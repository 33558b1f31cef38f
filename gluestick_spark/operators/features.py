"""Feature-engineering operators: equi-depth binning and column scaling.

The preprocessing pair every ML-adjacent pipeline reimplements: quantile
(equi-depth) bucketing for stratification/curriculum ordering, and
z-score / min-max scaling before distance-based models (the ANN stack in
:mod:`gluestick_spark.llm.similarity` assumes comparable feature scales).

Scale design: both are two-phase — ONE statistics aggregate over one scan
(exact sort-based percentiles / moments), then a pure projection applying
the learned transform. The statistics are tiny scalars broadcast into the
second pass's expressions, so the transform itself pipelines inside the
scan with no shuffle. The learned parameters are also RETURNED so
serving-time data can apply the identical transform (train/serve skew is
a parameter-snapshot problem — persist them with the snapshot machinery).

Exact (engine-portable) percentiles keep the bin edges oracle-checkable;
swap ``percentile`` for ``percentile_approx`` at 100 TB when ±0.1% edge
error is acceptable — the operator shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["equi_depth_bin", "scale_features", "clip_outliers"]


def equi_depth_bin(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str | None = None,
    edge_decimals: int | None = None,
) -> tuple[DataFrame, list[float]]:
    """Assign each row an equi-depth (quantile) bin 0..n_bins−1 over
    ``col``: bin edges are the exact 1/n_bins … (n_bins−1)/n_bins
    percentiles; a value lands in bin i when edge[i−1] < v ≤ edge[i]
    (right-closed, matching SQL ``width_bucket``-style conventions with
    quantile edges). NULLs get NULL bins. Returns (binned df, edges).

    Unlike ``ntile`` (a GLOBAL SORT of the whole table — the thing to
    avoid at 100 TB), this is one percentile aggregate + a branch-free
    projection; ties at an edge all take the lower bin, so equal values
    always share a bin (ntile splits them arbitrarily — statistically
    wrong for stratification).

    ``edge_decimals``: for inputs quantized to a 10^-d decimal grid, snap
    each interpolated edge DOWN to that grid (with a 1%-of-step tolerance
    absorbing the ±ulp the interpolation formula itself contributes —
    ``a·(1−t)+b·t`` vs ``a+(b−a)·t`` differ in the last bit when t isn't
    dyadic). Snapped edges make bin assignment a pure grid comparison:
    bit-reproducible across engines, Spark versions, and serve-time
    re-implementations. No-op for continuous inputs left at ``None``."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    out_col = out_col or f"{col}_bin"
    v = F.col(col).cast("double")
    qs = [i / n_bins for i in range(1, n_bins)]
    row = df.agg(F.percentile(v, F.array(*[F.lit(q) for q in qs])).alias("e")).first()
    if row["e"] is None:
        raise ValueError(f"equi_depth_bin: column {col!r} has no non-null values")
    edges = [float(x) for x in row["e"]]
    if edge_decimals is not None:
        import math

        scale = 10.0 ** edge_decimals
        edges = [math.floor(e * scale + 0.01) / scale for e in edges]
    bin_expr = F.lit(0)
    for e in edges:
        bin_expr = bin_expr + (v > F.lit(e)).cast("int")
    binned = df.withColumn(out_col, F.when(v.isNotNull(), bin_expr))
    return binned, edges


def scale_features(
    df: DataFrame,
    cols: list[str],
    method: str = "zscore",
    suffix: str = "_scaled",
) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Scale numeric columns: ``"zscore"`` → (x − mean)/stddev (population
    stddev; constant columns scale to 0.0), ``"minmax"`` → (x − min)/
    (max − min), ``"robust"`` → (x − median)/IQR (sklearn RobustScaler
    semantics — outlier-resistant center/spread: one corrupt reading
    moves a mean and stddev arbitrarily far but barely moves the
    quartiles; pair with :func:`clip_outliers` for heavy-tailed
    features). Constant/zero-spread columns scale to 0.0 in every mode.
    Adds ``{col}{suffix}`` columns; returns (df, {col: params}) where
    params is (mean, stddev), (min, max), or (median, iqr) — persist
    them to apply the identical transform at serving time. One
    statistics aggregate over one scan, then a projection."""
    if method not in ("zscore", "minmax", "robust"):
        raise ValueError(f"method must be 'zscore'/'minmax'/'robust', got {method!r}")
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        if method == "zscore":
            aggs += [F.avg(v).alias(f"m_{c}"), F.stddev_pop(v).alias(f"s_{c}")]
        elif method == "robust":
            aggs += [
                F.percentile(
                    v, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
                ).alias(f"q_{c}")
            ]
        else:
            aggs += [F.min(v).alias(f"m_{c}"), F.max(v).alias(f"s_{c}")]
    row = df.agg(*aggs).first()
    params: dict[str, tuple[float, float]] = {}
    out = df
    for c in cols:
        if method == "robust":
            qs = row[f"q_{c}"]
            if qs is None:
                a, b = 0.0, 0.0
            else:
                a, b = float(qs[1]), float(qs[2]) - float(qs[0])
            denom = b
        else:
            a, b = float(row[f"m_{c}"] or 0.0), float(row[f"s_{c}"] or 0.0)
            denom = b if method == "zscore" else (b - a)
        params[c] = (a, b)
        v = F.col(c).cast("double")
        if denom == 0.0:
            scaled = F.when(v.isNotNull(), F.lit(0.0))
        else:
            scaled = (v - F.lit(a)) / F.lit(denom)
        out = out.withColumn(f"{c}{suffix}", scaled)
    return out, params


def clip_outliers(
    df: DataFrame,
    cols: list[str],
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    suffix: str = "_clip",
    edge_decimals: int | None = None,
) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Winsorize: clamp each column into its [``lower_q``, ``upper_q``]
    quantile band — the standard heavy-tail remedy before scaling or
    distance-based models (one corrupt sensor reading otherwise owns the
    z-score denominator). Adds ``{col}{suffix}``; returns (df, {col:
    (lo, hi)}) — persist the bounds to clip identically at serving time.

    ONE percentile aggregate over one scan for ALL columns, then a pure
    ``greatest(least(...))`` projection that pipelines inside the scan —
    the same two-phase shape as :func:`scale_features`, no shuffle beyond
    the aggregate. ``edge_decimals`` snaps bounds to a decimal grid
    exactly as in :func:`equi_depth_bin` (cross-engine/serve-time
    reproducible clipping of grid-quantized inputs)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if not (0.0 <= lower_q < upper_q <= 1.0):
        raise ValueError(f"need 0 <= lower_q < upper_q <= 1, got {lower_q}, {upper_q}")
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs.append(
            F.percentile(
                v, F.array(F.lit(lower_q), F.lit(upper_q))
            ).alias(f"q_{c}")
        )
    row = df.agg(*aggs).first()
    params: dict[str, tuple[float, float]] = {}
    out = df
    for c in cols:
        qs = row[f"q_{c}"]
        if qs is None:
            raise ValueError(f"clip_outliers: column {c!r} has no non-null values")
        lo, hi = float(qs[0]), float(qs[1])
        if edge_decimals is not None:
            import math

            scale = 10.0 ** edge_decimals
            lo = math.floor(lo * scale + 0.01) / scale
            hi = math.floor(hi * scale + 0.01) / scale
        params[c] = (lo, hi)
        v = F.col(c).cast("double")
        # explicit NULL guard: greatest/least SKIP nulls (SQL semantics),
        # so an unguarded NULL would "clip" to the lower bound
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(v.isNotNull(), F.greatest(F.least(v, F.lit(hi)), F.lit(lo))),
        )
    return out, params
