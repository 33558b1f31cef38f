"""Engine-dispatch compatibility shims.

The reference dispatches ``to_export``/``to_singer`` on the input frame type
(``@singledispatch``, etl_utils.py:562-577, singer.py:437-451) with pandas
and polars registrations. This engine has ONE execution engine — Spark — so
these shims convert a driver-side pandas/polars frame to a Spark DataFrame
and route to the Spark implementations; reference call sites run unchanged.

Only use them for driver-sized frames (config blobs, small tap outputs):
data at scale should already be a Spark DataFrame. The polars variants are
gated behind an import-try (polars is not a dependency of this engine).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "ensure_spark_df",
    "pandas_df_to_export",
    "pandas_df_to_singer",
    "polars_df_to_export",
    "polars_df_to_singer",
    "polars_lf_to_export",
    "polars_lf_to_singer",
    "PolarsReader",
    "PLLazyFrameReader",
    "map_pd_type_to_polars",
    "cast_df_from_schema",
    "cast_lf_from_schema",
    "gen_singer_header_from_polars_schema",
]


def _spark() -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark

    return get_spark()


def ensure_spark_df(data: Any) -> DataFrame:
    """Spark DataFrame passthrough; pandas/polars frames are converted
    driver-side (Arrow when available)."""
    if isinstance(data, DataFrame):
        return data
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            return _spark().createDataFrame(data)
    except ImportError:  # pragma: no cover - pandas ships with pyspark
        pass
    try:
        import polars as pl

        if isinstance(data, pl.LazyFrame):
            data = data.collect()
        if isinstance(data, pl.DataFrame):
            return _spark().createDataFrame(data.to_pandas())
    except ImportError:
        pass
    raise NotImplementedError(
        f"to_export/to_singer is not implemented for {type(data).__name__}"
    )


def pandas_df_to_export(data, name: str, output_dir: str, **kwargs) -> None:
    """Reference ``pandas_df_to_export`` (etl_utils.py:578-669)."""
    from .sinks.export import to_export

    to_export(ensure_spark_df(data), name, output_dir, **kwargs)


def pandas_df_to_singer(df, stream: str, output_dir: str, **kwargs) -> None:
    """Reference ``pandas_df_to_singer`` (singer.py:453-606)."""
    from .sinks.singer import to_singer

    to_singer(ensure_spark_df(df), stream, output_dir, **kwargs)


def polars_df_to_export(data, name: str, output_dir: str, **kwargs) -> None:
    """Reference ``polars_df_to_export`` (etl_utils.py:755-836); requires
    polars installed at the call site."""
    pandas_df_to_export(data, name, output_dir, **kwargs)


def polars_df_to_singer(df, stream: str, output_dir: str, **kwargs) -> None:
    """Reference ``polars_df_to_singer`` (singer.py:608-716)."""
    pandas_df_to_singer(df, stream, output_dir, **kwargs)


def polars_lf_to_export(data, name: str, output_dir: str, **kwargs) -> None:
    """Reference ``polars_lf_to_export`` (etl_utils.py:672-753)."""
    pandas_df_to_export(data, name, output_dir, **kwargs)


def polars_lf_to_singer(df, stream: str, output_dir: str, **kwargs) -> None:
    """Reference lazy-frame singer path (singer.py polars registration)."""
    pandas_df_to_singer(df, stream, output_dir, **kwargs)


# ---------------------------------------------------------------------------
# Import-parity aliases for the reference's polars class/function names
# (readers/pl_reader.py:12, readers/pl_lazyframe_reader.py:9,
# utils/polars_utils.py:3-59, singer.py:552). SURVEY §2.1 S11–S14 folds the
# polars engines into the single Spark Reader; these shims exist so a
# reference script's imports resolve unchanged. Anything that must HAND BACK
# a polars object needs polars importable at the call site; everything else
# works engine-side.
# ---------------------------------------------------------------------------

from .sources.reader import Reader as _Reader  # noqa: E402


def _require_polars():
    try:
        import polars as pl  # noqa: PLC0415

        return pl
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "polars is not installed; this engine executes on Spark only. "
            "Use Reader.get() (Spark DataFrame) or install polars for the "
            "driver-side conversion shim."
        ) from exc


def _to_polars(df: DataFrame):
    """Driver-side Spark → polars conversion (small frames only)."""
    return _require_polars().from_pandas(df.toPandas())


class PolarsReader(_Reader):
    """Reference ``PolarsReader`` (readers/pl_reader.py:12): same discovery,
    catalog, and coercion as :class:`Reader`, but ``get`` hands back a
    ``pl.DataFrame``. The read/coerce pipeline runs on Spark; only the
    final driver-side handoff converts — use the base :class:`Reader` for
    data that shouldn't be collected."""

    def get(self, stream, default=None, catalog_types: bool = True, **kwargs):
        df = super().get(stream, default=None, catalog_types=catalog_types, **kwargs)
        if df is None:
            return default
        return _to_polars(df)


class PLLazyFrameReader(PolarsReader):
    """Reference ``PLLazyFrameReader`` (readers/pl_lazyframe_reader.py:9):
    ``get`` returns a ``pl.LazyFrame``."""

    def get(self, stream, default=None, catalog_types: bool = True, **kwargs):
        out = super().get(stream, default=None, catalog_types=catalog_types, **kwargs)
        return default if out is None else out.lazy()


def map_pd_type_to_polars(type_name):
    """Reference ``map_pd_type_to_polars`` (utils/polars_utils.py:3-29):
    pandas-style type name → polars dtype. Requires polars."""
    pl = _require_polars()
    if not isinstance(type_name, str):
        type_name = type_name.__name__
    mapping = {
        "Int64": pl.Int64,
        "int": pl.Int64,
        "Float64": pl.Float64,
        "float": pl.Float64,
        "Boolean": pl.Boolean,
        "bool": pl.Boolean,
        "boolean": pl.Boolean,
        "String": pl.String,
        "object": pl.String,
        "Datetime": pl.Datetime(time_unit="ns", time_zone="UTC"),
        "Date": pl.Date,
        "Time": pl.Time,
    }
    if type_name not in mapping:
        raise ValueError(f"Unknown type: {type_name}")
    return mapping[type_name]


_SPARK_TYPE_NAMES = {
    "Int64": "long",
    "int": "long",
    "Float64": "double",
    "float": "double",
    "Boolean": "boolean",
    "bool": "boolean",
    "boolean": "boolean",
    "String": "string",
    "object": "string",
    "Datetime": "timestamp",
    "Date": "date",
    "Time": "string",
}


def cast_df_from_schema(df, types_params: dict):
    """Reference ``cast_df_from_schema`` (utils/polars_utils.py:41-48):
    cast listed columns to the given types (booleans via the true/false
    string matrix, not a blind cast). Dual dispatch: a Spark DataFrame is
    cast engine-side through :func:`functions.casting.cast_expr` (type
    names accepted as the reference's pandas-style strings or polars
    dtypes); a polars frame follows the reference semantics verbatim."""
    if isinstance(df, DataFrame):
        from pyspark.sql import functions as F
        from pyspark.sql.types import _parse_datatype_string

        from .functions.casting import cast_expr

        cols = []
        for c in df.columns:
            if c in types_params:
                name = types_params[c]
                name = name if isinstance(name, str) else str(name)
                # parametrized polars dtypes stringify with arguments —
                # "Datetime(time_unit='ns', time_zone='UTC')" — strip to
                # the base name when THAT is a known polars/pandas name
                # (parametrized Spark strings like "decimal(10,2)" still
                # pass through to the parser intact)
                base = name.split("(", 1)[0].strip()
                if base in _SPARK_TYPE_NAMES:
                    name = base
                spark_t = _parse_datatype_string(
                    _SPARK_TYPE_NAMES.get(name, name.lower())
                )
                cols.append(
                    cast_expr(F.col(c), spark_t, source_dt=df.schema[c].dataType).alias(c)
                )
            else:
                cols.append(F.col(c))
        return df.select(*cols)
    pl = _require_polars()
    if isinstance(df, pl.LazyFrame):
        return cast_lf_from_schema(df, types_params)
    schema = df.schema
    return df.with_columns(
        [
            pl.col(c) if dt == pl.Boolean and schema.get(c) == pl.Boolean
            else _pl_cast_expr(pl, c, dt)
            for c, dt in types_params.items()
        ]
    )


def cast_lf_from_schema(lf, types_params: dict):
    """Reference ``cast_lf_from_schema`` (utils/polars_utils.py:31-39);
    Spark DataFrames route to :func:`cast_df_from_schema` (a Spark frame
    is already lazy)."""
    if isinstance(lf, DataFrame):
        return cast_df_from_schema(lf, types_params)
    pl = _require_polars()
    schema = lf.collect_schema()
    return lf.with_columns(
        [
            pl.col(c) if dt == pl.Boolean and schema.get(c) == pl.Boolean
            else _pl_cast_expr(pl, c, dt)
            for c, dt in types_params.items()
        ]
    )


def _pl_cast_expr(pl, col: str, dtype):
    """Reference ``_cast_expr`` (utils/polars_utils.py:51-61)."""
    if dtype == pl.Boolean:
        lowered = pl.col(col).cast(pl.Utf8, strict=False).str.to_lowercase()
        return (
            pl.when(lowered == "true").then(pl.lit(True))
            .when(lowered == "false").then(pl.lit(False))
            .alias(col)
        )
    return pl.col(col).cast(dtype, strict=True)


def gen_singer_header_from_polars_schema(schema) -> dict:
    """Reference ``gen_singer_header_from_polars_schema`` (singer.py:552):
    polars schema → Singer JSON-Schema header. Operates on ``str(dtype)``
    so it accepts a ``pl.Schema``, a ``{col: dtype}`` mapping of polars
    dtypes, OR plain dtype-name strings — usable without polars."""
    primitive = {
        "Float64": {"type": ["number", "null"]},
        "Float32": {"type": ["number", "null"]},
        "Int64": {"type": ["integer", "null"]},
        "Int32": {"type": ["integer", "null"]},
        "Int16": {"type": ["integer", "null"]},
        "Int8": {"type": ["integer", "null"]},
        "UInt64": {"type": ["integer", "null"]},
        "UInt32": {"type": ["integer", "null"]},
        "UInt16": {"type": ["integer", "null"]},
        "UInt8": {"type": ["integer", "null"]},
        "Boolean": {"type": ["boolean", "null"]},
        "Utf8": {"type": ["string", "null"]},
        "String": {"type": ["string", "null"]},
        "Date": {"type": ["string", "null"], "format": "date"},
        "Datetime": {"type": ["string", "null"], "format": "date-time"},
        "Time": {"type": ["string", "null"], "format": "time"},
    }

    def map_dtype(dtype) -> dict:
        name = str(dtype)
        if name.startswith("Struct("):
            return {"type": ["object", "null"]}
        if name.startswith("Datetime("):
            return {"type": ["string", "null"], "format": "date-time"}
        if name.startswith("List("):
            return {"type": ["array", "null"], "items": {"type": ["any", "null"]}}
        return primitive.get(name, {"type": ["string", "null"]})

    return {
        "type": ["object", "null"],
        "properties": {c: map_dtype(dt) for c, dt in dict(schema).items()},
    }
