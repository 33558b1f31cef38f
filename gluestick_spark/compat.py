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
