"""Datetime helpers.

Parity targets (citations into /root/reference):
- ``localize_datetime`` (df mode): gluestick/date_utils.py:82-90 —
  ``to_datetime(errors="coerce")`` then tz-localize/convert to UTC. With the
  session timezone pinned UTC, this is ``try_to_timestamp``.
- Singer datetime rendering ``%Y-%m-%dT%H:%M:%S.%fZ`` / ``%Y-%m-%d``:
  gluestick/singer.py:17, 280-304 (``deep_convert_datetimes``).

Plus an engine-specific helper: parquet TIMESTAMP(NANOS) columns are read as
long nanos (see session.ENGINE_CONF) and converted here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "as_timestamp",
    "localize_datetime",
    "ns_to_timestamp",
    "singer_datetime_expr",
]

SINGER_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def localize_datetime(df, column, timezone: str = "UTC"):
    """Coerce a column to UTC timestamp; unparseable values become null.

    Two modes like the reference (date_utils.py:38-115): a Spark DataFrame
    with a column name (distributed; always UTC), or a single record dict
    with a list of field names (driver-side validation flow — dispatches to
    :func:`gluestick_spark.records.localize_record_datetimes`, which raises
    ``CustomValidationError`` on NaT values).
    """
    if isinstance(column, (list, tuple)) or isinstance(df, dict):
        from ..records import localize_record_datetimes

        return localize_record_datetimes(df, list(column), timezone)
    dt = df.schema[column].dataType
    if isinstance(dt, T.TimestampType):
        return df
    return df.withColumn(column, F.try_to_timestamp(F.col(f"`{column}`").cast("string")))


def ns_to_timestamp(col: Column) -> Column:
    """Long nanoseconds-since-epoch → TimestampType (micro truncation).

    Exact integer division via decimal — a double division would lose
    precision above 2^53 ns (~104 days into 1970).
    """
    micros = (col.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def as_timestamp(df: DataFrame, column: str) -> Column:
    """Normalize an event-time column to TimestampType across source
    generations.

    Parquet TIMESTAMP(NANOS) surfaces as long nanos under
    ``spark.sql.legacy.parquet.nanosAsLong`` (older data gens); newer files
    carry a plain ``timestamp``/``timestamp_ntz`` and need no conversion.
    Dispatching on the *schema* (not a blind cast) keeps the expression a
    no-op passthrough — zero plan overhead — when the file is already
    timestamp-typed.
    """
    dt = df.schema[column].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.col(column)
    if isinstance(dt, T.LongType):
        return ns_to_timestamp(F.col(column))
    # Fail loudly on schema drift (string/date/double…) rather than silently
    # interpreting an unexpected dtype as nanoseconds-since-epoch.
    raise TypeError(
        f"as_timestamp: column {column!r} has dtype {dt.simpleString()}; "
        "expected timestamp, timestamp_ntz, or long (nanos-since-epoch)"
    )


def singer_datetime_expr(col: Column, dt: T.DataType) -> Column:
    """Render a temporal column the way the Singer sink does
    (deep_convert_datetimes): timestamps → ISO-µs ``Z``, dates → yyyy-MM-dd.

    This is the vectorized column form of the sink's per-record strftime —
    the shape that runs at corpus scale. NTZ timestamps render identically
    (the session is pinned UTC, so wall time == instant time).
    """
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, SINGER_TS_FORMAT)
    if isinstance(dt, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    return col
