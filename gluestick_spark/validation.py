"""Record validation against Pydantic unified models — distributed.

Parity target: /root/reference/gluestick/unified_models_utils.py:34-80
(``validate_model``: per-record Pydantic validation collecting errors).

Spark shape: Arrow-batched ``mapInPandas`` — each executor validates its
partitions; valid rows and error rows come back as one DataFrame with an
``_error`` column (null = valid), so callers can split with two filters
(both served from the same scan). Pydantic is an optional dependency —
a plain callable validator works too.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["validate_records", "split_valid_invalid"]


def validate_records(
    df: DataFrame,
    model: Any = None,
    validator: Callable[[dict[str, Any]], None] | None = None,
    error_col: str = "_error",
) -> DataFrame:
    """Validate each row; append ``error_col`` (null when valid).

    ``model``: a Pydantic model class (``model_validate`` is called), or
    pass a ``validator`` callable that raises on invalid records.
    """
    if model is None and validator is None:
        raise ValueError("provide a pydantic model or a validator callable")

    def check(rec: dict[str, Any]) -> str | None:
        try:
            if model is not None:
                model.model_validate(rec)
            if validator is not None:
                validator(rec)
            return None
        except Exception as exc:  # validation errors become row-level data
            return str(exc)

    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(error_col, T.StringType())])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            errs = [check(rec) for rec in pdf.to_dict(orient="records")]
            out = pdf.copy()
            out[error_col] = pd.Series(errs, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(process, out_schema)


def split_valid_invalid(
    validated: DataFrame, error_col: str = "_error"
) -> tuple[DataFrame, DataFrame]:
    """(valid rows without the error col, invalid rows with it)."""
    valid = validated.where(validated[error_col].isNull()).drop(error_col)
    invalid = validated.where(validated[error_col].isNotNull())
    return valid, invalid
