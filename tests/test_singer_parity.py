"""Message-level parity: our Singer sink vs the reference implementation
on identical data (skipped when the reference checkout is absent)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import types

import pytest

REFERENCE = "/root/reference"


def _import_reference_to_singer():
    # polars isn't installed here; the reference imports it at module load —
    # satisfy it with an attribute-fabricating stub (nothing polars is used
    # on the pandas to_singer path)
    class _Any(type):
        def __getattr__(cls, item):
            return _make(item)

    def _make(name):
        return _Any(name, (object,), {})

    fake = types.ModuleType("polars")

    class _FakeMeta(types.ModuleType):
        def __getattr__(self, item):
            return _make(item)

    fake.__class__ = _FakeMeta
    sys.modules.setdefault("polars", fake)
    sys.path.insert(0, REFERENCE)
    from gluestick.singer import to_singer  # noqa: PLC0415

    return to_singer


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference checkout absent")
def test_singer_messages_match_reference(spark):
    import numpy as np
    import pandas as pd

    from gluestick_spark import to_singer

    ref_to_singer = _import_reference_to_singer()
    n = 50
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "amount": rng.normal(100, 25, size=n).round(4),
            "active": rng.integers(0, 2, size=n, dtype=np.int8).astype(bool),
            "name": pd.array([f"name_{i}" if i % 7 else None for i in range(n)], dtype="string"),
            "created_at": pd.to_datetime(
                rng.integers(1_600_000_000, 1_700_000_000, size=n), unit="s", utc=True
            ),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        ref_to_singer(pdf, "out", d, keys=["id"])
        ref_msgs = [json.loads(l) for l in open(os.path.join(d, "data.singer"))]
    with tempfile.TemporaryDirectory() as d:
        to_singer(spark.createDataFrame(pdf), "out", d, keys=["id"])
        our_msgs = [json.loads(l) for l in open(os.path.join(d, "data.singer"))]

    assert len(our_msgs) == len(ref_msgs)
    for i, (a, b) in enumerate(zip(ref_msgs, our_msgs)):
        assert a == b, f"message {i} differs"
