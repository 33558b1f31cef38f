"""Generate oracle fixtures for queries whose verification depends on a
hash function DuckDB cannot compute (Spark xxhash64).

The simhash pipeline is re-implemented here INDEPENDENTLY (pure-Python
XXH64 from the public spec + numpy majority vote) — no Spark involved — so
the fixture is a genuine second implementation, not a dump of the system
under test. Parity of the two implementations is asserted at a different
scale factor in tests/test_llm_ops.py::test_simhash_fixture_replica_matches_spark.

Usage:  PYTHONPATH=/root/repo python tools/make_oracle_fixtures.py
Writes: tests/fixtures/simhash_pairs_sf001.parquet (for the sf0.01
        correctness gate — regenerate if the testdata changes).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.xxh64 import xxh64  # noqa: E402

_WS = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only; match it


def simhash_sig_py(text: str) -> int:
    """Independent replica of simhash_signature_udf ∘ xxhash64-token-hashing:
    distinct whitespace tokens of lower(text), XXH64 per token, per-bit
    majority vote (bit set iff ones*2 > n). Returns unsigned 64-bit."""
    toks = list(dict.fromkeys(t for t in _WS.split(text.lower()) if t != ""))
    if not toks:
        return 0
    hashes = [xxh64(t.encode("utf-8")) & ((1 << 64) - 1) for t in toks]
    n = len(hashes)
    sig = 0
    for i in range(64):
        ones = sum((h >> i) & 1 for h in hashes)
        if ones * 2 > n:
            sig |= 1 << i
    return sig


def simhash_pairs_py(
    docs: dict[int, str], max_hamming: int = 8, chunks: int | None = None
) -> list[tuple[int, int, int]]:
    """Independent replica of simhash_near_dups: band the 64-bit signature
    into ``chunks`` pieces, candidate pairs share ≥1 (chunk, piece), verify
    exact hamming ≤ ``max_hamming``. Returns sorted (a, b, hamming).
    ``chunks=None`` mirrors the library's adaptive default (max_hamming+1 —
    the widest full-recall banding)."""
    if chunks is None:
        chunks = min(16, max_hamming + 1)
    bits_per = 64 // chunks
    mask = (1 << bits_per) - 1
    sigs = {i: simhash_sig_py(t) for i, t in docs.items()}
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, s in sigs.items():
        for c in range(chunks):
            buckets.setdefault((c, (s >> (c * bits_per)) & mask), []).append(i)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    out = []
    for a, b in pairs:
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return sorted(out)


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "simhash_pairs_sf001.parquet",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 200"
    ).fetchall()
    pairs = simhash_pairs_py({i: t for i, t in rows}, max_hamming=8)
    con.sql("CREATE TABLE p (a BIGINT, b BIGINT, hamming INT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pairs)
    con.sql(f"COPY p TO '{out}' (FORMAT PARQUET)")
    print(f"wrote {len(pairs)} pairs to {out}")


if __name__ == "__main__":
    main()
