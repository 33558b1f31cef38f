"""Round-14 regression tests: ADVICE-r13 closures (torn-append-aware
plain-IVF rebalance, KLL compaction watermark, catalog-aware orphan
clearing, cosine rebalance geometry) and the round's new operators."""

import pytest
from pyspark.sql import functions as F


# ---------------- ADVICE 3: orphan clearing respects the catalog --------


def test_clear_orphaned_location_respects_catalog(spark, tmp_dir):
    """An EXTERNAL table sitting on the default warehouse path of a
    missing table name must survive (ADVICE r13 #3); a true orphan dir
    is cleared — including the default-database case, which lives at
    wh/tbl, not wh/default.db/tbl."""
    import os
    import shutil
    from urllib.parse import urlparse

    from gluestick_spark.sinks.layout import _clear_orphaned_managed_location

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    os.makedirs(wh, exist_ok=True)

    # external table whose LOCATION is the default path of name ext_prot
    ext_loc = os.path.join(wh, "ext_prot")
    shutil.rmtree(ext_loc, ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS other_name_r14")
    spark.createDataFrame([(1,)], "a int").write.mode("overwrite").parquet(
        ext_loc
    )
    spark.sql(
        f"CREATE TABLE other_name_r14 (a INT) USING parquet "
        f"LOCATION '{ext_loc}'"
    )
    try:
        assert not spark.catalog.tableExists("ext_prot")
        _clear_orphaned_managed_location(spark, "ext_prot")
        assert os.path.isdir(ext_loc), "external table data was deleted"
        assert spark.table("other_name_r14").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS other_name_r14")
        shutil.rmtree(ext_loc, ignore_errors=True)

    # true orphan, QUALIFIED default-db name: old code looked at
    # wh/default.db/tbl and missed it
    orphan = os.path.join(wh, "orphan_r14")
    os.makedirs(orphan, exist_ok=True)
    _clear_orphaned_managed_location(spark, "default.orphan_r14")
    assert not os.path.isdir(orphan)

    # and the unqualified form
    os.makedirs(orphan, exist_ok=True)
    _clear_orphaned_managed_location(spark, "orphan_r14")
    assert not os.path.isdir(orphan)


# ---------------- VERDICT #2: ANN index DELETE + vacuum ------------------


def _emb(spark, n=300, dim=8):
    import math

    rows = [
        (i, [math.sin(0.31 * i + j) + 0.01 * ((i * (j + 2)) % 5) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_sq_ivf_delete_serves_survivors_and_vacuum_purges(spark, tmp_dir):
    """Delete propagation (VERDICT r13 #2): tombstoned ids vanish from
    serving immediately; vacuum physically purges exactly the affected
    cells, drops fully-dead ones, clears the tombstones, and the probe
    answer is unchanged before/after vacuum — and equals exhaustive SQ
    scoring over the surviving rows."""
    import os

    from gluestick_spark.llm.cluster import (
        materialize_sq_ivf,
        sq_ivf_append,
        sq_ivf_topk_indexed,
    )
    from gluestick_spark.llm.index_delete import (
        TOMBSTONES,
        sq_ivf_delete,
        tombstones,
        vacuum_deleted,
    )
    from gluestick_spark.llm.similarity import sq_topk

    emb = _emb(spark)
    path = os.path.join(tmp_dir, "sq_idx")
    materialize_sq_ivf(
        emb.where("vec_id < 100"), "embedding", "vec_id", path, n_clusters=4
    )
    sq_ivf_append(emb.where("vec_id >= 100"), "embedding", "vec_id", path)

    q = [1.0] * 8
    # plant the delete set to INCLUDE the full corpus's top-3 — the test
    # cannot pass by accident
    top_full = [r["vec_id"] for r in sq_topk(emb, "embedding", "vec_id", q, 3).collect()]
    doom_pred = F.col("vec_id").isin(top_full) | (F.col("vec_id") % 7 == 3)
    doomed = emb.where(doom_pred).select("vec_id")
    n_doomed = doomed.count()
    assert sq_ivf_delete(spark, path, doomed) == n_doomed
    # idempotent re-delete
    assert sq_ivf_delete(spark, path, doomed) == n_doomed

    survivors = emb.where(~doom_pred)
    brute = [
        tuple(r) for r in sq_topk(survivors, "embedding", "vec_id", q, 10).collect()
    ]
    got = [
        tuple(r)
        for r in sq_ivf_topk_indexed(spark, path, q, k=10, nprobe=4).collect()
    ]
    assert got == brute
    assert not any(v in top_full for v, _ in got)

    # vacuum: physical purge, atomic per-cell swap, tombstones cleared
    rep = vacuum_deleted(spark, path)
    assert rep["rows_purged"] == n_doomed
    assert tombstones(spark, path, "vec_id") is None
    assert not os.path.isdir(os.path.join(path, TOMBSTONES))
    left = spark.read.parquet(os.path.join(path, "cells"))
    assert left.where(doom_pred).count() == 0
    assert left.count() == 300 - n_doomed
    got2 = [
        tuple(r)
        for r in sq_ivf_topk_indexed(spark, path, q, k=10, nprobe=4).collect()
    ]
    assert got2 == brute
    # vacuum with nothing to do is a no-op
    assert vacuum_deleted(spark, path)["rows_purged"] == 0


def test_ivf_delete_fully_dead_cell_and_plain_family(spark, tmp_dir):
    """Plain-family delete: wiping every row of one cell drops its dir
    at vacuum; serving (cosine top-k) equals brute force over survivors
    both before and after."""
    import os

    from gluestick_spark.llm.index_delete import ivf_delete, vacuum_deleted
    from gluestick_spark.llm.similarity import (
        cosine_topk,
        ivf_topk_indexed,
        materialize_ivf,
        train_ivf_centroids,
    )

    emb = _emb(spark)
    path = os.path.join(tmp_dir, "ivf_idx")
    cents = train_ivf_centroids(emb, "embedding", 4)
    materialize_ivf(emb, "embedding", cents, path)

    # wipe one whole cell + a few ids elsewhere
    assigned = spark.read.parquet(path)
    cid0 = assigned.groupBy("centroid_id").count().orderBy("count").first()[
        "centroid_id"
    ]
    doomed = (
        assigned.where(F.col("centroid_id") == cid0)
        .select("vec_id")
        .union(emb.where("vec_id % 31 = 1").select("vec_id"))
        .distinct()
    )
    doomed_ids = {r["vec_id"] for r in doomed.collect()}
    ivf_delete(spark, path, doomed)

    q = [1.0] * 8
    surv = emb.where(~F.col("vec_id").isin(list(doomed_ids)))
    brute = [tuple(r) for r in cosine_topk(surv, "embedding", q, 10).collect()]
    got = [
        tuple(r)
        for r in ivf_topk_indexed(spark, path, q, cents, k=10, nprobe=4).collect()
    ]
    assert got == brute

    rep = vacuum_deleted(
        spark, path, cells=".", part_col="centroid_id", id_col="vec_id"
    )
    assert cid0 in rep["cells_dropped"]
    assert not os.path.isdir(os.path.join(path, f"centroid_id={cid0}"))
    assert rep["rows_purged"] == len(doomed_ids)
    got2 = [
        tuple(r)
        for r in ivf_topk_indexed(spark, path, q, cents, k=10, nprobe=4).collect()
    ]
    assert got2 == brute


def test_torn_delete_refuses_to_serve_and_rolls_back(spark, tmp_dir):
    """Crash window: a delete that died between tombstone write and
    bracket commit leaves the sidecar — serving refuses loudly; the next
    op rolls the torn tombstones back (the self-describing manifest
    guarantees the rollback targets the TOMBSTONE root, never the
    cells), and delete-then-append equals rebuild over the same rows."""
    import json
    import os

    from gluestick_spark.llm.cluster import (
        materialize_sq_ivf,
        sq_ivf_append,
        sq_ivf_topk_indexed,
    )
    from gluestick_spark.llm.index_commit import SIDECAR
    from gluestick_spark.llm.index_delete import (
        TOMBSTONES,
        sq_ivf_delete,
        tombstones,
    )

    emb = _emb(spark)
    path = os.path.join(tmp_dir, "sq_torn")
    materialize_sq_ivf(emb, "embedding", "vec_id", path, n_clusters=4)

    # simulate the torn delete: run a real delete, then re-plant the
    # sidecar AS IF the commit never happened (manifest = empty tombstone
    # root, i.e. the pre-delete listing)
    n_cells_files = sum(
        len(files) for _, _, files in os.walk(os.path.join(path, "cells"))
    )
    assert sq_ivf_delete(
        spark, path, emb.where("vec_id % 11 = 5").select("vec_id")
    ) > 0
    with open(os.path.join(path, SIDECAR), "w") as f:
        json.dump({"files": [], "cells": TOMBSTONES}, f)

    with pytest.raises(ValueError, match="in-progress or torn"):
        sq_ivf_topk_indexed(spark, path, [1.0] * 8, k=5, nprobe=4)

    # next delete heals: torn tombstone files removed, cells untouched
    assert sq_ivf_delete(
        spark, path, emb.where("vec_id % 13 = 2").select("vec_id")
    ) > 0
    t = tombstones(spark, path, "vec_id")
    ids = {r["vec_id"] for r in t.collect()}
    assert ids == {i for i in range(300) if i % 13 == 2}
    assert not any(i % 11 == 5 and i % 13 != 2 for i in ids)
    n_cells_files2 = sum(
        len(files) for _, _, files in os.walk(os.path.join(path, "cells"))
    )
    assert n_cells_files2 == n_cells_files  # rollback never touched cells

    # delete-then-append == rebuild over (old - doomed) + new
    extra = _emb(spark, n=40).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    sq_ivf_append(extra, "embedding", "vec_id", path)
    q = [0.4] * 8
    got = [
        tuple(r)
        for r in sq_ivf_topk_indexed(spark, path, q, k=10, nprobe=4).collect()
    ]
    from gluestick_spark.llm.similarity import sq_topk

    want_corpus = emb.where("vec_id % 13 != 2").unionByName(extra)
    assert got == [
        tuple(r) for r in sq_topk(want_corpus, "embedding", "vec_id", q, 10).collect()
    ]


# ---------------- VERDICT #6: unigram Viterbi segmentation ---------------


def _ref_segment(word, vocab, L, unk):
    """Brute-force reference: exact max-sum DP, ties -> smallest piece
    length — the documented decision rule, implemented independently."""
    n = len(word)
    NEG = float("-inf")
    dp = [0] + [NEG] * n
    bp = [0] * (n + 1)
    for i in range(1, n + 1):
        best, bl = NEG, 0
        for l in range(1, min(L, i) + 1):
            piece = word[i - l:i]
            sc = vocab.get(piece, unk if l == 1 else None)
            if sc is None or dp[i - l] == NEG:
                continue
            cand = dp[i - l] + sc
            if cand > best:  # strict: ties keep the SMALLEST l seen first
                best, bl = cand, l
        dp[i], bp[i] = best, bl
    parts, pos = [], n
    while pos > 0:
        l = bp[pos]
        parts.append(word[pos - l:pos])
        pos -= l
    return list(reversed(parts)), dp[n]


def test_unigram_segment_matches_bruteforce(spark):
    """Planted ln-scored vocab (the canonical log-prob instance, floor
    x1e6 to integers): the engine's Viterbi fold agrees with an
    independent brute-force DP on every word — pieces AND score."""
    import math

    from gluestick_spark.llm.unigram import unigram_segment

    pieces = [
        "in", "ter", "inter", "nation", "national", "net", "al", "ion",
        "at", "ernat", "supercal",
    ] + list("abcdefghijklmnopqrstuvwxyz")
    # deterministic pseudo-probabilities, ln-scored, integer-floored
    vocab = {
        p: math.floor(math.log(1.0 / (3 + (i * 7) % 23)) * 1e6)
        for i, p in enumerate(pieces)
    }
    words = [
        "international", "internet", "intern", "net", "national",
        "nationalization", "ternate", "aaaa", "supercala", "xyz",
        "q", "internationalatio",
    ]
    L, W, UNK = 8, 16, -40_000_000
    d = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    vdf = spark.createDataFrame(
        list(vocab.items()), "piece string, score long"
    )
    out = {
        r["word"]: (list(r["pieces"]), r["score"])
        for r in unigram_segment(
            d, "text", "doc_id", vdf,
            max_piece_len=L, max_word_len=W, unk_score=UNK,
        ).collect()
    }
    for w in words:
        if len(w) > W:
            assert out[w] == ([w], UNK), w
            continue
        ref_parts, ref_score = _ref_segment(w, vocab, L, UNK)
        assert out[w] == (ref_parts, ref_score), (w, out[w], ref_parts)
    # every segmentation rebuilds its word exactly
    for w, (parts, _) in out.items():
        assert "".join(parts) == w


# ---------------- VERDICT #7: streaming cross-corpus SemDeDup ------------


def test_streaming_semdedup_equals_batch(spark, tmp_dir):
    """Stream ≡ batch exactly (stateless per batch, frozen reference):
    two micro-batches of corpus embeddings judged against the persisted
    reference reproduce semdedup_against row-for-row; capped reference
    cells leave their corpus rows UNJUDGED in both; a torn reference
    (no meta) refuses loudly; an empty reference keeps everything."""
    import os

    from gluestick_spark.llm.cluster import semdedup_against
    from gluestick_spark.streaming.pipeline import (
        materialize_semdedup_ref,
        read_streaming_dedup_output,
        stream_from_directory,
        streaming_semdedup,
    )

    import math

    # skewed: 80% of vectors cluster tightly (one hot reference cell) so
    # the max_cluster_size cap is guaranteed to bite
    rows = []
    for i in range(240):
        if i % 5 != 0:
            v = [1.0 + 0.001 * ((i * (j + 3)) % 7) for j in range(8)]
        else:
            v = [math.sin(0.7 * i + j) for j in range(8)]
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = emb.where("vec_id % 3 = 0")
    cor = emb.where("vec_id % 3 != 0")
    refp = os.path.join(tmp_dir, "ref")
    materialize_semdedup_ref(
        ref, "embedding", "vec_id", refp, k=4, iters=2, max_cluster_size=35
    )

    stage = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ckpt = os.path.join(tmp_dir, "ckpt")
    schema = cor.schema
    for cond in ("vec_id <= 120", "vec_id > 120"):
        cor.where(cond).coalesce(1).write.mode("append").parquet(stage)
        q = streaming_semdedup(
            stream_from_directory(spark, stage, schema),
            refp, "embedding", "vec_id", out, ckpt, threshold=0.9,
        )
        q.awaitTermination()
    got = sorted(
        map(tuple, read_streaming_dedup_output(spark, out).collect())
    )
    want = sorted(
        map(
            tuple,
            semdedup_against(
                cor, ref, "embedding", "vec_id",
                k=4, iters=2, threshold=0.9, max_cluster_size=35,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    # the cap actually bit: some corpus rows are unjudged
    assert len(got) < cor.count()

    # torn reference refuses
    os.remove(os.path.join(refp, "_SEMDEDUP_META.json"))
    with pytest.raises(ValueError, match="torn or absent"):
        streaming_semdedup(
            stream_from_directory(spark, stage, schema),
            refp, "embedding", "vec_id", out, ckpt,
        )

    # empty reference: all rows keep, cid NULL (stream matches batch)
    refp2 = os.path.join(tmp_dir, "ref_empty")
    materialize_semdedup_ref(
        ref.where("vec_id < 0"), "embedding", "vec_id", refp2, k=4
    )
    out2 = os.path.join(tmp_dir, "out2")
    ckpt2 = os.path.join(tmp_dir, "ckpt2")
    q = streaming_semdedup(
        stream_from_directory(spark, stage, schema),
        refp2, "embedding", "vec_id", out2, ckpt2,
    )
    q.awaitTermination()
    rows = read_streaming_dedup_output(spark, out2).collect()
    assert len(rows) == cor.count()
    assert all(r["keep"] and r["cid"] is None for r in rows)


def test_tombstone_antijoin_keeps_partition_pruning(spark, tmp_dir):
    """The serving anti-join against tombstones must not disturb the
    probe's partition pruning: the cells FileSourceScan still carries a
    cid PartitionFilter with tombstones present."""
    import os

    from gluestick_spark.llm.cluster import (
        materialize_sq_ivf,
        sq_ivf_topk_indexed,
    )
    from gluestick_spark.llm.index_delete import sq_ivf_delete

    emb = _emb(spark)
    path = os.path.join(tmp_dir, "sq_prune")
    materialize_sq_ivf(emb, "embedding", "vec_id", path, n_clusters=4)
    sq_ivf_delete(
        spark, path, emb.where("vec_id % 9 = 4").select("vec_id")
    )
    top = sq_ivf_topk_indexed(spark, path, [1.0] * 8, k=5, nprobe=2)
    plan = top._jdf.queryExecution().executedPlan().toString()
    pruned = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln
        and "PartitionFilters:" in ln
        and "cid" in ln.split("PartitionFilters:")[1].split("]")[0]
    ]
    assert pruned, plan
    # and the deleted ids are actually gone from the answer
    assert all(r["vec_id"] % 9 != 4 for r in top.collect())


# ---------------- r14 extra: versioned-table merge-on-read DELETE --------


def test_versioned_delete_chain_compact_vacuum(spark, tmp_dir):
    """delete_where writes a delete VECTOR (O(matched keys), no table
    rewrite); read resolves chained deltas; time travel still sees the
    pre-delete state; compact_version materializes; vacuum is
    chain-aware (never removes a retained delta's base) and completes
    the physical purge after compaction; a torn delta stays invisible."""
    import os

    from gluestick_spark.operators.versioned import (
        _BASE_MARK,
        _DELETES_DIR,
        _vdir,
        compact_version,
        delete_where,
        list_versions,
        read_versioned,
        vacuum_versions,
        write_versioned,
    )

    d = spark.createDataFrame(
        [(i, f"u{i % 7}", float(i)) for i in range(100)],
        "id long, user string, v double",
    )
    path = os.path.join(tmp_dir, "vt")
    assert write_versioned(d, path) == 1

    v2 = delete_where(spark, path, "id % 10 = 3", "id")
    assert v2 == 2
    # the delta holds ONLY the vector — no data rewrite
    assert os.path.isfile(os.path.join(_vdir(path, 2), _BASE_MARK))
    assert spark.read.parquet(
        os.path.join(_vdir(path, 2), _DELETES_DIR)
    ).count() == 10
    assert read_versioned(spark, path).count() == 90
    assert read_versioned(spark, path, 1).count() == 100  # time travel

    v3 = delete_where(spark, path, F.col("user") == "u2", "id")
    assert v3 == 3
    got = sorted(r["id"] for r in read_versioned(spark, path).collect())
    want = sorted(
        i for i in range(100) if i % 10 != 3 and i % 7 != 2
    )
    assert got == want

    # chain-aware vacuum: keep=1 retains v3, whose chain is {2, 1} —
    # nothing may be removed
    assert vacuum_versions(path, keep=1, unpublished_grace_seconds=0) == []
    assert read_versioned(spark, path, 1).count() == 100

    # compaction flattens; vacuum then purges the pre-delete history
    v4 = compact_version(spark, path)
    assert v4 == 4
    assert sorted(r["id"] for r in read_versioned(spark, path).collect()) == want
    assert compact_version(spark, path) == 4  # flat: no-op
    gone = vacuum_versions(path, keep=1, unpublished_grace_seconds=0)
    assert gone == [1, 2, 3]
    assert list_versions(path) == [4]
    # physical purge complete: the deleted ids exist nowhere on disk
    left = spark.read.parquet(_vdir(path, 4))
    assert left.where("id % 10 = 3 OR user = 'u2'").count() == 0

    # torn delta: claim + vector, no commit marker -> invisible
    os.makedirs(_vdir(path, 5))
    spark.createDataFrame([(1,)], "id long").write.parquet(
        os.path.join(_vdir(path, 5), _DELETES_DIR)
    )
    with open(os.path.join(_vdir(path, 5), _BASE_MARK), "w") as f:
        f.write('{"base": 4, "keys": ["id"]}')
    assert read_versioned(spark, path).count() == len(want)
    import pytest as _pt

    with _pt.raises(ValueError, match="not published"):
        read_versioned(spark, path, 5)


# ---------------- r14 extra: chunking + leakage-safe split ---------------


def test_chunk_text_cover_rule(spark):
    """Cover-with-full-windows: every chunk except a short doc's single
    one is exactly chunk_tokens long, consecutive chunks overlap by
    >= overlap, the union covers every token, and the last window snaps
    to the end. Empty docs emit nothing; bad params raise."""
    from gluestick_spark.llm.text import chunk_text

    docs = [
        (1, " ".join(f"t{i}" for i in range(100))),   # 100 toks
        (2, " ".join(f"t{i}" for i in range(40))),    # exactly C
        (3, " ".join(f"t{i}" for i in range(7))),     # short
        (4, " ".join(f"t{i}" for i in range(41))),    # C+1: two chunks
        (5, "   "),                                    # empty
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_text(d, "text", "doc_id", chunk_tokens=40, overlap=10)
    rows = sorted(
        map(tuple, out.select("doc_id", "chunk_idx", "token_start", "n_tokens").collect())
    )
    by_doc = {}
    for did, ci, ts, nt in rows:
        by_doc.setdefault(did, []).append((ci, ts, nt))
    assert 5 not in by_doc
    assert by_doc[2] == [(1, 0, 40)]
    assert by_doc[3] == [(1, 0, 7)]
    assert by_doc[4] == [(1, 0, 40), (2, 1, 40)]  # last snapped to end
    # 100 toks, stride 30: starts 0,30 (60+40 !< 100) then snap 60
    assert by_doc[1] == [(1, 0, 40), (2, 30, 40), (3, 60, 40)]
    # coverage: every token index in [0, n) is inside some chunk
    for did, n in ((1, 100), (4, 41)):
        covered = set()
        for _, ts, nt in by_doc[did]:
            covered.update(range(ts, ts + nt))
        assert covered == set(range(n))
    # chunk text round-trips the token slice
    r = {
        (x["doc_id"], x["chunk_idx"]): x["chunk_text"]
        for x in out.collect()
    }
    assert r[(1, 2)].split(" ") == [f"t{i}" for i in range(30, 70)]

    with pytest.raises(ValueError, match="overlap"):
        chunk_text(d, "text", "doc_id", chunk_tokens=10, overlap=10)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_text(d, "text", "doc_id", chunk_tokens=0)


def test_component_split_no_cluster_straddles(spark):
    """Every near-dup component lands entirely inside ONE split, and the
    component labels are the min-id closure (singletons = own id)."""
    from gluestick_spark.llm.dedup import component_split

    d = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(60)], "doc_id long, text string"
    )
    # chain 1~2~3, pair 10~11, pair 20~40; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 40)], "a long, b long"
    )
    out = component_split(
        d, "doc_id", pairs, {"train": 0.6, "val": 0.2, "test": 0.2}
    )
    rows = {r["doc_id"]: (r["component"], r["split"]) for r in out.collect()}
    assert len(rows) == 60
    assert rows[1][0] == rows[2][0] == rows[3][0] == 1
    assert rows[10][0] == rows[11][0] == 10
    assert rows[20][0] == rows[40][0] == 20
    assert rows[5][0] == 5  # singleton
    # no component straddles splits
    comp_splits = {}
    for did, (c, s) in rows.items():
        comp_splits.setdefault(c, set()).add(s)
    assert all(len(v) == 1 for v in comp_splits.values())
    # and the split is the hash_split of the component key (stability)
    from gluestick_spark.llm.sampling import hash_split

    ref = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            out.select("doc_id", F.col("component").alias("k")),
            "k", {"train": 0.6, "val": 0.2, "test": 0.2},
        ).collect()
    }
    assert all(rows[d][1] == ref[d] for d in rows)


def test_train_unigram_vocab_em_step(spark):
    """Hard-EM refinement: the M-step re-costs pieces from Viterbi
    usage (hand-checked on a planted corpus), prunes abandoned
    multi-char pieces, keeps every single char (worst cost when
    unused), and never admits a piece longer than max_piece_len (long
    words' fallback pieces stay out). A second iteration runs on the
    refined vocabulary without error (fixpoint-ish)."""
    from gluestick_spark.llm.unigram import (
        subword_vocab,
        train_unigram_vocab,
        unigram_segment,
    )

    d = spark.createDataFrame(
        [(1, "abab abab abab cd"), (2, "abab cd cd")],
        "doc_id long, text string",
    )
    v1 = train_unigram_vocab(
        d, "text", iters=1, max_piece_len=2, max_word_len=8,
        min_count=2, scale=1_000_000_000,
    )
    got = {r["piece"]: r["score"] for r in v1.collect()}
    # Viterbi over init vocab segments abab -> [ab, ab] (ab is the
    # cheapest frequent piece) and cd -> [cd]; usage: ab = 2*4(instances)
    # = 8, cd = 3
    assert got["ab"] == -(1_000_000_000 // 8)
    assert got["cd"] == -(1_000_000_000 // 3)
    # abandoned multi-char pieces pruned ('ba' never used by any optimal
    # segmentation)
    assert "ba" not in got
    # single chars survive at worst cost (unused -> usage floor 1)
    for c in ("a", "b", "c", "d"):
        assert got[c] == -1_000_000_000
    # no piece longer than max_piece_len
    assert all(len(p) <= 2 for p in got)

    # refined vocab still segments exactly (and fewer pieces per word
    # than the char baseline)
    seg = unigram_segment(
        d, "text", "doc_id", v1, max_piece_len=2, max_word_len=8
    )
    for r in seg.collect():
        assert "".join(r["pieces"]) == r["word"]
        if r["word"] == "abab":
            assert list(r["pieces"]) == ["ab", "ab"]

    # iteration 2 is stable on this corpus
    v2 = train_unigram_vocab(
        d, "text", iters=2, max_piece_len=2, max_word_len=8,
        min_count=2, scale=1_000_000_000,
    )
    got2 = {r["piece"]: r["score"] for r in v2.collect()}
    assert got2 == got

    with pytest.raises(ValueError, match="iters"):
        train_unigram_vocab(d, "text", iters=0)

    # the init vocab really did contain 'ba' (so the prune is load-bearing)
    init = {
        r["piece"]
        for r in subword_vocab(d, "text", max_piece_len=2, min_count=2).collect()
    }
    assert "ba" in init


def test_rrf_fuse_hand_computed(spark):
    """RRF against a hand-computed fixture: integer contributions
    floor(1e9/(60+rank)), multi-leg sum, leg_k truncation, tie -> id,
    ascending legs (distance-like scores) rank correctly."""
    from gluestick_spark.llm.retrieval import rrf_fuse

    bm = spark.createDataFrame(
        [(1, 9.0), (2, 7.0), (3, 7.0), (4, 1.0)], "doc_id long, s double"
    )
    ann = spark.createDataFrame(
        [(2, 0.1), (5, 0.2), (1, 0.9)], "doc_id long, d double"
    )
    out = rrf_fuse(
        [(bm, "s", False), (ann, "d", True)], "doc_id", k_const=60, leg_k=3
    )
    rows = {r["doc_id"]: (r["rrf_score"], r["n_legs"]) for r in out.collect()}
    c = lambda r: 10**9 // (60 + r)  # noqa: E731
    # bm ranks: 1->1, 2->2 (tie 7.0 breaks to smaller id), 3->3, 4 cut by leg_k
    # ann ranks (ascending d): 2->1, 5->2, 1->3
    assert rows[1] == (c(1) + c(3), 2)
    assert rows[2] == (c(2) + c(1), 2)
    assert rows[3] == (c(3), 1)
    assert rows[5] == (c(2), 1)
    assert 4 not in rows
    # ordering: best first, ties by id
    got = [r["doc_id"] for r in out.collect()]
    assert got == sorted(
        rows, key=lambda d: (-rows[d][0], d)
    )
    with pytest.raises(ValueError, match="legs"):
        rrf_fuse([], "doc_id")


def test_pq_ivf_delete_and_vacuum(spark, tmp_dir):
    """Delete propagation through the PQ family: tombstoned ids stop
    serving immediately; vacuum physically purges the code rows; the
    probe answer is identical before and after vacuum."""
    import os

    from gluestick_spark.llm.index_delete import (
        pq_ivf_delete,
        tombstones,
        vacuum_deleted,
    )
    from gluestick_spark.llm.pq import materialize_pq_ivf, pq_ivf_topk_indexed

    emb = _emb(spark, n=200)
    path = os.path.join(tmp_dir, "pq_idx")
    materialize_pq_ivf(
        emb, "embedding", "vec_id", path, m=4, n_codes=8, n_clusters=4
    )
    n = pq_ivf_delete(
        spark, path, emb.where("vec_id % 4 = 2").select("vec_id")
    )
    assert n == 50
    q = [0.5] * 8
    got = [
        tuple(r)
        for r in pq_ivf_topk_indexed(spark, path, q, k=10, nprobe=4).collect()
    ]
    assert got and all(v % 4 != 2 for v, _ in got)
    rep = vacuum_deleted(spark, path)
    assert rep["rows_purged"] == 50
    assert tombstones(spark, path, "vec_id") is None
    assert spark.read.parquet(os.path.join(path, "cells")).count() == 150
    got2 = [
        tuple(r)
        for r in pq_ivf_topk_indexed(spark, path, q, k=10, nprobe=4).collect()
    ]
    assert got2 == got
