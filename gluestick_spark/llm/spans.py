"""Span-level (segment) deduplication — C4/RefinedWeb-style duplicated-text
removal INSIDE documents, not whole-document dedup.

Web-scale corpora repeat boilerplate spans (navigation text, license
blurbs, quoted paragraphs) across otherwise-distinct documents. C4 removes
any three-sentence span that occurs more than once in the corpus, keeping
only its first occurrence; this operator is the same policy over fixed
word-count segments (sentence boundaries don't survive whitespace-only
tokenization, and fixed windows are the shape MassiveText/RefinedWeb use
for repetition accounting — see ``llm/repetition.py`` for the intra-doc
statistics twin).

Beyond-reference surface: the pandas reference (hotgluexyz/gluestick) has
no corpus-text operators at all; this is part of the LLM-pipeline family
the brief adds (SURVEY.md §2.13, L33).

Scale design (the 100 TB shape):
1. Tokenize once per document (JVM ``split``), slice into NON-overlapping
   ``seg_words``-word segments with ``transform`` over a ``sequence`` —
   pure Catalyst projection, pipelined inside the scan, no Python.
2. ``posexplode`` to one row per segment occurrence.
3. First-occurrence election: ``groupBy(segment) → min(struct(doc_id,
   pos))``. A groupBy-min (NOT a window over the segment) is deliberate:
   partial aggregation collapses every map task's occurrences of a hot
   segment to ONE row before the shuffle, so a boilerplate span repeated
   in half the corpus ships O(#map-tasks) rows — a window would sort the
   full occurrence list of the hottest segment in one reducer.
4. Join the election result back on the segment string (exact — no hash
   collisions to reason about) and keep only the winning occurrence of
   each duplicated segment plus every unique segment. The join's skewed
   probe side is handled by AQE skew-split; the build side is one row per
   DISTINCT segment.
5. Reassemble per document: ``groupBy(doc_id)`` + order-preserving
   ``sort_array(collect_list(struct(pos, seg)))`` — the second (and last)
   shuffle, keyed on doc_id, uniform by construction.

Two shuffles total, both with map-side combine; memory per reducer is one
document's segment list. Every step is engine-portable; the DuckDB oracle
reproduces results bit-for-bit (`__spark_entry__.py:q_segment_dedup`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gluestick_spark.llm.text import tokens_expr

__all__ = ["segment_occurrences", "segment_dedup"]


def segment_occurrences(
    df: DataFrame, id_col: str, text_col: str, seg_words: int = 4
) -> DataFrame:
    """One row per non-overlapping ``seg_words``-word segment:
    (``id_col``, ``pos``, ``seg``). The tail segment may be shorter than
    ``seg_words``; empty/NULL documents yield no rows (re-attach them in
    the caller — :func:`segment_dedup` does). Pure projection, no shuffle.
    """
    if seg_words < 1:
        raise ValueError(f"seg_words must be >= 1, got {seg_words}")
    toks = tokens_expr(F.col(text_col))
    n_seg = F.ceil(F.size(toks) / F.lit(seg_words)).cast("int")
    segs = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.array_join(
                F.slice(toks, i * seg_words + 1, seg_words), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.posexplode(segs).alias("pos", "seg")
    ).select(id_col, F.col("pos").cast("long").alias("pos"), "seg")


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 4,
) -> DataFrame:
    """Remove every repeated ``seg_words``-word segment from the corpus,
    keeping only its first occurrence in (``id_col``, position) order —
    C4's duplicated-span policy over fixed word windows.

    Returns one row per input document: (``id_col``, ``text_clean``,
    ``n_segments``, ``n_removed``). Documents whose every segment was
    removed (or that were empty) come back with ``text_clean = ''``.
    """
    occ = segment_occurrences(df, id_col, text_col, seg_words)
    # Election: minimal (doc_id, pos) per segment. Struct min gives
    # lexicographic (doc_id, then pos) — the corpus-order first occurrence.
    firsts = occ.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "first"
        ),
        F.count(F.lit(1)).alias("n_occ"),
    )
    kept_flag = (F.col("n_occ") == 1) | (
        (F.col(id_col) == F.col("first.d")) & (F.col("pos") == F.col("first.p"))
    )
    tagged = occ.join(firsts, "seg").select(
        id_col, "pos", "seg", kept_flag.alias("keep")
    )
    per_doc = tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "seg"))
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_removed"),
    )
    # Re-attach zero-segment (empty/NULL-text) documents.
    base = df.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
    )
