"""Segment-level boilerplate removal — the line/paragraph dedup pass
every web-scale training corpus runs between exact dedup and near-dup
(CCNet-style: drop any segment that recurs across >= K distinct
documents, keep the rest of each document in order).

The corpus documents carry no newlines, so the splitter is generic:
``mode="lines"`` splits on newline (the real-world spelling, exercised
by the pytest fixtures) and ``mode="words"`` segments into fixed
word windows (the spelling with cross-document signal on the driver
corpus — at sf0.01, 47 four-word windows recur in >= 3 documents).

Scale shape (100 TB): segments never shuffle as text. The document
frequency aggregation groups on ``(xxhash64(segment), length)`` — a
12-byte key with map-side partial combine — and the drop decision
joins back on the same key, so the only text shuffle is the final
per-document reassembly (one row per surviving segment, same order
of magnitude as the corpus itself, identical to any rewrite pass).
A 64-bit hash + exact length collision across distinct segments is
~2^-64 per pair and only ever *over*-removes one segment; acceptable
for a lossy curation pass and called out here by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table

_WINDOW = 4
_MIN_DOCS = 3


def _segments_col(text: Column, mode: str, window: int) -> Column:
    """Array of segments for one document, in document order."""
    if mode == "lines":
        return F.split(text, "\n")
    # Fixed word windows, built without an explode: slice the word
    # array per window index — pure codegen, one pass over the text.
    ws = F.split(text, " ")
    n_seg = F.ceil(F.size(ws) / F.lit(float(window))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(ws, i * window + 1, window), " "),
    )


def explode_segments(
    docs: DataFrame, mode: str = "words", window: int = _WINDOW
) -> DataFrame:
    """(doc_id, pos, segment) — one row per segment, pos = document order."""
    return docs.select(
        "doc_id",
        F.posexplode(_segments_col(F.col("text"), mode, window)).alias(
            "pos", "segment"
        ),
    )


def segment_dedup(
    docs: DataFrame,
    min_docs: int = _MIN_DOCS,
    mode: str = "words",
    window: int = _WINDOW,
) -> DataFrame:
    """Remove every segment occurring in >= ``min_docs`` distinct
    documents; reassemble the survivors per document in order.

    Returns (doc_id, n_segments, n_kept, cleaned_text). A document
    whose every segment is boilerplate survives with
    ``cleaned_text = ''`` (downstream length filters drop it — this
    operator never invents or deletes document rows).

    Plan: explode → hash-key df-count (map-side combine) → key join
    back → one groupBy(doc_id) reassembly. Two shuffles total, both
    on compact keys; no window functions, no driver collection.
    """
    seg = explode_segments(docs, mode=mode, window=window)
    keyed = seg.withColumn(
        "__k", F.struct(F.xxhash64("segment"), F.length("segment"))
    )
    boiler = (
        keyed.groupBy("__k")
        .agg(F.countDistinct("doc_id").alias("seg_df"))
        .filter(F.col("seg_df") >= min_docs)
        .select("__k", F.lit(True).alias("__boiler"))
    )
    sep = "\n" if mode == "lines" else " "
    flagged = keyed.join(boiler, "__k", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("__boiler").isNull(), 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        # collect_list skips nulls → boiler rows drop out
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct("pos", "segment"),
                            )
                        )
                    ),
                    lambda s: s.getField("segment"),
                ),
                sep,
            ).alias("cleaned_text"),
        )
    )


def q_text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: 4-word-window boilerplate removal over documents,
    drop threshold df >= 3 (47 recurring windows at sf0.01)."""
    docs = read_table(spark, sf_dir, "documents")
    return segment_dedup(docs).orderBy("doc_id")


# DuckDB twin: identical windowing via list slicing; the df-count
# groups on the raw segment text (no xxhash64 in DuckDB) — decisions
# agree with the Spark hash-keyed count absent 64-bit collisions.
ORACLE_SEGMENT_DEDUP = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), segs AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, CAST(ceil(len(ws) / {float(_WINDOW)!r}) AS INT) - 1),
           i -> array_to_string(ws[i * {_WINDOW} + 1 : i * {_WINDOW} + {_WINDOW}], ' ')
         ) AS sl
  FROM t
), seg AS (
  SELECT doc_id, unnest(sl) AS segment, generate_subscripts(sl, 1) AS pos
  FROM segs
), counts AS (
  SELECT segment, COUNT(DISTINCT doc_id) AS seg_df FROM seg GROUP BY segment
), flagged AS (
  SELECT s.doc_id, s.pos, s.segment, (c.seg_df >= {_MIN_DOCS}) AS boiler
  FROM seg s JOIN counts c USING (segment)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(*) FILTER (WHERE NOT boiler) AS BIGINT) AS n_kept,
       COALESCE(
         STRING_AGG(segment, ' ' ORDER BY pos) FILTER (WHERE NOT boiler),
         ''
       ) AS cleaned_text
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES = {
    "text_segment_dedup": q_text_segment_dedup,
}

ORACLES = {
    "text_segment_dedup": ORACLE_SEGMENT_DEDUP,
}
