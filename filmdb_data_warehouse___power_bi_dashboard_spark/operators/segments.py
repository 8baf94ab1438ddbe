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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import read_table
from .dedup import _spread, h60, sql_h60

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


# ---------------------------------------------------------------------------
# Substring-level exact dedup: duplicated-span detection
# ---------------------------------------------------------------------------

_SPAN_W = 40  # window width in characters


def window_hashes(docs: DataFrame, width: int, extra_cols: tuple = ()) -> DataFrame:
    """Stride-1 ``width``-char window hashes computed IN THE SCAN
    PROJECTION — (doc_id, *extra_cols, pos, h): the shared
    substring-level primitive of duplicated-span detection and
    containment decontamination (round-14). Text never leaves the
    scan; only (doc_id, pos, 60-bit hash) triples flow downstream,
    so every consumer inherits the no-text-shuffle property."""
    d = _spread(docs).where(
        F.col("text").isNotNull() & (F.length("text") >= width)
    )
    win_arr = F.transform(
        F.sequence(F.lit(0), F.length("text") - width),
        lambda p: F.struct(
            p.cast("int").alias("pos"),
            h60(F.col("text").substr(p + F.lit(1), F.lit(width))).alias("h"),
        ),
    )
    return d.select("doc_id", *extra_cols, F.explode(win_arr).alias("w")).select(
        "doc_id", *extra_cols, F.col("w.pos").alias("pos"), F.col("w.h").alias("h")
    )


def duplicated_spans(
    docs: DataFrame, width: int = _SPAN_W, min_docs: int = 2
) -> DataFrame:
    """Exact duplicated-span detection (the "exact substring dedup" of
    Lee et al., Deduplicating Training Data Makes Language Models
    Better, 2022 — re-expressed Spark-first): every ``width``-char
    sliding window is hashed IN THE SCAN PROJECTION; a window whose
    exact content occurs in >= ``min_docs`` distinct documents is
    duplicated, and per document the overlapping/adjacent duplicated
    windows merge into maximal spans ``[span_start, span_end)`` —
    every character inside a reported span is covered by some
    cross-document duplicated window, so removing the spans removes
    exactly the boilerplate and preserves all novel text.

    Spark-first shape instead of the paper's suffix array: stride-1
    windows + the :func:`~.dedup.h60` cross-engine hash give the same
    span semantics as a composition of existing DataFrame ops. Scale:
    text never shuffles — only (h, doc_id, pos) triples (the
    text_ngram_novelty pattern); the duplicate decision is a
    map-side-combined COUNT(DISTINCT doc_id) per hash; the merge is a
    per-document window (partitioned by doc_id, never global). Window
    count is len(text) - width + 1 per doc, i.e. the same linear cost
    class as shingling; a 60-bit collision conflates windows
    identically on both engines (defined semantics, ~2^-60/pair).
    """
    hashed = window_hashes(docs, width)
    dup = (
        hashed.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("h")
    )
    dp = hashed.join(dup, "h").select("doc_id", "pos")
    return windows_to_spans(dp, width).orderBy("doc_id", "span_start")


def windows_to_spans(positions: DataFrame, width: int) -> DataFrame:
    """Merge matched (doc_id, pos) windows into maximal spans
    ``[span_start, span_end)`` via per-document gaps-and-islands —
    the shared ACT-side primitive of duplicated-span dedup and
    containment scrubbing. Unordered output (doc_id, span_start,
    span_end, span_len, n_dup_windows)."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    # New island when the previous matched window can't merge:
    # windows at p1 < p2 cover [p1, p2+width) contiguously iff
    # p2 - p1 <= width. NULL lag (first row) falls to otherwise(1).
    gap = F.when(F.col("pos") - F.lag("pos").over(w) <= width, F.lit(0)).otherwise(
        F.lit(1)
    )
    isl = positions.withColumn(
        "island",
        F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("pos").alias("__maxp"),
            F.count(F.lit(1)).alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            (F.col("__maxp") + width).cast("int").alias("span_end"),
            (F.col("__maxp") + width - F.col("span_start"))
            .cast("int")
            .alias("span_len"),
            "n_dup_windows",
        )
    )


def _materialized_dup_spans(
    spark: SparkSession, sf_dir: str, width: int = _SPAN_W, min_docs: int = 2
) -> DataFrame:
    """The (doc_id, span) table as a corpus-versioned artifact — the
    same staged-pipeline move as the minhash/simhash/posting
    artifacts: the stride-1 window hashing dominates both span
    entries, and spans are a pure function of the corpus + (width,
    min_docs). Both oracles recompute from raw text, so a stale
    record goes red the same round."""
    from ..runtime import corpus_artifact, parquet_artifact_io

    def build() -> DataFrame:
        return duplicated_spans(
            read_table(spark, sf_dir, "documents"), width=width, min_docs=min_docs
        )

    save, load = parquet_artifact_io(spark)
    return corpus_artifact(
        sf_dir,
        "documents",
        f"dupspans{width}m{min_docs}",
        ("v1",),
        build,
        save,
        load,
        memo=False,
    )


def q_text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _materialized_dup_spans(spark, sf_dir).orderBy("doc_id", "span_start")


# Shared CTE chain for BOTH span oracles (detection + removal): one
# definition of "what is a duplicated span", so the two entries can
# never drift apart through an edit to only one oracle.
_SPAN_CTES = f"""d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE text IS NOT NULL AND length(text) >= {_SPAN_W}
),
win AS (
  SELECT doc_id, unnest(generate_series(0, n - {_SPAN_W})) AS pos, text
  FROM d
),
hashed AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         {sql_h60(f"substring(text, CAST(pos AS INT) + 1, {_SPAN_W})")} AS h
  FROM win
),
dup AS (SELECT h FROM hashed GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
dp AS (SELECT doc_id, pos FROM hashed JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > {_SPAN_W} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
           AS island
  FROM (SELECT doc_id, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dp)
),
spans AS (
  SELECT doc_id,
         CAST(MIN(pos) AS INT) AS span_start,
         CAST(MAX(pos) + {_SPAN_W} AS INT) AS span_end,
         CAST(MAX(pos) + {_SPAN_W} - MIN(pos) AS INT) AS span_len,
         CAST(COUNT(*) AS BIGINT) AS n_dup_windows
  FROM isl GROUP BY doc_id, island
)"""


ORACLE_DUP_SPANS = f"""
WITH {_SPAN_CTES}
SELECT doc_id, span_start, span_end, span_len, n_dup_windows
FROM spans
ORDER BY doc_id, span_start
"""


def remove_duplicated_spans(
    docs: DataFrame,
    width: int = _SPAN_W,
    min_docs: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """The REWRITE half of exact substring dedup: cut every maximal
    duplicated span (:func:`duplicated_spans`) out of its document and
    reassemble the survivors in order — returns
    (doc_id, n_spans, removed_chars, cleaned_text), one row per input
    document (docs with no duplicated span, including sub-``width``
    docs, pass through untouched with n_spans = 0).

    Spark shape: spans per doc are FEW (bounded by len/width); the
    kept pieces come from a LAG window over the span list (piece k =
    [prev span_end, span_start)), plus one tail piece per spanned doc,
    then an ordered array_sort(collect_list) reassembly — the same A8
    ordered-string-agg pattern as segment_dedup. The only text shuffle
    is the final join of piece offsets back to the document text, the
    same cost class as any rewrite pass. ``spans`` short-circuits the
    span build with the corpus-versioned artifact from
    :func:`_materialized_dup_spans`."""
    if spans is None:
        spans = duplicated_spans(docs, width=width, min_docs=min_docs)
    w = Window.partitionBy("doc_id").orderBy("span_start")
    mid = spans.select(
        "doc_id",
        F.coalesce(F.lag("span_end").over(w), F.lit(0)).alias("seg_start"),
        F.col("span_start").alias("seg_end"),
        F.col("span_len").alias("cut"),
    )
    tail = (
        spans.groupBy("doc_id")
        .agg(F.max("span_end").alias("seg_start"))
        .withColumn("seg_end", F.lit(None).cast("int"))  # to end of text
        .withColumn("cut", F.lit(0).cast("int"))
    )
    pieces = mid.unionByName(tail)
    base = docs.select("doc_id", "text")
    rebuilt = (
        pieces.join(base, "doc_id")
        .select(
            "doc_id",
            "seg_start",
            "cut",
            F.col("text")
            .substr(
                F.col("seg_start") + 1,
                F.coalesce(F.col("seg_end"), F.length("text"))
                - F.col("seg_start"),
            )
            .alias("piece"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("cut") > 0, 1).otherwise(0)).alias("n_spans"),
            F.sum("cut").alias("removed_chars"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_start", "piece"))),
                    lambda s: s.getField("piece"),
                ),
                "",
            ).alias("cleaned_text"),
        )
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("removed_chars"), F.lit(0))
            .cast("long")
            .alias("removed_chars"),
            F.coalesce(F.col("cleaned_text"), F.col("text")).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


def q_text_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(
        docs, spans=_materialized_dup_spans(spark, sf_dir)
    )


ORACLE_DUP_SPAN_REMOVAL = f"""
WITH {_SPAN_CTES},
pieces AS (
  SELECT doc_id,
         COALESCE(LAG(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 0)
           AS seg_start,
         span_start AS seg_end,
         span_len AS cut
  FROM spans
  UNION ALL
  SELECT s.doc_id, MAX(s.span_end) AS seg_start, MAX(dd.n) AS seg_end, 0 AS cut
  FROM spans s JOIN d dd USING (doc_id)
  GROUP BY s.doc_id
),
rebuilt AS (
  SELECT p.doc_id,
         CAST(COUNT(*) FILTER (WHERE p.cut > 0) AS BIGINT) AS n_spans,
         CAST(SUM(p.cut) AS BIGINT) AS removed_chars,
         COALESCE(STRING_AGG(substring(dd.text, p.seg_start + 1,
                                       p.seg_end - p.seg_start),
                             '' ORDER BY p.seg_start), '') AS cleaned_text
  FROM pieces p JOIN d dd USING (doc_id)
  GROUP BY p.doc_id
)
SELECT doc_id,
       CAST(COALESCE(r.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(r.removed_chars, 0) AS BIGINT) AS removed_chars,
       COALESCE(r.cleaned_text, documents.text) AS cleaned_text
FROM documents LEFT JOIN rebuilt r USING (doc_id)
ORDER BY doc_id
"""


QUERIES = {
    "text_segment_dedup": q_text_segment_dedup,
    "text_dup_spans": q_text_dup_spans,
    "text_dup_span_removal": q_text_dup_span_removal,
}

ORACLES = {
    "text_segment_dedup": ORACLE_SEGMENT_DEDUP,
    "text_dup_spans": ORACLE_DUP_SPANS,
    "text_dup_span_removal": ORACLE_DUP_SPAN_REMOVAL,
}
