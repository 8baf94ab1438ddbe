"""Training-data preparation operators over ``documents`` and
``embeddings``: fixed-window document chunking, GPT-style sequence
packing (concat-and-split token spans), and per-label embedding
centroid outlier scoring.

All three are beyond-reference extensions (the reference warehouse has
no corpus-prep surface); they complete the LLM-pipeline story next to
dedup/similarity/quality: chunking feeds fixed-context tokenization,
packing assigns every document its context-window span, and centroid
outliers flag vectors that drifted from their class — a standard
curation signal before training.

Engine notes:
- Chunking is ``explode(sequence(...))`` + ``substr`` — pure codegen,
  one scan, no Python. The row multiplier is ceil(len/stride), known
  per-row at plan time, so AQE sizes post-explode partitions.
- Packing is the concat-and-split model (documents concatenated in
  deterministic doc_id order, split into fixed token windows; a doc
  may straddle two windows). The running sum is a window partitioned
  by ``source`` — shards pack independently, which is exactly how a
  100 TB corpus is packed in practice (per input shard, never a
  global sequence); for a single giant source, pre-shard with a
  deterministic hash bucket and pack per (source, shard).
- Centroid distance works in integer-scaled space: each coordinate is
  scaled to a BIGINT (floor(x*1e6+0.5)) so the per-dimension sums are
  EXACT and order-independent in both engines — the same trick
  dedup's tf-idf join uses for its dot products. The only floating
  ops (mean division, diff, square, left-fold sum, sqrt) run in a
  pinned order, bit-identical across Spark's ``aggregate(zip_with)``
  and DuckDB's ordered ``list_sum`` (proven for dedup._fold_dot).

Scale design: chunking/packing shuffle nothing except the packing
window's per-source sort; centroid outliers shuffle 64×|labels|
partial aggregates (map-side combined) and broadcast the tiny
centroid table back — one scan each side, no all-pairs structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import sql_round_half_up
from ..sources.catalog import read_table

CHUNK_SIZE = 80
CHUNK_STRIDE = 60
PACK_WINDOW = 512


def chunk_documents(
    docs: DataFrame, chunk_size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Overlapping fixed-width character windows per document.

    Chunk i covers [i*stride, i*stride + chunk_size); the last chunk
    is the one whose start is still inside the text, so every char
    belongs to >=1 chunk and consecutive chunks overlap by
    ``chunk_size - stride`` chars (tokenizer context carry-over).
    """
    n_chunks_minus1 = F.floor((F.length("text") - 1) / F.lit(stride))
    chunk_id = F.explode(
        F.sequence(F.lit(0).cast("long"), n_chunks_minus1)
    ).alias("chunk_id")
    start = (F.col("chunk_id") * stride).cast("long")
    chunk_text = F.col("text").substr(
        (start + 1).cast("int"), F.lit(chunk_size)
    )
    return (
        docs.filter(F.length("text") > 0)
        .select("doc_id", "source", chunk_id, "text")
        .select(
            "doc_id",
            "source",
            "chunk_id",
            start.alias("chunk_start"),
            chunk_text.alias("chunk_text"),
            F.length(chunk_text).cast("long").alias("n_chunk_chars"),
            F.size(F.split(chunk_text, " ")).cast("long").alias("n_chunk_tokens"),
        )
    )


def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs).orderBy("doc_id", "chunk_id")


ORACLE_CHUNKING = f"""
WITH c AS (
  SELECT doc_id, source, text,
         unnest(generate_series(0, (length(text) - 1) // {CHUNK_STRIDE})) AS chunk_id
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, source, chunk_id,
       CAST(chunk_id * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       substr(text, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}) AS chunk_text,
       CAST(length(substr(text, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS BIGINT)
         AS n_chunk_chars,
       CAST(len(string_split(substr(text, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}), ' ')) AS BIGINT)
         AS n_chunk_tokens
FROM c
ORDER BY doc_id, chunk_id
"""


def pack_spans(
    docs: DataFrame,
    window_tokens: int = PACK_WINDOW,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing: per source, documents are
    concatenated in doc_id order and the token stream is cut into
    fixed windows of ``window_tokens``; each document's span is
    [tok_start, tok_start + n_tokens), covering context windows
    ``first_bin .. last_bin`` (a doc straddling a cut belongs to
    both — the standard GPT-style packing with document spillover).

    ``token_counts`` (round-13): an optional (``doc_id``,
    ``n_tokens``) frame — e.g. the EXACT per-doc counts from
    bpe.bpe_token_counts — replacing the whitespace-token proxy; docs
    with no positive count pack no span, mirroring the proxy path's
    empty-text filter. The registered gate entry stays on the proxy
    (its oracle replays whitespace counts); the exact-count
    composition is pytest-asserted.
    """
    if token_counts is not None:
        base = docs.select("source", "doc_id").join(
            token_counts.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens")),
            "doc_id",
        ).filter(F.col("n_tokens") > 0)
    else:
        n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
        base = docs.filter(F.length("text") > 0).select(
            "source", "doc_id", n_tokens.alias("n_tokens")
        )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok_start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    out = base.withColumn("tok_start", tok_start)
    first_bin = F.floor(F.col("tok_start") / F.lit(window_tokens))
    last_bin = F.floor(
        (F.col("tok_start") + F.col("n_tokens") - 1) / F.lit(window_tokens)
    )
    return out.select(
        "source",
        "doc_id",
        "n_tokens",
        "tok_start",
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        (last_bin - first_bin + 1).alias("n_bins"),
    )


def q_corpus_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return pack_spans(docs).orderBy("source", "doc_id")


ORACLE_PACK_SPANS = f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE length(text) > 0
),
s AS (
  SELECT source, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM t
)
SELECT source, doc_id, n_tokens, tok_start,
       tok_start // {PACK_WINDOW} AS first_bin,
       (tok_start + n_tokens - 1) // {PACK_WINDOW} AS last_bin,
       (tok_start + n_tokens - 1) // {PACK_WINDOW} - tok_start // {PACK_WINDOW} + 1
         AS n_bins
FROM s
ORDER BY source, doc_id
"""


def pack_spans_global(docs: DataFrame, window_tokens: int = PACK_WINDOW) -> DataFrame:
    """Concat-and-split packing over ONE GLOBAL sequence (all sources
    concatenated in doc_id order) — the single-giant-source case
    :func:`pack_spans` names as its scale limit.

    A naive spelling is ``SUM(n) OVER (ORDER BY doc_id)`` — a
    single-partition window, the canonical 100 TB anti-pattern. This
    uses functions/ranking.global_running_sum instead: deterministic
    range buckets on doc_id, per-bucket BIGINT sums (exact,
    order-independent) collected as the offset map (n_buckets rows on
    the driver), local windows add the offsets. Results are bit-equal
    to the global window (oracle-checked) at any partition count.
    """
    from ..functions.ranking import global_running_sum

    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    base = docs.filter(F.length("text") > 0).select(
        "doc_id", n_tokens.alias("n_tokens")
    )
    out = global_running_sum(
        base, ["doc_id"], "n_tokens", alias="tok_start", exclusive=True
    )
    first_bin = F.floor(F.col("tok_start") / F.lit(window_tokens))
    last_bin = F.floor(
        (F.col("tok_start") + F.col("n_tokens") - 1) / F.lit(window_tokens)
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "tok_start",
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        (last_bin - first_bin + 1).alias("n_bins"),
    )


def q_corpus_pack_spans_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return pack_spans_global(docs).orderBy("doc_id")


ORACLE_PACK_SPANS_GLOBAL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE length(text) > 0
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM t
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {PACK_WINDOW} AS first_bin,
       (tok_start + n_tokens - 1) // {PACK_WINDOW} AS last_bin,
       (tok_start + n_tokens - 1) // {PACK_WINDOW} - tok_start // {PACK_WINDOW} + 1
         AS n_bins
FROM s
ORDER BY doc_id
"""


def _scaled_long(x):
    """float32 coordinate -> exact integer-scaled BIGINT (1e-6 grid),
    identical in both engines: float->double widening is exact and
    floor(x*1e6+0.5) is one IEEE multiply+add+floor."""
    return F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast("long")


def centroid_outliers(emb: DataFrame, top_n: int = 5) -> DataFrame:
    """Per-label centroid in integer-scaled space, then each vector's
    Euclidean distance to its label centroid; returns the ``top_n``
    farthest vectors per label (rank ties broken by vec_id).

    The per-dimension coordinate sums are BIGINT — exact and
    partition-order-independent — so the centroid is deterministic;
    the distance fold runs left-to-right over dimensions (Spark
    ``aggregate(zip_with)`` == DuckDB ordered ``list_sum``).
    """
    base = emb.filter(F.col("embedding").isNotNull())
    ex = base.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).select("vec_id", "label", "pos", _scaled_long(F.col("x")).alias("xs"))
    cent = ex.groupBy("label", "pos").agg(
        F.sum("xs").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cvec = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
            lambda t: t["s"] / t["n"],
        ).alias("cv")
    )
    xs_arr = F.transform(
        F.col("embedding"), lambda x: _scaled_long(x).cast("double")
    )
    sq_fold = F.aggregate(
        F.zip_with(xs_arr, F.col("cv"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dist6 = F.floor(F.sqrt(sq_fold) / 1e6 * 1e6 + F.lit(0.5)) / 1e6
    scored = base.join(F.broadcast(cvec), "label").select(
        "label", "vec_id", dist6.alias("dist_to_centroid")
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("dist_to_centroid"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .orderBy("label", "rnk")
    )


def q_embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return centroid_outliers(emb)


_SQL_SCALED = "CAST(FLOOR(CAST({v} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"

_SQL_DIST = sql_round_half_up(
    "sqrt(list_sum(["
    " (CAST(" + _SQL_SCALED.format(v="e.embedding[i]") + " AS DOUBLE) - c.cv[i])"
    " * (CAST(" + _SQL_SCALED.format(v="e.embedding[i]") + " AS DOUBLE) - c.cv[i])"
    " for i in range(1, len(e.embedding) + 1)])) / 1000000.0",
    6,
)

ORACLE_CENTROID_OUTLIERS = f"""
WITH ex AS (
  SELECT label,
         unnest(list_transform(embedding, x -> {_SQL_SCALED.format(v='x')})) AS xs,
         unnest(generate_series(1, len(embedding))) AS pos
  FROM embeddings WHERE embedding IS NOT NULL
),
cent AS (
  SELECT label, pos, SUM(xs) AS s, COUNT(*) AS n FROM ex GROUP BY label, pos
),
cv AS (
  SELECT label, list(CAST(s AS DOUBLE) / n ORDER BY pos) AS cv
  FROM cent GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id, {_SQL_DIST} AS dist_to_centroid
  FROM embeddings e JOIN cv c USING (label)
  WHERE e.embedding IS NOT NULL
),
ranked AS (
  SELECT label, vec_id, dist_to_centroid,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY label ORDER BY dist_to_centroid DESC, vec_id ASC
         ) AS INT) AS rnk
  FROM scored
)
SELECT label, vec_id, dist_to_centroid, rnk
FROM ranked WHERE rnk <= 5
ORDER BY label, rnk
"""


QUERIES = {
    "text_chunking": q_text_chunking,
    "corpus_pack_spans": q_corpus_pack_spans,
    "corpus_pack_spans_global": q_corpus_pack_spans_global,
    "embedding_centroid_outliers": q_embedding_centroid_outliers,
}

ORACLES = {
    "text_chunking": ORACLE_CHUNKING,
    "corpus_pack_spans": ORACLE_PACK_SPANS,
    "corpus_pack_spans_global": ORACLE_PACK_SPANS_GLOBAL,
    "embedding_centroid_outliers": ORACLE_CENTROID_OUTLIERS,
}
