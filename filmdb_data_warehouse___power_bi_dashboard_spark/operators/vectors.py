"""Embedding-column care: referential/shape integrity auditing and
int8 quantization error reporting — the checks a 100 TB multimodal
corpus runs before (and after) shipping vectors to a trainer or an
ANN index build.

Everything here is pure ``pyspark.sql.functions`` higher-order
expressions over ``array<float>`` — whole-stage codegen, no Python in
the data path, no shuffle except the final 1-row / per-label
aggregates (map-side combined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

def _dzero():
    # built lazily: F.lit at module import would require an active
    # SparkContext before any session exists
    return F.lit(0.0).cast("double")


def _norm(col):
    """L2 norm via a left-fold — identical op order to the DuckDB
    oracle's list_sum at fp-negligible (<1e-15) divergence, absorbed
    by the 4-decimal reporting rounds."""
    return F.sqrt(
        F.aggregate(
            col, _dzero(), lambda a, x: a + x.cast("double") * x.cast("double")
        )
    )


def integrity_audit(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """One-row corpus audit joining the documents and embeddings
    tables: row counts, referential orphans on both sides, dimension
    drift vs the modal dimension, NaN vectors, zero-norm vectors, and
    the norm distribution over clean vectors.

    Every branch is a 1-row aggregate (or a count over an anti-join
    whose build side is keys-only); the driver never holds more than
    the single report row.
    """
    vec = emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.exists("embedding", F.isnan).alias("has_nan"),
        _norm(F.col("embedding")).alias("norm"),
    )
    # Modal dimension, ties broken toward the larger dim — a 1-row
    # frame cross-joined in (never collected).
    modal = (
        vec.groupBy("dim")
        .count()
        .agg(F.max_by("dim", F.struct("count", "dim")).alias("expected_dim"))
    )
    vec_stats = vec.crossJoin(F.broadcast(modal)).agg(
        F.count("*").alias("n_vecs"),
        F.first("expected_dim").alias("expected_dim"),
        F.sum((F.col("dim") != F.col("expected_dim")).cast("long")).alias(
            "n_bad_dim"
        ),
        F.sum(F.col("has_nan").cast("long")).alias("n_nan_vecs"),
        F.sum(
            (~F.col("has_nan") & (F.col("norm") == 0.0)).cast("long")
        ).alias("n_zero_norm"),
        round_half_up(F.min(F.when(~F.col("has_nan"), F.col("norm"))), 4).alias(
            "norm_min"
        ),
        round_half_up(F.avg(F.when(~F.col("has_nan"), F.col("norm"))), 4).alias(
            "norm_avg"
        ),
        round_half_up(F.max(F.when(~F.col("has_nan"), F.col("norm"))), 4).alias(
            "norm_max"
        ),
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    orphan_vecs = (
        emb.select("vec_id")
        .join(docs.select("doc_id"), F.col("vec_id") == F.col("doc_id"), "left_anti")
        .agg(F.count("*").alias("n_orphan_vecs"))
    )
    missing_vecs = (
        docs.select("doc_id")
        .join(emb.select("vec_id"), F.col("doc_id") == F.col("vec_id"), "left_anti")
        .agg(F.count("*").alias("n_docs_missing_vec"))
    )
    out = (
        n_docs.crossJoin(vec_stats)
        .crossJoin(orphan_vecs)
        .crossJoin(missing_vecs)
    )
    return out.select(
        "n_docs",
        "n_vecs",
        "n_orphan_vecs",
        "n_docs_missing_vec",
        F.col("expected_dim").cast("long").alias("expected_dim"),
        "n_bad_dim",
        "n_nan_vecs",
        "n_zero_norm",
        "norm_min",
        "norm_avg",
        "norm_max",
    )


def q_embedding_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    return integrity_audit(docs, emb)


ORACLE_INTEGRITY = f"""
WITH v AS (
  SELECT vec_id,
         len(embedding) AS dim,
         len(list_filter(embedding, x -> isnan(x))) > 0 AS has_nan,
         sqrt(list_sum(list_transform(
           embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
         ))) AS norm
  FROM embeddings
), modal AS (
  SELECT dim AS expected_dim
  FROM (SELECT dim, COUNT(*) AS c FROM v GROUP BY dim)
  ORDER BY c DESC, dim DESC LIMIT 1
)
SELECT
  (SELECT COUNT(*) FROM documents) AS n_docs,
  (SELECT COUNT(*) FROM v) AS n_vecs,
  (SELECT COUNT(*) FROM embeddings e
     LEFT JOIN documents d ON e.vec_id = d.doc_id
     WHERE d.doc_id IS NULL) AS n_orphan_vecs,
  (SELECT COUNT(*) FROM documents d
     LEFT JOIN embeddings e ON d.doc_id = e.vec_id
     WHERE e.vec_id IS NULL) AS n_docs_missing_vec,
  (SELECT CAST(expected_dim AS BIGINT) FROM modal) AS expected_dim,
  (SELECT COUNT(*) FROM v, modal WHERE dim <> expected_dim) AS n_bad_dim,
  (SELECT COUNT(*) FROM v WHERE has_nan) AS n_nan_vecs,
  (SELECT COUNT(*) FROM v WHERE NOT has_nan AND norm = 0.0) AS n_zero_norm,
  (SELECT {sql_round_half_up('MIN(norm)', 4)} FROM v WHERE NOT has_nan) AS norm_min,
  (SELECT {sql_round_half_up('AVG(norm)', 4)} FROM v WHERE NOT has_nan) AS norm_avg,
  (SELECT {sql_round_half_up('MAX(norm)', 4)} FROM v WHERE NOT has_nan) AS norm_max
"""


def quantize_report(emb: DataFrame) -> DataFrame:
    """Per-label int8 symmetric-quantization error report.

    Per vector: scale = amax/127 (max-abs calibration), each element
    quantized as floor(x/scale*127... spelled floor(x*inv+0.5) with
    inv = 127/amax), dequantized back, and the max absolute
    reconstruction error taken over the vector. The report aggregates
    per label: vectors, mean calibration range, mean and worst max
    error. Zero vectors (amax = 0) quantize losslessly (error 0).

    The whole computation is elementwise codegen (transform/aggregate
    HOFs); the only shuffle is the per-label partial-combined agg.
    The floor(x+0.5) spelling keeps the Spark and DuckDB IEEE op
    sequences identical (see functions.scalar.round_half_up).
    """
    amax = F.aggregate(
        F.col("embedding"),
        _dzero(),
        lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
    )
    v = emb.select("label", F.col("embedding"), amax.alias("amax"))
    inv = F.lit(127.0) / F.col("amax")  # elements/scale; inf when amax=0
    err_elem = lambda x: F.abs(  # noqa: E731 — readable lambda chain
        x.cast("double")
        - F.floor(x.cast("double") * inv + F.lit(0.5)) / inv
    )
    max_err = F.when(F.col("amax") == 0.0, _dzero()).otherwise(
        F.aggregate(
            F.col("embedding"), _dzero(), lambda a, x: F.greatest(a, err_elem(x))
        )
    )
    scored = v.select("label", "amax", max_err.alias("max_err"))
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            round_half_up(F.avg("amax"), 5).alias("avg_amax"),
            round_half_up(F.avg("max_err"), 6).alias("avg_max_abs_err"),
            round_half_up(F.max("max_err"), 6).alias("max_abs_err"),
        )
        .orderBy("label")
    )


def q_embedding_quantize_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # label is the report's group key: NULL-label (unlabeled) rows are
    # out of scope — and a NULL in the BIGINT label column is
    # unrepresentable under the driver comparator (pandas NaN-floats
    # the whole column). NULL embeddings quantize nothing either.
    emb = read_table(spark, sf_dir, "embeddings")
    return quantize_report(
        emb.filter(F.col("label").isNotNull() & F.col("embedding").isNotNull())
    )


ORACLE_QUANTIZE = f"""
WITH v AS (
  SELECT label,
         embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
  FROM embeddings
  WHERE label IS NOT NULL AND embedding IS NOT NULL
), scored AS (
  SELECT label,
         amax,
         CASE WHEN amax = 0.0 THEN 0.0 ELSE
           list_max(list_transform(
             embedding,
             x -> abs(CAST(x AS DOUBLE)
                      - floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5)
                        / (127.0 / amax))
           ))
         END AS max_err
  FROM v
)
SELECT label,
       COUNT(*) AS n_vecs,
       {sql_round_half_up('AVG(amax)', 5)} AS avg_amax,
       {sql_round_half_up('AVG(max_err)', 6)} AS avg_max_abs_err,
       {sql_round_half_up('MAX(max_err)', 6)} AS max_abs_err
FROM scored
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (cluster-bounded)
# ---------------------------------------------------------------------------

_SEMDEDUP_THRESHOLD = 0.4


def semantic_dedup_summary(
    emb: DataFrame, threshold: float = _SEMDEDUP_THRESHOLD
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: within each cluster
    (here the ``label`` column — in production the k-means assignment
    an IVF build already produces), drop every vector that has a
    LOWER-id neighbor above the cosine threshold, and report the
    per-cluster keep/drop tally.

    "Exists a smaller-id near neighbor" is the standard SemDeDup
    keep-one rule (keep the cluster's first representative of each
    near-dup neighborhood); unlike greedy transitive dedup it is a
    pure semi-join — fully declarative, no iteration.

    Scale shape: the quadratic is BOUNDED BY THE CLUSTER — that is
    the whole point of SemDeDup's cluster-then-compare design. The
    join shuffles both sides on the cluster key once; within a
    cluster the pair filter + fold-cosine run inside whole-stage
    codegen. Clusters too large for one task would be sub-blocked the
    way dedup.embedding_near_dup_pairs blocks id ranges; at corpus
    scale the label column comes from the persisted IVF quantizer
    (similarity.py) so cluster sizes are controlled by k.
    """
    from .dedup import dot_product

    # The cluster key is the whole point of SemDeDup: a row without
    # one can't be compared to anything (the join key is NULL) and
    # would emit a NULL in the BIGINT label output (round-8).
    emb = emb.filter(F.col("label").isNotNull())
    # Norms are per-VECTOR, so compute them once on the base frame
    # instead of twice per pair inside the join (3x fewer HOF folds;
    # sqrt is deterministic, so the pairwise cosine is bit-identical
    # to the inline dedup.cosine / oracle spelling).
    e = emb.select("label", "vec_id", "embedding").withColumn(
        "nrm", F.sqrt(dot_product(F.col("embedding"), F.col("embedding")))
    )
    a = e.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = e.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    # try_divide (round-8, pathological-corpus audit): a zero-norm
    # vector made this join predicate throw DIVIDE_BY_ZERO under ANSI,
    # killing the whole job for one degenerate row. NULL cosine ->
    # pair filtered -> the zero vector is simply never dropped, which
    # matches DuckDB, whose float x/0 is NULL (so its `>= t` is never
    # satisfied either). NULL-embedding rows behave identically (NULL
    # dot). Both stay counted in n_vectors.
    cos6 = round_half_up(
        F.try_divide(
            dot_product(F.col("a_emb"), F.col("b_emb")),
            F.col("a_nrm") * F.col("b_nrm"),
        ),
        6,
    )
    dropped = (
        a.join(b, "l")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cos6 >= F.lit(threshold))
        .select(F.col("l").alias("label"), F.col("b_id").alias("vec_id"))
        .distinct()
    )
    per_label = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    d = dropped.groupBy("label").agg(F.count(F.lit(1)).alias("n_dropped"))
    nd = F.coalesce(F.col("n_dropped"), F.lit(0))
    return (
        per_label.join(d, "label", "left")
        .select(
            "label",
            "n_vectors",
            nd.alias("n_dropped"),
            (F.col("n_vectors") - nd).alias("n_kept"),
            round_half_up(
                nd.cast("double") / F.col("n_vectors") * 100.0, 4
            ).alias("drop_pct"),
        )
        .orderBy("label")
    )


def q_embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup_summary(emb)


def _semdedup_oracle() -> str:
    from .dedup import _SQL_COS

    return f"""
WITH dropped AS (
  SELECT b.label, b.vec_id
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_SQL_COS} >= {_SEMDEDUP_THRESHOLD}
  GROUP BY 1, 2
),
per_label AS (SELECT label, COUNT(*) AS n_vectors FROM embeddings
              WHERE label IS NOT NULL GROUP BY 1),
d AS (SELECT label, COUNT(*) AS n_dropped FROM dropped GROUP BY 1)
SELECT p.label, p.n_vectors,
       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(p.n_vectors - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept,
       {sql_round_half_up(
           "CAST(COALESCE(d.n_dropped, 0) AS DOUBLE) / p.n_vectors * 100.0", 4
       )} AS drop_pct
FROM per_label p LEFT JOIN d ON p.label = d.label
ORDER BY p.label
"""


ORACLE_SEMDEDUP = _semdedup_oracle()


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics (dead dims, scale drift)
# ---------------------------------------------------------------------------


def dim_stats(emb: DataFrame) -> DataFrame:
    """Per-DIMENSION statistics of the embedding matrix: mean, std,
    min/max, and zero counts for every coordinate — the diagnostic
    that catches dead dimensions (all-zero columns from a broken
    projection), scale drift between encoder versions, and
    un-normalized batches before an index build trusts the vectors.

    Exactness: values are scaled to integer 1e-4 units
    (``floor(x*1e4 + 0.5)`` — the codebase's standard exact-sum
    device), so the mean/std come from order-independent BIGINT sums;
    the variance is clamped at zero (the exact-integer E[x²]−E[x]²
    can round a hair negative for near-constant dims — identically on
    both engines, so the clamp is hash-safe). NaN samples are COUNTED
    (``n_nan``) and excluded from every statistic — folding them in
    would silently zero them on the Spark side (floor(NaN)→cast long
    is 0) and ABORT the DuckDB oracle (CAST(NaN AS BIGINT) throws),
    the worst cross-engine divergence: one engine errors, the other
    lies. An all-NaN dimension reports 0.0 stats rather than NULL
    (the gate bans NULL numerics).

    Scale shape: ``posexplode`` emits (dim, value) pairs — N·d rows,
    but the aggregation map-side combines onto |d| keys, so the
    shuffle is |d| rows per task regardless of N. This long-form
    explode-then-agg is the one array shape the HOF reports above
    can't express (they fold WITHIN a vector; this folds ACROSS
    vectors per coordinate).
    """
    x = emb.select(F.posexplode("embedding").alias("pos", "xf"))
    xd = F.col("xf").cast("double")
    ok = ~F.isnan(xd)
    sc = F.floor(xd * 10000 + F.lit(0.5)).cast("long")
    agg = (
        x.select(
            (F.col("pos") + 1).alias("dim"),
            F.when(ok, xd).alias("x"),  # NULL for NaN: aggs skip it
            F.when(ok, sc).otherwise(F.lit(0)).alias("sc"),
            (~ok).cast("long").alias("is_nan"),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("is_nan").alias("n_nan"),
            F.sum("sc").alias("s1"),
            F.sum(F.col("sc") * F.col("sc")).alias("s2"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
            # all-NaN dim: the (x == 0.0) column is all-NULL and SUM
            # returns NULL — coalesce to 0 like every other stat (the
            # oracle's CASE..ELSE 0 never goes NULL).
            F.coalesce(
                F.sum((F.col("x") == 0.0).cast("long")), F.lit(0)
            ).alias("n_zero"),
        )
    )
    nn = F.nullif(F.col("n_values") - F.col("n_nan"), F.lit(0))
    m = F.col("s1").cast("double") / nn
    var = F.greatest(F.col("s2").cast("double") / nn - m * m, F.lit(0.0))
    return agg.select(
        "dim",
        "n_values",
        "n_nan",
        F.coalesce(round_half_up(m / 10000.0, 6), F.lit(0.0)).alias("mean_val"),
        F.coalesce(round_half_up(F.sqrt(var) / 10000.0, 6), F.lit(0.0)).alias(
            "std_val"
        ),
        F.coalesce(round_half_up(F.col("mn"), 6), F.lit(0.0)).alias("min_val"),
        F.coalesce(round_half_up(F.col("mx"), 6), F.lit(0.0)).alias("max_val"),
        "n_zero",
    ).orderBy("dim")


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_stats(read_table(spark, sf_dir, "embeddings"))


ORACLE_DIM_STATS = f"""
WITH expl AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS xf
  FROM embeddings
),
s AS (
  SELECT dim,
         CASE WHEN isnan(CAST(xf AS DOUBLE)) THEN NULL
              ELSE CAST(xf AS DOUBLE) END AS x,
         CASE WHEN isnan(CAST(xf AS DOUBLE)) THEN 0
              ELSE CAST(FLOOR(CAST(xf AS DOUBLE) * 10000 + 0.5) AS BIGINT)
         END AS sc,
         CASE WHEN isnan(CAST(xf AS DOUBLE)) THEN 1 ELSE 0 END AS is_nan
  FROM expl
),
agg AS (
  SELECT dim, COUNT(*) AS n_values,
         CAST(SUM(is_nan) AS BIGINT) AS n_nan,
         CAST(SUM(sc) AS BIGINT) AS s1,
         CAST(SUM(sc * sc) AS BIGINT) AS s2,
         MIN(x) AS mn, MAX(x) AS mx,
         CAST(SUM(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
  FROM s GROUP BY dim
)
SELECT dim, n_values, n_nan,
       COALESCE({sql_round_half_up(
           "CAST(s1 AS DOUBLE) / NULLIF(n_values - n_nan, 0) / 10000.0", 6
       )}, 0.0) AS mean_val,
       COALESCE({sql_round_half_up(
           "sqrt(GREATEST(CAST(s2 AS DOUBLE) / NULLIF(n_values - n_nan, 0)"
           " - (CAST(s1 AS DOUBLE) / NULLIF(n_values - n_nan, 0))"
           " * (CAST(s1 AS DOUBLE) / NULLIF(n_values - n_nan, 0)),"
           " 0.0)) / 10000.0",
           6,
       )}, 0.0) AS std_val,
       COALESCE({sql_round_half_up("mn", 6)}, 0.0) AS min_val,
       COALESCE({sql_round_half_up("mx", 6)}, 0.0) AS max_val,
       n_zero
FROM agg ORDER BY dim
"""


# ---------------------------------------------------------------------------
# PCA / whitening report (embedding preprocessing for training)
# ---------------------------------------------------------------------------

_PCA_DIM = 64


def pca_report(emb: DataFrame, dim: int = _PCA_DIM) -> DataFrame:
    """One-row PCA/whitening readiness report: the distributed part
    computes the EXACT integer-scaled covariance of the embedding
    matrix (the expensive O(N·d²) pass); the driver eigendecomposes
    the resulting d×d matrix (numpy ``eigh`` on 64×64 — the same
    driver-bounded-model shape as the IVF centroids) and the report
    attests both halves:

    - ``n_vectors`` / ``n_excluded`` (NULL, wrong-dim, NaN-bearing
      vectors are excluded — a NaN poisons every cross-product it
      touches) and ``total_var_r6`` replay EXACTLY in SQL: the trace
      is accumulated as the all-integer ``Σ_i (n·P_ii − S_i²)``
      (order-independent BIGINT sums — a float fold would diverge
      across engines), divided once at the end in a pinned order.
    - ``eig_ok`` (|Σλ − trace| ≤ 1e-9·max(trace,1)) and ``ortho_ok``
      (max|VᵀV − I| ≤ 1e-8) are the eigendecomposition's invariants,
      asserted TRUE by the oracle — numerically meaningful because
      the eigenvalue sum is checked against the INDEPENDENTLY
      SQL-replayed trace.

    Scale shape: per vector the nested HOF emits the d(d+1)/2 = 2080
    upper-triangle products as ONE constant-size expression (the
    scaled array is materialized to a column first — the _bind
    lesson, so the plan holds one reference, not 4160 inlined
    copies); the aggregation map-side combines onto 2080 (i,j) keys,
    so shuffle volume is partitions×2080 rows regardless of N. Only
    the d×d sums reach the driver. At int64 limits (Σ n·s⁴ terms),
    ~1e10 rows of unit-scale embeddings fit; past that the sums move
    to DECIMAL(38,0) unchanged in shape. Whitening itself is then a
    broadcast matmul of the collected rotation — downstream numpy/
    Arrow work this report gates."""
    import numpy as np
    import pandas as pd

    clean_pred = (
        F.col("embedding").isNotNull()
        & (F.size("embedding") == dim)
        & ~F.exists("embedding", lambda x: F.isnan(x.cast("double")))
    )
    clean = emb.filter(clean_pred)
    spark = emb.sparkSession
    # Round-16 (guide §1.2 step 1): total and clean counts fused into
    # ONE aggregate job (was two sequential counts; false AND NULL is
    # false under Kleene logic, so summing the predicate counts
    # exactly the rows `clean` keeps).
    # Round-17 (guide §4.2 — hand whole batches to native code; r16
    # "not yet optimized" item 3): the d(d+1)/2-term upper-triangle
    # HOF explode (2080 struct allocations PER ROW in the JVM) is
    # replaced by a per-partition integer Gram kernel: each task
    # accumulates scΤ·sc and Σsc in exact int64 numpy, emitting ONE
    # bounded partial frame (2080 product rows + d sum rows, j = -1
    # marking the sum rows) per partition; a map-side-combined
    # groupBy-sum reduces the partials. The scaling is the identical
    # IEEE op chain (float32→float64 exact widening, ·10⁴, +0.5,
    # floor, truncate-to-long), and integer matmul/sum are
    # order-independent, so the collected totals are bit-equal to the
    # explode spelling (pytest-pinned). Overflow headroom: |sc| ≤
    # 10⁴·max|x| + 1 ⇒ per-task partials stay under int64 for ~9·10¹⁰
    # unit-scale rows per task — far past any real partition; the
    # cross-task reduction is the same Spark BIGINT sum as before.
    # The total/clean count aggregate is independent of the Gram pass,
    # so the two jobs overlap (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    def _gram_kernel(it):
        P_part = np.zeros((dim, dim), dtype=np.int64)
        S_part = np.zeros(dim, dtype=np.int64)
        seen = False
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.vstack(
                [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]]
            ).astype(np.float64)
            sc_m = np.floor(mat * 10000.0 + 0.5).astype(np.int64)
            P_part += sc_m.T @ sc_m
            S_part += sc_m.sum(axis=0, dtype=np.int64)
            seen = True
        if not seen:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [iu.astype(np.int32), np.arange(dim, dtype=np.int32)]
                ),
                "j": np.concatenate(
                    [ju.astype(np.int32), np.full(dim, -1, dtype=np.int32)]
                ),
                "p": np.concatenate([P_part[iu, ju], S_part]),
            }
        )

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _f_counts = _pool.submit(
            lambda: emb.agg(
                F.count(F.lit(1)), F.sum(clean_pred.cast("long"))
            ).first()
        )
        _f_gram = _pool.submit(
            lambda: clean.select("embedding")
            .mapInPandas(_gram_kernel, "i int, j int, p long")
            .groupBy("i", "j")
            .agg(F.sum("p").alias("p"))
            .collect()
        )
    n_total, n = _f_counts.result()
    gram_rows = _f_gram.result()
    n_total, n = int(n_total), int(n or 0)
    if n == 0:
        rows = [(0, n_total, dim, 0.0, True, True)]
    else:
        P = np.zeros((dim, dim), dtype=np.int64)
        S = np.zeros(dim, dtype=np.int64)
        for r in gram_rows:
            if r["j"] == -1:
                S[r["i"]] = r["p"]
            else:
                P[r["i"], r["j"]] = r["p"]
                P[r["j"], r["i"]] = r["p"]
        # trace in EXACT integers, single pinned-order division chain
        # (ts/n/n/1e8 — the oracle spells the same left-assoc chain).
        ts = int((int(n) * P.diagonal().astype(object) - S.astype(object) ** 2).sum())
        # float(ts) FIRST (== the oracle's CAST(ts AS DOUBLE)): ts can
        # exceed 2^53, where Python's exact big-int division and
        # DuckDB's cast-then-divide differ in the last ulp.
        total_var = float(ts) / n / n / 1e8
        tv_r6 = np.floor(total_var * 1e6 + 0.5) / 1e6
        # covariance in float for the eigendecomposition only
        C = (P / n - np.multiply.outer(S / n, S / n)) / 1e8
        w, v = np.linalg.eigh(C)
        eig_ok = bool(abs(w.sum() - total_var) <= 1e-9 * max(total_var, 1.0))
        ortho_ok = bool(np.abs(v.T @ v - np.eye(dim)).max() <= 1e-8)
        rows = [(n, n_total - n, dim, float(tv_r6), eig_ok, ortho_ok)]
    return spark.createDataFrame(
        rows,
        "n_vectors long, n_excluded long, dim int, total_var_r6 double, "
        "eig_ok boolean, ortho_ok boolean",
    )


def q_embedding_pca_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_report(read_table(spark, sf_dir, "embeddings"))


ORACLE_PCA_REPORT = f"""
WITH v AS (
  SELECT embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {_PCA_DIM}
    AND len([y for y in embedding if isnan(CAST(y AS DOUBLE))]) = 0
),
tot AS (SELECT COUNT(*) AS n_total FROM embeddings),
sc AS (
  SELECT [CAST(FLOOR(CAST(y AS DOUBLE) * 10000 + 0.5) AS BIGINT)
          for y in embedding] AS s
  FROM v
),
expl AS (SELECT generate_subscripts(s, 1) AS i, unnest(s) AS si FROM sc),
agg AS (
  SELECT i, CAST(SUM(si) AS BIGINT) AS s1,
         CAST(SUM(si * si) AS BIGINT) AS pii
  FROM expl GROUP BY i
),
n AS (SELECT COUNT(*) AS n FROM v),
tr AS (
  SELECT CAST(SUM(n.n * pii - s1 * s1) AS BIGINT) AS ts
  FROM agg, n
)
SELECT CAST(n.n AS BIGINT) AS n_vectors,
       CAST(tot.n_total - n.n AS BIGINT) AS n_excluded,
       {_PCA_DIM} AS dim,
       CASE WHEN n.n = 0 THEN 0.0 ELSE
         FLOOR(CAST(tr.ts AS DOUBLE) / n.n / n.n / 1e8 * 1e6 + 0.5) / 1e6
       END AS total_var_r6,
       TRUE AS eig_ok,
       TRUE AS ortho_ok
FROM n, tot, tr
"""


QUERIES = {
    "embedding_integrity_audit": q_embedding_integrity_audit,
    "embedding_quantize_report": q_embedding_quantize_report,
    "embedding_semantic_dedup": q_embedding_semantic_dedup,
    "embedding_dim_stats": q_embedding_dim_stats,
    "embedding_pca_report": q_embedding_pca_report,
}

ORACLES = {
    "embedding_integrity_audit": ORACLE_INTEGRITY,
    "embedding_quantize_report": ORACLE_QUANTIZE,
    "embedding_semantic_dedup": ORACLE_SEMDEDUP,
    "embedding_dim_stats": ORACLE_DIM_STATS,
    "embedding_pca_report": ORACLE_PCA_REPORT,
}
