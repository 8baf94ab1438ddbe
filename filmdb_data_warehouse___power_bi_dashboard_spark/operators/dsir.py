"""DSIR-style importance weighting (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): per-document
importance weight = target-vs-raw log-likelihood ratio under two
bag-of-hashed-n-gram models — the principled upgrade from the
temperature mixing of ``corpus_mix_weights`` (which reweights whole
SOURCES; this weights every DOCUMENT by how target-like its content
is, so resampling can shift the corpus toward a target domain without
hand-labeling).

Model (the paper's §2.2, hashed n-gram variant):

- features = unigrams ∪ bigrams, hashed into ``n_buckets`` buckets
  (h60 → pmod — the same cross-engine 60-bit hash family as the
  dedup postings);
- target distribution p and raw distribution q are add-α smoothed
  bucket frequencies: p_f = (c_p[f]+α)/(N_p+αB), likewise q;
- log w(x) = Σ_{occurrences f∈x} (ln p_f − ln q_f).

Scale design (100 TB story): the feature stream ships (doc_id, bucket)
pairs — text never shuffles; BOTH models come from ONE aggregation
pass (a conditional sum splits target from raw per bucket, and raw
includes target exactly as in the paper); the per-feature log-ratio
table is bounded by ``n_buckets`` (4096 rows) so the scoring join is a
broadcast; and each ratio is rounded onto a 1e-6 integer grid BEFORE
the per-document sum, so the reduction is exact BIGINT arithmetic —
partition-order independent and oracle-checkable (the ln-at-source
discipline of operators/lm.py bigram_lm_score). The feature explode
runs twice overall — once under the model aggregation, once under
scoring — DELIBERATELY: persisting the corpus-scale token-occurrence
stream to save a scan is exactly the thing that doesn't survive
100 TB, while the thing worth keeping (the 4096-row model) is what
the split log_ratio_table/score_against_model seam lets a caller
persist and broadcast (the streaming twin does precisely that).

Reference anchor: SURVEY §2.11 extension surface; the reference's
closest relative is the per-store weighting of its BI measures —
nothing in PostgreSQL/Power BI computes importance ratios, which is
exactly why the extension inventory carries it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

_DSIR_BUCKETS = 4096
_DSIR_ALPHA = 0.5
_DSIR_TARGET_LANG = "en"


def _scaled_long(x):
    """double -> exact integer-scaled BIGINT on a 1e-6 grid (lm.py
    twin, kept local to avoid a cross-module private import)."""
    return F.floor(x * 1e6 + F.lit(0.5)).cast("long")


def _feature_stream(docs: DataFrame, target_pred) -> DataFrame:
    """(doc_id, is_target, f): one row per unigram+bigram occurrence,
    bucketed. The bigram list rides the same slice+zip spelling as
    lm.py (stays in codegen; no posexplode self-join); single-token
    docs contribute their unigram only."""
    from .dedup import h60

    toks = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        target_pred.alias("is_target"),
        F.split("text", " ").alias("t"),
    )
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return toks.select(
        "doc_id",
        "is_target",
        F.explode(F.concat("t", bigrams)).alias("feat"),
    ).select(
        "doc_id",
        "is_target",
        F.pmod(h60(F.col("feat")), F.lit(_DSIR_BUCKETS)).alias("f"),
    )


def importance_weights(
    docs: DataFrame,
    target_pred,
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = _DSIR_ALPHA,
) -> DataFrame:
    """Per-document DSIR importance weight against the ``target_pred``
    subset. Returns (doc_id, n_features, log_weight, avg_log_weight)
    for every non-NULL-text document, ordered by doc_id — log_weight
    > 0 means the document looks more like the target than like the
    raw corpus; resampling/filtering on it is the pipeline action."""
    occ = _feature_stream(docs, target_pred)
    lam = log_ratio_table(occ, n_buckets=n_buckets, alpha=alpha)
    return score_against_model(occ, lam).orderBy("doc_id")


def log_ratio_table(
    occ: DataFrame,
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = _DSIR_ALPHA,
) -> DataFrame:
    """The DSIR model as data: (f, lf) — per-bucket integer-scaled
    log-likelihood ratio, exactly ``n_buckets`` rows. Split from the
    scoring step so a STATIC model can be built once and broadcast to
    every scoring call (the streaming twin scores arriving batches
    against exactly this table).

    The table is DENSE (round-16, advisor fix): buckets with zero
    occurrences in the model corpus still get a row carrying the
    add-α prior ratio ln((α/(n_p+αB))/(α/(n_q+αB))) — so scoring
    FUTURE data against a static model prior-scores unseen-bucket
    features exactly as DSIR smoothing implies, instead of silently
    dropping them through the join. For the corpus the model was
    built from this changes nothing (every occurring bucket already
    had a row with the identical ratio)."""
    a, b = float(alpha), int(n_buckets)
    # Round-16 optimization (guide §1.2 step 1 — don't compute things
    # twice): the feature explode used to run THREE times per entry —
    # once under the bucket counts, once more because ``tot``
    # re-derived those counts from scratch (Catalyst planned two
    # independent subtrees; exchange reuse never fired because the two
    # prune different columns), and once under scoring. The counts
    # table is bounded by ``n_buckets`` (4096 rows), so checkpoint it
    # — one explode pass — and read the grand totals off it as exact
    # BIGINT literals (the ln math itself stays in Spark, so the
    # engine/oracle bit-parity of the smoothed ratios is untouched).
    # The scoring explode remains the one deliberate second pass
    # (module docstring: the corpus-scale token stream is what must
    # NOT persist at 100 TB; 4096 rows is what may).
    # Reliability note (round-17, verdict item): localCheckpoint
    # stores blocks on executors and is NON-recoverable on executor
    # loss — fine here because the frame is bounded (≤ n_buckets
    # rows) and a loss fails the job visibly (retry recomputes);
    # a cluster deployment that wants lineage-free recovery should
    # set a checkpoint dir and switch to .checkpoint().
    counts = (
        occ.groupBy("f")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c_q"),
            F.sum(F.col("is_target").cast("long")).alias("c_p"),
        )
        .localCheckpoint(eager=True)
    )
    n_q, n_p = counts.agg(F.sum("c_q"), F.sum("c_p")).first()
    spine = occ.sparkSession.range(b).select(F.col("id").cast("long").alias("f"))
    if n_q is None:
        # Degenerate empty-occurrence model (round-17, advisor fix):
        # before the round-16 totals inlining, NULL grand totals made
        # every lf NULL; `int(None or 0)` silently turned that into a
        # finite all-equal score of 0. Short-circuit to the original
        # all-NULL table so the degenerate case stays bit-compatible
        # with the pre-change spelling (and the oracle's NULL math).
        return spine.select(
            "f", F.lit(None).cast("long").alias("lf")
        )
    n_q, n_p = int(n_q), int(n_p or 0)
    dense = spine.join(counts, "f", "left").select(
        "f",
        F.coalesce("c_q", F.lit(0).cast("long")).alias("c_q"),
        F.coalesce("c_p", F.lit(0).cast("long")).alias("c_p"),
    )
    return dense.select(
        "f",
        _scaled_long(
            F.log(
                (F.col("c_p").cast("double") + F.lit(a))
                / (F.lit(n_p).cast("double") + F.lit(a * b))
            )
            - F.log(
                (F.col("c_q").cast("double") + F.lit(a))
                / (F.lit(n_q).cast("double") + F.lit(a * b))
            )
        ).alias("lf"),
    )


def score_against_model(occ: DataFrame, lam: DataFrame) -> DataFrame:
    """Per-document reduction of a feature stream against a (f, lf)
    model table: exact BIGINT sum of grid-scaled ratios, then the two
    rounded doubles. Unordered — callers order (batch) or append
    (streaming). ``lam`` from log_ratio_table is dense over the bucket
    space, so every feature of future/unseen data finds a row (the
    smoothed prior ratio) and the inner join drops nothing."""
    s = F.sum("lf")
    n = F.count(F.lit(1))
    return (
        occ.join(F.broadcast(lam), "f")
        .groupBy("doc_id")
        .agg(
            n.alias("n_features"),
            round_half_up(s.cast("double") / F.lit(1e6), 6).alias("log_weight"),
            round_half_up(
                (s.cast("double") / F.lit(1e6)) / n.cast("double"), 6
            ).alias("avg_log_weight"),
        )
    )


def q_corpus_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry: target = declared-English documents (the same
    target domain as the release pipeline's language filter), raw =
    the whole corpus."""
    docs = read_table(spark, sf_dir, "documents")
    return importance_weights(docs, F.col("lang") == _DSIR_TARGET_LANG)


_DSIR_FRACTION = 0.25


def dsir_budget_selection(
    docs: DataFrame,
    target_pred,
    fraction: float = _DSIR_FRACTION,
) -> DataFrame:
    """The ACT step of DSIR (detect→act, like the dedup keep arcs):
    rank the corpus by importance weight (most target-like first) and
    keep documents until the EXCLUSIVE running token total reaches
    ``fraction`` of the corpus — the paper's resampling step spelled
    deterministically (top-weight-first under a token budget instead
    of Gumbel noise, so the selection is recompute-stable and
    oracle-checkable). Returns the per-source composition of the kept
    set plus each source's minimum selected weight — the effective
    per-source cut line the global ranking induced.

    Scale shape: importance scoring as above (one pass + broadcast
    model), token proxy from the same profile expr as
    corpus_token_budget, and the ranking rides
    functions/ranking.global_running_sum (range-bucketed exact BIGINT
    prefix sums) — never a single-partition ORDER BY window.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..functions.ranking import global_running_sum
    from ..runtime import track_persist
    from .text import text_profile

    # Round-17 (guide §2.6): the BPE token profile and the DSIR model
    # build are independent full-text passes — the profile side fills
    # its own pin from a worker thread while the main thread
    # checkpoints the model counts (inside importance_weights), so the
    # two scans overlap instead of running as sequential driver jobs.
    prof0 = track_persist(
        text_profile(docs.where(F.col("text").isNotNull()))
        .select("doc_id", "n_tokens_bpe")
        .join(docs.select("doc_id", "source"), "doc_id")
        .persist()
    )
    with ThreadPoolExecutor(max_workers=1) as tpool:
        prof0_fut = tpool.submit(prof0.count)
        wts = importance_weights(docs, target_pred).select(
            "doc_id", "avg_log_weight"
        )
    prof0_fut.result()
    prof = prof0.join(wts, "doc_id")
    prof = track_persist(
        prof.select(
            "doc_id",
            "source",
            "avg_log_weight",
            F.coalesce("n_tokens_bpe", F.lit(0)).cast("long").alias("__tok"),
        ).persist()
    )
    total = prof.agg(F.sum("__tok").alias("__total"))
    cum = global_running_sum(
        prof,
        [("avg_log_weight", False), "doc_id"],
        "__tok",
        alias="__cum",
        exclusive=True,
    )
    kept = cum.crossJoin(F.broadcast(total)).where(
        F.col("__cum") < F.col("__total") * F.lit(fraction)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_selected"),
            F.sum("__tok").alias("tokens_selected"),
            round_half_up(F.min("avg_log_weight"), 6).alias("min_weight"),
        )
        .orderBy("source")
    )


def q_corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dsir_budget_selection(docs, F.col("lang") == _DSIR_TARGET_LANG)


def _dsir_cte_body() -> str:
    """Shared WITH-body (toks→occ→counts→tot→lam→weights): the exact
    per-doc weight computation, composed by both oracles so the two
    entries can never drift apart."""
    from .dedup import sql_h60

    a, b = _DSIR_ALPHA, _DSIR_BUCKETS
    lam = (
        f"CAST(FLOOR((ln((CAST(c_p AS DOUBLE) + {a!r})"
        f" / (CAST(n_p AS DOUBLE) + {a * b!r}))"
        f" - ln((CAST(c_q AS DOUBLE) + {a!r})"
        f" / (CAST(n_q AS DOUBLE) + {a * b!r})))"
        f" * 1000000.0 + 0.5) AS BIGINT)"
    )
    return f"""toks AS (
  SELECT doc_id, lang = '{_DSIR_TARGET_LANG}' AS is_target,
         string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
occ AS (
  SELECT doc_id, is_target,
         {sql_h60("feat")} % {b} AS f
  FROM (
    SELECT doc_id, is_target,
           unnest(list_concat(
             t,
             CASE WHEN len(t) >= 2
                  THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t) - 1 + 1)]
                  ELSE [] END)) AS feat
    FROM toks
  )
),
counts AS (
  SELECT f,
         CAST(COUNT(*) AS BIGINT) AS c_q,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS c_p
  FROM occ GROUP BY f
),
tot AS (
  SELECT CAST(SUM(c_q) AS BIGINT) AS n_q, CAST(SUM(c_p) AS BIGINT) AS n_p
  FROM counts
),
lam AS (SELECT f, {lam} AS lf FROM counts CROSS JOIN tot),
weights AS (
  SELECT o.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_features,
         {sql_round_half_up("CAST(SUM(l.lf) AS DOUBLE) / 1000000.0", 6)}
           AS log_weight,
         {sql_round_half_up(
             "(CAST(SUM(l.lf) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE)",
             6)} AS avg_log_weight
  FROM occ o JOIN lam l ON o.f = l.f
  GROUP BY o.doc_id
)"""


def _oracle_importance_weights() -> str:
    return f"""
WITH {_dsir_cte_body()}
SELECT doc_id, n_features, log_weight, avg_log_weight
FROM weights
ORDER BY doc_id
"""


def _oracle_dsir_select() -> str:
    from .text import _TOKEN_RE

    return f"""
WITH {_dsir_cte_body()},
prof AS (
  SELECT d.doc_id, d.source, w.avg_log_weight,
         CAST(COALESCE(len(regexp_extract_all(d.text, '{_TOKEN_RE}')), 0)
              AS BIGINT) AS tok
  FROM documents d JOIN weights w ON w.doc_id = d.doc_id
  WHERE d.text IS NOT NULL
),
tt AS (SELECT CAST(SUM(tok) AS BIGINT) AS total FROM prof),
cum AS (
  SELECT doc_id, source, avg_log_weight, tok,
         CAST(COALESCE(SUM(tok) OVER (
           ORDER BY avg_log_weight DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS c
  FROM prof
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_selected,
       CAST(SUM(tok) AS BIGINT) AS tokens_selected,
       {sql_round_half_up("MIN(avg_log_weight)", 6)} AS min_weight
FROM cum CROSS JOIN tt
WHERE c < total * {_DSIR_FRACTION}
GROUP BY source
ORDER BY source
"""


QUERIES: dict = {
    "corpus_importance_weights": q_corpus_importance_weights,
    "corpus_dsir_select": q_corpus_dsir_select,
}
ORACLES: dict = {
    "corpus_importance_weights": _oracle_importance_weights(),
    "corpus_dsir_select": _oracle_dsir_select(),
}
