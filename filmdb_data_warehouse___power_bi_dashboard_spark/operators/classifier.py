"""Learned quality-classifier inference: the model-based curation
stage (fastText / logistic-regression quality filtering) that every
production training-data pipeline runs after the heuristic filters.

A trained linear text classifier is, at inference time, nothing but a
(token → weight) lookup plus a per-document weighted sum:
``logit(d) = Σ_t count(d,t) · w(t)``, thresholded into keep/drop.
That is exactly a broadcast-joinable dimension table and one
map-side-combined aggregate — no model runtime needed in the hot
path, which is why the linear family dominates at corpus scale
(fastText's quality filter in CCNet/RedPajama-style pipelines).

Here the weight table stands in for the trained artifact: the
vocabulary is every token with document frequency ≥ ``_MIN_DF``
(Zipf's law makes this a tiny fraction of the token stream — the same
min-count cap the lm.py bigram model documents), and each weight is
derived deterministically from the cross-engine ``h60`` token hash,
mapped onto the integer grid [−1000, 1000]. Deterministic weights
make the whole inference pass — vocabulary build, weight lookup, OOV
fallback, logit sum, threshold — replayable by the DuckDB oracle, so
the driver hash attests the full stage. Swapping in real trained
weights changes ONE projection (read the table instead of hashing),
none of the plan shape.

Integer-exactness contract: weights and counts are BIGINTs, so every
logit is an exact integer sum (partition-order independent, bit-equal
across engines); the only float is the final length-normalized score,
computed once per document from identical integers.

Scale shape (100 TB story): token counts are one explode + groupBy
(doc_id, token) — partial-agg combines within each document's
partition before any shuffle; document frequency is a second
map-side-combined agg onto token keys; the weight table is
vocabulary-sized (min_df-capped), so AQE broadcasts it — and if a
degenerate corpus made it large, the equi-join degrades to a shuffle
hash join instead of an OOM (no forced hint, the round-12 linkage
lesson). The per-document reduction lands on doc_id keys. Nothing
quadratic, no Python in the hot path, raw text scanned once.

Reference anchor: the reference's text surface is the tsvector
full-text column (filmdb.sql:143); this module is part of the
SURVEY §2.11 training-data-pipeline extension over `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table
from .dedup import h60, sql_h60
from .text import _EN_STOP

# Vocabulary cap: a token enters the model only with document
# frequency >= _MIN_DF. 5 at the 500-doc sf0.01 fixture keeps the
# vocabulary meaningfully smaller than the token stream while leaving
# most running text in-vocabulary — the regime a trained classifier
# operates in.
_MIN_DF = 5
# Weight grid: h60(token) mapped onto [-1000, 1000] — integer
# "trained" weights on a symmetric grid, zero-mean by construction.
_W_SPAN = 2001
_W_OFF = 1000


def token_weight_table(docs: DataFrame, min_df: int = _MIN_DF) -> DataFrame:
    """The model artifact: (token, weight BIGINT) for every token with
    document frequency >= min_df. In production this frame is READ
    (the trained model's weight vector); here it is derived so the
    oracle can rebuild it bit-for-bit."""
    counts = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select(
            "tok",
            (F.pmod(h60("tok"), F.lit(_W_SPAN)) - F.lit(_W_OFF))
            .cast("long")
            .alias("w"),
        )
    )


def quality_classifier_scores(
    docs: DataFrame, min_df: int = _MIN_DF
) -> DataFrame:
    """Score every document under the linear model (module docstring).

    Returns (doc_id, n_tokens, logit_fp, score, quality_pass) ordered
    by doc_id: ``logit_fp`` the exact integer logit Σ count·weight
    (OOV tokens weigh 0 via the left join's COALESCE — the standard
    unknown-token fallback), ``score`` the length-normalized logit in
    weight units (logit / n_tokens / 1000, rounded on the 1e-6 grid),
    ``quality_pass`` the keep/drop decision at the logit-0 threshold —
    integer-exact, so the classification boundary is bit-identical
    across engines.
    """
    counts = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    weights = token_weight_table(docs, min_df=min_df)
    scored = counts.join(weights, "tok", "left").groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0)))
        .cast("long")
        .alias("logit_fp"),
    )
    score = (
        F.col("logit_fp").cast("double")
        / F.col("n_tokens").cast("double")
        / float(_W_OFF)
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit_fp",
        round_half_up(score, 6).alias("score"),
        (F.col("logit_fp") >= 0).alias("quality_pass"),
    ).orderBy("doc_id")


def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_classifier_scores(read_table(spark, sf_dir, "documents"))


ORACLE_QUALITY_CLASSIFIER = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
),
weights AS (
  SELECT tok, CAST({sql_h60('tok')} % {_W_SPAN} - {_W_OFF} AS BIGINT) AS w
  FROM (SELECT tok FROM counts GROUP BY tok HAVING COUNT(*) >= {_MIN_DF}) v
),
scored AS (
  SELECT c.doc_id,
         CAST(SUM(c.cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(c.cnt * COALESCE(w.w, 0)) AS BIGINT) AS logit_fp
  FROM counts c LEFT JOIN weights w ON c.tok = w.tok
  GROUP BY c.doc_id
)
SELECT doc_id, n_tokens, logit_fp,
       {sql_round_half_up(
           "CAST(logit_fp AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
           f" / {float(_W_OFF)!r}", 6
       )} AS score,
       logit_fp >= 0 AS quality_pass
FROM scored
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Calibration report: the model-ops companion of the inference stage
# (round-14) — every production quality filter ships with a
# reliability diagram before its threshold is trusted.
# ---------------------------------------------------------------------------

_CAL_SLOPE = 5  # bins per score unit; score ∈ [-1, 1] → 10 bins


def classifier_calibration(docs: DataFrame, min_df: int = _MIN_DF) -> DataFrame:
    """Reliability diagram for the linear quality classifier: documents
    bucket by score bin (``floor(score·5)`` clamped to [-5, 4] — fixed
    bins, no global sort) against the ``lang = 'en'`` reference label
    (the same label the stump miner audits), reporting per bin the doc
    count, label count, observed label rate and the POOLED score
    (Σ logit / Σ tokens / 1000 — both sums exact BIGINTs, so the only
    floats are one division per bin from identical integers; a
    per-doc-mean would sum doubles in partition order and diverge
    across engines in the last ulp).

    The bin key derives from the rounded-on-1e-6 score, which is
    bit-identical across engines by the classifier's integer-exactness
    contract, so bucketing is deterministic. Scale shape: one join of
    the classifier output with a scan-level label projection, then a
    map-side-combined aggregate onto ≤10 bin keys.
    """
    scores = quality_classifier_scores(docs, min_df=min_df)
    labels = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("is_en"),
    )
    bin_ = (
        F.least(
            F.greatest(F.floor(F.col("score") * _CAL_SLOPE), F.lit(-_CAL_SLOPE)),
            F.lit(_CAL_SLOPE - 1),
        )
    ).cast("long")
    return (
        scores.join(labels, "doc_id")
        .groupBy(bin_.alias("score_bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_en").cast("long").alias("n_en"),
            F.sum("logit_fp").cast("long").alias("__sl"),
            F.sum("n_tokens").cast("long").alias("__st"),
        )
        .select(
            "score_bin",
            "n_docs",
            "n_en",
            round_half_up(
                F.col("n_en").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("en_rate"),
            round_half_up(
                F.col("__sl").cast("double")
                / F.col("__st").cast("double")
                / float(_W_OFF),
                6,
            ).alias("pooled_score"),
        )
        .orderBy("score_bin")
    )


def q_text_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier_calibration(read_table(spark, sf_dir, "documents"))


ORACLE_CLASSIFIER_CALIBRATION = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
),
weights AS (
  SELECT tok, CAST({sql_h60('tok')} % {{span}} - {{off}} AS BIGINT) AS w
  FROM (SELECT tok FROM counts GROUP BY tok HAVING COUNT(*) >= {_MIN_DF}) v
),
scored AS (
  SELECT c.doc_id,
         CAST(SUM(c.cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(c.cnt * COALESCE(w.w, 0)) AS BIGINT) AS logit_fp
  FROM counts c LEFT JOIN weights w ON c.tok = w.tok
  GROUP BY c.doc_id
),
withscore AS (
  SELECT doc_id, n_tokens, logit_fp,
         {{score_expr}} AS score
  FROM scored
),
joined AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(s.score * {_CAL_SLOPE}) AS BIGINT),
                        -{_CAL_SLOPE}), {_CAL_SLOPE - 1}) AS score_bin,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_en,
         s.logit_fp, s.n_tokens
  FROM withscore s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT score_bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_en) AS BIGINT) AS n_en,
       {{rate_expr}} AS en_rate,
       {{pooled_expr}} AS pooled_score
FROM joined
GROUP BY score_bin
ORDER BY score_bin
"""


def _oracle_classifier_calibration() -> str:
    return ORACLE_CLASSIFIER_CALIBRATION.format(
        span=_W_SPAN,
        off=_W_OFF,
        score_expr=sql_round_half_up(
            "CAST(logit_fp AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
            f" / {float(_W_OFF)!r}",
            6,
        ),
        rate_expr=sql_round_half_up(
            "CAST(SUM(is_en) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 6
        ),
        pooled_expr=sql_round_half_up(
            "CAST(SUM(logit_fp) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)"
            f" / {float(_W_OFF)!r}",
            6,
        ),
    )


# ---------------------------------------------------------------------------
# Decision-stump split mining: the training-side companion of the
# inference stage above (operator-fusion ML in pure SQL: the split
# search is conditional aggregates, the chosen stump compiles to one
# CASE in the scan — no model runtime, no Python).
# ---------------------------------------------------------------------------

# (feature, thresholds) grid: integer features only so every split
# count is exact; thresholds are fixed design parameters (document-
# scale landmarks), not data-derived, so the whole search is ONE
# conditional aggregate with |grid| sum pairs — zero row blowup.
_STUMP_GRID: list[tuple[str, tuple[int, ...]]] = [
    ("n_tokens", (5, 10, 20, 40)),
    ("n_chars", (100, 200, 400, 800)),
    ("n_stopwords", (1, 2, 4, 8)),
    ("n_punct", (2, 5, 10, 20)),
]
_STUMP_TOPK = 10


def stump_split_report(docs: DataFrame) -> DataFrame:
    """Exact decision-stump split search over integer text features
    for the label ``lang = 'en'`` — the feature-audit step before
    training any tree/boosted quality model: which single
    (feature ≤ threshold) test separates the classes best.

    For every grid cell the ONE aggregate pass collects exact BIGINT
    split counts (n_left, pos_left, n_right, pos_right); the reported
    quality is the weighted Gini impurity
    ``(n_L·gini_L + n_R·gini_R) / n`` with
    ``gini = 1 − (pos² + neg²)/n²`` — computed from identical
    integers by identical IEEE ops on both engines, rounded on the
    1e-6 grid, ranked ascending (lower = purer split) with
    (feature, threshold) as the deterministic tie-break. Degenerate
    splits (an empty side) are excluded — their Gini term is 0/0.

    Scale shape: one scan projecting the integer features, one
    map-side-combined aggregate producing 2·|grid| BIGINTs on a
    SINGLE row, an inline-table unpivot of that row (|grid| rows),
    and arithmetic on the bounded frame. Nothing shuffles but the
    one-row aggregate.
    """
    words = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(m) for m in _EN_STOP])
    feats = docs.where(F.col("text").isNotNull()).select(
        (F.col("lang") == "en").cast("long").alias("pos"),
        F.size(words).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
        .cast("long")
        .alias("n_stopwords"),
        # Explicit whitespace class, NOT \s: Java's \s includes \x0B
        # (vertical tab) while DuckDB's RE2 \s does not — spelling the
        # same five chars on both engines removes the latent divergence
        # (round-13 advisor finding).
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]"), 0
            )
        )
        .cast("long")
        .alias("n_punct"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("pos"),
    ]
    for feat, ths in _STUMP_GRID:
        for t in ths:
            cond = F.col(feat) <= F.lit(t)
            aggs.append(
                F.sum(cond.cast("long")).cast("long").alias(f"nl_{feat}_{t}")
            )
            aggs.append(
                F.sum((cond & (F.col("pos") == 1)).cast("long"))
                .cast("long")
                .alias(f"pl_{feat}_{t}")
            )
    one = feats.agg(*aggs)
    stack_items = ", ".join(
        f"'{feat}', {t}L, nl_{feat}_{t}, pl_{feat}_{t}"
        for feat, ths in _STUMP_GRID
        for t in ths
    )
    n_cells = sum(len(ths) for _, ths in _STUMP_GRID)
    cells = one.select(
        "n",
        "pos",
        F.expr(
            f"stack({n_cells}, {stack_items})"
            " AS (feature, threshold, n_left, pos_left)"
        ),
    ).select(
        "feature",
        "threshold",
        "n_left",
        "pos_left",
        (F.col("n") - F.col("n_left")).alias("n_right"),
        (F.col("pos") - F.col("pos_left")).alias("pos_right"),
        "n",
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    gini = (
        (
            d("n_left")
            - (d("pos_left") * d("pos_left")
               + (d("n_left") - d("pos_left")) * (d("n_left") - d("pos_left")))
            / d("n_left")
        )
        + (
            d("n_right")
            - (d("pos_right") * d("pos_right")
               + (d("n_right") - d("pos_right")) * (d("n_right") - d("pos_right")))
            / d("n_right")
        )
    ) / d("n")
    return (
        cells.where((F.col("n_left") > 0) & (F.col("n_right") > 0))
        .select(
            "feature",
            "threshold",
            "n_left",
            "pos_left",
            "n_right",
            "pos_right",
            round_half_up(gini, 6).alias("gini_split"),
        )
        .orderBy("gini_split", "feature", "threshold")
        .limit(_STUMP_TOPK)
    )


def q_text_stump_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stump_split_report(read_table(spark, sf_dir, "documents"))


def _oracle_stump_splits() -> str:
    stop_arr = ", ".join(f"'{m}'" for m in _EN_STOP)
    cell_sums = ",\n         ".join(
        f"CAST(SUM(CASE WHEN {feat} <= {t} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS nl_{feat}_{t},\n         "
        f"CAST(SUM(CASE WHEN {feat} <= {t} AND pos = 1 THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS pl_{feat}_{t}"
        for feat, ths in _STUMP_GRID
        for t in ths
    )
    unpivot = "\nUNION ALL\n".join(
        f"SELECT '{feat}' AS feature, CAST({t} AS BIGINT) AS threshold,"
        f" nl_{feat}_{t} AS n_left, pl_{feat}_{t} AS pos_left, n, pos FROM one"
        for feat, ths in _STUMP_GRID
        for t in ths
    )
    g = (
        "((CAST(n_left AS DOUBLE)"
        " - (CAST(pos_left AS DOUBLE) * CAST(pos_left AS DOUBLE)"
        " + (CAST(n_left AS DOUBLE) - CAST(pos_left AS DOUBLE))"
        " * (CAST(n_left AS DOUBLE) - CAST(pos_left AS DOUBLE)))"
        " / CAST(n_left AS DOUBLE))"
        " + (CAST(n_right AS DOUBLE)"
        " - (CAST(pos_right AS DOUBLE) * CAST(pos_right AS DOUBLE)"
        " + (CAST(n_right AS DOUBLE) - CAST(pos_right AS DOUBLE))"
        " * (CAST(n_right AS DOUBLE) - CAST(pos_right AS DOUBLE)))"
        " / CAST(n_right AS DOUBLE)))"
        " / CAST(n AS DOUBLE)"
    )
    return f"""
WITH feats AS (
  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS pos,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> list_contains([{stop_arr}], w))) AS BIGINT)
           AS n_stopwords,
         -- explicit whitespace class, matching the Spark side (Java \\s
         -- includes \\x0B, RE2 \\s does not)
         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]'))
              AS BIGINT) AS n_punct
  FROM documents WHERE text IS NOT NULL
),
one AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS pos,
         {cell_sums}
  FROM feats
),
cells AS ({unpivot}),
sided AS (
  SELECT feature, threshold, n_left, pos_left,
         CAST(n - n_left AS BIGINT) AS n_right,
         CAST(pos - pos_left AS BIGINT) AS pos_right,
         n
  FROM cells
)
SELECT feature, threshold, n_left, pos_left, n_right, pos_right,
       {sql_round_half_up(g, 6)} AS gini_split
FROM sided
WHERE n_left > 0 AND n_right > 0
ORDER BY gini_split, feature, threshold
LIMIT {_STUMP_TOPK}
"""


QUERIES = {
    "text_quality_classifier": q_text_quality_classifier,
    "text_stump_splits": q_text_stump_splits,
    "text_classifier_calibration": q_text_classifier_calibration,
}
ORACLES = {
    "text_quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "text_stump_splits": _oracle_stump_splits(),
    "text_classifier_calibration": _oracle_classifier_calibration(),
}
