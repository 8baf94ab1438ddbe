"""Corpus-quality and curation operators beyond the basic text
profile: BM25 ranked retrieval, n-gram repetition profiling
(Gopher/C4-style quality signals), PII detection + redaction, and
temperature-weighted source mixing.

Everything is built-in Column expressions plus ordinary
groupBy/join — no Python UDF anywhere, so every pass stays inside
whole-stage codegen. Each operator's scale story is documented on
the function; the common theme: per-document work is bounded by the
document (embarrassingly parallel), corpus-level statistics are
small aggregates (broadcast back), and nothing ever collects
unbounded data on the driver.

Reference anchor: the reference's only text surface is the tsvector
full-text column (filmdb.sql:143, GiST index :47576) which
operators/text.py approximates; this module is the SURVEY §2.11
training-data-pipeline extension built on the same `documents`
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "merge", "window"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 50


def _eq(term: str):
    # Closure factory: a default-arg lambda reads as 2-ary to the
    # higher-order binder (index overload) — same trap as text.py.
    return lambda w: w == F.lit(term)


def bm25_search(docs: DataFrame, terms: list[str], top_k: int = _BM25_TOPK) -> DataFrame:
    """BM25-ranked retrieval (OR semantics, unlike text.py's AND
    tsquery): score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with the Lucene non-negative idf ln(1 + (N−df+0.5)/(df+0.5)).

    Scale shape: the term list is fixed and small, so per-document tf
    values are pure Column expressions over one scan — no explode, no
    per-token shuffle. Corpus statistics (N, avgdl, df per term) are
    ONE tiny aggregate broadcast back with a 1-row cross join; the
    final top-k is TakeOrderedAndProject. Total cost: two scans of
    `documents`, zero wide shuffles, independent of corpus size per
    partition. (A dynamic/large query workload would switch to the
    inverted-index vocabulary of text.vocabulary — same df statistic.)
    """
    words = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        F.size(words).alias("dl"),
        *[
            F.size(F.filter(words, _eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    hit = None
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        norm = tf + F.lit(_BM25_K1) * (
            F.lit(1.0 - _BM25_B)
            + F.lit(_BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        part = idf * (tf * F.lit(_BM25_K1 + 1.0)) / norm
        score = part if score is None else (score + part)
        has = F.col(f"tf_{i}") > 0
        hit = has if hit is None else (hit | has)
    return (
        base.filter(hit)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", round_half_up(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(top_k)
    )


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return bm25_search(docs, _BM25_TERMS)


def _bm25_oracle(terms: list[str]) -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(string_split(text, ' '), w -> w = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    # Identical operation ORDER to the Spark expression tree so the
    # IEEE-754 double sequence matches bit-for-bit (see
    # functions.scalar.round_half_up docstring).
    parts = []
    for i in range(len(terms)):
        idf = (
            f"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        )
        norm = (
            f"(CAST(tf_{i} AS DOUBLE) + {_BM25_K1!r} * ({1.0 - _BM25_B!r}"
            f" + {_BM25_B!r} * CAST(dl AS DOUBLE) / avgdl))"
        )
        parts.append(
            f"({idf} * (CAST(tf_{i} AS DOUBLE) * {_BM25_K1 + 1.0!r}) / {norm})"
        )
    score = parts[0]
    for p in parts[1:]:
        score = f"({score} + {p})"
    any_hit = " OR ".join(f"tf_{i} > 0" for i in range(len(terms)))
    return f"""
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS dl,
         {tf_cols}
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_cols} FROM base
)
SELECT doc_id, {sql_round_half_up(score, 4)} AS bm25
FROM base, stats
WHERE {any_hit}
ORDER BY bm25 DESC, doc_id ASC
LIMIT {_BM25_TOPK}
"""


ORACLE_BM25 = _bm25_oracle(_BM25_TERMS)


# ---------------------------------------------------------------------------
# N-gram repetition profile (Gopher/C4-style quality signals)
# ---------------------------------------------------------------------------


def repetition_profile(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals used by training-data quality
    filters (Gopher/C4 family): duplicate-word ratio, the share of
    the most frequent bigram, and the fraction of bigrams/trigrams
    that occur more than once.

    Scale shape: uni/bi/trigrams are tagged (n, gram) rows from ONE
    explode over one scan; `groupBy(doc_id, n, gram)` shrinks
    map-side (partial aggregation), so the shuffle carries distinct
    grams per document, not occurrences. All later stages group on
    `doc_id` — the same key prefix — so AQE coalesces them onto the
    already-shuffled layout. Per-document work is bounded by document
    length; nothing is corpus-global, so the profile scales linearly
    with rows regardless of document count. (A per-document
    higher-order-function spelling avoids the shuffle entirely but is
    O(distinct²) per doc — wrong for million-token documents, so the
    explode spelling is the default.)
    """
    words = F.split(F.col("text"), " ")
    n1 = F.size(words)
    big = F.zip_with(
        F.slice(words, 1, F.greatest(n1 - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n1 - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tri = F.zip_with(
        F.slice(big, 1, F.greatest(n1 - 2, F.lit(0))),
        F.slice(words, 3, F.greatest(n1 - 2, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tagged = docs.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform(words, lambda g: F.struct(F.lit(1).alias("n"), g.alias("g"))),
                F.transform(big, lambda g: F.struct(F.lit(2).alias("n"), g.alias("g"))),
                F.transform(tri, lambda g: F.struct(F.lit(3).alias("n"), g.alias("g"))),
            )
        ).alias("t"),
    ).select("doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    per_gram = tagged.groupBy("doc_id", "n", "g").agg(F.count("*").alias("cnt"))
    per_level = per_gram.groupBy("doc_id", "n").agg(
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup_cnt"
        ),
    )

    def lvl(n: int, col: str):
        return F.max(F.when(F.col("n") == n, F.col(col)))

    ratio = lambda num, den: round_half_up(num.cast("double") / den, 4)  # noqa: E731
    return (
        per_level.groupBy("doc_id")
        .agg(
            lvl(1, "total").alias("n_words"),
            ratio(lvl(1, "total") - lvl(1, "n_distinct"), lvl(1, "total")).alias(
                "dup_word_ratio"
            ),
            ratio(
                F.coalesce(lvl(2, "top_cnt"), F.lit(0)),
                F.greatest(F.coalesce(lvl(2, "total"), F.lit(0)), F.lit(1)),
            ).alias("top_bigram_share"),
            ratio(
                F.coalesce(lvl(2, "dup_cnt"), F.lit(0)),
                F.greatest(F.coalesce(lvl(2, "total"), F.lit(0)), F.lit(1)),
            ).alias("dup_bigram_frac"),
            ratio(
                F.coalesce(lvl(3, "dup_cnt"), F.lit(0)),
                F.greatest(F.coalesce(lvl(3, "total"), F.lit(0)), F.lit(1)),
            ).alias("dup_trigram_frac"),
        )
        .orderBy("doc_id")
    )


def q_text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return repetition_profile(docs)


ORACLE_REPETITION = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, 1 AS n, unnest(w) AS g FROM base
  UNION ALL
  SELECT doc_id, 2 AS n,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
  FROM base
  UNION ALL
  SELECT doc_id, 3 AS n,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM base
),
per_gram AS (
  SELECT doc_id, n, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, n, g
),
per_level AS (
  SELECT doc_id, n,
         SUM(cnt) AS total,
         COUNT(*) AS n_distinct,
         MAX(cnt) AS top_cnt,
         SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_cnt
  FROM per_gram GROUP BY doc_id, n
)
SELECT doc_id,
       CAST(MAX(CASE WHEN n = 1 THEN total END) AS BIGINT) AS n_words,
       {sql_round_half_up(
           "CAST(MAX(CASE WHEN n = 1 THEN total END)"
           " - MAX(CASE WHEN n = 1 THEN n_distinct END) AS DOUBLE)"
           " / MAX(CASE WHEN n = 1 THEN total END)", 4)} AS dup_word_ratio,
       {sql_round_half_up(
           "CAST(COALESCE(MAX(CASE WHEN n = 2 THEN top_cnt END), 0) AS DOUBLE)"
           " / GREATEST(COALESCE(MAX(CASE WHEN n = 2 THEN total END), 0), 1)", 4)}
         AS top_bigram_share,
       {sql_round_half_up(
           "CAST(COALESCE(MAX(CASE WHEN n = 2 THEN dup_cnt END), 0) AS DOUBLE)"
           " / GREATEST(COALESCE(MAX(CASE WHEN n = 2 THEN total END), 0), 1)", 4)}
         AS dup_bigram_frac,
       {sql_round_half_up(
           "CAST(COALESCE(MAX(CASE WHEN n = 3 THEN dup_cnt END), 0) AS DOUBLE)"
           " / GREATEST(COALESCE(MAX(CASE WHEN n = 3 THEN total END), 0), 1)", 4)}
         AS dup_trigram_frac
FROM per_level
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

# Dialect-portable patterns: no backreferences/lookarounds, so Java
# regex (Spark) and RE2 (DuckDB) agree on every match.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_URL = "https?://[^ ]+"
_PII_NUM = "[0-9]{2,}"


def pii_scrub(df: DataFrame, col: str, patterns: dict[str, str]) -> DataFrame:
    """Redact every PII pattern in ``col`` (global replace with
    ``<LABEL>`` placeholders) and annotate per-row match counts.

    One projection, zero shuffles: `regexp_replace` and
    `regexp_extract_all` are JVM codegen expressions, so scrubbing is
    a map-only pass that runs at scan speed — the right shape for a
    100 TB corpus wash. Returns the original frame plus
    `<col>_clean` and `pii_hits_<label>` columns.
    """
    out = df
    clean = F.col(col)
    for label, pat in patterns.items():
        out = out.withColumn(
            f"pii_hits_{label}",
            F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0))),
        )
        clean = F.regexp_replace(clean, pat, f"<{label.upper()}>")
    return out.withColumn(f"{col}_clean", clean)


def pii_scrub_summary(docs: DataFrame, events: DataFrame) -> DataFrame:
    """Corpus-level PII audit: per dataset, how many rows carry a
    match, total matches, and the net character delta after
    redaction. Two map-only passes + two 1-row aggregates."""
    d = pii_scrub(docs, "text", {"email": _PII_EMAIL, "url": _PII_URL})
    d_sum = d.agg(
        F.lit("documents").alias("dataset"),
        F.count("*").alias("n_rows"),
        F.sum(
            ((F.col("pii_hits_email") + F.col("pii_hits_url")) > 0).cast("int")
        ).alias("n_rows_hit"),
        F.sum(F.col("pii_hits_email") + F.col("pii_hits_url")).alias("n_matches"),
        F.sum(F.length("text_clean") - F.length("text")).alias("chars_delta"),
    )
    e = pii_scrub(events, "props", {"num": _PII_NUM})
    e_sum = e.agg(
        F.lit("events_props").alias("dataset"),
        F.count("*").alias("n_rows"),
        F.sum((F.col("pii_hits_num") > 0).cast("int")).alias("n_rows_hit"),
        F.sum(F.col("pii_hits_num")).alias("n_matches"),
        F.sum(F.length("props_clean") - F.length("props")).alias("chars_delta"),
    )
    return d_sum.unionByName(e_sum).orderBy("dataset")


def q_pii_scrub_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    events = read_table(spark, sf_dir, "events")
    return pii_scrub_summary(docs, events)


ORACLE_PII = f"""
WITH d AS (
  SELECT text,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS h_email,
         len(regexp_extract_all(text, '{_PII_URL}')) AS h_url,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                        '{_PII_URL}', '<URL>', 'g') AS clean
  FROM documents
),
e AS (
  SELECT props,
         len(regexp_extract_all(props, '{_PII_NUM}')) AS h_num,
         regexp_replace(props, '{_PII_NUM}', '<NUM>', 'g') AS clean
  FROM events
)
SELECT * FROM (
  SELECT 'documents' AS dataset,
         COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN h_email + h_url > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rows_hit,
         CAST(SUM(h_email + h_url) AS BIGINT) AS n_matches,
         CAST(SUM(len(clean) - len(text)) AS BIGINT) AS chars_delta
  FROM d
  UNION ALL
  SELECT 'events_props', COUNT(*),
         CAST(SUM(CASE WHEN h_num > 0 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(h_num) AS BIGINT),
         CAST(SUM(len(clean) - len(props)) AS BIGINT)
  FROM e
)
ORDER BY dataset
"""


# ---------------------------------------------------------------------------
# Temperature-weighted source mixing
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.5
_MIX_BUDGET_FRAC = 0.3


def mix_weights(
    docs: DataFrame, alpha: float = _MIX_ALPHA, budget_frac: float = _MIX_BUDGET_FRAC
) -> DataFrame:
    """Temperature-weighted mixture over sources: sampling weight
    ∝ n_tokens^alpha (alpha<1 upweights small sources — the standard
    multilingual/multi-source rebalancing), plus the per-source epoch
    factor implied by a token budget of ``budget_frac`` × corpus.

    Scale shape: one scan → groupBy(source) (tiny result) → 1-row
    totals broadcast back. The weights table is what a downstream
    deterministic sampler (operators/sampling.py) consumes as its
    per-stratum fraction — together they form the mixing stage of a
    training-data pipeline without any driver-side state.
    """
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    weighted = per_source.withColumn("w_raw", w)
    totals = weighted.agg(
        F.sum("w_raw").alias("w_sum"),
        F.sum("n_tokens").alias("tok_sum"),
    )
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            round_half_up(F.col("w_raw") / F.col("w_sum"), 6).alias("mix_weight"),
            round_half_up(
                (F.col("w_raw") / F.col("w_sum"))
                * (F.col("tok_sum").cast("double") * F.lit(budget_frac))
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("epochs"),
        )
        .orderBy("source")
    )


def q_corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return mix_weights(docs)


_WF_BUDGET_FRAC = 0.5  # waterfill budget as a fraction of corpus tokens


def waterfill_allocation(
    docs: DataFrame, budget_frac: float = _WF_BUDGET_FRAC
) -> DataFrame:
    """Max-min fair (water-filling) token allocation across sources —
    the budget split that maximizes the minimum per-source share: the
    temperature mix (:func:`mix_weights`) proposes proportional
    weights, this operator answers the complementary planning
    question "given budget B, how many tokens may each source
    contribute so no source is starved while none exceeds what it
    has". Small sources are taken whole; the rest share the remaining
    budget at a common water level.

    EXACT INTEGER waterfill (no float level): sources sorted by
    (n_tokens ASC, source) — source i is FULL iff
    prefix(i−1) + n_i·(m−i+1) ≤ B (the standard level test; fulls
    form a prefix of the sort order because the LHS is nondecreasing
    in i). With j fulls consuming P tokens, the m−j partial sources
    get floor((B−P)/(m−j)) each and the first (B−P) mod (m−j) of
    them (in the same sort order) one extra token, so
    Σ allocated == min(B, total) EXACTLY — the remainder-distribution
    convention every engine reproduces bit-for-bit, where any
    float-level spelling would be one ulp from flipping a floor.

    Returns (``source``, ``n_tokens``, ``allocated``, ``is_full``)
    ordered by source. Scale shape: one scan → groupBy(source); all
    waterfill arithmetic (windows, prefix sums, the j/P fold) runs on
    the |sources|-row BOUNDED frame, broadcast back as one row.
    """
    from pyspark.sql import Window

    per_source = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy("n_tokens", "source")
    m_w = Window.partitionBy()
    ranked = per_source.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("i"),
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("prefix_excl"),
        F.count(F.lit(1)).over(m_w).alias("m"),
        F.sum("n_tokens").over(m_w).alias("total"),
    ).select(
        "*",
        F.floor(F.col("total") * F.lit(budget_frac)).cast("long").alias("B"),
    ).select(
        "*",
        (
            F.coalesce("prefix_excl", F.lit(0))
            + F.col("n_tokens") * (F.col("m") - F.col("i") + 1)
            <= F.col("B")
        ).alias("is_full"),
    )
    fold = ranked.agg(
        F.sum(F.col("is_full").cast("long")).alias("j"),
        F.sum(F.when(F.col("is_full"), F.col("n_tokens")).otherwise(0)).alias("P"),
    )
    out = ranked.crossJoin(F.broadcast(fold)).select(
        "source",
        "n_tokens",
        "is_full",
        F.when(F.col("is_full"), F.col("n_tokens"))
        .otherwise(
            F.least(
                F.col("n_tokens"),
                # integer `div`, not `/`-then-cast: the double quotient
                # loses exactness past 2^53, which production token
                # totals can reach
                F.expr("(B - P) div (m - j)")
                + (
                    (F.col("i") - F.col("j"))
                    <= F.pmod(F.col("B") - F.col("P"), F.col("m") - F.col("j"))
                ).cast("long"),
            )
        )
        .cast("long")
        .alias("allocated"),
    )
    return out.select("source", "n_tokens", "allocated", "is_full").orderBy("source")


def q_corpus_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return waterfill_allocation(read_table(spark, sf_dir, "documents"))


def _oracle_waterfill() -> str:
    return f"""
WITH per_source AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
ranked AS (
  SELECT source, n_tokens,
         CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, source) AS BIGINT) AS i,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY n_tokens, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS prefix_excl,
         CAST(COUNT(*) OVER () AS BIGINT) AS m,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
  FROM per_source
),
flagged AS (
  SELECT *,
         CAST(FLOOR(total * {_WF_BUDGET_FRAC!r}) AS BIGINT) AS B,
         (prefix_excl + n_tokens * (m - i + 1)
            <= CAST(FLOOR(total * {_WF_BUDGET_FRAC!r}) AS BIGINT)) AS is_full
  FROM ranked
),
fold AS (
  SELECT CAST(SUM(CASE WHEN is_full THEN 1 ELSE 0 END) AS BIGINT) AS j,
         CAST(SUM(CASE WHEN is_full THEN n_tokens ELSE 0 END) AS BIGINT) AS P
  FROM flagged
)
SELECT source, n_tokens,
       CAST(CASE WHEN is_full THEN n_tokens
            ELSE least(n_tokens,
                       (B - P) // (m - j)
                       + CASE WHEN (i - j) <= (B - P) % (m - j)
                              THEN 1 ELSE 0 END)
            END AS BIGINT) AS allocated,
       is_full
FROM flagged CROSS JOIN fold
ORDER BY source
"""


ORACLE_MIX = f"""
WITH per_source AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
weighted AS (
  SELECT *, POWER(CAST(n_tokens AS DOUBLE), {_MIX_ALPHA!r}) AS w_raw FROM per_source
),
totals AS (
  SELECT SUM(w_raw) AS w_sum, SUM(n_tokens) AS tok_sum FROM weighted
)
SELECT source, n_docs, n_tokens,
       {sql_round_half_up("w_raw / w_sum", 6)} AS mix_weight,
       {sql_round_half_up(
           "(w_raw / w_sum) * (CAST(tok_sum AS DOUBLE) * " + repr(_MIX_BUDGET_FRAC)
           + ") / CAST(n_tokens AS DOUBLE)", 6)} AS epochs
FROM weighted, totals
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Curriculum / quality-decile binning
# ---------------------------------------------------------------------------

_N_DECILES = 10


def quality_deciles(docs: DataFrame, k: int = _N_DECILES) -> DataFrame:
    """Curriculum binning: rank every document by its composite
    quality score and split the corpus into ``k`` equal-depth bins
    (NTILE semantics — the first ``n mod k`` bins get one extra row),
    then summarize each bin. This is the standard shape behind
    quality-threshold ablations and curriculum schedules ("train on
    deciles 8-10 first").

    Scale shape: a naive ``NTILE(k) OVER (ORDER BY score)`` plans ONE
    single-partition global sort — the canonical 100 TB killer. Here
    the global rank comes from functions/ranking.global_row_number
    (range-bucketed, every stage distributed) and the NTILE bucket is
    recovered arithmetically by functions/ranking.ntile_from_rank —
    the same pairing the RFM quintiles ride (queries/corpus.py),
    verified against the DuckDB oracle's literal NTILE.

    Ties on the (rounded) score are broken by ``doc_id`` so the
    ranking is a total order on both engines. The per-bin mean goes
    through an integer basis-point sum (``floor(score*1e4 + 0.5)``)
    because a float SUM is association-order-dependent — the integer
    sum is exact, and one double division at the end is IEEE
    correctly-rounded on both engines.
    """
    from ..functions.ranking import global_row_number, ntile_from_rank
    from ..runtime import track_persist
    from .text import text_profile

    # n via the BASE table (parquet metadata count — text_profile is
    # row-preserving, so the counts are equal and the regex-heavy
    # profile isn't executed just to count). The profile itself feeds
    # global_row_number's sample + rank passes plus the final agg, so
    # persist it once.
    n = docs.count()
    prof = track_persist(
        text_profile(docs)
        .select("doc_id", "quality_score", "n_tokens_bpe")
        .persist()
    )
    # NULL placement pinned explicitly (NULLS LAST on both engines):
    # a NULL/empty-text doc has NULL quality_score (div-by-zero), and
    # Spark's ascending sort puts NULLs FIRST while DuckDB's NTILE
    # ORDER BY puts them LAST — ranking on COALESCE(score, +inf) makes
    # the total order identical (scores are bounded, so +inf is free).
    null_last = F.coalesce(F.col("quality_score"), F.lit(float("inf")))
    ranked = global_row_number(
        prof, [null_last, "doc_id"], alias="__rk", n_rows=n
    )
    decile = ntile_from_rank(F.col("__rk"), n, k).cast("long")
    bp = F.floor(F.col("quality_score") * 10000 + F.lit(0.5)).cast("long")
    return (
        ranked.select(
            decile.alias("decile"),
            "quality_score",
            "n_tokens_bpe",
            bp.alias("__bp"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_half_up(
                F.sum("__bp").cast("double") / F.count(F.lit(1)) / 10000.0, 6
            ).alias("avg_quality"),
            F.min("quality_score").alias("min_quality"),
            F.max("quality_score").alias("max_quality"),
            F.sum("n_tokens_bpe").alias("total_tokens_bpe"),
        )
        .orderBy("decile")
    )


def q_corpus_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_deciles(read_table(spark, sf_dir, "documents"))


def _deciles_oracle() -> str:
    from .text import _P_QUALITY, _TOKEN_RE

    return f"""
WITH prof AS (
  SELECT doc_id,
         {_P_QUALITY} AS quality_score,
         len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_tokens_bpe
  FROM documents
),
ranked AS (
  SELECT *, NTILE({_N_DECILES}) OVER (
    ORDER BY COALESCE(quality_score, CAST('infinity' AS DOUBLE)), doc_id
  ) AS decile
  FROM prof
)
SELECT decile, COUNT(*) AS n_docs,
       {sql_round_half_up(
           "CAST(SUM(CAST(FLOOR(quality_score * 10000 + 0.5) AS BIGINT)) AS DOUBLE)"
           " / COUNT(*) / 10000.0",
           6,
       )} AS avg_quality,
       MIN(quality_score) AS min_quality,
       MAX(quality_score) AS max_quality,
       CAST(SUM(n_tokens_bpe) AS BIGINT) AS total_tokens_bpe
FROM ranked GROUP BY decile ORDER BY decile
"""


ORACLE_DECILES = _deciles_oracle()


# ---------------------------------------------------------------------------
# Token-budget corpus selection
# ---------------------------------------------------------------------------

_BUDGET_FRACTION = 0.5


def token_budget_selection(
    docs: DataFrame,
    fraction: float = _BUDGET_FRACTION,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Greedy quality-first selection under a token budget — the
    "best N tokens" cut every pretraining data plan starts from: rank
    docs by quality (best first), keep taking until the running token
    total reaches ``fraction`` of the corpus, report the per-source
    composition of the kept set (how the cut reshapes the mix).

    A doc is kept iff the EXCLUSIVE running sum of tokens before it is
    under budget — the standard greedy knapsack relaxation. The
    running sum is functions/ranking.global_running_sum (range-
    bucketed, exact BIGINT prefix sums) — never a single-partition
    ``SUM OVER (ORDER BY …)``. NULL-quality docs rank last
    (COALESCE(score, -inf), the deciles NULLS-LAST pin) and NULL
    token counts coalesce to 0, so degenerate docs can never abort
    the plan or diverge across engines.

    Scale shape: one profile scan, the running-sum machinery (sample
    + per-bucket window), a 1-row broadcast of the total, and a
    per-source agg — no driver-side data beyond bucket metadata.

    ``token_counts`` (round-13): an optional (``doc_id``,
    ``n_tokens``) frame — e.g. the EXACT counts from
    bpe.bpe_token_counts — replacing the profile's regex-token proxy
    for the budget arithmetic (quality ranking still comes from the
    profile). Missing doc_ids coalesce to 0 tokens, exactly as NULL
    proxy counts do. The registered gate entry stays on the proxy;
    the exact-count composition is pytest-asserted.
    """
    from ..functions.ranking import global_running_sum
    from ..runtime import track_persist
    from .text import text_profile

    prof = text_profile(docs).join(docs.select("doc_id", "source"), "doc_id")
    if token_counts is not None:
        prof = prof.drop("n_tokens_bpe").join(
            token_counts.select(
                "doc_id", F.col("n_tokens").cast("long").alias("n_tokens_bpe")
            ),
            "doc_id",
            "left",
        )
    prof = track_persist(
        prof.select(
            "doc_id",
            "source",
            F.coalesce("quality_score", F.lit(float("-inf"))).alias("__q"),
            F.coalesce("n_tokens_bpe", F.lit(0)).cast("long").alias("__tok"),
        )
        .persist()
    )
    total = prof.agg(F.sum("__tok").alias("__total"))
    cum = global_running_sum(
        prof, [("__q", False), "doc_id"], "__tok", alias="__cum", exclusive=True
    )
    kept = cum.crossJoin(F.broadcast(total)).where(
        F.col("__cum") < F.col("__total") * F.lit(fraction)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_selected"),
            F.sum("__tok").alias("tokens_selected"),
        )
        .orderBy("source")
    )


def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_selection(read_table(spark, sf_dir, "documents"))


def _token_budget_oracle() -> str:
    from .text import _P_QUALITY, _TOKEN_RE

    return f"""
WITH prof AS (
  SELECT doc_id, source,
         COALESCE({_P_QUALITY}, CAST('-infinity' AS DOUBLE)) AS q,
         CAST(COALESCE(len(regexp_extract_all(text, '{_TOKEN_RE}')), 0) AS BIGINT) AS tok
  FROM documents
),
tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS total FROM prof),
cum AS (
  SELECT doc_id, source, tok,
         CAST(COALESCE(SUM(tok) OVER (
           ORDER BY q DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
  FROM prof
)
SELECT source, COUNT(*) AS n_docs_selected, CAST(SUM(tok) AS BIGINT) AS tokens_selected
FROM cum CROSS JOIN tot
WHERE c < total * {_BUDGET_FRACTION}
GROUP BY source ORDER BY source
"""


ORACLE_TOKEN_BUDGET = _token_budget_oracle()


def q_corpus_token_budget_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The budget selection driven by the EXACT apply-step token
    counts (bpe.bpe_token_counts) instead of the profile's regex-token
    proxy — the driver-attested completion of the BPE integration
    (quality ranking still comes from the profile; only the budget
    arithmetic changes). The oracle composes the full BPE recursive
    CTE chain with the budget window, so one value hash attests
    tokenizer AND selection together."""
    from .bpe import _bpe_counts_frame

    docs = read_table(spark, sf_dir, "documents")
    tc = _bpe_counts_frame(docs).select(
        "doc_id", F.col("n_tokens_bpe").alias("n_tokens")
    )
    return token_budget_selection(docs, token_counts=tc)


def _token_budget_exact_oracle() -> str:
    from .bpe import _BPE_COUNT_CTES
    from .text import _P_QUALITY

    return f"""
WITH RECURSIVE {_BPE_COUNT_CTES},
prof AS (
  SELECT d.doc_id, d.source,
         COALESCE({_P_QUALITY}, CAST('-infinity' AS DOUBLE)) AS q,
         CAST(COALESCE(c.n_tokens_bpe, 0) AS BIGINT) AS tok
  FROM documents d LEFT JOIN bpecounts c ON c.doc_id = d.doc_id
),
tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS total FROM prof),
cum AS (
  SELECT doc_id, source, tok,
         CAST(COALESCE(SUM(tok) OVER (
           ORDER BY q DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
  FROM prof
)
SELECT source, COUNT(*) AS n_docs_selected, CAST(SUM(tok) AS BIGINT) AS tokens_selected
FROM cum CROSS JOIN tot
WHERE c < total * {_BUDGET_FRACTION}
GROUP BY source ORDER BY source
"""


QUERIES = {
    "corpus_token_budget_exact": q_corpus_token_budget_exact,
    "text_bm25": q_text_bm25,
    "text_repetition_profile": q_text_repetition_profile,
    "pii_scrub_summary": q_pii_scrub_summary,
    "corpus_mix_weights": q_corpus_mix_weights,
    "corpus_waterfill": q_corpus_waterfill,
    "corpus_quality_deciles": q_corpus_quality_deciles,
    "corpus_token_budget": q_corpus_token_budget,
}

ORACLES = {
    "corpus_token_budget_exact": _token_budget_exact_oracle(),
    "text_bm25": ORACLE_BM25,
    "text_repetition_profile": ORACLE_REPETITION,
    "pii_scrub_summary": ORACLE_PII,
    "corpus_mix_weights": ORACLE_MIX,
    "corpus_waterfill": _oracle_waterfill(),
    "corpus_quality_deciles": ORACLE_DECILES,
    "corpus_token_budget": ORACLE_TOKEN_BUDGET,
}
