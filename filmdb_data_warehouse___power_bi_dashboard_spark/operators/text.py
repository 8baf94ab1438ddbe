"""Text analysis over the ``documents`` table: language ID (marker-
word heuristic), quality scoring, token counting (whitespace + a
BPE-ish regex), and canonical document fingerprinting.

Everything is built-in Column expressions — no Python UDF anywhere —
so the whole profile runs inside whole-stage codegen in one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

# Marker-word sets per language for the n-gram/stopword heuristic.
# Fixed precedence order breaks score ties deterministically.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "est", "que"],
}
_LANG_ORDER = ["en", "es", "de", "fr"]

# The BPE-ish token regex: word pieces, digit runs, or single
# non-space symbols — a coarse stand-in for byte-pair pretokenization.
_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

_EN_STOP = _LANG_MARKERS["en"]


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


def _marker_hits(words, lang: str):
    """Occurrences (with repeats) of the language's marker words."""
    markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(markers, w)))


def _detect_expr(words):
    """lang_detected as ONE composable Column: the marker-hit array is
    bound once (similarity._bind — evaluate-once HOF lambda variable)
    so the argmax+tie-break chain doesn't re-plan the four filters."""
    from .similarity import _bind

    hits = F.array(*[_marker_hits(words, lg) for lg in _LANG_ORDER])

    def pick(h):
        best = F.array_max(h)
        d = F.when(best == 0, F.lit("und"))
        for i, lg in enumerate(_LANG_ORDER):
            d = d.when(F.element_at(h, i + 1) == best, F.lit(lg))
        return d

    return _bind(hits, pick)


def language_id(docs: DataFrame) -> DataFrame:
    """Detected language = argmax marker-hit count, ties broken by
    the fixed _LANG_ORDER precedence, 'und' when nothing matches."""
    words = _words()
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        _detect_expr(words).alias("lang_detected"),
    )


def _quality_expr(words):
    """Composite quality score in [0,1] as one composable Column:
    long enough, low punctuation noise, some but not all stopwords —
    each clause in [0,1], averaged."""
    n_ws = F.size(words)
    n_chars = F.length("text")
    stop = F.array(*[F.lit(m) for m in _EN_STOP])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0))
    # try_divide, not '/': ANSI mode errors on x/0, but an empty/NULL
    # text must yield a NULL score (DuckDB's div-by-zero semantics) so
    # degenerate docs flow to the NULLS-LAST decile, not a job abort.
    stop_ratio = F.try_divide(n_stop.cast("double"), n_ws)
    punct_ratio = F.try_divide(n_punct.cast("double"), n_chars)
    q_len = F.least(n_ws.cast("double") / F.lit(20.0), F.lit(1.0))
    q_punct = F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))
    q_stop = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.3))
    return (q_len + q_punct + q_stop) / F.lit(3.0)


def text_profile(docs: DataFrame) -> DataFrame:
    """Per-document quality profile: token counts (whitespace and
    BPE-ish), char stats, stopword/punct ratios, mean word length,
    and a composite quality score in [0,1]."""
    words = _words()
    n_ws = F.size(words)
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
    n_chars = F.length("text")
    stop = F.array(*[F.lit(m) for m in _EN_STOP])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0))
    mean_wlen = F.try_divide((n_chars - (n_ws - 1)).cast("double"), n_ws)
    stop_ratio = F.try_divide(n_stop.cast("double"), n_ws)
    punct_ratio = F.try_divide(n_punct.cast("double"), n_chars)
    quality = _quality_expr(words)
    return docs.select(
        "doc_id",
        n_ws.alias("n_tokens_ws"),
        n_bpe.alias("n_tokens_bpe"),
        n_chars.alias("n_chars"),
        round_half_up(mean_wlen, 4).alias("mean_word_len"),
        round_half_up(stop_ratio, 4).alias("stopword_ratio"),
        # Empty text: 0 punct chars over 0 chars is defined as ratio 0
        # (try_divide yields NULL, which the driver comparator cannot
        # represent in a double column — round-8 pathological audit).
        F.coalesce(round_half_up(punct_ratio, 4), F.lit(0.0)).alias("punct_ratio"),
        round_half_up(quality, 4).alias("quality_score"),
    )


def _fp_expr(words=None):
    """THE canonical-fingerprint expression (md5 over the sorted
    distinct token set). Single definition — fingerprints(),
    corpus_curation, and pipeline_funnel must stay fingerprint-
    compatible, and a drifted hand-copy would silently break the
    funnel's stage-parity contract."""
    w = _words() if words is None else words
    return F.md5(F.array_join(F.sort_array(F.array_distinct(w)), " "))


# The DuckDB twin of _fp_expr — used by every oracle that fingerprints.
_SQL_FP = (
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"
)


def fingerprints(docs: DataFrame) -> DataFrame:
    """Canonical fingerprint: md5 over the sorted distinct token set —
    invariant to token order and repetition (catches shuffled/
    re-sampled copies that exact hashing misses)."""
    return docs.select("doc_id", _fp_expr().alias("fingerprint"))


def fingerprint_clusters(docs: DataFrame) -> DataFrame:
    return (
        fingerprints(docs)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("nb_docs"))
        .filter(F.col("nb_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return language_id(docs).orderBy("doc_id")


def _sql_hits(lang: str) -> str:
    arr = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> list_contains([{arr}], w)))"


_SQL_BEST = "greatest(" + ", ".join(f"s_{lg}" for lg in _LANG_ORDER) + ")"
_SQL_DETECT = "CASE WHEN " + _SQL_BEST + " = 0 THEN 'und' " + " ".join(
    f"WHEN s_{lg} = {_SQL_BEST} THEN '{lg}'" for lg in _LANG_ORDER
) + " END"

ORACLE_LANGUAGE_ID = f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_declared,
         {", ".join(f"{_sql_hits(lg)} AS s_{lg}" for lg in _LANG_ORDER)}
  FROM documents
)
SELECT doc_id, lang_declared, {_SQL_DETECT} AS lang_detected
FROM scored ORDER BY doc_id
"""


def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: detected vs declared language,
    with each cell's share of its declared-language row — the accuracy
    evidence for the n-gram langid heuristic, as a queryable table
    instead of a one-off eval script. The share window runs over the
    AGGREGATED |langs|² frame (bounded domain), never the corpus."""
    docs = read_table(spark, sf_dir, "documents")
    cells = (
        language_id(docs)
        .groupBy("lang_declared", "lang_detected")
        .agg(F.count("*").alias("n_docs"))
    )
    w = Window.partitionBy("lang_declared")
    return (
        cells.withColumn(
            "row_share",
            round_half_up(
                F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 4
            ),
        )
        .orderBy("lang_declared", "lang_detected")
    )


ORACLE_LANGID_CONFUSION = f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_declared,
         {", ".join(f"{_sql_hits(lg)} AS s_{lg}" for lg in _LANG_ORDER)}
  FROM documents
),
cells AS (
  SELECT lang_declared, {_SQL_DETECT} AS lang_detected,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM scored GROUP BY 1, 2
)
SELECT lang_declared, lang_detected, n_docs,
       {sql_round_half_up(
           "CAST(n_docs AS DOUBLE)"
           " / CAST(SUM(n_docs) OVER (PARTITION BY lang_declared) AS DOUBLE)", 4)}
       AS row_share
FROM cells
ORDER BY lang_declared, lang_detected
"""


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-text docs have no profile (every count would be NULL — and
    # a NULL in an int output column is unrepresentable under the
    # driver comparator); dropped on both engines (round-8).
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return text_profile(docs).orderBy("doc_id")


_STOP_ARR = ", ".join(f"'{m}'" for m in _EN_STOP)
_P_MEAN_WLEN = sql_round_half_up(
    "CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)"
    " / len(string_split(text,' '))",
    4,
)
_P_STOP = sql_round_half_up(
    f"CAST(len(list_filter(string_split(text,' '), w -> list_contains([{_STOP_ARR}], w))) AS DOUBLE)"
    " / len(string_split(text,' '))",
    4,
)
_P_PUNCT = "COALESCE(" + sql_round_half_up(
    "CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / length(text)", 4
) + ", 0.0)"
_P_QUALITY = sql_round_half_up(
    "(least(CAST(len(string_split(text,' ')) AS DOUBLE) / 20.0, 1.0)"
    " + (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)"
    "                / length(text) * 10.0, 1.0))"
    f" + (1.0 - abs(CAST(len(list_filter(string_split(text,' '), w -> list_contains([{_STOP_ARR}], w))) AS DOUBLE)"
    "              / len(string_split(text,' ')) - 0.3))) / 3.0",
    4,
)

ORACLE_TEXT_PROFILE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens_ws,
       len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_tokens_bpe,
       length(text) AS n_chars,
       {_P_MEAN_WLEN} AS mean_word_len,
       {_P_STOP} AS stopword_ratio,
       {_P_PUNCT} AS punct_ratio,
       {_P_QUALITY} AS quality_score
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""


def q_text_fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return fingerprint_clusters(docs).orderBy("fingerprint")


ORACLE_FINGERPRINT = f"""
SELECT {_SQL_FP}
         AS fingerprint,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS nb_docs
FROM documents
GROUP BY 1
HAVING COUNT(*) >= 2
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Full-text search approximation (the reference's tsvector column +
# GiST index, filmdb.sql:143/47576 — SURVEY §2.8 F12): tokenized
# arrays + containment, ranked by term frequency. No index structure
# exists in Spark; at scale the analog is a pre-tokenized array
# column + partition/file pruning on any leading filter.
# ---------------------------------------------------------------------------

_SEARCH_TERMS = ["spark", "join", "stream"]


def full_text_search(docs: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ALL terms (tsquery `a & b & c` semantics),
    ranked by total term frequency (ts_rank approximation)."""
    words = _words()

    def _eq(term: str):
        # Closure factory: a default-arg lambda would read as 2-ary
        # to the higher-order binder (index overload).
        return lambda w: w == F.lit(term)

    cond = None
    score = None
    for t in terms:
        has = F.array_contains(words, t)
        cond = has if cond is None else (cond & has)
        freq = F.size(F.filter(words, _eq(t)))
        score = freq if score is None else (score + freq)
    return (
        docs.filter(cond)
        .select("doc_id", "lang", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def q_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return full_text_search(docs, _SEARCH_TERMS)


_SQL_FREQ = " + ".join(
    f"len(list_filter(string_split(text, ' '), w -> w = '{t}'))" for t in _SEARCH_TERMS
)
_SQL_HAS = " AND ".join(
    f"list_contains(string_split(text, ' '), '{t}')" for t in _SEARCH_TERMS
)

ORACLE_TEXT_SEARCH = f"""
SELECT doc_id, lang, {_SQL_FREQ} AS score
FROM documents
WHERE {_SQL_HAS}
ORDER BY score DESC, doc_id ASC
"""


def corpus_curation(
    docs: DataFrame, min_quality: float = 0.5, langs: tuple[str, ...] = ("en",)
) -> DataFrame:
    """End-to-end corpus curation — the composed filter a training-data
    pipeline runs before tokenization: keep documents that (a) are the
    canonical copy of their content (exact-dedup keeper = lowest
    doc_id per token-set fingerprint), (b) detect as one of ``langs``,
    and (c) clear the quality bar.

    Single-scan design: language, quality, and fingerprint are all
    Column expressions (reused from language_id / text_profile /
    fingerprints via _detect_expr/_quality_expr), so the whole
    enrichment is ONE projection over one scan; the only shuffle is
    the fingerprint window for the keeper rule. The naive spelling —
    join the three operator outputs on doc_id — costs three scans and
    two doc_id shuffles for the same answer; composition-by-expression
    is the scale win of keeping analyses as Columns rather than
    materialized frames.

    The cheap predicates (lang, quality) can't be applied before the
    keeper window (a discarded duplicate must still claim keeper-ship
    for its group — semantics: dedup THEN filter), so the window runs
    over the full corpus; at 100 TB the fingerprint groupBy-join
    variant with an early lang prefilter is the dial if dedup-scope =
    per-language is acceptable.
    """
    words = _words()
    enriched = docs.select(
        "doc_id",
        _detect_expr(words).alias("lang_detected"),
        round_half_up(_quality_expr(words), 4).alias("quality_score"),
        F.size(words).alias("n_tokens"),
        _fp_expr(words).alias("__fp"),
    )
    w = Window.partitionBy("__fp")
    return (
        enriched.withColumn("__keeper", F.min("doc_id").over(w))
        .filter(
            (F.col("doc_id") == F.col("__keeper"))
            & F.col("lang_detected").isin(list(langs))
            & (F.col("quality_score") >= min_quality)
        )
        .select("doc_id", "lang_detected", "n_tokens", "quality_score")
        .orderBy("doc_id")
    )


def vocabulary(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """Corpus vocabulary: per-token document frequency (df) and total
    term frequency (tf), top ``top_n`` tokens by df — the
    vocabulary-building / stop-list-mining pass of a training-data
    pipeline (its df column is also exactly the statistic the Jaccard
    ``max_df`` dial and an IDF weighting consume).

    One explode + one groupBy: tf = COUNT(*) over all occurrences,
    df = COUNT(DISTINCT doc_id) — partial aggregation shrinks the
    exploded stream map-side, so the shuffle carries (token, partial)
    rows, not one row per occurrence. Top-k via the sort-limit
    TakeOrderedAndProject pattern, total-ordered (df desc, tf desc,
    token asc) so LIMIT is deterministic.
    """
    return (
        docs.select("doc_id", F.explode(_words()).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("token"))
        .limit(top_n)
    )


def q_text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return vocabulary(docs, top_n=100)


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return corpus_curation(docs, min_quality=0.5, langs=("en",))


ORACLE_VOCABULARY = """
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS tf,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY df DESC, tf DESC, token ASC
LIMIT 100
"""


ORACLE_CURATION = f"""
WITH scored AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         {", ".join(f"{_sql_hits(lg)} AS s_{lg}" for lg in _LANG_ORDER)},
         {_P_QUALITY} AS quality_score,
         {_SQL_FP}
           AS fp
  FROM documents
),
enriched AS (
  SELECT doc_id, n_tokens, quality_score, fp,
         {_SQL_DETECT} AS lang_detected,
         MIN(doc_id) OVER (PARTITION BY fp) AS keeper
  FROM scored
)
SELECT doc_id, lang_detected, n_tokens, quality_score
FROM enriched
WHERE doc_id = keeper AND lang_detected IN ('en') AND quality_score >= 0.5
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Readability scoring (Flesch-style reading ease)
# ---------------------------------------------------------------------------

_SENT_RE = "[.!?]+"
_SYL_RE = "[aeiouy]+"
# Flesch reading-ease constants; the products with the two ratios are
# single-literal-times-double on both engines (no decimal-times-
# decimal folding hazard — see the Wilson-bound lesson).
_FL_BASE, _FL_WPS, _FL_SPW = 206.835, 1.015, 84.6


def readability(docs: DataFrame) -> DataFrame:
    """Flesch-style reading-ease score per document: sentence length
    and syllable density, with syllables approximated by vowel-group
    runs (the standard no-dictionary proxy) — a curation signal that
    separates prose from boilerplate/code soup, complementing the
    punctuation/stopword quality score in text_profile.

    Sentence count floors at 1 (a fragment without terminal
    punctuation is one sentence, and the ratio stays finite). Both
    regexes are in the common Java-regex/RE2 subset, so the counts
    match across engines; the score itself is three IEEE ops on
    exact integer counts.

    Scale shape: pure per-document Column expressions in one scan —
    no shuffle, no UDF, whole-stage codegen.
    """
    n_words = F.size(_words())
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_SENT_RE), 0)), F.lit(1)
    )
    n_syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(_SYL_RE), 0)
    )
    wps = n_words.cast("double") / n_sent
    spw = n_syl.cast("double") / n_words
    flesch = (
        F.lit(_FL_BASE) - F.lit(_FL_WPS) * wps - F.lit(_FL_SPW) * spw
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
        round_half_up(flesch, 4).alias("flesch"),
    ).orderBy("doc_id")


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-text guard: same reasoning as q_text_profile (round-8).
    return readability(
        read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )


ORACLE_READABILITY = f"""
WITH c AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         GREATEST(len(regexp_extract_all(text, '{_SENT_RE}')), 1) AS n_sentences,
         len(regexp_extract_all(lower(text), '{_SYL_RE}')) AS n_syllables
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       {sql_round_half_up(
           f"{_FL_BASE!r}"
           f" - {_FL_WPS!r} * (CAST(n_words AS DOUBLE) / n_sentences)"
           f" - {_FL_SPW!r} * (CAST(n_syllables AS DOUBLE) / n_words)",
           4,
       )} AS flesch
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Curation pipeline funnel (per-stage attrition report)
# ---------------------------------------------------------------------------

def _funnel_stage_names(langs: tuple[str, ...]) -> tuple[str, ...]:
    # The language stage is labeled by what it actually filtered —
    # a funnel run with langs=("fr",) must not report "lang_en".
    return (
        "raw",
        "nonempty",
        "exact_unique",
        "canonical_unique",
        "lang_" + "_".join(langs),
        "quality",
    )


_FUNNEL_STAGES = _funnel_stage_names(("en",))


def pipeline_funnel(
    docs: DataFrame, min_quality: float = 0.5, langs: tuple[str, ...] = ("en",)
) -> DataFrame:
    """The curation pipeline's attrition funnel: how many documents
    survive each stage — raw → nonempty → exact-unique (md5 of the
    text) → canonical-unique (token-set fingerprint, among exact
    survivors) → language filter → quality threshold — with the share
    of the raw corpus remaining. The single report a pipeline owner
    reads before trusting `corpus_curation`'s output ("we dropped 40%
    — WHERE?"). Stage semantics match corpus_curation exactly, so the
    funnel's final count equals that operator's row count.

    Scale shape: flags are computed in ONE enriched projection; the
    two keeper lookups are hash aggregates on 16-byte digests joined
    back (text never shuffles); the funnel itself is a single
    map-side-combined aggregate over the six flag conjunctions,
    exploded into the 6-row report.
    """
    words = _words()
    nonempty = F.col("text").isNotNull() & (F.length("text") > 0)
    base = docs.select(
        "doc_id",
        nonempty.alias("ok1"),
        _detect_expr(words).alias("ld"),
        # quality divides by n_chars — guard the empty-text rows the
        # nonempty stage is about to drop anyway (ANSI div-by-zero).
        F.when(nonempty, round_half_up(_quality_expr(words), 4))
        .otherwise(F.lit(0.0))
        .alias("q"),
        F.md5("text").alias("h"),
        _fp_expr(words).alias("fp"),
    )
    ek = base.filter("ok1").groupBy("h").agg(F.min("doc_id").alias("ekeep"))
    s2 = base.join(ek, "h", "left").withColumn(
        "ok2", F.col("ok1") & (F.col("doc_id") == F.col("ekeep"))
    )
    ck = s2.filter("ok2").groupBy("fp").agg(F.min("doc_id").alias("ckeep"))
    s3 = (
        s2.join(ck, "fp", "left")
        .withColumn("ok3", F.col("ok2") & (F.col("doc_id") == F.col("ckeep")))
        .withColumn("ok4", F.col("ok3") & F.col("ld").isin(*langs))
        .withColumn("ok5", F.col("ok4") & (F.col("q") >= F.lit(min_quality)))
    )
    agg = s3.agg(
        F.count(F.lit(1)).alias("n0"),
        *[
            F.sum(F.coalesce(F.col(f"ok{i}"), F.lit(False)).cast("long")).alias(
                f"n{i}"
            )
            for i in range(1, 6)
        ],
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_no"),
                F.lit(name).alias("stage"),
                F.col(f"n{i}").alias("n_docs"),
            )
            for i, name in enumerate(_funnel_stage_names(langs))
        ]
    )
    return (
        agg.select(F.col("n0").alias("n_raw"), F.explode(stages).alias("s"))
        .select(
            F.col("s.stage_no").alias("stage_no"),
            F.col("s.stage").alias("stage"),
            F.col("s.n_docs").alias("n_docs"),
            round_half_up(
                F.col("s.n_docs").cast("double") / F.col("n_raw") * 100.0, 4
            ).alias("pct_of_raw"),
        )
        .orderBy("stage_no")
    )


def q_corpus_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline_funnel(read_table(spark, sf_dir, "documents"))


def _funnel_oracle() -> str:
    flags = f"""
WITH scored AS (
  SELECT doc_id,
         (text IS NOT NULL AND length(text) > 0) AS ok1,
         {", ".join(f"{_sql_hits(lg)} AS s_{lg}" for lg in _LANG_ORDER)},
         CASE WHEN text IS NOT NULL AND length(text) > 0
              THEN {_P_QUALITY} ELSE 0.0 END AS q,
         md5(text) AS h,
         {_SQL_FP}
           AS fp
  FROM documents
),
s1 AS (SELECT *, {_SQL_DETECT} AS ld FROM scored),
ek AS (SELECT h, MIN(doc_id) AS ekeep FROM s1 WHERE ok1 GROUP BY h),
s2 AS (
  SELECT s1.*, (s1.ok1 AND s1.doc_id = ek.ekeep) AS ok2
  FROM s1 LEFT JOIN ek ON s1.h = ek.h
),
ck AS (SELECT fp, MIN(doc_id) AS ckeep FROM s2 WHERE ok2 GROUP BY fp),
s3 AS (
  SELECT s2.*,
         (s2.ok2 AND s2.doc_id = ck.ckeep) AS ok3
  FROM s2 LEFT JOIN ck ON s2.fp = ck.fp
),
s4 AS (
  SELECT *,
         (ok3 AND ld IN ('en')) AS ok4,
         (ok3 AND ld IN ('en') AND q >= 0.5) AS ok5
  FROM s3
),
agg AS (
  SELECT COUNT(*) AS n0,
         {", ".join(
             "CAST(SUM(CASE WHEN COALESCE(ok%d, FALSE) THEN 1 ELSE 0 END)"
             " AS BIGINT) AS n%d" % (i, i)
             for i in range(1, 6)
         )}
  FROM s4
)"""
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage_no, '{name}' AS stage,"
        f" CAST(n{i} AS BIGINT) AS n_docs,"
        f" {sql_round_half_up(f'CAST(n{i} AS DOUBLE) / n0 * 100.0', 4)}"
        f" AS pct_of_raw FROM agg"
        for i, name in enumerate(_FUNNEL_STAGES)
    )
    return f"{flags}\n{selects}\nORDER BY stage_no"


ORACLE_PIPELINE_FUNNEL = _funnel_oracle()


_KW_SCALE = 1_000_000
_KW_TOP = 5


def keywords_by_source(docs: DataFrame, top_k: int = _KW_TOP) -> DataFrame:
    """Characteristic-term extraction: the top tf-idf keywords of each
    SOURCE — the corpus-card profiling pass ("what is this slice of
    the pile actually about") and the source-level twin of text_bm25's
    per-document ranking.

    idf is over SOURCES (how many of the corpus' slices contain the
    term), so a term every source shares gets idf 0 and drops out —
    stop-structure vanishes without a stop list. The only
    transcendental is ln, integer-scaled at the source
    (``floor(ln(n_sources/df)·1e6)`` — the tf-idf/value_drift
    precedent), so scores are exact BIGINTs: ``score_fp =
    tf · idf_fp``.

    Scale shape: explode + map-side-combined (source, token) counts;
    df aggregates THAT frame onto token keys; the 1-row source count
    broadcasts into the scoring projection; per-source top-k is a
    window over (source) partitions — parallel across sources, never
    a global sort.
    """
    # NULL guards, applied identically on both sides: a NULL-source
    # row would diverge the source count (Spark's distinct-frame
    # count(1) keeps NULL where SQL COUNT(DISTINCT) ignores it) and a
    # NULL text contributes nothing anyway.
    toks = docs.where(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    ).select("source", F.explode(_words()).alias("token"))
    tf = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df_sources"))
    nsrc = toks.select("source").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_sources")
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(nsrc))
        .select(
            "source",
            "token",
            "tf",
            "df_sources",
            F.floor(
                F.log(F.col("n_sources").cast("double") / F.col("df_sources"))
                * F.lit(float(_KW_SCALE))
            )
            .cast("long")
            .alias("idf_fp"),
        )
        .where(F.col("idf_fp") > 0)
        .select(
            "source",
            "token",
            "tf",
            "df_sources",
            (F.col("tf") * F.col("idf_fp")).cast("long").alias("score_fp"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score_fp").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= top_k)
        .select("source", "rnk", "token", "tf", "df_sources", "score_fp")
        .orderBy("source", "rnk")
    )


def q_text_keywords_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return keywords_by_source(read_table(spark, sf_dir, "documents"))


ORACLE_KEYWORDS = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
),
tf AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df_sources FROM tf GROUP BY 1
),
nsrc AS (
  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM toks
),
scored AS (
  SELECT t.source, t.token, t.tf, d.df_sources,
         t.tf * CAST(FLOOR(ln(CAST(n.n_sources AS DOUBLE) / d.df_sources)
                           * {float(_KW_SCALE)!r}) AS BIGINT) AS score_fp
  FROM tf t JOIN df d ON d.token = t.token CROSS JOIN nsrc n
  WHERE CAST(FLOOR(ln(CAST(n.n_sources AS DOUBLE) / d.df_sources)
                   * {float(_KW_SCALE)!r}) AS BIGINT) > 0
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY score_fp DESC, token) AS BIGINT) AS rnk
  FROM scored
)
SELECT source, rnk, token, tf, df_sources, score_fp
FROM ranked WHERE rnk <= {_KW_TOP}
ORDER BY source, rnk
"""


_TPL_TOP = 5
_TPL_SCALE = 10_000


def template_ngrams(docs: DataFrame, top_k: int = _TPL_TOP) -> DataFrame:
    """Per-source template/boilerplate candidates: the word trigrams
    shared by the most documents WITHIN each source — the CCNet-style
    boilerplate-mining pass (crawl pipelines look for the header/
    footer/nav phrases that repeat across one site's pages and strip
    them before training; the same statistic flags licence blurbs and
    scraped-template residue).

    One row per (source, rank): the top-``top_k`` trigrams by
    within-source document frequency, with the share of the source's
    documents containing them (``ratio_fp``, exact 1e-4 integer
    units). Presence is per-document (DISTINCT before counting), so a
    phrase repeated inside one document counts once — template-ness
    is about breadth, not repetition.

    Scale shape: trigram strings are array expressions in the scan
    projection; the per-doc DISTINCT and the (source, gram) count are
    map-side-combined aggregates; the per-source denominator
    aggregates the same base frame; top-k is a window over source
    partitions. Raw text scans once.
    """
    base = (
        docs.where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", F.split("text", " ").alias("l"))
        .where(F.expr("size(l) >= 3"))
    )
    grams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(l) - 2), i -> "
                "concat_ws(' ', element_at(l, i), element_at(l, i + 1),"
                " element_at(l, i + 2)))"
            )
        ).alias("gram"),
    ).distinct()
    df = grams.groupBy("source", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    nd = base.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = df.join(nd, "source").select(
        "source",
        "gram",
        "df_docs",
        "n_docs",
        F.expr(f"(df_docs * {_TPL_SCALE}) div n_docs").cast("long").alias("ratio_fp"),
    )
    w = Window.partitionBy("source").orderBy(F.col("df_docs").desc(), "gram")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= top_k)
        .select("source", "rnk", "gram", "df_docs", "n_docs", "ratio_fp")
        .orderBy("source", "rnk")
    )


def q_text_template_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return template_ngrams(read_table(spark, sf_dir, "documents"))


ORACLE_TEMPLATE_NGRAMS = f"""
WITH base AS (
  SELECT doc_id, source, string_split(text, ' ') AS l
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
eligible AS (SELECT * FROM base WHERE len(l) >= 3),
grams AS (
  SELECT DISTINCT doc_id, source,
         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT) + 1] || ' '
           || l[CAST(i AS INT) + 2] AS gram
  FROM eligible, unnest(range(1, len(l) - 1)) AS t(i)
),
df AS (
  SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS df_docs
  FROM grams GROUP BY 1, 2
),
nd AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM eligible GROUP BY 1
),
ranked AS (
  SELECT d.source, d.gram, d.df_docs, n.n_docs,
         CAST((d.df_docs * {_TPL_SCALE}) // n.n_docs AS BIGINT) AS ratio_fp,
         CAST(ROW_NUMBER() OVER (PARTITION BY d.source
               ORDER BY d.df_docs DESC, d.gram) AS BIGINT) AS rnk
  FROM df d JOIN nd n ON n.source = d.source
)
SELECT source, rnk, gram, df_docs, n_docs, ratio_fp
FROM ranked WHERE rnk <= {_TPL_TOP}
ORDER BY source, rnk
"""


QUERIES = {
    "text_keywords_by_source": q_text_keywords_by_source,
    "text_template_ngrams": q_text_template_ngrams,
    "text_language_id": q_text_language_id,
    "text_langid_confusion": q_text_langid_confusion,
    "text_profile": q_text_profile,
    "text_fingerprint_clusters": q_text_fingerprint_clusters,
    "text_search": q_text_search,
    "text_vocabulary": q_text_vocabulary,
    "corpus_curation": q_corpus_curation,
    "text_readability": q_text_readability,
    "corpus_pipeline_funnel": q_corpus_pipeline_funnel,
}

ORACLES = {
    "text_keywords_by_source": ORACLE_KEYWORDS,
    "text_template_ngrams": ORACLE_TEMPLATE_NGRAMS,
    "text_language_id": ORACLE_LANGUAGE_ID,
    "text_langid_confusion": ORACLE_LANGID_CONFUSION,
    "text_profile": ORACLE_TEXT_PROFILE,
    "text_fingerprint_clusters": ORACLE_FINGERPRINT,
    "text_search": ORACLE_TEXT_SEARCH,
    "text_vocabulary": ORACLE_VOCABULARY,
    "corpus_curation": ORACLE_CURATION,
    "text_readability": ORACLE_READABILITY,
    "corpus_pipeline_funnel": ORACLE_PIPELINE_FUNNEL,
}
