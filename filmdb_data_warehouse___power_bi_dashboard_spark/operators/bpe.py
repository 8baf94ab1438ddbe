"""Tokenizer-training statistics: BPE merge-candidate estimation.

Training a byte-pair-encoding tokenizer starts from exactly one
corpus-scale aggregate: the frequency of every ADJACENT SYMBOL PAIR,
weighted by how often the containing word occurs (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
the merge chosen at each step is the argmax of this table). The full
iterative trainer re-counts after each merge, but the expensive,
data-sized step — and the one a distributed engine owns — is this
first pair-count pass; subsequent iterations ride the (word, freq)
dictionary, which is vocabulary-sized, not corpus-sized.

The classic trick, kept here: count pairs over the DISTINCT-WORD
dictionary weighted by word frequency, never over the raw token
stream. Zipf's law makes the dictionary orders of magnitude smaller
than the corpus (measured on the fixture: 500 docs → ~14k running
tokens → a few hundred distinct words), so the per-character pair
explosion — the only super-linear-looking step — rides a frame whose
size is bounded by VOCABULARY × word length, independent of corpus
row count.

Scale shape (100 TB story): one explode + map-side-combined groupBy
builds the word dictionary (the same shape as text_vocabulary); the
pair explosion is array expressions over that small frame
(``transform(sequence(...))`` — whole-stage codegen, no UDF); the
final pair aggregate lands on at most |alphabet|² keys. Raw text is
scanned once; nothing quadratic in documents.

Determinism: counts are BIGINTs; ordering is (merge_count DESC,
pair), a unique total order, so the top-K frontier is bit-identical
across engines.

Reference anchor: SURVEY §2.11 training-data-pipeline extension over
`documents` (the reference's text surface is the tsvector column,
filmdb.sql:143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

_TOP_K = 40


def bpe_merge_candidates(docs: DataFrame, top_k: int = _TOP_K) -> DataFrame:
    """Top-``top_k`` adjacent character pairs by corpus-weighted count.

    Returns (``pair``, ``merge_count``, ``n_word_types``):
    ``merge_count`` is the total number of adjacent occurrences across
    the corpus (a word contributes freq × occurrences-within-word, so
    'aaa' counts 'aa' twice per instance — the exact quantity BPE
    maximizes), ``n_word_types`` the number of distinct dictionary
    words containing the pair. Words shorter than 2 characters have no
    pair and drop out via the empty sequence.
    """
    freq = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    pairs = freq.select(
        "tok",
        "f",
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("f").cast("long").alias("merge_count"),
            F.count_distinct("tok").cast("long").alias("n_word_types"),
        )
        .orderBy(F.col("merge_count").desc(), "pair")
        .limit(top_k)
    )


def q_text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merge_candidates(read_table(spark, sf_dir, "documents"))


ORACLE_BPE_MERGE_CANDIDATES = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks WHERE length(tok) >= 2 GROUP BY tok
),
pairs AS (
  SELECT tok, f, substr(tok, CAST(i AS INT), 2) AS pair
  FROM freq, unnest(range(1, length(tok))) AS t(i)
)
SELECT pair,
       CAST(SUM(f) AS BIGINT) AS merge_count,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_word_types
FROM pairs
GROUP BY pair
ORDER BY merge_count DESC, pair
LIMIT {_TOP_K}
"""


_APPLY_K = 16  # merges applied by the tokenize step (unrolled, fixed)


def bpe_token_counts(docs: DataFrame, k_merges: int = _APPLY_K) -> DataFrame:
    """The APPLY step closing the BPE arc (round-12 verdict item 4):
    tokenize every document with the top-``k_merges`` mined merges and
    return EXACT per-doc token counts — the numbers token budgeting
    was previously approximating with whitespace-token proxies.

    Semantics (Sennrich apply, one level): each word starts as its
    character symbols; merges apply IN MINED PRIORITY ORDER
    (merge_count DESC, pair — a unique total order), each merging all
    left-to-right non-overlapping adjacent occurrences of its pair.
    The mined table is flat (pairs of original characters), so merged
    symbols never re-merge — exactly what "apply the mined merge
    table" means; a hierarchical trainer would extend the table, not
    this operator.

    Execution shape: the segmentation state is a STRING with every
    symbol delimited as ``<c>``, and one merge is one ``replace(state,
    '<x><y>', '<xy>')`` — both engines' ``replace`` scans
    left-to-right over non-overlapping occurrences and continues
    AFTER the replacement, which is precisely BPE's greedy overlap
    rule ('aaa' + merge 'aa' → one merge, not two). Delimiters cannot
    false-match across symbol boundaries because a pattern's inner
    ``><`` only occurs between two adjacent single-char symbols.
    Words containing literal ``<`` or ``>`` are counted per-char and
    skip merging (deterministic guard on both engines; a mined pair
    containing a delimiter is a no-op on guarded-out words by the
    same argument). The symbol wrap uses ``([\\s\\S])`` — a TOTAL
    character class in both Java and RE2 dialects — not ``(.)``:
    Java's ``.`` excludes \\r/\\u0085/\\u2028/\\u2029 while RE2's
    excludes only \\n, so a ``.``-based wrap left line terminators
    inside a word unwrapped on Spark but wrapped on the DuckDB
    oracle (latent cross-engine divergence, round-13 advisor
    finding), and made n_symbols' stated contract inaccurate.

    Scale shape (the Zipf trick twice): the ``k_merges`` nested
    replaces run over the DISTINCT-WORD dictionary (vocabulary-sized,
    not corpus-sized); the mined merge list itself is a bounded model
    shape (``k_merges`` rows) collected to the driver like the IVF
    centroids; per-doc counts come from one (doc_id, word) map-side-
    combined aggregate joined against the tokenized dictionary (AQE
    decides broadcast). Raw text is scanned twice (mine + tokenize),
    nothing quadratic.

    Returns (``doc_id``, ``n_symbols``, ``n_tokens_bpe``,
    ``n_merges_applied``) ordered by doc_id: ``n_symbols`` is the
    pre-merge symbol count — EVERY character of a whitespace-split
    word is a symbol, so n_symbols is exactly the summed code-point
    length of the words — and ``n_merges_applied`` =
    n_symbols − n_tokens_bpe counts true merges.
    """
    return (
        _bpe_counts_frame(docs, k_merges)
        .select(
            "doc_id",
            "n_symbols",
            "n_tokens_bpe",
            (F.col("n_symbols") - F.col("n_tokens_bpe")).alias("n_merges_applied"),
        )
        .orderBy("doc_id")
    )


def _bpe_counts_frame(docs: DataFrame, k_merges: int = _APPLY_K) -> DataFrame:
    """The unordered per-doc count frame (doc_id, n_words, n_symbols,
    n_tokens_bpe) — the composition point for downstream consumers
    (fertility report, exact-count packing); the public entry selects
    its contract columns and adds the ORDER BY."""
    merges = [
        r["pair"]
        for r in bpe_merge_candidates(docs, top_k=k_merges)
        .select("pair")
        .collect()
    ]
    words = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 1)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    dict_df = words.select("tok").distinct()
    guard = F.col("tok").contains("<") | F.col("tok").contains(">")
    state = F.regexp_replace("tok", r"([\s\S])", "<$1>")
    for pair in merges:
        x, y = pair[0], pair[1]
        state = F.replace(state, F.lit(f"<{x}><{y}>"), F.lit(f"<{pair}>"))
    # Every character is a symbol (total wrap above), so the pre-merge
    # symbol count is just the code-point length.
    n_sym = F.length("tok").cast("long")
    n_tok = (
        F.length(state) - F.length(F.replace(state, F.lit("<"), F.lit("")))
    ).cast("long")
    tokenized = dict_df.select(
        "tok",
        n_sym.alias("sym"),
        F.when(guard, n_sym).otherwise(n_tok).alias("ntk"),
    )
    return (
        words.join(tokenized, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("sym")).cast("long").alias("n_symbols"),
            F.sum(F.col("n_occ") * F.col("ntk")).cast("long").alias("n_tokens_bpe"),
        )
    )


def q_text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_counts(read_table(spark, sf_dir, "documents"))


_APPLY_K2 = 8  # level-2 merges (over level-1 SYMBOL sequences)


def bpe_token_counts_hier(
    docs: DataFrame, k1: int = _APPLY_K, k2: int = _APPLY_K2
) -> DataFrame:
    """Two-LEVEL BPE: after the ``k1`` flat character merges
    (:func:`bpe_token_counts`), re-mine the most frequent ADJACENT
    SYMBOL pairs over the level-1 segmentations — where a symbol is
    now possibly multi-character — and apply the top ``k2`` of them.
    This is the genuinely hierarchical Sennrich step the flat table
    cannot express: a level-2 merge like ``<th><e>`` → ``<the>``
    consumes a level-1 product, so counts converge toward a real
    subword vocabulary.

    Mechanics: level-1 states are ``<sym>``-delimited strings, so
    level-2 mining is ``regexp_extract_all(state, '<([^>]*)>')`` →
    adjacent pairs (zip of the shifted symbol arrays), weighted by
    corpus word frequency; a level-2 merge's pattern is the literal
    ``'<x><y>'`` and its replacement drops the single inner ``'><'``
    (symbols are delimiter-free by the guard, so the pattern can
    never match across a symbol boundary, and both engines' replace
    keeps the greedy left-to-right overlap rule). Priority order is
    (pair_count DESC, pair-string ASC) — a unique total order on
    ASCII states, identical bytewise on both engines.

    Scale shape: everything after the corpus scan rides the
    DISTINCT-WORD dictionary (states, symbol arrays, pair explosion
    bounded by vocabulary × word length); both merge lists are
    bounded driver-side model shapes; per-doc counts come from the
    same (doc_id, word) aggregate join as the flat path.

    Returns (``doc_id``, ``n_symbols``, ``n_tokens_l1``,
    ``n_tokens_l2``, ``n_merges_l2``) ordered by doc_id, with
    ``n_merges_l2`` = n_tokens_l1 − n_tokens_l2 ≥ 0.
    """
    merges1 = [
        r["pair"]
        for r in bpe_merge_candidates(docs, top_k=k1).select("pair").collect()
    ]
    words = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 1)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    dict_df = words.select("tok").distinct()
    guard = F.col("tok").contains("<") | F.col("tok").contains(">")
    s1 = F.regexp_replace("tok", r"([\s\S])", "<$1>")
    for pair in merges1:
        s1 = F.replace(s1, F.lit(f"<{pair[0]}><{pair[1]}>"), F.lit(f"<{pair}>"))
    n_sym = F.length("tok").cast("long")
    st = dict_df.select("tok", guard.alias("g"), n_sym.alias("sym"), s1.alias("s1"))

    tokfreq = words.groupBy("tok").agg(F.sum("n_occ").cast("long").alias("f"))
    sy = F.regexp_extract_all(F.col("s1"), F.lit("<([^>]*)>"), 1)
    syms = (
        st.where(~F.col("g"))
        .join(tokfreq, "tok")
        .select("f", sy.alias("sy"))
        .where(F.size("sy") >= 2)
    )
    npair = F.size("sy") - 1
    pairs2 = syms.select(
        "f",
        F.explode(
            F.zip_with(
                F.slice("sy", 1, F.greatest(npair, F.lit(0))),
                F.slice("sy", 2, F.greatest(npair, F.lit(0))),
                lambda a, b: F.concat(F.lit("<"), a, F.lit("><"), b, F.lit(">")),
            )
        ).alias("pair"),
    )
    merges2 = [
        r["pair"]
        for r in pairs2.groupBy("pair")
        .agg(F.sum("f").cast("long").alias("c"))
        .orderBy(F.col("c").desc(), "pair")
        .limit(k2)
        .collect()
    ]
    s2 = F.col("s1")
    for pair in merges2:
        s2 = F.replace(s2, F.lit(pair), F.lit(pair.replace("><", "")))
    count_tok = lambda c: (  # noqa: E731
        F.length(c) - F.length(F.replace(c, F.lit("<"), F.lit("")))
    ).cast("long")
    tokenized = st.select(
        "tok",
        "sym",
        F.when(F.col("g"), F.col("sym")).otherwise(count_tok(F.col("s1"))).alias(
            "ntk1"
        ),
        F.when(F.col("g"), F.col("sym")).otherwise(count_tok(s2)).alias("ntk2"),
    )
    return (
        words.join(tokenized, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n_occ") * F.col("sym")).cast("long").alias("n_symbols"),
            F.sum(F.col("n_occ") * F.col("ntk1")).cast("long").alias("n_tokens_l1"),
            F.sum(F.col("n_occ") * F.col("ntk2")).cast("long").alias("n_tokens_l2"),
        )
        .select(
            "doc_id",
            "n_symbols",
            "n_tokens_l1",
            "n_tokens_l2",
            (F.col("n_tokens_l1") - F.col("n_tokens_l2")).alias("n_merges_l2"),
        )
        .orderBy("doc_id")
    )


def q_text_bpe_tokenize_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_counts_hier(read_table(spark, sf_dir, "documents"))


# Sequential merge application as a recursive CTE: state at step k is
# the segmentation after the first k merges; step k+1 joins the rank-
# (k+1) merge and applies ONE replace. DuckDB's replace has the same
# left-to-right non-overlapping scan as Spark's, so the greedy overlap
# rule matches by construction. Kept as a WITH-body fragment (ending
# at the per-doc counts CTE) so the fertility oracle replays the
# identical tokenizer.
_BPE_COUNT_CTES = f"""toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
words AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM toks WHERE length(tok) >= 1 GROUP BY doc_id, tok
),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks WHERE length(tok) >= 2 GROUP BY tok
),
prs AS (
  SELECT tok, f, substr(tok, CAST(i AS INT), 2) AS pair
  FROM freq, unnest(range(1, length(tok))) AS t(i)
),
cand AS (
  SELECT pair, CAST(SUM(f) AS BIGINT) AS merge_count
  FROM prs GROUP BY pair
),
merges AS (
  SELECT pair,
         CAST(ROW_NUMBER() OVER (ORDER BY merge_count DESC, pair) AS INT) AS rk
  FROM cand
  QUALIFY rk <= {_APPLY_K}
),
dict AS (
  SELECT DISTINCT tok FROM words
  WHERE NOT (tok LIKE '%<%' OR tok LIKE '%>%')
),
state AS (
  -- ([\\s\\S]) not (.): total char class in BOTH Java and RE2, so the
  -- Spark wrap and this oracle wrap the same characters (Java '.'
  -- excludes \\r and U+2028/29; RE2 '.' excludes only \\n)
  SELECT tok, 0 AS k, regexp_replace(tok, '([\\s\\S])', '<\\1>', 'g') AS s
  FROM dict
  UNION ALL
  SELECT st.tok, st.k + 1,
         replace(st.s,
                 '<' || substr(m.pair, 1, 1) || '><' || substr(m.pair, 2, 1) || '>',
                 '<' || m.pair || '>')
  FROM state st JOIN merges m ON m.rk = st.k + 1
),
tokenized AS (
  SELECT d.tok,
         CAST(length(d.tok) AS BIGINT) AS sym,
         CAST(length(s.s) - length(replace(s.s, '<', '')) AS BIGINT) AS ntk
  -- final state is at k = |merges|, NOT the cap: a degenerate corpus
  -- with fewer than {_APPLY_K} distinct pairs stops the recursion
  -- early, and selecting the cap would drop every non-guard token
  -- while the Spark side (which applies however many merges exist)
  -- keeps them
  FROM dict d JOIN state s
    ON s.tok = d.tok AND s.k = (SELECT COUNT(*) FROM merges)
  UNION ALL
  SELECT tok,
         CAST(length(tok) AS BIGINT) AS sym,
         CAST(length(tok) AS BIGINT) AS ntk
  FROM (SELECT DISTINCT tok FROM words
        WHERE tok LIKE '%<%' OR tok LIKE '%>%') g
),
bpecounts AS (
  SELECT w.doc_id,
         CAST(SUM(w.n_occ) AS BIGINT) AS n_words,
         CAST(SUM(w.n_occ * t.sym) AS BIGINT) AS n_symbols,
         CAST(SUM(w.n_occ * t.ntk) AS BIGINT) AS n_tokens_bpe
  FROM words w JOIN tokenized t ON t.tok = w.tok
  GROUP BY w.doc_id
)"""

ORACLE_BPE_TOKENIZE = f"""
WITH RECURSIVE {_BPE_COUNT_CTES}
SELECT doc_id, n_symbols, n_tokens_bpe,
       CAST(n_symbols - n_tokens_bpe AS BIGINT) AS n_merges_applied
FROM bpecounts
ORDER BY doc_id
"""


# Level-2 mining + application over the level-1 states, composed onto
# the shared fragment (same early-stop discipline: both final states
# select at k = |merge list|, not the cap).
ORACLE_BPE_TOKENIZE_HIER = f"""
WITH RECURSIVE {_BPE_COUNT_CTES},
tokfreq AS (SELECT tok, CAST(SUM(n_occ) AS BIGINT) AS f FROM words GROUP BY tok),
syms AS (
  SELECT s.tok, tf.f, regexp_extract_all(s.s, '<([^>]*)>', 1) AS sy
  FROM state s JOIN tokfreq tf ON tf.tok = s.tok
  WHERE s.k = (SELECT COUNT(*) FROM merges)
),
p2 AS (
  SELECT '<' || sy[CAST(i AS INT)] || '><' || sy[CAST(i AS INT) + 1] || '>'
           AS pair,
         f
  FROM syms, unnest(range(1, len(sy))) AS t(i)
  WHERE len(sy) >= 2
),
cand2 AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS c FROM p2 GROUP BY pair),
merges2 AS (
  SELECT pair, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, pair) AS INT) AS rk
  FROM cand2 QUALIFY rk <= {_APPLY_K2}
),
state2 AS (
  SELECT tok, 0 AS k, s FROM state WHERE k = (SELECT COUNT(*) FROM merges)
  UNION ALL
  SELECT st.tok, st.k + 1, replace(st.s, m.pair, replace(m.pair, '><', ''))
  FROM state2 st JOIN merges2 m ON m.rk = st.k + 1
),
tok2 AS (
  SELECT t.tok, t.sym, t.ntk AS ntk1,
         COALESCE(CAST(length(s2.s) - length(replace(s2.s, '<', ''))
                       AS BIGINT), t.ntk) AS ntk2
  FROM tokenized t
  LEFT JOIN (SELECT tok, s FROM state2
             WHERE k = (SELECT COUNT(*) FROM merges2)) s2
    ON s2.tok = t.tok
)
SELECT w.doc_id,
       CAST(SUM(w.n_occ * t.sym) AS BIGINT) AS n_symbols,
       CAST(SUM(w.n_occ * t.ntk1) AS BIGINT) AS n_tokens_l1,
       CAST(SUM(w.n_occ * t.ntk2) AS BIGINT) AS n_tokens_l2,
       CAST(SUM(w.n_occ * t.ntk1) - SUM(w.n_occ * t.ntk2) AS BIGINT)
         AS n_merges_l2
FROM words w JOIN tok2 t ON t.tok = w.tok
GROUP BY w.doc_id
ORDER BY w.doc_id
"""


# ---------------------------------------------------------------------------
# K-level BPE: the hierarchical miner generalized to a fixed-depth
# trainer (round-14, generalizing the round-13 level-2 step)
# ---------------------------------------------------------------------------

# Merge-list sizes per level: level 1 mines character pairs (the flat
# table), levels 2..K re-mine adjacent SYMBOL pairs over the previous
# level's segmentations. Each list is a bounded driver-side model
# shape, exactly like the IVF centroids.
_KLEVEL_KS = (_APPLY_K, _APPLY_K2, _APPLY_K2)


def bpe_level_convergence(docs: DataFrame, ks: tuple = _KLEVEL_KS) -> DataFrame:
    """K-LEVEL BPE trainer convergence: apply ``ks[0]`` flat character
    merges, then for each further level re-mine the most frequent
    adjacent SYMBOL pairs over the current segmentations and apply the
    top ``ks[l]`` of them — the loop the round-13 level-2 miner
    (:func:`bpe_token_counts_hier`) was one iteration of. Reported per
    level: the corpus-total token count and tokens-per-word, so the
    output IS the convergence curve (monotone non-increasing by
    construction: every merge strictly removes one ``><`` boundary
    per application and nothing else changes the token count).

    Level 0 is the pre-merge symbol count (= summed word lengths).

    Scale shape: everything after the one corpus scan rides the
    DISTINCT-WORD dictionary (Zipf-bounded); each level costs one
    vocabulary-sized mining aggregate whose top-k collects to the
    driver as a bounded merge list, and the application is nested
    literal ``replace`` — whole-stage codegen, no UDF. K-1 driver
    round-trips of k rows each, independent of corpus size.

    Returns (``level``, ``n_tokens``, ``tokens_per_word``) ordered by
    level — K+1 rows total.
    """
    merges1 = [
        r["pair"]
        for r in bpe_merge_candidates(docs, top_k=ks[0]).select("pair").collect()
    ]
    toks = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 1)
    )
    tokfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("f"))
    guard = F.col("tok").contains("<") | F.col("tok").contains(">")
    s1 = F.regexp_replace("tok", r"([\s\S])", "<$1>")
    for pair in merges1:
        s1 = F.replace(s1, F.lit(f"<{pair[0]}><{pair[1]}>"), F.lit(f"<{pair}>"))
    # Materialized per-word frame the level loop mines and extends:
    # one state column per level, all vocabulary-sized.
    stf = tokfreq.select(
        "tok", "f", guard.alias("g"), F.length("tok").cast("long").alias("sym"),
        s1.alias("s1"),
    )
    cur = "s1"
    for li, k in enumerate(ks[1:], start=2):
        sy = F.regexp_extract_all(F.col(cur), F.lit("<([^>]*)>"), 1)
        npair = F.size("sy") - 1
        pairs = (
            stf.where(~F.col("g"))
            .select("f", sy.alias("sy"))
            .where(F.size("sy") >= 2)
            .select(
                "f",
                F.explode(
                    F.zip_with(
                        F.slice("sy", 1, F.greatest(npair, F.lit(0))),
                        F.slice("sy", 2, F.greatest(npair, F.lit(0))),
                        lambda a, b: F.concat(
                            F.lit("<"), a, F.lit("><"), b, F.lit(">")
                        ),
                    )
                ).alias("pair"),
            )
        )
        merges_l = [
            r["pair"]
            for r in pairs.groupBy("pair")
            .agg(F.sum("f").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), "pair")
            .limit(k)
            .collect()
        ]
        s_next = F.col(cur)
        for pair in merges_l:
            s_next = F.replace(s_next, F.lit(pair), F.lit(pair.replace("><", "")))
        stf = stf.withColumn(f"s{li}", s_next)
        cur = f"s{li}"

    count_tok = lambda c: (  # noqa: E731
        F.length(c) - F.length(F.replace(c, F.lit("<"), F.lit("")))
    ).cast("long")
    aggs = [
        F.sum("f").cast("long").alias("nw"),
        F.sum(F.col("f") * F.col("sym")).cast("long").alias("t0"),
    ]
    for li in range(1, len(ks) + 1):
        ntk = F.when(F.col("g"), F.col("sym")).otherwise(count_tok(F.col(f"s{li}")))
        aggs.append(F.sum(F.col("f") * ntk).cast("long").alias(f"t{li}"))
    one = stf.agg(*aggs)
    stack_items = ", ".join(
        f"CAST({li} AS BIGINT), t{li}" for li in range(0, len(ks) + 1)
    )
    return (
        one.select(
            "nw",
            F.expr(
                f"stack({len(ks) + 1}, {stack_items}) AS (level, n_tokens)"
            ),
        )
        .select(
            "level",
            "n_tokens",
            round_half_up(
                F.col("n_tokens").cast("double") / F.col("nw").cast("double"), 6
            ).alias("tokens_per_word"),
        )
        .orderBy("level")
    )


def q_text_bpe_klevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_level_convergence(read_table(spark, sf_dir, "documents"))


def _oracle_bpe_klevel(ks: tuple = _KLEVEL_KS) -> str:
    """K-level oracle generated by the same loop the Spark side runs:
    for each level past 1 emit (syms, pairs, cand, merges, state)
    CTEs mirroring the hier oracle's level-2 block, then unpivot the
    per-level corpus totals. Level 1 rides the shared fragment
    (`state`/`merges`/`tokenized`)."""
    parts = [f"WITH RECURSIVE {_BPE_COUNT_CTES},"]
    parts.append(
        "tokfreq AS (SELECT tok, CAST(SUM(n_occ) AS BIGINT) AS f"
        " FROM words GROUP BY tok)"
    )
    prev_state, prev_merges = "state", "merges"
    for li, k in enumerate(ks[1:], start=2):
        parts.append(f""",
syms{li} AS (
  SELECT s.tok, tf.f, regexp_extract_all(s.s, '<([^>]*)>', 1) AS sy
  FROM {prev_state} s JOIN tokfreq tf ON tf.tok = s.tok
  WHERE s.k = (SELECT COUNT(*) FROM {prev_merges})
),
p{li} AS (
  SELECT '<' || sy[CAST(i AS INT)] || '><' || sy[CAST(i AS INT) + 1] || '>'
           AS pair,
         f
  FROM syms{li}, unnest(range(1, len(sy))) AS t(i)
  WHERE len(sy) >= 2
),
cand{li} AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS c FROM p{li} GROUP BY pair),
merges{li} AS (
  SELECT pair, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, pair) AS INT) AS rk
  FROM cand{li} QUALIFY rk <= {k}
),
state{li} AS (
  SELECT tok, 0 AS k, s FROM {prev_state}
  WHERE k = (SELECT COUNT(*) FROM {prev_merges})
  UNION ALL
  SELECT st.tok, st.k + 1, replace(st.s, m.pair, replace(m.pair, '><', ''))
  FROM state{li} st JOIN merges{li} m ON m.rk = st.k + 1
)""")
        prev_state, prev_merges = f"state{li}", f"merges{li}"
    # Per-word count at each level: guarded words (absent from every
    # state) fall back level-by-level to the previous level's count,
    # bottoming out at tokenized.ntk (= sym for the guarded branch).
    ntk_selects = ["t.ntk AS ntk1"]
    joins = []
    prev_col = "t.ntk"
    for li in range(2, len(ks) + 1):
        joins.append(
            f"LEFT JOIN (SELECT tok, CAST(length(s) - length(replace(s, '<', ''))"
            f" AS BIGINT) AS ntk FROM state{li}"
            f" WHERE k = (SELECT COUNT(*) FROM merges{li})) c{li}"
            f" ON c{li}.tok = t.tok"
        )
        ntk_selects.append(f"COALESCE(c{li}.ntk, {prev_col}) AS ntk{li}")
        prev_col = f"COALESCE(c{li}.ntk, {prev_col})"
    tot_cols = ", ".join(
        [
            "CAST(SUM(tf.f) AS BIGINT) AS nw",
            "CAST(SUM(tf.f * k.sym) AS BIGINT) AS t0",
        ]
        + [
            f"CAST(SUM(tf.f * k.ntk{li}) AS BIGINT) AS t{li}"
            for li in range(1, len(ks) + 1)
        ]
    )
    parts.append(f""",
klevels AS (
  SELECT t.tok, t.sym, {", ".join(ntk_selects)}
  FROM tokenized t
  {" ".join(joins)}
),
tot AS (SELECT {tot_cols} FROM klevels k JOIN tokfreq tf ON tf.tok = k.tok)
""")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({li} AS BIGINT) AS level, t{li} AS n_tokens,"
        f" {sql_round_half_up(f'CAST(t{li} AS DOUBLE) / CAST(nw AS DOUBLE)', 6)}"
        f" AS tokens_per_word FROM tot"
        for li in range(0, len(ks) + 1)
    )
    parts.append(unions + "\nORDER BY level")
    return "\n".join(parts)


def tokenizer_fertility(docs: DataFrame, k_merges: int = _APPLY_K) -> DataFrame:
    """Tokenizer fertility by detected language — the tokenizer-equity
    metric every multilingual pretraining plan reports (tokens per
    word by language; a tokenizer trained on English-heavy data
    fragments other languages into more tokens, inflating their
    effective cost per word). Composes the langid heuristic
    (text.language_id) with the EXACT apply-step counts
    (:func:`bpe_token_counts`), so the fertility is measured against
    the real mined tokenizer, not a proxy.

    Returns per detected language: (``lang_detected``, ``n_docs``,
    ``n_words``, ``n_tokens_bpe``, ``fertility``,
    ``chars_per_token``) ordered by lang_detected — fertility =
    tokens/words, chars_per_token = symbols/tokens, each ONE IEEE
    division of exact BIGINTs (identical on both engines). Docs with
    no tokenizable word drop out via the inner join, on both engines.

    Scale shape: the tokenize join (vocabulary-sized, see
    bpe_token_counts) plus one scan-side langid projection and a
    final agg onto the ≤|langs|+1 bounded domain.
    """
    from .text import language_id

    counts = _bpe_counts_frame(docs, k_merges)
    langs = language_id(docs).select("doc_id", "lang_detected")
    g = counts.join(langs, "doc_id").groupBy("lang_detected").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
        F.sum("n_symbols").cast("long").alias("__sym"),
    )
    return g.select(
        "lang_detected",
        "n_docs",
        "n_words",
        "n_tokens_bpe",
        round_half_up(
            F.col("n_tokens_bpe").cast("double") / F.col("n_words").cast("double"),
            6,
        ).alias("fertility"),
        round_half_up(
            F.col("__sym").cast("double") / F.col("n_tokens_bpe").cast("double"),
            6,
        ).alias("chars_per_token"),
    ).orderBy("lang_detected")


def q_text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenizer_fertility(read_table(spark, sf_dir, "documents"))


def _oracle_tokenizer_fertility() -> str:
    from ..functions.scalar import sql_round_half_up
    from .text import _LANG_ORDER, _sql_hits

    best = "greatest(" + ", ".join(f"s_{lg}" for lg in _LANG_ORDER) + ")"
    detect = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in _LANG_ORDER)
        + " END"
    )
    return f"""
WITH RECURSIVE {_BPE_COUNT_CTES},
scored AS (
  SELECT doc_id,
         {", ".join(f"{_sql_hits(lg)} AS s_{lg}" for lg in _LANG_ORDER)}
  FROM documents
),
langs AS (SELECT doc_id, {detect} AS lang_detected FROM scored),
g AS (
  SELECT l.lang_detected,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(c.n_words) AS BIGINT) AS n_words,
         CAST(SUM(c.n_tokens_bpe) AS BIGINT) AS n_tokens_bpe,
         CAST(SUM(c.n_symbols) AS BIGINT) AS sym
  FROM bpecounts c JOIN langs l ON l.doc_id = c.doc_id
  GROUP BY l.lang_detected
)
SELECT lang_detected, n_docs, n_words, n_tokens_bpe,
       {sql_round_half_up(
           "CAST(n_tokens_bpe AS DOUBLE) / CAST(n_words AS DOUBLE)", 6)}
         AS fertility,
       {sql_round_half_up(
           "CAST(sym AS DOUBLE) / CAST(n_tokens_bpe AS DOUBLE)", 6)}
         AS chars_per_token
FROM g
ORDER BY lang_detected
"""


QUERIES = {
    "text_bpe_merge_candidates": q_text_bpe_merge_candidates,
    "text_bpe_tokenize": q_text_bpe_tokenize,
    "text_bpe_tokenize_hier": q_text_bpe_tokenize_hier,
    "text_bpe_klevel": q_text_bpe_klevel,
    "text_tokenizer_fertility": q_text_tokenizer_fertility,
}
ORACLES = {
    "text_bpe_merge_candidates": ORACLE_BPE_MERGE_CANDIDATES,
    "text_bpe_tokenize": ORACLE_BPE_TOKENIZE,
    "text_bpe_tokenize_hier": ORACLE_BPE_TOKENIZE_HIER,
    "text_bpe_klevel": _oracle_bpe_klevel(),
    "text_tokenizer_fertility": _oracle_tokenizer_fertility(),
}
