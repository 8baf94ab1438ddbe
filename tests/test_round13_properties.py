"""Hypothesis properties for the round-13 algebraic operators: the
waterfill allocation, the HRW shard assignment, and the BPE apply step
checked against an independent pure-Python replay on randomized
inputs. Each property is exactly the invariant the operator's
docstring claims; examples are kept small because every example is a
Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# Waterfill: conservation, per-source cap, common level
# ---------------------------------------------------------------------------


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=8)
)
@settings(**_SETTINGS)
def test_waterfill_properties(spark, sizes):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        waterfill_allocation,
    )

    docs = spark.createDataFrame(
        [
            (i * 1000 + j, f"src{i}", "w " * (1 if j else n - 1))
            for i, n in enumerate(sizes)
            for j in range(2)
        ],
        "doc_id long, source string, text string",
    )
    # token count per source == sizes[i] + 1 trailing-empty artifacts
    # aside, just read the operator's own n_tokens as ground truth
    rows = waterfill_allocation(docs).collect()
    total = sum(r.n_tokens for r in rows)
    budget = int(total * 0.5)
    assert sum(r.allocated for r in rows) == min(budget, total)
    for r in rows:
        assert 0 <= r.allocated <= r.n_tokens
        if r.is_full:
            assert r.allocated == r.n_tokens
    partial = sorted(r.allocated for r in rows if not r.is_full)
    if partial:
        assert partial[-1] - partial[0] <= 1
        full = [r.allocated for r in rows if r.is_full]
        if full:
            assert max(full) <= partial[-1]


# ---------------------------------------------------------------------------
# HRW: moved docs land only on the new shard
# ---------------------------------------------------------------------------


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    n=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_hrw_minimal_disruption(spark, ids, n):
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        _hrw_shard_col,
    )

    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = docs.select(
        _hrw_shard_col(F.col("doc_id"), n).alias("before"),
        _hrw_shard_col(F.col("doc_id"), n + 1).alias("after"),
    ).collect()
    for r in rows:
        assert 0 <= r.before < n
        assert 0 <= r.after < n + 1
        if r.before != r.after:
            assert r.after == n, "HRW may move docs only TO the new shard"


# ---------------------------------------------------------------------------
# BPE apply: operator counts == independent Python replay
# ---------------------------------------------------------------------------


def _replay_bpe(texts, k_merges):
    """Pure-Python Sennrich mine + apply with the operator's documented
    semantics (first-level merges, greedy left-to-right, merged symbols
    never re-merge)."""
    from collections import Counter

    words_per_doc = [[w for w in t.split(" ") if len(w) >= 1] for t in texts]
    freq = Counter(w for ws in words_per_doc for w in ws if len(w) >= 2)
    pair_count: Counter = Counter()
    for w, f in freq.items():
        for i in range(len(w) - 1):
            pair_count[w[i : i + 2]] += f
    merges = [
        p
        for p, _ in sorted(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[
            :k_merges
        ]
    ]

    def apply(word):
        sym = list(word)
        for m in merges:
            x, y = m[0], m[1]
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == x and sym[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return len(sym)

    return {
        doc_id: (
            sum(len(w) for w in ws),
            sum(apply(w) for w in ws),
        )
        for doc_id, ws in enumerate(words_per_doc)
        if ws
    }


_word = st.text(alphabet="ab", min_size=1, max_size=6)
_text = st.lists(_word, min_size=1, max_size=8).map(" ".join)


@given(texts=st.lists(_text, min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_bpe_apply_matches_python_replay(spark, texts):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(i, "src0", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    got = {
        r.doc_id: (r.n_symbols, r.n_tokens_bpe)
        for r in bpe_token_counts(docs).collect()
    }
    assert got == _replay_bpe(texts, 16)
