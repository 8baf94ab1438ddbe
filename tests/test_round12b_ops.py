"""Round-12 second wave: BPE merge estimation, corpus snapshot diff,
DOULION-sampled triangle counting, session trigram mining, the
warehouse DQ audit, and integer-exact weighted sampling. Oracle
equivalence is covered by tests/test_oracle_parity.py; this file
asserts what the oracle cannot see — brute-force equivalence on
frames the fixture doesn't produce (dirty data for the DQ audit,
known graphs for triangles) and the distributional/algebraic
invariants behind each construction."""

from __future__ import annotations

import datetime
import hashlib
import itertools
from collections import Counter

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
    bpe_merge_candidates,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dq import dq_audit
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.graph import (
    triangle_participation,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
    _WS_CAP,
    _WS_SALT,
    weighted_sample,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sequence import (
    session_trigrams,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.versioning import (
    snapshot_diff,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# BPE merge candidates
# ---------------------------------------------------------------------------


def test_bpe_matches_bruteforce(spark):
    texts = ["low lower lowest", "low low banana", "aaa ab", None, "x"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["pair"]: (r["merge_count"], r["n_word_types"])
        for r in bpe_merge_candidates(docs, top_k=1000).collect()
    }
    freq = Counter(
        tok
        for t in texts
        if t is not None
        for tok in t.split(" ")
        if len(tok) >= 2
    )
    exp_count: Counter = Counter()
    exp_types: dict = {}
    for tok, f in freq.items():
        for i in range(len(tok) - 1):
            exp_count[tok[i : i + 2]] += f
        for pair in {tok[i : i + 2] for i in range(len(tok) - 1)}:
            exp_types.setdefault(pair, set()).add(tok)
    assert got == {
        p: (c, len(exp_types[p])) for p, c in exp_count.items()
    }
    # 'aaa' contributes 'aa' twice per occurrence — the exact BPE count.
    assert got["aa"][0] == 2 and got["aa"][1] == 1


def test_bpe_single_char_words_drop(spark):
    docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    assert bpe_merge_candidates(docs).count() == 0


# ---------------------------------------------------------------------------
# Corpus snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_exactly(spark):
    schema = "doc_id long, source string, text string, n_chars int"
    v1 = spark.createDataFrame(
        [
            (1, "s0", "same", 4),
            (2, "s0", "old", 3),
            (3, "s1", "gone", 4),
            (4, "s1", "kept", 4),
        ],
        schema,
    )
    v2 = spark.createDataFrame(
        [
            (1, "s0", "same", 4),  # unchanged
            (2, "s0", "new!", 4),  # changed
            (4, "s1", "kept", 4),  # unchanged
            (5, "s1", "born", 4),  # added
        ],
        schema,
    )
    rows = {r["source"]: r.asDict() for r in snapshot_diff(v1, v2).collect()}
    assert rows["s0"] == {
        "source": "s0",
        "n_added": 0,
        "n_removed": 0,
        "n_changed": 1,
        "n_unchanged": 1,
        "chars_v1": 7,
        "chars_v2": 8,
        "chars_delta": 1,
    }
    assert rows["s1"] == {
        "source": "s1",
        "n_added": 1,
        "n_removed": 1,
        "n_changed": 0,
        "n_unchanged": 1,
        "chars_v1": 8,
        "chars_v2": 8,
        "chars_delta": 0,
    }


def test_snapshot_diff_conserves_documents(spark, sf_small):
    """Every doc_id in either derived snapshot lands in exactly one
    class: Σ class counts == |v1 ∪ v2| by key."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.versioning import (
        q_corpus_snapshot_diff,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    rep = q_corpus_snapshot_diff(spark, sf_small).collect()
    total = sum(
        r["n_added"] + r["n_removed"] + r["n_changed"] + r["n_unchanged"]
        for r in rep
    )
    docs = read_table(spark, sf_small, "documents").where(
        F.col("text").isNotNull()
    )
    n_docs = docs.count()
    # both snapshots keep ~90%; the union is <= all docs and the diff
    # covers every union member exactly once
    assert 0 < total <= n_docs
    classes = {c: sum(r[c] for r in rep) for c in ("n_added", "n_removed", "n_changed")}
    assert all(v > 0 for v in classes.values()), classes


# ---------------------------------------------------------------------------
# Triangle participation
# ---------------------------------------------------------------------------


def _brute_triangles(edges: list[tuple[int, int]]) -> Counter:
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    part: Counter = Counter()
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            part[a] += 1
            part[b] += 1
            part[c] += 1
    return part


def test_triangles_k4_plus_pendant(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["u"]: (r["deg"], r["triangles"]) for r in triangle_participation(df).collect()}
    # K4: every member sits in C(3,2)=3 triangles; the pendant in none.
    assert got == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3)}


def test_triangles_match_bruteforce_on_hash_graph(spark):
    # deterministic pseudo-random graph: edge iff md5 bucket hits
    nodes = range(18)
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if _h60(f"g:{a}:{b}") % 3 == 0
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["u"]: r["triangles"] for r in triangle_participation(df).collect()}
    exp = _brute_triangles(edges)
    assert got == dict(exp)


# ---------------------------------------------------------------------------
# Session trigram patterns
# ---------------------------------------------------------------------------


def test_session_trigrams_respect_gap(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1, one session: a b c d -> abc, bcd
        (1, 1, at(0), "a"),
        (2, 1, at(1), "b"),
        (3, 1, at(2), "c"),
        (4, 1, at(3), "d"),
        # user 2: a b | (31-min gap) c d e -> only cde
        (5, 2, at(0), "a"),
        (6, 2, at(1), "b"),
        (7, 2, at(32), "c"),
        (8, 2, at(33), "d"),
        (9, 2, at(34), "e"),
        # keyless and null-type rows are dropped
        (10, None, at(0), "a"),
        (11, 3, at(0), None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["pattern"]: (r["n_occurrences"], r["n_users"])
        for r in session_trigrams(ev).collect()
    }
    assert got == {"a>b>c": (1, 1), "b>c>d": (1, 1), "c>d>e": (1, 1)}


def test_session_trigrams_overlapping_and_multiuser(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        for i, e in enumerate("xyxyx"):
            eid += 1
            rows.append((eid, user, t0 + datetime.timedelta(minutes=i), e))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["pattern"]: (r["n_occurrences"], r["n_users"])
        for r in session_trigrams(ev).collect()
    }
    # xyxyx -> xyx (positions 0,2), yxy (position 1) per user
    assert got == {"x>y>x": (6, 3), "y>x>y": (3, 3)}


# ---------------------------------------------------------------------------
# Warehouse DQ audit
# ---------------------------------------------------------------------------


def test_dq_audit_counts_planted_violations(spark):
    lineitem = spark.createDataFrame(
        [
            # (orderkey, partkey, suppkey, quantity, shipdate)
            (1, 10, 100, 5.0, datetime.date(2024, 2, 1)),   # clean
            (2, 10, 100, 0.0, datetime.date(2024, 2, 1)),   # bad quantity
            (99, 10, 100, 5.0, datetime.date(2024, 2, 1)),  # orphan order FK
            (1, 77, 100, 5.0, datetime.date(2024, 2, 1)),   # orphan part FK
            (1, 10, 999, 5.0, datetime.date(2024, 2, 1)),   # orphan supplier FK
            (1, 10, 100, 5.0, datetime.date(2023, 12, 31)), # ships before order
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, l_shipdate date",
    )
    orders = spark.createDataFrame(
        [
            (1, 20, 10.0, datetime.date(2024, 1, 1)),
            (2, 20, -3.0, datetime.date(2024, 1, 1)),  # bad totalprice
            (2, 20, -3.0, datetime.date(2024, 1, 1)),  # duplicate PK
            (3, 66, 10.0, datetime.date(2024, 1, 1)),  # orphan customer FK
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date",
    )
    part = spark.createDataFrame([(10,)], "p_partkey long")
    supplier = spark.createDataFrame([(100,)], "s_suppkey long")
    customer = spark.createDataFrame([(20,), (20,)], "c_custkey long")  # dup PK
    documents = spark.createDataFrame(
        [(1, "ok"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["dq_check"]: (r["tbl"], r["n_checked"], r["n_violations"])
        for r in dq_audit(lineitem, orders, part, supplier, customer, documents).collect()
    }
    assert got == {
        "fk_lineitem_orders": ("lineitem", 6, 1),
        "fk_lineitem_part": ("lineitem", 6, 1),
        "fk_lineitem_supplier": ("lineitem", 6, 1),
        "dom_lineitem_quantity": ("lineitem", 6, 1),
        "ord_lineitem_ship_after_order": ("lineitem", 6, 1),
        "fk_orders_customer": ("orders", 4, 1),
        "dom_orders_totalprice": ("orders", 4, 2),
        "pk_orders_unique": ("orders", 4, 1),
        "pk_customer_unique": ("customer", 2, 1),
        "nn_documents_text": ("documents", 2, 1),
    }


def test_dq_audit_fixture_findings(spark, sf_small):
    """The synthetic fixture is referentially clean but VIOLATES the
    ship-after-order invariant (its ship dates are drawn independently
    of the order date) — a real finding the audit surfaces, and proof
    the report isn't a constant zero."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dq import (
        q_warehouse_dq_audit,
    )

    rep = {r["dq_check"]: r for r in q_warehouse_dq_audit(spark, sf_small).collect()}
    assert len(rep) == 10
    dirty = {k for k, r in rep.items() if r["n_violations"] > 0}
    assert dirty == {"ord_lineitem_ship_after_order"}, dirty
    assert all(r["n_checked"] > 0 for r in rep.values())


# ---------------------------------------------------------------------------
# Weighted sample
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_python_replay(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    base = docs.where(F.col("text").isNotNull()).select("doc_id", "n_chars").collect()
    keys = {}
    for r in base:
        w = max(1, min(int(r["n_chars"]), _WS_CAP))
        keys[r["doc_id"]] = max(
            _h60(f"{_WS_SALT}:{r['doc_id']}:{i}") for i in range(1, w + 1)
        )
    exp = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["key_fp"])
        for r in weighted_sample(docs, k=10).collect()
    ]
    assert got == exp


def test_weighted_sample_is_weight_monotone_in_distribution(spark):
    """max-of-w-uniforms keys: a doc with the weight CAP must win a
    top-1 contest against weight-1 docs far more often than 1/n —
    asserted exactly via the deterministic hash replay over many
    disjoint id blocks (no RNG: the hash IS the randomness)."""
    wins = 0
    blocks = 200
    for b in range(blocks):
        ids = range(b * 10, b * 10 + 10)
        heavy = b * 10  # weight 64; the other nine weight 1
        key = {
            i: max(
                _h60(f"{_WS_SALT}:{i}:{j}")
                for j in range(1, (_WS_CAP if i == heavy else 1) + 1)
            )
            for i in ids
        }
        if max(key, key=key.get) == heavy:
            wins += 1
    # E[wins] = blocks * 64/73 ≈ 175; a uniform sampler gives 20.
    assert wins > blocks // 2, wins


# ---------------------------------------------------------------------------
# Survivor weights (dedup -> training-weight correction)
# ---------------------------------------------------------------------------


def test_survivor_weights_conserve_corpus_mass(spark, sf_small):
    """Σ weight over survivors == |docs with text|: every document is
    represented exactly once, either by itself or by its cluster's
    keeper."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        q_dedup_keep_policy,
        q_dedup_survivor_weights,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    surv = q_dedup_survivor_weights(spark, sf_small).collect()
    n_docs = (
        read_table(spark, sf_small, "documents")
        .where(F.col("text").isNotNull())
        .count()
    )
    assert sum(r["weight"] for r in surv) == n_docs
    assert len({r["doc_id"] for r in surv}) == len(surv)
    # keepers agree with dedup_keep_policy's keep=True set
    keep = {
        r["doc_id"] for r in q_dedup_keep_policy(spark, sf_small).collect() if r["keep"]
    }
    clustered_survivors = {r["doc_id"] for r in surv if r["clustered"]}
    assert clustered_survivors == keep
    assert all(r["weight"] >= 2 for r in surv if r["clustered"])
    assert all(r["weight"] == 1 for r in surv if not r["clustered"])


# ---------------------------------------------------------------------------
# Collocations
# ---------------------------------------------------------------------------


def test_collocations_match_bruteforce(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.collocation import (
        _LIFT_SCALE,
        collocations,
    )

    texts = ["a b a b c", "b c b c", "a c a b", None, "solo"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["x"], r["y"]): (r["n_xy"], r["n_x"], r["n_y"], r["lift_fp"])
        for r in collocations(docs, min_count=1, top_k=100).collect()
    }
    bigrams = []
    for t in texts:
        if t is None:
            continue
        toks = t.split(" ")
        bigrams += list(zip(toks, toks[1:]))
    n = len(bigrams)
    cxy = Counter(bigrams)
    cx = Counter(x for x, _ in bigrams)
    cy = Counter(y for _, y in bigrams)
    exp = {
        (x, y): (c, cx[x], cy[y], c * n * _LIFT_SCALE // (cx[x] * cy[y]))
        for (x, y), c in cxy.items()
    }
    assert got == exp


def test_collocations_lift_centers_on_scale_for_independent_pairs(spark):
    """A perfectly 'independent' bigram stream (every pair equally
    frequent) has lift == 1 exactly -> lift_fp == _LIFT_SCALE * n_pairs
    / ... == the grid value predicted by the marginals."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.collocation import (
        _LIFT_SCALE,
        collocations,
    )

    # "a b a b ... " -> bigrams (a,b) and (b,a) alternate
    docs = spark.createDataFrame([(0, "a b " * 50 + "a")], "doc_id long, text string")
    rows = collocations(docs, min_count=1, top_k=10).collect()
    by = {(r["x"], r["y"]): r for r in rows}
    # 100 a-starts... bigrams: (a,b) x50, (b,a) x50 -> n=100... wait:
    # tokens = 101, bigrams = 100: (a,b) 50, (b,a) 50.
    r = by[("a", "b")]
    assert r["n_xy"] == 50 and r["n_x"] == 50 and r["n_y"] == 50
    assert r["lift_fp"] == 50 * 100 * _LIFT_SCALE // (50 * 50)  # lift = 2.0


# ---------------------------------------------------------------------------
# KS drift
# ---------------------------------------------------------------------------


def test_ks_drift_detects_planted_shift(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
        ks_drift,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # reference: 3 weeks of values near 10; recent week: near 100
    for day in range(28):
        for j in range(40):
            eid += 1
            v = 100.0 + j % 5 if day >= 21 else 10.0 + j % 5
            rows.append((eid, t0 + datetime.timedelta(days=day, minutes=j), v))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    r = ks_drift(ev).collect()[0]
    assert r["n_recent"] > 0 and r["n_ref"] > 0
    # near-disjoint supports (the >= cutoff catches one boundary event
    # from the reference regime) -> D within one event of 1.0
    assert r["d_stat_grid"] > 0.99
    assert r["drift"] is True


def test_ks_drift_identical_distributions_no_drift(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
        ks_drift,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(28):
        for j in range(40):
            eid += 1
            rows.append((eid, t0 + datetime.timedelta(days=day, minutes=j), float(j % 7)))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    r = ks_drift(ev).collect()[0]
    # the >= cutoff leaks one boundary event across sides, so D is a
    # one-event sliver, far below the critical value
    assert r["d_stat_grid"] < 0.01
    assert r["d_stat_grid"] < r["ks_crit_95"]
    assert r["drift"] is False
