"""Round-11 additions: image perceptual near-dup (dHash), exact
duplicated-span detection, and the driver-attested GDPR erasure audit.
Oracle equivalence is covered by tests/test_oracle_parity.py (all
three are oracle-bearing registry entries); this file asserts the
properties the oracle cannot see — pigeonhole completeness within the
Hamming radius, span-removal preserving every non-duplicated
character, and the erasure audit's internal consistency against a
corrupted-delete counterexample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
    _DHASH_BANDS,
    _DHASH_CELLS,
    _DHASH_MAX_HAMMING,
    image_dhash,
    image_dhash_pairs,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.segments import (
    _SPAN_W,
    duplicated_spans,
)


# ---------------------------------------------------------------------------
# Image dHash near-dup
# ---------------------------------------------------------------------------


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, "image", t.encode("utf-8"), None) for i, t in rows],
        "media_id long, kind string, payload binary, meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )


@pytest.fixture(scope="module")
def planted_media(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8  # 360 chars
    # 0/1: byte-identical -> hamming 0. 2: one flipped char (local
    # gradient change) -> small hamming. 3: unrelated text.
    variant = base.replace("quick", "quack", 1)
    other = "".join(chr(33 + (i * 7) % 90) for i in range(360))
    return _media(
        spark, [(0, base), (1, base), (2, variant), (3, other)]
    )


def test_dhash_identical_payloads_pair_at_hamming_zero(planted_media):
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in image_dhash_pairs(planted_media).collect()
    }
    assert pairs.get((0, 1)) == 0
    for (a, b), h in pairs.items():
        assert h <= _DHASH_MAX_HAMMING
        assert a < b


def test_dhash_pigeonhole_complete_within_radius(planted_media):
    """Every pair within the Hamming radius is found — the banding is
    a complete candidate generator for radius <= bands - 1, verified
    by brute-forcing the hashes."""
    hashes = {
        r.media_id: [r[f"b{k}"] for k in range(_DHASH_BANDS)]
        for r in image_dhash(planted_media).collect()
    }
    expected = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(
                bin(x ^ y).count("1") for x, y in zip(hashes[a], hashes[b])
            )
            if ham <= _DHASH_MAX_HAMMING:
                expected.add((a, b))
    found = {
        (r.media_a, r.media_b)
        for r in image_dhash_pairs(planted_media).collect()
    }
    assert found == expected
    assert (0, 1) in found


def test_dhash_drops_tiny_images(spark):
    tiny = _media(spark, [(0, "x" * (_DHASH_CELLS - 1)), (1, "x" * (_DHASH_CELLS - 1))])
    assert image_dhash(tiny).count() == 0
    assert image_dhash_pairs(tiny).count() == 0


# ---------------------------------------------------------------------------
# Exact duplicated spans
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_docs(spark):
    boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED CONTACT US AT EXAMPLE " * 2
    uniq_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    uniq_b = "kilo lima mike november oscar papa quebec romeo sierra tango xx"
    uniq_c = "uniform victor whiskey xray yankee zulu one two three four five"
    return spark.createDataFrame(
        [
            (0, uniq_a + boiler),
            (1, boiler + uniq_b),
            (2, uniq_c),
        ],
        "doc_id long, text string",
    )


def test_dup_spans_cover_only_shared_text_and_reassembly_preserves_unique(
    planted_docs,
):
    """Removing every reported span preserves all text not covered by
    a cross-document duplicated window — the Lee-et-al guarantee the
    operator's docstring claims."""
    docs = {r.doc_id: r.text for r in planted_docs.collect()}
    spans = duplicated_spans(planted_docs).collect()
    by_doc: dict[int, list] = {}
    for r in spans:
        assert 0 <= r.span_start < r.span_end <= len(docs[r.doc_id])
        assert r.span_len == r.span_end - r.span_start
        assert r.span_len >= _SPAN_W
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # doc 2 is entirely unique -> no spans; docs 0 and 1 share boiler.
    assert 2 not in by_doc
    assert set(by_doc) == {0, 1}
    for doc_id, intervals in by_doc.items():
        intervals.sort()
        # Spans are disjoint and non-adjacent (maximal merge).
        for (s1, e1), (s2, e2) in zip(intervals, intervals[1:]):
            assert e1 < s2
        # Reassembly: dropping spans keeps every char not inside one.
        text = docs[doc_id]
        covered = set()
        for s, e in intervals:
            covered.update(range(s, e))
        kept = "".join(c for i, c in enumerate(text) if i not in covered)
        # The doc's unique sentinel words survive the removal.
        sentinel = "alpha" if doc_id == 0 else "tango"
        assert sentinel in kept
    # Every character inside a span is covered by some width-window
    # whose content occurs in both docs: check the shared boiler text
    # is what got flagged (span text of doc 0 appears in doc 1's text).
    for s, e in by_doc[0]:
        # every width-slice of the span occurs in the other document
        span_text = docs[0][s:e]
        for off in range(0, len(span_text) - _SPAN_W + 1):
            assert span_text[off : off + _SPAN_W] in docs[1]


def test_dup_span_removal_agrees_with_manual_cut(planted_docs):
    """cleaned_text must equal the python-side cut of the reported
    spans, untouched docs must pass through verbatim, and the
    bookkeeping columns must reconcile with the span list."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.segments import (
        remove_duplicated_spans,
    )

    docs = {r.doc_id: r.text for r in planted_docs.collect()}
    spans: dict[int, list] = {}
    for r in duplicated_spans(planted_docs).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    out = {r.doc_id: r for r in remove_duplicated_spans(planted_docs).collect()}
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        expected = text
        for s, e in sorted(spans.get(doc_id, []), reverse=True):
            expected = expected[:s] + expected[e:]
        r = out[doc_id]
        assert r.cleaned_text == expected
        assert r.n_spans == len(spans.get(doc_id, []))
        assert r.removed_chars == sum(e - s for s, e in spans.get(doc_id, []))
    assert out[2].cleaned_text == docs[2]  # fully unique doc untouched


def test_dup_spans_empty_when_no_cross_doc_duplication(spark):
    docs = spark.createDataFrame(
        [
            (0, "entirely original text with no repeats anywhere at all here"),
            (1, "second document likewise novel content nothing shared between"),
        ],
        "doc_id long, text string",
    )
    assert duplicated_spans(docs).count() == 0


# ---------------------------------------------------------------------------
# Bootstrap confidence intervals
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_mean_deterministically(spark, sf_small):
    """The 95% CI must bracket the point estimate, be strictly
    ordered, and be bit-identical across runs (the resampling is a
    pure hash function, not an RNG)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        bootstrap_mean_ci,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    orders = read_table(spark, sf_small, "orders")
    r1 = bootstrap_mean_ci(orders).collect()[0]
    r2 = bootstrap_mean_ci(orders).collect()[0]
    assert r1 == r2  # deterministic
    assert r1.ci_lo < r1.mean_price < r1.ci_hi
    assert r1.n_replicates == 32


def test_bootstrap_ci_narrows_with_more_data(spark, sf_small, sf_med):
    """Sampling-theory sanity: 10x the rows shrinks the CI width by
    roughly sqrt(10) (allow a loose 1.5x-6x band — B=32 replicates)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        bootstrap_mean_ci,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    small = bootstrap_mean_ci(read_table(spark, sf_small, "orders")).collect()[0]
    med = bootstrap_mean_ci(read_table(spark, sf_med, "orders")).collect()[0]
    shrink = (small.ci_hi - small.ci_lo) / (med.ci_hi - med.ci_lo)
    assert 1.5 < shrink < 6.0


def test_poisson_threshold_ladder_is_the_integer_cdf():
    """The integer thresholds are floor(CDF_Poisson(1)(k) * 65536) —
    the spec constants both engines compare the same u16 against."""
    import math

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        _POIS_T,
    )

    cdf, fact = 0.0, 1
    for k, t in enumerate(_POIS_T):
        if k > 0:
            fact *= k
        cdf += math.exp(-1) / fact
        assert t == math.floor(cdf * 65536)


# ---------------------------------------------------------------------------
# GDPR erasure audit
# ---------------------------------------------------------------------------


def test_delete_report_consistent_and_residual_zero(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.maintenance import (
        warehouse_delete_report,
    )

    row = warehouse_delete_report(spark, sf_small).collect()[0]
    assert row.rows_before == row.rows_removed + row.rows_kept
    assert row.rows_removed > 0  # the request matched something
    assert row.residual_erased_rows == 0
    assert row.kept_total_price > 0.0


def test_delete_report_survives_full_erasure(spark, tmp_path):
    """A corpus where EVERY order belongs to an erased customer must
    produce a valid all-zero kept side (kept_total_price 0.0, not a
    float(None) crash) — locks the round-11 review fix."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.maintenance import (
        _ERASE_MOD,
        warehouse_delete_report,
    )

    sf = str(tmp_path)
    custkeys = [_ERASE_MOD * i for i in range(1, 4)]
    spark.createDataFrame(
        [(k, f"cust{k}") for k in custkeys], "c_custkey long, c_name string"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(i, custkeys[i % 3], 100.0 + i) for i in range(9)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    row = warehouse_delete_report(spark, sf).collect()[0]
    assert row.rows_before == 9
    assert row.rows_removed == 9
    assert row.rows_kept == 0
    assert row.residual_erased_rows == 0
    assert row.kept_total_price == 0.0


def test_delete_by_keys_removes_exactly_the_requested_keys(spark, sf_small, tmp_path):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.sinks import (
        delete_by_keys,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    path = str(tmp_path / "orders")
    orders = read_table(spark, sf_small, "orders")
    orders.write.parquet(path)
    keys = spark.createDataFrame([(7,), (13,)], "o_custkey long")
    expected_removed = orders.where(F.col("o_custkey").isin(7, 13)).count()
    removed = delete_by_keys(spark, path, keys, "o_custkey")
    assert removed == expected_removed
    after = spark.read.parquet(path)
    assert after.where(F.col("o_custkey").isin(7, 13)).count() == 0
    assert after.count() == orders.count() - expected_removed


# ---------------------------------------------------------------------------
# Blocked fuzzy matching (record linkage)
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_match_report_equals_bruteforce(spark, sf_small):
    """The blocked + length-band + threshold-levenshtein pipeline must
    equal a plain Python brute force over the same semantics."""
    from collections import Counter, defaultdict

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.linkage import (
        _FUZZY_T,
        fuzzy_match_report,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    part = read_table(spark, sf_small, "part")
    names = Counter(r.p_name for r in part.select("p_name").collect())
    blocks = defaultdict(Counter)
    for nm, cnt in names.items():
        blocks[nm.split(" ")[0]][nm] = cnt
    expected = {}
    for blk, members in blocks.items():
        n_rows = sum(members.values())
        exact = sum(c * (c - 1) // 2 for c in members.values())
        dists, row_pairs = [], 0
        ordered = sorted(members)
        for i, a in enumerate(ordered):
            for b in ordered[i + 1 :]:
                d = _levenshtein(a, b)  # no prefilter: the full truth
                if d <= _FUZZY_T:
                    dists.append(d)
                    row_pairs += members[a] * members[b]
        if dists:
            expected[blk] = (
                n_rows, len(members), exact, len(dists), row_pairs,
                min(dists), max(dists),
            )
    got = {
        r.block_token: (
            r.n_rows, r.n_names, r.exact_dup_pairs, r.fuzzy_name_pairs,
            r.fuzzy_row_pairs, r.min_dist, r.max_dist,
        )
        for r in fuzzy_match_report(part).collect()
    }
    assert got == expected
    assert got, "fixture should produce at least one fuzzy block"


def test_length_band_prefilter_is_a_levenshtein_lower_bound():
    """|len(a) - len(b)| <= levenshtein(a, b) for ALL strings, so the
    band prefilter can never drop a within-threshold pair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="ab ", max_size=12), st.text(alphabet="ab ", max_size=12))
    def check(a, b):
        assert abs(len(a) - len(b)) <= _levenshtein(a, b)

    check()


# ---------------------------------------------------------------------------
# Fixed-point PageRank (graph link analysis)
# ---------------------------------------------------------------------------


def _py_pagerank(pairs, hops):
    """Exact integer replication of fixed_point_pagerank."""
    from collections import defaultdict

    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    deg = {u: len(ns) for u, ns in adj.items()}
    r = {u: 1_000_000_000 for u in adj}
    for _ in range(hops):
        inflow = defaultdict(int)
        for u, ns in adj.items():
            c = r[u] // deg[u]
            for v in ns:
                inflow[v] += c
        r = {u: 150_000_000 + (inflow[u] * 85) // 100 for u in adj}
    return r, deg


def test_pagerank_equals_python_fixed_point(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.graph import (
        fixed_point_pagerank,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    orders = read_table(spark, sf_small, "orders")
    lineitem = read_table(spark, sf_small, "lineitem")
    pairs_df = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("u"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("v"),
        )
        .distinct()
    )
    pairs = [(r.u, r.v) for r in pairs_df.collect()]
    exp_r, exp_deg = _py_pagerank(pairs, hops=3)
    got = {r.u: (r.deg, r.rank_fp) for r in fixed_point_pagerank(pairs_df).collect()}
    assert got == {u: (exp_deg[u], exp_r[u]) for u in exp_r}
    assert len(got) > 50  # the sf0.001 purchase graph is non-trivial


def test_pagerank_center_of_star_dominates(spark):
    """On a star graph the hub must strictly outrank every leaf, and
    the result must be deterministic across runs."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.graph import (
        fixed_point_pagerank,
    )

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "u long, v long"
    )
    r1 = {r.u: r.rank_fp for r in fixed_point_pagerank(pairs).collect()}
    r2 = {r.u: r.rank_fp for r in fixed_point_pagerank(pairs).collect()}
    assert r1 == r2
    hub, leaves = r1[0], [r1[i] for i in range(1, 9)]
    assert all(hub > leaf for leaf in leaves)
    assert len(set(leaves)) == 1  # symmetry: identical leaves tie exactly


# ---------------------------------------------------------------------------
# Degenerate-input edges for the late-round-11 ops
# ---------------------------------------------------------------------------


def test_bootstrap_ci_degenerate_inputs(spark):
    """Empty input → zero rows (not a NULL-numeric report); a single
    row survives the zero-weight replicates (P = e^-1 each) without
    ANSI divide-by-zero and degenerates to a zero-width CI."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        bootstrap_mean_ci,
    )

    empty = spark.createDataFrame([], "o_orderkey long, o_totalprice double")
    assert bootstrap_mean_ci(empty).collect() == []
    one = spark.createDataFrame([(1, 5.0)], "o_orderkey long, o_totalprice double")
    row = bootstrap_mean_ci(one).collect()[0]
    assert row.n_orders == 1
    assert row.ci_lo == row.mean_price == row.ci_hi == 5.0


def test_fuzzy_and_pagerank_empty_inputs(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.graph import (
        fixed_point_pagerank,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.linkage import (
        fuzzy_match_report,
    )

    empty_part = spark.createDataFrame([], "p_partkey long, p_name string")
    assert fuzzy_match_report(empty_part).collect() == []
    empty_pairs = spark.createDataFrame([], "u long, v long")
    assert fixed_point_pagerank(empty_pairs).collect() == []


# ---------------------------------------------------------------------------
# Clustered layout for scan pruning
# ---------------------------------------------------------------------------


def _file_ranges(path, col):
    """Per-parquet-file (min, max) of ``col`` read from the footers."""
    import os

    import pyarrow.parquet as pq

    ranges = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                        hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
            if lo is not None:
                ranges.append((lo, hi))
    return sorted(ranges)


def test_cluster_by_layout_makes_footer_stats_selective(spark, sf_small, tmp_path):
    """After cluster_by_layout the per-file [min,max] ranges of the
    cluster column are pairwise non-overlapping (footer stats become a
    coarse index), the content is unchanged, and the append-ordered
    BEFORE layout really was non-selective (every file spans ~the full
    range) — i.e. the rewrite, not luck, creates the pruning."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.sinks import (
        cluster_by_layout,
    )

    path = str(tmp_path / "orders")
    orders = read_table(spark, sf_small, "orders")
    # Append-ordered layout: 8 round-robin files, each spanning ~all keys.
    orders.repartition(8).write.parquet(path)
    before = _file_ranges(path, "o_orderkey")
    assert len(before) == 8
    glo = min(lo for lo, _ in before)
    ghi = max(hi for _, hi in before)
    overlapping = sum(
        1 for (lo1, hi1), (lo2, hi2) in zip(before, before[1:]) if hi1 > lo2
    )
    assert overlapping >= 6  # round-robin: essentially every pair overlaps

    cluster_by_layout(spark, path, ["o_orderkey"], n_files=8)
    after = _file_ranges(path, "o_orderkey")
    assert len(after) == 8
    for (lo1, hi1), (lo2, hi2) in zip(after, after[1:]):
        assert hi1 <= lo2  # pairwise disjoint: a range predicate prunes files
    assert min(lo for lo, _ in after) == glo
    assert max(hi for _, hi in after) == ghi

    rewritten = spark.read.parquet(path)
    assert rewritten.count() == orders.count()
    assert (
        rewritten.agg(F.sum("o_orderkey")).collect()[0][0]
        == orders.agg(F.sum("o_orderkey")).collect()[0][0]
    )


def _files_intersecting(path, col, lo, hi):
    """How many parquet files COULD contain col in [lo, hi] per their
    footer min/max — i.e. how many a stats-pruning scan must read."""
    return sum(1 for mn, mx in _file_ranges(path, col) if mx >= lo and mn <= hi)


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """On a uniform 64x64 grid split into 8 files: a plain sort by x
    leaves a y-band query unprunable (every file spans all of y),
    while the Z-order layout bounds BOTH dimensions per file, so the
    same y-band query skips most files — and an x-band query still
    prunes too. Content must survive the rewrite bit-for-bit."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.sinks import (
        cluster_by_layout,
        zorder_by_layout,
    )

    grid = spark.range(4096).select(
        (F.col("id") % 64).cast("long").alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    xsorted, zpath = str(tmp_path / "xsorted"), str(tmp_path / "zorder")
    grid.write.parquet(xsorted)
    grid.write.parquet(zpath)
    cluster_by_layout(spark, xsorted, ["x"], n_files=8)
    zorder_by_layout(spark, zpath, ("x", "y"), n_files=8)

    # y-band query (y in [8, 15], 1/8 of the domain):
    assert _files_intersecting(xsorted, "y", 8, 15) == 8  # sort-by-x: no help
    assert _files_intersecting(zpath, "y", 8, 15) <= 4  # Z: boxes bound y
    # x-band query still prunes on the Z layout as well:
    assert _files_intersecting(zpath, "x", 8, 15) <= 4

    z = spark.read.parquet(zpath)
    assert z.count() == 4096
    assert sorted((r.x, r.y) for r in z.collect()) == sorted(
        (r.x, r.y) for r in grid.collect()
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time join
# ---------------------------------------------------------------------------


def test_point_in_time_join_is_lossless_and_unique(spark, sf_small):
    """Version intervals partition each key's timeline, so the PIT
    join must match EXACTLY one version per fact — same row count in,
    same row count out, no fan-out, no drops."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import (
        _client_versions,
        point_in_time_join,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    orders = read_table(spark, sf_small, "orders")
    versions = _client_versions(read_table(spark, sf_small, "customer"))
    joined = point_in_time_join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        versions,
        "o_custkey",
        F.col("o_orderdate"),
    )
    assert joined.count() == orders.count()
    assert joined.select("o_orderkey").distinct().count() == orders.count()


def test_point_in_time_attribution_diverges_from_live(spark):
    """A fact dated before a version change must attribute to the OLD
    version under PIT and the NEW one under as-is — the whole reason
    SCD2 exists."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import (
        OPEN_END,
        point_in_time_join,
    )

    versions = spark.createDataFrame(
        [
            (1, "OLD", "1992-01-01", "1998-01-01"),
            (1, "NEW", "1998-01-01", OPEN_END),
        ],
        "client_id long, segment string, valid_from string, valid_to string",
    )
    facts = spark.createDataFrame(
        [(100, 1, "1995-06-15"), (200, 1, "1998-01-01")],
        "fact_id long, o_custkey long, d string",
    )
    got = {
        r.fact_id: r.segment
        for r in point_in_time_join(facts, versions, "o_custkey", F.col("d")).collect()
    }
    assert got == {100: "OLD", 200: "NEW"}  # boundary day belongs to NEW
