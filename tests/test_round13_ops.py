"""Round-13 additions: the audio dedup detect→act completion
(fingerprint pairs → components → canonical keep — the audio twin of
round 12's image arc). Oracle equivalence for the oracle-bearing
entries is covered by tests/test_oracle_parity.py; this file asserts
what the oracle cannot see (per-cluster keep invariants, the
larger-payload preference on a constructed tie)."""

from __future__ import annotations

import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
    ascii_guarded,
    audio_dedup_keep,
    audio_fp_pairs,
    synthesize_media,
)

# ---------------------------------------------------------------------------
# Audio dedup keep (fingerprint pairs -> components -> canonical keep)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def audio_keep_frames(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    media = ascii_guarded(
        synthesize_media(read_table(spark, sf_small, "documents"))
    )
    pairs = audio_fp_pairs(media).collect()
    kept = audio_dedup_keep(media).collect()
    return pairs, kept


def test_audio_dedup_keep_one_keeper_per_cluster(audio_keep_frames):
    _pairs, kept = audio_keep_frames
    assert kept, "sf0.001 fixture must produce at least one near-dup cluster"
    by_cluster: dict = {}
    for r in kept:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1, f"cluster {cid}: {len(keepers)} keepers"
        k = keepers[0]
        b_max = max(m.payload_bytes for m in members)
        assert k.payload_bytes == b_max
        # ties -> smallest media_id among the argmax set
        assert k.media_id == min(
            m.media_id for m in members if m.payload_bytes == b_max
        )
        # min-label components: cluster id IS the smallest member id
        assert cid == min(m.media_id for m in members)


def test_audio_dedup_keep_membership_covers_pairs(audio_keep_frames):
    pairs, kept = audio_keep_frames
    label = {r.media_id: r.cluster_id for r in kept}
    for p in pairs:
        assert label.get(p.media_a) is not None
        assert label[p.media_a] == label[p.media_b], (
            f"pair ({p.media_a},{p.media_b}) split across clusters"
        )


def test_audio_dedup_keep_prefers_larger_payload(spark):
    # Two identical constant clips plus a LONGER constant near-dup:
    # at lengths 132 and 264 every proportional window has exactly 4
    # (resp. 8) samples, so constant samples make every window energy
    # equal, no bit ever rises, and all three share fingerprint 0
    # (hamming 0) — the keeper must be the big copy, not the smallest
    # id.
    media = spark.createDataFrame(
        [
            (1, "audio", b"a" * 132),
            (2, "audio", b"a" * 132),
            (3, "audio", b"a" * 264),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r for r in audio_dedup_keep(media).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r.cluster_id == 1 for r in rows.values())
    assert rows[3].keep and not rows[1].keep and not rows[2].keep


# ---------------------------------------------------------------------------
# Streaming media dedup (growing fingerprint index over micro-batches)
# ---------------------------------------------------------------------------


def test_stream_media_dedup_equals_batch_and_crosses_batches(spark, sf_small):
    """The streamed pair set must equal the one-shot batch pipelines'
    union (oracle parity covers values; this guards the set), and at
    least one pair must SPAN two micro-batch slices — i.e. the
    accumulated fingerprint index was actually probed, not just the
    within-batch self-joins."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        audio_fp_pairs,
        image_dhash_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        stream_media_dedup,
    )

    streamed = stream_media_dedup(spark, sf_small, n_slices=4, files_per_trigger=1)
    media = ascii_guarded(synthesize_media(read_table(spark, sf_small, "documents")))
    batch = {
        ("image", r.media_a, r.media_b, r.hamming)
        for r in image_dhash_pairs(media).collect()
    } | {
        ("audio", r.media_a, r.media_b, r.hamming)
        for r in audio_fp_pairs(media).collect()
    }
    s = {(r.kind, r.media_a, r.media_b, r.hamming) for r in streamed.collect()}
    assert s == batch
    assert s, "fixture must produce at least one media near-dup pair"
    cross = sum(1 for _, a, b, _h in s if a % 4 != b % 4)
    assert cross > 0, "no pair spans two slices — index probe untested"


# ---------------------------------------------------------------------------
# BPE apply step (mined merges -> exact per-doc token counts)
# ---------------------------------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, "src0", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )


def test_bpe_tokenize_greedy_overlap(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
    )

    # Corpus is all 'aaa': the only mined pair is 'aa'. Greedy
    # left-to-right: 'aaa' -> ['aa', 'a'] — ONE merge, not two.
    rows = {r.doc_id: r for r in bpe_token_counts(_docs(spark, ["aaa aaa"])).collect()}
    r = rows[0]
    assert r.n_symbols == 6
    assert r.n_tokens_bpe == 4  # two words x ['aa','a']
    assert r.n_merges_applied == 2


def test_bpe_tokenize_merge_consumes_symbol(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
    )

    # 'ab' dominates the corpus so it merges first; in 'abc' the b is
    # then inside the merged symbol, so a later 'bc' merge cannot
    # apply across the boundary: 'abc' -> ['ab', 'c'].
    docs = _docs(spark, ["ab ab ab ab abc bc"])
    rows = {r.doc_id: r for r in bpe_token_counts(docs).collect()}
    r = rows[0]
    # symbols: 4*2 + 3 + 2 = 13; merges: 'ab' x5 ('abc' has one) then
    # 'bc' applies only to the standalone 'bc' word -> 6 merges.
    assert r.n_symbols == 13
    assert r.n_merges_applied == 6
    assert r.n_tokens_bpe == 7


def test_bpe_tokenize_counts_are_conserved(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    rows = bpe_token_counts(docs).collect()
    assert rows
    for r in rows:
        assert r.n_symbols == r.n_tokens_bpe + r.n_merges_applied
        assert 0 < r.n_tokens_bpe <= r.n_symbols


def test_pack_spans_consumes_exact_counts(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.chunking import (
        pack_spans,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_small, "documents")
    tc = bpe_token_counts(docs).select(
        "doc_id", F.col("n_tokens_bpe").alias("n_tokens")
    )
    spans = pack_spans(docs, token_counts=tc).collect()
    exact = {r.doc_id: r.n_tokens for r in tc.collect()}
    assert spans
    by_source: dict = {}
    for s in spans:
        assert s.n_tokens == exact[s.doc_id], "span must carry the exact count"
        by_source.setdefault(s.source, []).append(s)
    # spans per source are contiguous: each doc starts where the
    # previous one ended (the packing invariant, now on exact counts)
    for members in by_source.values():
        members.sort(key=lambda r: r.doc_id)
        run = 0
        for m in members:
            assert m.tok_start == run
            run += m.n_tokens


def test_token_budget_consumes_exact_counts(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        token_budget_selection,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.text import (
        text_profile,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_small, "documents")
    tc = bpe_token_counts(docs).select(
        "doc_id", F.col("n_tokens_bpe").alias("n_tokens")
    )
    got = {
        r.source: (r.n_docs_selected, r.tokens_selected)
        for r in token_budget_selection(docs, token_counts=tc).collect()
    }
    # Python replay of the greedy exclusive-prefix rule on the same
    # (quality, exact-token) inputs.
    q = {r.doc_id: r.quality_score for r in text_profile(docs).collect()}
    srcs = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    toks = {r.doc_id: r.n_tokens for r in tc.collect()}
    # best quality first (the operator orders __q DESC, doc_id ASC)
    items = sorted(
        (((q.get(d) if q.get(d) is not None else float("-inf")), d) for d in srcs),
        key=lambda x: (-x[0], x[1]),
    )
    total = sum(toks.get(d, 0) for d in srcs)
    want: dict = {}
    run = 0
    for _, d in items:
        if run < 0.5 * total:
            n, t = want.get(srcs[d], (0, 0))
            want[srcs[d]] = (n + 1, t + toks.get(d, 0))
        run += toks.get(d, 0)
    assert got == want


# ---------------------------------------------------------------------------
# Streaming SCD2 maintenance
# ---------------------------------------------------------------------------


def test_stream_scd2_stacks_versions_across_batches(spark, sf_small):
    """A key hit by every CDC wave must accumulate the full version
    chain (seed + one version per wave), each version closed exactly
    where the next opens — proof the per-batch fold genuinely applied
    each wave to the PREVIOUS batch's state, not to the seed."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import OPEN_END
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        _SCD2_WAVES,
        stream_scd2_maintenance,
    )

    rows = stream_scd2_maintenance(spark, sf_small).collect()
    assert rows
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.client_id, []).append(r)
    # every key: exactly one live version; intervals chain
    for cid, vs in by_key.items():
        vs.sort(key=lambda r: r.valid_from)
        live = [v for v in vs if v.valid_to == OPEN_END]
        assert len(live) == 1, f"client {cid}: {len(live)} live versions"
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, f"client {cid}: interval gap"
    # a key divisible by every wave modulus stacks all versions
    import math

    lcm = math.lcm(*[m for _, m, _ in _SCD2_WAVES])
    stacked = [cid for cid in by_key if cid % lcm == 0 and cid != 0]
    if stacked:
        cid = stacked[0]
        segs = [v.segment for v in sorted(by_key[cid], key=lambda r: r.valid_from)]
        assert segs[1:] == [seg for _, _, seg in _SCD2_WAVES]


# ---------------------------------------------------------------------------
# Tokenizer fertility + rendezvous sharding
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_conserves_doc_counts(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
        tokenizer_fertility,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    fert = tokenizer_fertility(docs).collect()
    per_doc = bpe_token_counts(docs).collect()
    assert fert
    assert sum(r.n_docs for r in fert) == len(per_doc)
    assert sum(r.n_tokens_bpe for r in fert) == sum(r.n_tokens_bpe for r in per_doc)
    for r in fert:
        # fertility >= 1: a word is at least one token; chars/token >= 1
        assert r.fertility >= 1.0
        assert r.chars_per_token >= 1.0


def test_hrw_moved_docs_land_on_new_shard(spark, sf_small):
    """The HRW minimal-disruption property: adding shard N changes a
    doc's assignment ONLY to shard N (no lateral movement), and the
    movement total is far below the (N)/(N+1) a modulo reshard would
    cost."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        _HRW_SHARDS,
        _hrw_shard_col,
        shard_assignment_report,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_small, "documents")
    n = _HRW_SHARDS
    assigned = docs.select(
        _hrw_shard_col(F.col("doc_id"), n).alias("before"),
        _hrw_shard_col(F.col("doc_id"), n + 1).alias("after"),
    ).collect()
    moved = [r for r in assigned if r.before != r.after]
    assert all(r.after == n for r in moved), "lateral movement breaks HRW"
    # expected movement 1/(N+1); allow generous sampling slack but stay
    # far below the modulo reshard's N/(N+1)
    assert len(moved) / len(assigned) < 0.35
    rep = {r.shard: r for r in shard_assignment_report(docs).collect()}
    assert set(rep) <= set(range(n))
    assert sum(r.n_moved for r in rep.values()) == len(moved)


def test_cms_never_underestimates_and_conserves_mass(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sketches import (
        _CMS_D,
        cms_counters,
        cms_report,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from pyspark.sql import functions as F

    events = read_table(spark, sf_small, "events")
    ev = events.where(F.col("user_id").isNotNull()).select("user_id")
    n_total = ev.count()
    # mass conservation: every hash row's counters sum to N exactly
    per_row = {
        r.j: r.total
        for r in cms_counters(ev, "user_id")
        .groupBy("j")
        .agg(F.sum("c").alias("total"))
        .collect()
    }
    assert set(per_row) == set(range(_CMS_D))
    assert all(v == n_total for v in per_row.values())
    # the CMS guarantee: min over rows never underestimates
    rows = cms_report(events).collect()
    assert rows
    for r in rows:
        assert r.overestimate >= 0
        assert r.n_cms >= r.n_exact


def test_waterfill_conserves_budget_and_is_max_min_fair(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        _WF_BUDGET_FRAC,
        waterfill_allocation,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    rows = waterfill_allocation(docs).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    budget = int(total * _WF_BUDGET_FRAC)
    assert sum(r.allocated for r in rows) == min(budget, total)
    partial = sorted(r.allocated for r in rows if not r.is_full)
    full = [r for r in rows if r.is_full]
    for r in rows:
        assert 0 <= r.allocated <= r.n_tokens
    if partial:
        # common water level: partial allocations differ by at most 1
        assert partial[-1] - partial[0] <= 1
        # max-min fairness: a full source sits at or below the level
        # (n_full <= floor((B-P)/(m-j)) — provable from the full test)
        if full:
            assert max(r.allocated for r in full) <= partial[-1]


def test_audio_short_clips_never_cluster(spark):
    # Below the 132-sample minimum there is no full fingerprint: the
    # clip is dropped deterministically, so it cannot appear in pairs
    # or in the keep frame even when byte-identical to a long clip.
    media = spark.createDataFrame(
        [
            (1, "audio", b"a" * 131),
            (2, "audio", b"a" * 131),
            (3, "audio", b"a" * 150),
            (4, "audio", b"a" * 150),
        ],
        "media_id long, kind string, payload binary",
    )
    kept = audio_dedup_keep(media).collect()
    assert {r.media_id for r in kept} == {3, 4}


# ---------------------------------------------------------------------------
# Decision-stump split mining
# ---------------------------------------------------------------------------


def test_stump_splits_are_exact_and_ranked(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.classifier import (
        stump_split_report,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    rows = stump_split_report(docs).collect()
    assert rows
    n_total = rows[0].n_left + rows[0].n_right
    ginis = [r.gini_split for r in rows]
    assert ginis == sorted(ginis), "ranked ascending (purest first)"
    for r in rows:
        # counts conserve and nest
        assert r.n_left + r.n_right == n_total
        assert 0 <= r.pos_left <= r.n_left
        assert 0 <= r.pos_right <= r.n_right
        # weighted Gini of a binary label lives in [0, 0.5]
        assert 0.0 <= r.gini_split <= 0.5


def test_stump_splits_find_a_perfect_separator(spark):
    # Construct a corpus where n_tokens <= 5 EXACTLY separates 'en':
    # the top split must be that cell with gini 0.
    docs = spark.createDataFrame(
        [(i, "en" if i < 4 else "de", "src0",
          "w " * (3 if i < 4 else 50)) for i in range(8)],
        "doc_id long, lang string, source string, text string",
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.classifier import (
        stump_split_report,
    )

    top = stump_split_report(docs).collect()[0]
    assert top.gini_split == 0.0
    assert top.feature == "n_tokens"


# ---------------------------------------------------------------------------
# Hierarchical BPE (level-2 merges over level-1 symbols)
# ---------------------------------------------------------------------------


def test_bpe_hier_merges_level1_products(spark):
    """Corpus 'abab abab': level 1 mines 'ab' and segments each word
    as <ab><ab>; level 2 must mine the SYMBOL pair <ab><ab> — a merge
    the flat character-pair table cannot express — and collapse each
    word to one token."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts_hier,
    )

    r = bpe_token_counts_hier(_docs(spark, ["abab abab"])).collect()[0]
    assert r.n_symbols == 8
    assert r.n_tokens_l1 == 4  # two words x <ab><ab>
    assert r.n_tokens_l2 == 2  # two words x <abab>
    assert r.n_merges_l2 == 2


def test_bpe_hier_is_monotone_on_fixture(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_token_counts,
        bpe_token_counts_hier,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    hier = {r.doc_id: r for r in bpe_token_counts_hier(docs).collect()}
    flat = {r.doc_id: r for r in bpe_token_counts(docs).collect()}
    assert set(hier) == set(flat)
    assert any(h.n_merges_l2 > 0 for h in hier.values()), (
        "level 2 must apply at least one merge on the fixture"
    )
    for d, h in hier.items():
        assert h.n_tokens_l1 == flat[d].n_tokens_bpe  # level 1 identical
        assert 0 < h.n_tokens_l2 <= h.n_tokens_l1 <= h.n_symbols


def test_bpe_oracle_survives_degenerate_pair_count(spark):
    """Regression for the round-13 early-stop fix: a corpus with FEWER
    than _APPLY_K distinct pairs stops the oracle's recursive apply
    early — selecting the final state at the CAP (k=16) instead of at
    |merges| dropped every non-guard token and silently emptied the
    oracle while Spark returned rows."""
    import duckdb

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        ORACLE_BPE_TOKENIZE,
        ORACLE_BPE_TOKENIZE_HIER,
        bpe_token_counts,
        bpe_token_counts_hier,
    )

    from .oracle_harness import compare

    texts = ["aaa aaa ab", "ab b aaa"]  # 3 distinct pairs: aa, ab (no others)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, 'src0', '{t}', 'en', {len(t)})" for i, t in enumerate(texts)
        )
        + ") t(doc_id, source, text, lang, n_chars)"
    )
    docs = spark.createDataFrame(
        [(i, "src0", t, "en", len(t)) for i, t in enumerate(texts)],
        "doc_id long, source string, text string, lang string, n_chars long",
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.scalar import (
        decimals_to_double,
    )

    ok, msg = compare(decimals_to_double(bpe_token_counts(docs)), con, ORACLE_BPE_TOKENIZE)
    assert ok, msg
    ok, msg = compare(
        decimals_to_double(bpe_token_counts_hier(docs)), con, ORACLE_BPE_TOKENIZE_HIER
    )
    assert ok, msg
