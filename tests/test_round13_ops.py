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
