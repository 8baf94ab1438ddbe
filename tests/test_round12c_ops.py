"""Round-12 third wave: portable HyperLogLog under the exact gate,
the seasonal-naive forecast backtest, and per-source tf-idf keyword
extraction. Oracle equivalence runs in tests/test_oracle_parity.py;
here: Python replays of the full sketch/forecast math, the
mergeability property that makes HLL a distributed sketch, the
integer-cent half-up boundary the float spelling would flip, and
brute-force keyword equivalence."""

from __future__ import annotations

import datetime
import hashlib
import math
from collections import Counter

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sketches import (
    _HLL_EST_NUM,
    _HLL_M,
    _HLL_SALT,
    _HLL_W,
    hll_report,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.text import (
    _KW_SCALE,
    keywords_by_source,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
    seasonal_naive_backtest,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll_registers(keys) -> list[int]:
    regs = [0] * _HLL_M
    for k in keys:
        h = _h60(f"{_HLL_SALT}:{k}")
        b, w = h % _HLL_M, h // _HLL_M
        rho = _HLL_W + 1 if w == 0 else _HLL_W - w.bit_length() + 1
        regs[b] = max(regs[b], rho)
    return regs


def _py_hll_estimate(regs: list[int]) -> float:
    s_int = sum(int(2.0 ** (_HLL_W + 1 - m)) for m in regs)
    v = sum(1 for m in regs if m == 0)
    raw = _HLL_EST_NUM / float(s_int)
    if raw <= 2.5 * _HLL_M and v > 0:
        return float(_HLL_M) * math.log(float(_HLL_M) / v)
    return raw


def _round4(x: float) -> float:
    return math.floor(x * 10**4 + 0.5) / 10**4


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def test_hll_matches_python_replay(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0, "click" if i % 3 else "view", i % 537)
        for i in range(4000)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long"
    )
    got = {r["event_type"]: r for r in hll_report(ev).collect()}
    for etype in ("click", "view"):
        keys = {u for (_, _, t, u) in rows if t == etype}
        exp = _round4(_py_hll_estimate(_py_hll_registers(keys)))
        assert got[etype]["n_hll"] == exp, (etype, got[etype]["n_hll"], exp)
        assert got[etype]["n_exact"] == len(keys)


def test_hll_accuracy_envelope(spark, sf_small):
    """m=256 gives ~1.04/√256 = 6.5% std error; assert a loose 3-sigma
    envelope on the real fixture."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sketches import (
        q_approx_distinct_hll_portable,
    )

    rows = q_approx_distinct_hll_portable(spark, sf_small).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["rel_err"]) < 0.20, (r["event_type"], r["rel_err"])


def test_hll_registers_merge_by_max():
    """The distributed-sketch property: the register-wise MAX of two
    partial sketches IS the sketch of the union — the reason the
    groupBy MAX plan computes a mergeable state."""
    a = [f"a{i}" for i in range(800)]
    b = [f"b{i}" for i in range(500)]
    ra, rb = _py_hll_registers(a), _py_hll_registers(b)
    merged = [max(x, y) for x, y in zip(ra, rb)]
    assert merged == _py_hll_registers(a + b)


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------


def test_forecast_perfect_seasonality_zero_error(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 21 days, value depends only on weekday -> holdout error == 0
    for day in range(21):
        for j in range(3):
            eid += 1
            rows.append(
                (
                    eid,
                    t0 + datetime.timedelta(days=day, hours=j),
                    10.0 * ((day % 7) + 1),
                )
            )
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = seasonal_naive_backtest(ev).collect()
    assert len(out) == 7
    for r in out:
        assert r["abs_err"] == 0.0
        assert r["forecast"] == r["actual"]
        assert r["n_train_days"] == 2


def test_forecast_half_cent_boundary_rounds_up(spark):
    """Two train days at 100.00 and 100.01 -> the weekday mean is
    exactly 100.005; integer half-up must yield 100.01 (a float
    spelling sits one reorder-ulp from 100.00)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0 + datetime.timedelta(days=0), 100.00),
        (2, t0 + datetime.timedelta(days=7), 100.01),
        (3, t0 + datetime.timedelta(days=14), 55.0),  # holdout, same weekday
        # a second weekday so the holdout window isn't the whole corpus
        (4, t0 + datetime.timedelta(days=1), 1.0),
        (5, t0 + datetime.timedelta(days=8), 1.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["day"]: r for r in seasonal_naive_backtest(ev).collect()}
    target = datetime.date(2024, 1, 15)
    assert out[target]["forecast"] == 100.01
    assert out[target]["actual"] == 55.0


# ---------------------------------------------------------------------------
# Keywords by source
# ---------------------------------------------------------------------------


def test_keywords_match_bruteforce_and_drop_ubiquitous_terms(spark):
    data = [
        (0, "s0", "alpha alpha shared"),
        (1, "s0", "alpha shared"),
        (2, "s1", "beta shared beta"),
        (3, "s2", "gamma shared alpha"),
    ]
    docs = spark.createDataFrame(data, "doc_id long, source string, text string")
    got = [
        (r["source"], r["rnk"], r["token"], r["tf"], r["df_sources"], r["score_fp"])
        for r in keywords_by_source(docs, top_k=3).collect()
    ]
    # brute force
    tf: Counter = Counter()
    for _, src, text in data:
        for tok in text.split(" "):
            tf[(src, tok)] += 1
    df: Counter = Counter()
    for src, tok in tf:
        df[tok] += 1
    n_sources = 3
    exp = []
    for src in ("s0", "s1", "s2"):
        scored = []
        for (s, tok), c in tf.items():
            if s != src:
                continue
            idf = math.floor(math.log(n_sources / df[tok]) * _KW_SCALE)
            if idf > 0:
                scored.append((tok, c, df[tok], c * idf))
        scored.sort(key=lambda t: (-t[3], t[0]))
        for i, (tok, c, d, score) in enumerate(scored[:3], start=1):
            exp.append((src, i, tok, c, d, score))
    assert got == exp
    # 'shared' appears in every source -> idf 0 -> never a keyword
    assert all(t[2] != "shared" for t in got)


# ---------------------------------------------------------------------------
# A/B test report
# ---------------------------------------------------------------------------


def _arm(uid: int) -> int:
    return _h60(f"ab-v1:{uid}") % 2


def test_ab_test_detects_planted_effect(spark):
    """Plant a real effect along the operator's own hash assignment:
    arm-0 users purchase 5x, arm-1 users once -> huge z, significant,
    and the means/power sums match a Python replay exactly."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        ab_test_report,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(200):
        k = 5 if _arm(uid) == 0 else 1
        for j in range(k):
            eid += 1
            rows.append((eid, t0, "purchase", uid))
        eid += 1
        rows.append((eid, t0, "view", uid))  # everyone also views
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long"
    )
    r = ab_test_report(ev).collect()[0]
    n_a = sum(1 for u in range(200) if _arm(u) == 0)
    assert (r["n_users_a"], r["n_users_b"]) == (n_a, 200 - n_a)
    assert r["purchases_a"] == 5 * n_a and r["purchases_b"] == 200 - n_a
    assert r["mean_a"] == 5.0 and r["mean_b"] == 1.0
    # zero within-arm variance -> z is the guarded 0/0... no: means
    # differ but variances are 0 -> se2 == 0 -> guarded z = 0. Add one
    # perturbed user per arm instead to give variance.
    # (covered in the variance test below)


def test_ab_test_variance_and_significance(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        ab_test_report,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(400):
        # arm-0: 4 or 6 purchases (mean 5); arm-1: 0 or 2 (mean 1)
        base = 4 if _arm(uid) == 0 else 0
        k = base + (0 if uid % 2 else 2)
        for j in range(k):
            eid += 1
            rows.append((eid, t0, "purchase", uid))
        eid += 1
        rows.append((eid, t0, "view", uid))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long"
    )
    r = ab_test_report(ev).collect()[0]
    assert r["significant"] is True
    assert r["z_stat"] > 10  # enormous effect at n=400
    assert abs(r["mean_a"] - 5.0) < 1.1 and abs(r["mean_b"] - 1.0) < 1.1


def test_ab_test_zero_variance_guard(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        ab_test_report,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for uid in range(40):
        rows.append((uid, t0, "purchase", uid))  # everyone exactly 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long"
    )
    r = ab_test_report(ev).collect()[0]
    assert r["z_stat"] == 0.0
    assert r["significant"] is False


# ---------------------------------------------------------------------------
# Streaming HLL
# ---------------------------------------------------------------------------


def test_stream_hll_equals_batch_sketch(spark, sf_small):
    """Stream ≡ batch: the streaming register pipeline must produce
    byte-identical estimates to a batch run of the same sketch over
    the same grouping."""
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        stream_hll_daily_users,
    )

    got = {
        r["day"]: (r["n_exact"], r["n_hll"])
        for r in stream_hll_daily_users(spark, sf_small).collect()
    }
    ev = (
        read_table(spark, sf_small, "events")
        .where(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
    )
    regs = hll_registers(ev, key="user_id", group_cols=["day"])
    est = {
        r["day"]: math.floor(r["hll_raw"] * 10**4 + 0.5) / 10**4
        for r in hll_estimate(regs, ["day"]).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy("day").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert set(got) == set(est)
    for day, (n_exact, n_hll) in got.items():
        assert n_hll == est[day], day
        assert n_exact == exact[day], day


# ---------------------------------------------------------------------------
# Brand discount elasticity
# ---------------------------------------------------------------------------


def test_elasticity_matches_numpy_on_planted_line(spark):
    """Plant y = 2x + noise-free per brand and recover slope 2, r 1."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        brand_discount_elasticity,
    )

    li = spark.createDataFrame(
        [(p, x / 100.0, float(2 * x + 1)) for p in (1, 2) for x in range(0, 11)],
        "l_partkey long, l_discount double, l_quantity double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], "p_partkey long, p_brand string"
    )
    rows = {r["p_brand"]: r for r in brand_discount_elasticity(li, part).collect()}
    for b in ("Brand#A", "Brand#B"):
        assert rows[b]["n_lines"] == 11
        assert rows[b]["slope_qty_per_bp"] == 2.0
        assert rows[b]["pearson_r"] == 1.0


def test_elasticity_excludes_zero_variance_brand(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        brand_discount_elasticity,
    )

    li = spark.createDataFrame(
        [(1, 0.05, 7.0), (1, 0.05, 9.0), (2, 0.01, 3.0), (2, 0.09, 8.0)],
        "l_partkey long, l_discount double, l_quantity double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#const_x"), (2, "Brand#ok")], "p_partkey long, p_brand string"
    )
    got = [r["p_brand"] for r in brand_discount_elasticity(li, part).collect()]
    assert got == ["Brand#ok"]


# ---------------------------------------------------------------------------
# Template n-grams
# ---------------------------------------------------------------------------


def test_template_ngrams_breadth_not_repetition(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.text import (
        template_ngrams,
    )

    data = [
        # 'click here now' in 3 of 4 s0 docs; 'spam spam spam' repeated
        # 3x INSIDE one doc only
        (0, "s0", "click here now foo"),
        (1, "s0", "bar click here now"),
        (2, "s0", "click here now baz"),
        (3, "s0", "spam spam spam spam spam"),
        (4, "s1", "one two three"),
        (5, "s1", "xx"),  # < 3 words: not eligible, excluded from n_docs
    ]
    docs = spark.createDataFrame(data, "doc_id long, source string, text string")
    rows = [r.asDict() for r in template_ngrams(docs, top_k=2).collect()]
    s0 = [r for r in rows if r["source"] == "s0"]
    assert s0[0]["gram"] == "click here now"
    assert s0[0]["df_docs"] == 3 and s0[0]["n_docs"] == 4
    assert s0[0]["ratio_fp"] == 7500
    # the within-doc-repeated trigram counts ONE document
    spam = [r for r in rows if r["gram"] == "spam spam spam"]
    assert all(r["df_docs"] == 1 for r in spam)
    s1 = [r for r in rows if r["source"] == "s1"]
    assert s1[0]["n_docs"] == 1  # the 2-word doc is not in the denominator


# ---------------------------------------------------------------------------
# Audio fingerprint
# ---------------------------------------------------------------------------


def _py_afp(samples: bytes) -> int:
    # Replays the round-13 proportional-window construction: window w
    # covers bytes [w*n//NWIN, (w+1)*n//NWIN) of the WHOLE clip.
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        _AFP_BITS,
        _AFP_NWIN,
    )

    n = len(samples)

    def e(w):
        chunk = samples[(w * n) // _AFP_NWIN : ((w + 1) * n) // _AFP_NWIN]
        return sum(b * b for b in chunk)

    return sum(1 << w for w in range(_AFP_BITS) if e(w + 1) > e(w))


def test_audio_fingerprint_matches_python_replay(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        _AFP_MIN_LEN,
        audio_fingerprints,
    )

    clip = bytes((i * 7) % 95 + 32 for i in range(200))  # ascii range
    short = clip[: _AFP_MIN_LEN - 1]
    media = spark.createDataFrame(
        [(1, "audio", clip), (2, "audio", short), (3, "image", clip)],
        "media_id long, kind string, payload binary",
    )
    rows = audio_fingerprints(media).collect()
    assert [r["media_id"] for r in rows] == [1]  # short + non-audio dropped
    r = rows[0]
    exp = _py_afp(clip)
    assert r["fp"] == exp
    for k in range(4):
        assert r[f"band_{k}"] == (exp >> (8 * k)) & 255


def test_audio_fingerprint_volume_invariant(spark):
    """Scaling every sample by a constant scales every window energy
    by c^2, preserving every energy-difference sign -> identical
    fingerprint. The property that makes the sign hash perceptual."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        audio_fingerprints,
    )

    # pure doubling of a low-amplitude clip (stays in the ascii range
    # the guarded media frame promises):
    low = bytes((i * 13) % 30 + 33 for i in range(160))
    high = bytes(b * 2 for b in low)
    media = spark.createDataFrame(
        [(1, "audio", low), (2, "audio", high)],
        "media_id long, kind string, payload binary",
    )
    fps = {r["media_id"]: r["fp"] for r in audio_fingerprints(media).collect()}
    assert fps[1] == fps[2]
    assert fps[1] == _py_afp(low)
