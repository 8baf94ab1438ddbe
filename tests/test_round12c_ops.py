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
