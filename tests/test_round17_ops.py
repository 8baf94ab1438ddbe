"""Round-17 (optimization round 2) focused tests.

Each test pins an optimization that changed an operator's INTERNALS
this round, asserting the externally visible result is unchanged:

- pca_report's per-partition integer Gram kernel (mapInPandas numpy
  matmul) vs an independent brute-force recompute of the exact
  integer-scaled covariance definition;
- log_ratio_table's empty-occurrence short-circuit (advisor fix: the
  degenerate model must stay all-NULL, as before the round-16 totals
  inlining);
- connected_components' fast-path NULL-endpoint guard (advisor fix:
  NULL endpoints must fall through to the distributed loop, never
  TypeError inside the driver union-find);
- ivf_topk's probed-cluster prefilter (advisor fix: dropping
  never-probed clusters before the Arrow boundary must not change the
  ranked output, including in sparse-probe regimes).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F


def test_pca_gram_kernel_matches_bruteforce(spark):
    """The mapInPandas integer Gram kernel must reproduce the exact
    integer-scaled covariance the HOF explode used to compute: same
    clean-row filter, same floor(x*1e4+0.5) scaling, same BIGINT sums
    — asserted against an independent pure-Python recompute on a
    corpus with NULL, wrong-dim and NaN-bearing vectors mixed in."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.vectors import (
        _PCA_DIM,
        pca_report,
    )

    dim = _PCA_DIM
    rng_rows = []
    clean_vecs = []
    for i in range(97):
        # Deterministic pseudo-values in [-1, 1], varied per row/dim.
        vec = [
            math.sin(0.1 * i + 0.37 * j) * (1.0 - 0.001 * j) for j in range(dim)
        ]
        rng_rows.append((i, vec))
        clean_vecs.append(vec)
    # Dirty rows: NULL, wrong dimension, NaN-bearing — all excluded.
    rng_rows.append((1000, None))
    rng_rows.append((1001, [0.5] * (dim - 1)))
    rng_rows.append((1002, [float("nan")] + [0.25] * (dim - 1)))
    emb = spark.createDataFrame(
        rng_rows, "vec_id long, embedding array<float>"
    )
    out = pca_report(emb).collect()[0]
    assert out["n_vectors"] == 97
    assert out["n_excluded"] == 3

    # Independent recompute: float32 storage round-trip, then the same
    # scale/floor/int chain in plain Python.
    mat = np.asarray(clean_vecs, dtype=np.float32).astype(np.float64)
    sc = np.floor(mat * 10000.0 + 0.5).astype(object)
    n = mat.shape[0]
    P = (sc.T @ sc).astype(object)
    S = sc.sum(axis=0)
    ts = int(sum(int(n) * int(P[i, i]) - int(S[i]) ** 2 for i in range(dim)))
    total_var = float(ts) / n / n / 1e8
    tv_r6 = math.floor(total_var * 1e6 + 0.5) / 1e6
    assert out["total_var_r6"] == tv_r6
    assert out["eig_ok"] is True
    assert out["ortho_ok"] is True


def test_log_ratio_table_empty_occ_is_all_null(spark):
    """Advisor fix: an empty occurrence frame must produce the dense
    bucket spine with NULL ratios (the pre-round-16 degenerate
    behavior), not finite all-zero scores."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dsir import (
        _DSIR_BUCKETS,
        log_ratio_table,
    )

    occ = spark.createDataFrame(
        [], "doc_id long, is_target boolean, f long"
    )
    lam = log_ratio_table(occ).collect()
    assert len(lam) == _DSIR_BUCKETS
    assert all(r["lf"] is None for r in lam)


def test_cc_null_endpoints_fall_through_to_distributed(spark):
    """Advisor fix: NULL endpoints would TypeError inside the driver
    union-find's min()/max(); such graphs must take the distributed
    path (whose joins tolerate NULLs) and still label the non-NULL
    components correctly."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (None, 5)],
        "src long, dst long",
    )
    labels = {
        r["node"]: r["label"]
        for r in connected_components(edges).collect()
        if r["node"] is not None
    }
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10
    assert labels[5] == 5


def test_ivf_prefilter_keeps_ranked_output_sparse_probe(spark):
    """Advisor fix: the probed-cluster isin prefilter must not change
    the ranked output — exercised in a sparse-probe regime (nprobe=1,
    many clusters, one probing query) where most base clusters are
    dropped before the Arrow boundary."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
        ivf_topk,
    )

    rows = []
    for i in range(200):
        vec = [
            math.cos(0.05 * i + 0.11 * j) + (0.01 * ((i * 7 + j) % 5))
            for j in range(64)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 3)
    res = ivf_topk(
        emb, queries, k=5, n_clusters=16, nprobe=1
    ).collect()
    assert len(res) > 0
    # Rank invariants: per query, ranks are 1..k' with non-increasing
    # cosine — the kernel's block top-k contract.
    by_q: dict = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in lst] == list(range(1, len(lst) + 1))
        cosines = [r["cosine"] for r in lst]
        assert all(a >= b for a, b in zip(cosines, cosines[1:]))
