"""Cold-build cost surface for the corpus-versioned artifact store.

The signature/fingerprint/quantizer/truth artifacts cut the WARM bench
dramatically (minhash family ~83 s → ~9 s in round 8), which means a
regression in the one-time build cost is invisible in the main bench
metric — warm numbers silently absorb it. This module enumerates every
artifact family's BUILD as a timeable unit so bench.py can emit a
separate ``artifact_build`` block per run: the per-corpus-version cost
becomes a measured, diffable number instead of prose in PERF.md.

Builders run the same code paths ``runtime.corpus_artifact`` invokes
(the pure build functions), but bypass the store entirely: they
measure build cost, never mutate the record a warm run serves.
DataFrame builds are fully materialized through the noop sink (the
same execution contract the bench's main loop uses); driver-side
builds (centroids, codebooks) materialize by returning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def artifact_builders(
    spark: SparkSession, sf_dir: str
) -> dict[str, Callable[[], object]]:
    """name -> zero-arg callable running one artifact family's cold
    build at ``sf_dir``. Names match the store's ``kind`` tags (plus
    the distinguishing params) so a BENCH_DETAIL reader can map a
    regression straight to the builder."""
    from .operators import similarity as S
    from .operators.dedup import (
        _build_postings,
        _build_tf,
        _jaccard_from_postings,
        _materialized_postings,
        minhash_signatures,
        simhash_fingerprints,
    )
    from .operators.segments import duplicated_spans
    from .sources.catalog import read_table

    def docs() -> DataFrame:
        return read_table(spark, sf_dir, "documents")

    def emb() -> DataFrame:
        return read_table(spark, sf_dir, "embeddings")

    def _materialize(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    def jacpairs() -> None:
        # Staged exactly like the production build: the pair artifact
        # consumes the POSTINGS artifact (its own cold cost is the
        # postings3 entry), so this times only the expansion.
        post = _materialized_postings(spark, sf_dir, n=3).select(
            "block", "doc_id", "sz", "s"
        )
        _materialize(_jaccard_from_postings(post, threshold=0.6))

    return {
        "postings3": lambda: _materialize(
            _build_postings(docs(), 3, extra_cols=("source",))
        ),
        "tfpostings3": lambda: _materialize(_build_tf(docs(), 3)),
        "minhashsig32x3": lambda: _materialize(
            minhash_signatures(docs(), 32, 3, portable=False)
        ),
        "minhashsig32x3p": lambda: _materialize(
            minhash_signatures(docs(), 32, 3, portable=True)
        ),
        "simhashfp32": lambda: _materialize(
            simhash_fingerprints(docs(), 32, portable=False)
        ),
        "simhashfp32p": lambda: _materialize(
            simhash_fingerprints(docs(), 32, portable=True)
        ),
        "jacpairs_t0.6_n3": jacpairs,
        "dupspans40m2": lambda: _materialize(duplicated_spans(docs())),
        "ivf_k16_i1": lambda: S.train_ivf_centroids(emb(), n_clusters=16, iters=1),
        f"ivf_k{S._LARGEK_CLUSTERS}_i1": lambda: S.train_ivf_centroids(
            emb(), n_clusters=S._LARGEK_CLUSTERS, iters=1
        ),
        "pq_m8_k16": lambda: S.train_pq_codebooks(emb(), m=8, k_codes=16),
        "anntruth_k10": lambda: _materialize(S.ann_truth_topk(emb())),
        # Staged like production: assignment derives from the STORED
        # quantizer (its own cold cost is the ivf_k16_i1 entry), so
        # this times only the assignment scan.
        "ivfassign_k16_i1": lambda: _materialize(
            S._assign_base(
                emb(),
                S._load_or_train_quantizer(emb(), sf_dir, n_clusters=16, iters=1),
            )
        ),
        "pqcodes_m8_k16": lambda: _materialize(
            S.pq_encode_table(
                emb(), S._load_or_train_pq(emb(), sf_dir, m=8, k_codes=16)
            )
        ),
        "lshsig_t8_b4": lambda: _materialize(S.lsh_sig_table(emb(), 8, 4)),
    }


def time_artifact_builds(
    spark: SparkSession, sf_dir: str
) -> dict[str, dict[str, object]]:
    """Run every cold build once and return {name: {sec} | {err}} —
    one failure never sinks the block (mirrors bench's scale-check
    error policy)."""
    import time

    out: dict[str, dict[str, object]] = {}
    for name, build in artifact_builders(spark, sf_dir).items():
        try:
            t0 = time.perf_counter()
            build()
            out[name] = {"sec": round(time.perf_counter() - t0, 3)}
        except Exception as exc:  # pragma: no cover - diagnostic path
            out[name] = {"err": str(exc)[:200]}
    return out
