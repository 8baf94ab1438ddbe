"""Session-lifetime bookkeeping for intentional ``persist()`` calls.

Some operators MUST persist an intermediate (range-partitioned ranking
inputs: the sampled partition boundaries have to stay aligned with the
driver-side offsets; LSH banded frames: both sides of a self-join read
them). Nothing used to unpersist those blocks, so long sessions
(bench, metrics dashboards) accumulated MEMORY_AND_DISK cache until
eviction pressure cost more than the persists saved.

Every such persist is registered here; callers that know a result has
been FULLY materialized (a bench loop between queries, a test teardown)
call :func:`release_persisted`.

Every tracked persist is a pure PERFORMANCE pin: results must not
change when a block is dropped and its lineage recomputed. (The old
``global_row_number`` violated this — its collected offsets were only
valid for one sampling of ``repartitionByRange`` boundaries, so a
release + recompute silently corrupted surrogate keys. It is now
deterministic by construction: hash-sampled boundaries, no cache
dependence.) The memoized star cache (plans.etl.build_star_frames) is
deliberately NOT tracked — its persist is a cross-query feature, not a
leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Register an intentionally persisted frame for later release."""
    _LIVE.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = 0
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:
            pass
        n += 1
    return n


# ---------------------------------------------------------------------------
# Corpus-versioned artifact store
# ---------------------------------------------------------------------------

# In-process memo over the on-disk store; keys embed the corpus
# version, so entries never go stale within a process.
_ARTIFACT_MEMO: dict = {}


def corpus_artifact(
    sf_dir: str,
    src_name: str,
    kind: str,
    params: tuple,
    build,
    save,
    load,
    memo: bool = True,
):
    """A derived artifact (trained quantizer, PQ codebook, near-dup
    pair set, …) built at most once per CORPUS VERSION.

    The version key is the source parquet's (mtime_ns, size) —
    nanosecond mtime so a corpus regenerated within the same second
    cannot serve a stale artifact. If the source cannot be stat'ed,
    the artifact is built fresh and NOT stored (an 'unknown' version
    key would alias every unstatable corpus to one record).

    ``build()`` produces the artifact; ``save(artifact, path)`` must
    write to ``path`` atomically-enough for a local store (write tmp +
    os.replace for files; write dir + os.replace for parquet dirs);
    ``load(path)`` reads it back. Store failures (read-only fs,
    corrupt record) degrade to per-process building, never to errors.

    Concurrency contract (tested): two builders racing the same
    record resolve LAST-WRITER-WINS — each os.replace is atomic (the
    pid-suffixed tmp names keep cross-process staging writes apart),
    so a reader never observes a half-written record, only one
    builder's complete output. That is sufficient because artifacts
    are DETERMINISTIC functions of (corpus version, params): the two
    racers' outputs are interchangeable, so no arbitration is needed
    beyond atomicity. Non-deterministic artifacts must not use this
    store.

    ``memo=False`` skips the in-process memo — REQUIRED when the
    artifact is a session-bound object (a DataFrame): the memo is
    keyed by corpus version only, so a second SparkSession would
    receive a frame bound to the first.
    """
    import hashlib
    import os

    src = os.path.join(sf_dir, f"{src_name}.parquet")
    try:
        st = os.stat(src)
        ver = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        return build()
    key = (os.path.abspath(sf_dir), ver, kind, params)
    if memo:
        cached = _ARTIFACT_MEMO.get(key)
        if cached is not None:
            return cached
    store = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "corpus_artifacts",
    )
    tag = hashlib.sha256("|".join(map(str, key)).encode()).hexdigest()[:16]
    path = os.path.join(store, f"{kind}_{tag}")
    if os.path.exists(path):
        try:
            art = load(path)
            if memo:
                _ARTIFACT_MEMO[key] = art
            return art
        except Exception:
            pass  # unreadable record: rebuild and rewrite
    art = build()
    try:
        os.makedirs(store, exist_ok=True)
        save(art, path)
    except OSError:
        return art  # read-only store: per-process artifact only
    # Return the STORED record, not the build plan: for DataFrame
    # artifacts the build is a lazy plan whose save already executed
    # the expensive pipeline — handing the plan back would make the
    # consumer execute it a second time (measured ~2x on the postings
    # artifacts' cold path).
    try:
        art = load(path)
    except Exception:
        pass  # unreadable round-trip: the built artifact still serves
    if memo:
        _ARTIFACT_MEMO[key] = art
    return art


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory on the repo's warehouse volume.

    Maintenance operators (GDPR erasure audit, layout rewrites) stage
    working copies of real tables; ``tempfile.mkdtemp`` would put those
    under ``/tmp``, which on many hosts is a small tmpfs that a
    table-sized staging copy can exhaust. The warehouse volume is the
    disk sized for table data, so staging belongs next to the
    ``corpus_artifacts`` store. Callers own cleanup (``shutil.rmtree``
    in ``finally`` for per-invocation staging; ``atexit`` for
    process-lifetime staging)."""
    import os
    import uuid

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "scratch",
    )
    path = os.path.join(base, f"{prefix}{uuid.uuid4().hex}")
    os.makedirs(path)
    return path


def json_artifact_io():
    """(save, load) pair for JSON-serializable artifacts."""
    import json
    import os

    def save(art, path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(art, fh)
        os.replace(tmp, path)

    def load(path):
        with open(path) as fh:
            return json.load(fh)

    return save, load


def parquet_artifact_io(spark):
    """(save, load) pair for DataFrame artifacts stored as parquet
    dirs (tmp-write + atomic dir rename; load forces a footer read so
    a corrupt record fails inside corpus_artifact's retry)."""
    import os

    def save(df, path):
        tmp = f"{path}.tmp.{os.getpid()}"
        df.write.mode("overwrite").parquet(tmp)
        os.replace(tmp, path)

    def load(path):
        df = spark.read.parquet(path)
        df.schema
        return df

    return save, load
