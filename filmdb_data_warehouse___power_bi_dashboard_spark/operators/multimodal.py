"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (:func:`decode_image`) — everything around it is
real and tested: the schema contract, the mapInPandas batch shape,
the partitioning, and the deterministic byte-level features.

Scale notes: media blobs ride in parquet binary columns; feature
extraction is embarrassingly parallel (mapInPandas, no shuffle), and
downstream joins use only the extracted scalar features, never the
blobs. ``spark.sql.files.maxPartitionBytes`` bounds the blob bytes
per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..runtime import track_persist
from ..sources.catalog import read_table

# Typed media schema: blob + metadata struct (SURVEY-style explicit
# StructType; the analog of the reference's bytea staff.picture).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("payload_md5", T.StringType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — image decoding needs a codec library (PIL/cv2) that is
    not installed in this container. The Spark-side plumbing (schema,
    batching, partitioning) is real; plug a decoder in here on a
    cluster with codecs baked into the image."""
    raise NotImplementedError(
        "image decode requires PIL/cv2 (not in this container); "
        "byte-level features below are the deterministic fallback"
    )


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media derived from documents (utf-8 payload
    + synthesized metadata) so the binary pipeline is exercised
    end-to-end without codec libraries."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(640)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(480)) + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("doc_id"), F.lit(300)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched byte-level features via mapInPandas: length, md5,
    mean byte value, empirical byte entropy. The pandas function
    receives column-pruned batches (only the columns it reads survive
    the scan) and emits the declared FEATURES schema.

    Vectorized per payload (``np.frombuffer`` + ``np.bincount`` — the
    same idiom as the audio path below): the previous per-byte Python
    dict loop was this module's only scale-killer at 100 TB of media.
    md5 stays per-payload (hashlib releases the GIL and is C-speed).

    Exactness contract (feeds the oracle-checked twin
    ``multimodal_byte_entropy``): byte_mean is an exact int64 sum
    followed by ONE IEEE division — bit-identical to DuckDB's
    ``CAST(SUM(byte) AS DOUBLE)/n``. byte_entropy uses the
    ``(ln n - Σ c·ln c / n) / ln 2`` spelling over the 256-bin
    histogram so the SQL twin can replay it from a GROUP BY histogram;
    per-term libm and summation-order drift is ~1e-12, far under the
    twin's 1e-4 rounding grid."""
    import hashlib
    import math

    import numpy as np

    def _features(b: bytes) -> tuple[int, float, float]:
        n = len(b)
        if not n:
            return 0, 0.0, 0.0
        a = np.frombuffer(b, dtype=np.uint8)
        counts = np.bincount(a, minlength=256).astype(np.int64)
        nz = counts[counts > 0].astype(np.float64)
        s_clogc = float((nz * np.log(nz)).sum())
        ent = (math.log(n) - s_clogc / n) / math.log(2.0)
        mean = int(counts @ np.arange(256, dtype=np.int64)) / n
        return n, mean, ent

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n, mean, ent = _features(b)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "byte_len": n,
                        "payload_md5": hashlib.md5(b).hexdigest(),
                        "byte_mean": mean,
                        "byte_entropy": ent,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES.fields])

    return media.mapInPandas(_batches, schema=FEATURES)


def ascii_guarded(media: DataFrame) -> DataFrame:
    """Runtime assertion of the corpus invariant the byte-as-char SQL
    oracles (ORACLE_FRAME_SAMPLE / ORACLE_AUDIO_WINDOWS /
    ORACLE_BYTE_ENTROPY) replay: every payload decodes to a string
    with equal character count, i.e. pure ASCII. The invariant was
    previously only documented — a non-ASCII fixture would have
    surfaced as an opaque driver hash mismatch; now the job fails
    loudly with the offending media_id and a pointer to the rows-only
    path. The guard rides the media_id column (read by every
    consumer, so Catalyst cannot prune it away) and costs one decode
    + two length calls per row — nothing at 100 TB scale next to the
    payload scan itself."""
    ok = F.col("payload").isNull() | (
        F.octet_length(F.col("payload"))
        == F.char_length(F.decode(F.col("payload"), "UTF-8"))
    )
    guarded = F.when(ok, F.col("media_id")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "multimodal twin precondition violated: non-ASCII "
                    "payload (octet_length != char_length) for media_id="
                ),
                F.col("media_id").cast("string"),
                F.lit(
                    " — the byte-as-char SQL oracles only replay pure-ASCII "
                    "corpora; route non-ASCII media through the rows-only "
                    "multimodal_features path"
                ),
            )
        ).cast("long")
    )
    return media.withColumn("media_id", guarded)


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL twin of the byte-level features (length + md5 on the
    binary payload) — oracle-checked; proves the binary column path
    (encode → binary ops) agrees across engines. NULL payloads (NULL
    source text) carry no bytes to profile and would put a NULL in the
    BIGINT byte_len column (driver-unrepresentable): filtered on both
    engines (round-8), matching the frame/audio twins' guard."""
    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_media(docs).where(F.col("payload").isNotNull())
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("media_id")


ORACLE_BYTE_STATS = """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS payload_md5,
       CAST(doc_id % 640 + 1 AS INT) AS width,
       CAST(doc_id % 480 + 1 AS INT) AS height
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: the mapInPandas path (Arrow batches, python
    feature extraction). Equality with the SQL twin on the shared
    columns is asserted in pytest, and multimodal_byte_entropy below
    puts byte_mean / byte_entropy under the full driver hash gate."""
    docs = read_table(spark, sf_dir, "documents")
    return extract_features(synthesize_media(docs)).orderBy("media_id")


def q_multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked twin for the statistical half of
    :func:`extract_features` (byte_mean / byte_entropy — previously
    the registry's only value columns with no cross-engine evidence).
    The VALUES come from the mapInPandas kernel itself, so the driver
    hash attests the vectorized numpy path, not a parallel SQL
    re-implementation on the Spark side.

    The corpus text is pure ASCII (same invariant ORACLE_FRAME_SAMPLE
    documents), so DuckDB replays the byte histogram as an
    ``ascii(substring(...))`` unnest: byte_sum / n_distinct_bytes are
    exact integers, byte_mean is one exact-int division (bit-identical
    IEEE), and byte_entropy is rounded at 1e-4 — ~8 orders of
    magnitude above the measured cross-engine drift of the
    ``(ln n - Σ c·ln c / n)/ln 2`` spelling."""
    docs = read_table(spark, sf_dir, "documents")
    media = ascii_guarded(synthesize_media(docs))
    feats = extract_features(media).where(F.col("byte_len") > 0)
    ent_r4 = F.floor(F.col("byte_entropy") * 1e4 + F.lit(0.5)) / 1e4
    return feats.select(
        "media_id",
        "kind",
        "byte_len",
        # mean·len recovers the exact integer sum but in IEEE can land
        # at .999…; +0.5-floor (drift « 0.5) instead of a truncating
        # cast.
        F.floor(F.col("byte_mean") * F.col("byte_len") + F.lit(0.5))
        .cast("long")
        .alias("byte_sum"),
        "byte_mean",
        ent_r4.alias("byte_entropy_r4"),
    ).orderBy("media_id")


ORACLE_BYTE_ENTROPY = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         text, length(text) AS n
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
bytes AS (
  SELECT m.media_id, unnest([ascii(substring(m.text, i, 1)) for i in range(1, m.n + 1)]) AS byte
  FROM m
),
hist AS (
  SELECT media_id, byte, CAST(COUNT(*) AS BIGINT) AS c
  FROM bytes GROUP BY 1, 2
),
ent AS (
  SELECT media_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * byte) AS BIGINT) AS byte_sum,
         SUM(c * ln(CAST(c AS DOUBLE))) AS s_clogc
  FROM hist GROUP BY 1
)
SELECT m.media_id, m.kind,
       e.n AS byte_len,
       e.byte_sum,
       CAST(e.byte_sum AS DOUBLE) / e.n AS byte_mean,
       FLOOR((ln(CAST(e.n AS DOUBLE)) - e.s_clogc / e.n) / ln(2.0) * 1e4 + 0.5) / 1e4
         AS byte_entropy_r4
FROM ent e JOIN m ON m.media_id = e.media_id
ORDER BY m.media_id
"""


# ---------------------------------------------------------------------------
# Video frame sampling
# ---------------------------------------------------------------------------

FRAME_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def sample_frame_indices(media: DataFrame, k: int = 8) -> DataFrame:
    """Uniform deterministic k-of-n frame selection as a pure JVM
    expression: idx_i = floor(i·n_frames/k), deduplicated (short
    videos yield fewer than k). Non-video rows get an empty list, so
    the downstream explode drops them without a filter pass."""
    n = F.col("meta.n_frames")
    idx = F.when(
        (F.col("kind") == "video") & n.isNotNull() & (n > 0),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.floor(i * n / F.lit(k)).cast("int"),
            )
        ),
    ).otherwise(F.array().cast("array<int>"))
    return media.withColumn("frame_indices", idx)


def extract_frame_features(media: DataFrame, k: int = 8) -> DataFrame:
    """Per-sampled-frame features: frame index selection is JVM-side
    (:func:`sample_frame_indices`), then an Arrow-batched pandas
    function "decodes" each frame and features it. The decode stub
    slices the payload proportionally (frame f of n covers bytes
    [f·len/n, (f+1)·len/n)) — a real deployment replaces the slice
    with a container seek + codec decode, keeping the identical
    batch shape, schema, and partitioning (no shuffle anywhere).
    """

    # NULL payloads are excluded on BOTH sides (there is nothing to
    # decode; the oracle mirrors with text IS NOT NULL — a b'' stub
    # here would emit md5('') rows the SQL NULL propagation doesn't).
    frames = (
        sample_frame_indices(media.filter(F.col("payload").isNotNull()), k)
        .select(
            "media_id",
            "payload",
            F.col("meta.n_frames").alias("n_frames"),
            F.explode("frame_indices").alias("frame_idx"),
        )
    )

    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, n_frames, fi in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"], pdf["frame_idx"]
            ):
                b = bytes(payload) if payload is not None else b""
                n = int(n_frames)
                start = (int(fi) * len(b)) // n
                end = ((int(fi) + 1) * len(b)) // n
                fb = b[start:end]
                rows.append(
                    {
                        "media_id": media_id,
                        "frame_idx": int(fi),
                        "frame_len": len(fb),
                        "frame_md5": hashlib.md5(fb).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_FEATURES.fields])

    return frames.mapInPandas(_batches, schema=FRAME_FEATURES)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked frame sampling: the byte-slice decode stub is
    reproducible in SQL (substring on the blob), so unlike
    multimodal_features this mapInPandas path gets a full value-hash
    check, not just rows-only."""
    docs = read_table(spark, sf_dir, "documents")
    media = ascii_guarded(synthesize_media(docs))
    return extract_frame_features(media, k=8).orderBy("media_id", "frame_idx")


_SCENE_SCALE = 10_000
_SCENE_CUT_BP = 500_000  # 50 mean-byte units on the 1e4 grid


FRAME_MEANS = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_bp", T.LongType(), False),
    ]
)


def scene_cuts(
    media: DataFrame, k: int = 8, threshold_bp: int = _SCENE_CUT_BP
) -> DataFrame:
    """Scene-cut detection over the sampled frames: a cut is a jump in
    the per-frame mean byte value (the decode stub's luminance proxy —
    a real deployment swaps the byte mean for a frame embedding /
    histogram distance with the identical plan) between CONSECUTIVE
    sampled frames exceeding ``threshold_bp`` on the exact 1e4 integer
    grid. The standard pre-processing pass a video training pipeline
    runs to segment footage before captioning/sampling.

    Exactness: mean_bp = byte_sum·10⁴ // max(len,1) is pure integer
    arithmetic in the Arrow kernel and replayed bit-for-bit by the
    oracle's character-sum spelling (ASCII invariant, runtime-guarded).
    Scale shape: frame features are the same zero-shuffle mapInPandas
    pass as extract_frame_features; the LAG window partitions by
    media_id (≤ k rows per group — bounded, never global).
    """
    frames = sample_frame_indices(
        media.filter(F.col("payload").isNotNull()), k
    ).select(
        "media_id",
        "payload",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode("frame_indices").alias("frame_idx"),
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, n_frames, fi in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"], pdf["frame_idx"]
            ):
                b = bytes(payload) if payload is not None else b""
                n = int(n_frames)
                start = (int(fi) * len(b)) // n
                end = ((int(fi) + 1) * len(b)) // n
                fb = b[start:end]
                rows.append(
                    {
                        "media_id": media_id,
                        "frame_idx": int(fi),
                        "mean_bp": (sum(fb) * _SCENE_SCALE) // max(len(fb), 1),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_MEANS.fields])

    feats = frames.mapInPandas(_batches, schema=FRAME_MEANS)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    lagged = feats.withColumn("prev", F.lag("mean_bp").over(w))
    delta = F.abs(F.col("mean_bp") - F.col("prev"))
    return (
        lagged.where(F.col("prev").isNotNull() & (delta > threshold_bp))
        .select("media_id", "frame_idx", delta.cast("long").alias("delta_bp"))
        .orderBy("media_id", "frame_idx")
    )


def q_multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = ascii_guarded(synthesize_media(docs))
    return scene_cuts(media, k=8)


ORACLE_SCENE_CUTS = f"""
WITH vids AS (
  SELECT doc_id AS media_id,
         text AS payload,
         CAST(doc_id % 300 + 1 AS INT) AS n_frames
  FROM documents
  WHERE CAST(doc_id % 3 AS INT) = 2 AND text IS NOT NULL
),
idx AS (
  SELECT media_id, payload, n_frames,
         unnest(list_distinct([CAST(FLOOR(i * n_frames / 8) AS INT)
                               for i in range(0, 8)])) AS frame_idx
  FROM vids
),
sliced AS (
  SELECT media_id, frame_idx,
         substring(payload,
                   CAST(frame_idx * length(payload) // n_frames AS INT) + 1,
                   CAST((frame_idx + 1) * length(payload) // n_frames AS INT)
                   - CAST(frame_idx * length(payload) // n_frames AS INT))
           AS fb
  FROM idx
),
sums AS (
  SELECT media_id, frame_idx, length(fb) AS fl,
         COALESCE(list_sum([ascii(substring(fb, i, 1))
                            for i in range(1, length(fb) + 1)]), 0) AS bs
  FROM sliced
),
m AS (
  SELECT media_id, frame_idx,
         CAST(bs * {_SCENE_SCALE} // GREATEST(fl, 1) AS BIGINT) AS mean_bp
  FROM sums
),
lagged AS (
  SELECT media_id, frame_idx, mean_bp,
         LAG(mean_bp) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev
  FROM m
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(ABS(mean_bp - prev) AS BIGINT) AS delta_bp
FROM lagged
WHERE prev IS NOT NULL AND ABS(mean_bp - prev) > {_SCENE_CUT_BP}
ORDER BY media_id, frame_idx
"""


# DuckDB has no BLOB substring; the corpus text is pure ASCII
# (asserted at RUN TIME by ascii_guarded — round 9; a violating
# corpus fails with a named media_id instead of an opaque hash
# mismatch), so byte slicing of the utf-8 payload equals character
# slicing of the text — the oracle slices the VARCHAR.
ORACLE_FRAME_SAMPLE = """
WITH vids AS (
  SELECT doc_id AS media_id,
         text AS payload,
         CAST(doc_id % 300 + 1 AS INT) AS n_frames
  FROM documents
  WHERE CAST(doc_id % 3 AS INT) = 2 AND text IS NOT NULL
),
idx AS (
  SELECT media_id, payload, n_frames,
         unnest(list_distinct([CAST(FLOOR(i * n_frames / 8) AS INT)
                               for i in range(0, 8)])) AS frame_idx
  FROM vids
),
sliced AS (
  SELECT media_id, frame_idx,
         substring(payload,
                   CAST(frame_idx * length(payload) // n_frames AS INT) + 1,
                   CAST((frame_idx + 1) * length(payload) // n_frames AS INT)
                   - CAST(frame_idx * length(payload) // n_frames AS INT))
           AS fb
  FROM idx
)
SELECT media_id, frame_idx,
       CAST(length(fb) AS BIGINT) AS frame_len,
       md5(fb) AS frame_md5
FROM sliced
ORDER BY media_id, frame_idx
"""


# ---------------------------------------------------------------------------
# Audio windowing: per-window RMS energy (silence/clipping detection)
# ---------------------------------------------------------------------------

_AUDIO_WIN = 100  # samples per analysis window (non-overlapping)

AUDIO_WINDOWS = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("mean_sample", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def audio_window_energy(media: DataFrame, win: int = _AUDIO_WIN) -> DataFrame:
    """Windowed audio energy via Arrow-batched ``mapInPandas``: the
    payload is treated as unsigned 8-bit PCM (the deterministic
    decode stub — a real deployment swaps in soundfile/ffmpeg here,
    same schema), cut into non-overlapping ``win``-sample windows,
    and each window reports its mean sample and RMS — the primitives
    behind silence trimming and clipping detection in audio curation.

    Exactness: windows are vectorized int64 sums (exact), one IEEE
    division + sqrt at the end, rounded with the floor(x*1e6+0.5)
    device — Python floats are IEEE doubles, so the values match the
    SQL oracle bit-for-bit.

    Scale shape: pure map-side (mapInPandas over column-pruned
    batches, no shuffle at all); output is the only thing that grows
    (len/win rows per clip), and the tail shorter than one window is
    dropped deterministically on both engines.
    """
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, idxs, means, rmss = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_w = len(b) // win
                if not n_w:
                    continue
                arr = (
                    np.frombuffer(b[: n_w * win], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(n_w, win)
                )
                # Fully vectorized per-window math: np divide/sqrt/
                # floor are the same IEEE elementwise ops as the
                # scalar spelling, so values stay bit-identical to
                # the SQL oracle with zero per-window Python work.
                mean = np.floor(arr.sum(axis=1) / float(win) * 1e6 + 0.5) / 1e6
                rms = (
                    np.floor(
                        np.sqrt((arr * arr).sum(axis=1) / float(win)) * 1e6 + 0.5
                    )
                    / 1e6
                )
                ids.append(np.full(n_w, media_id, dtype=np.int64))
                idxs.append(np.arange(n_w, dtype=np.int32))
                means.append(mean)
                rmss.append(rms)
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": np.concatenate(ids),
                        "window_idx": np.concatenate(idxs),
                        "mean_sample": np.concatenate(means),
                        "rms": np.concatenate(rmss),
                    },
                    columns=[f.name for f in AUDIO_WINDOWS.fields],
                )
            else:
                yield pd.DataFrame(
                    {k: [] for k in (f.name for f in AUDIO_WINDOWS.fields)}
                )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(_batches, schema=AUDIO_WINDOWS)
    )


def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = ascii_guarded(synthesize_media(docs))
    return audio_window_energy(media).orderBy("media_id", "window_idx")


# Same ASCII invariant as ORACLE_FRAME_SAMPLE: the corpus text is
# pure ASCII, so byte-as-sample equals ascii(char) and the oracle
# replays the stub decode on the VARCHAR.
ORACLE_AUDIO_WINDOWS = f"""
WITH auds AS (
  SELECT doc_id AS media_id, text AS payload
  FROM documents
  WHERE CAST(doc_id % 3 AS INT) = 1 AND text IS NOT NULL
),
win AS (
  SELECT media_id, payload,
         unnest(range(0, length(payload) // {_AUDIO_WIN})) AS window_idx
  FROM auds
),
chunked AS (
  SELECT media_id, CAST(window_idx AS INT) AS window_idx,
         substring(payload, CAST(window_idx * {_AUDIO_WIN} AS INT) + 1,
                   {_AUDIO_WIN}) AS chunk
  FROM win
),
sums AS (
  SELECT media_id, window_idx,
         list_sum([ascii(substring(chunk, i, 1))
                   for i in range(1, {_AUDIO_WIN} + 1)]) AS s1,
         list_sum([ascii(substring(chunk, i, 1)) * ascii(substring(chunk, i, 1))
                   for i in range(1, {_AUDIO_WIN} + 1)]) AS s2
  FROM chunked
)
SELECT media_id, window_idx,
       FLOOR(CAST(s1 AS DOUBLE) / {_AUDIO_WIN}.0 * 1e6 + 0.5) / 1e6
         AS mean_sample,
       FLOOR(sqrt(CAST(s2 AS DOUBLE) / {_AUDIO_WIN}.0) * 1e6 + 0.5) / 1e6
         AS rms
FROM sums
ORDER BY media_id, window_idx
"""


# ---------------------------------------------------------------------------
# Image perceptual near-dup: dHash + Hamming pigeonhole banding
# ---------------------------------------------------------------------------

_DHASH_ROWS = 8  # difference-hash grid: 8 rows x 9 cols -> 64 bits
_DHASH_COLS = _DHASH_ROWS + 1
_DHASH_CELLS = _DHASH_ROWS * _DHASH_COLS  # 72
_DHASH_BANDS = 4  # 16-bit bands; pigeonhole-complete for hamming <= 3
_DHASH_MAX_HAMMING = _DHASH_BANDS - 1

DHASH = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        *[
            T.StructField(f"b{k}", T.LongType(), False)
            for k in range(_DHASH_BANDS)
        ],
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: "decode" the
    payload to an 8×9 grayscale grid (cell = exact int sum of its
    proportional byte slice — the same byte-slice decode stub as
    :func:`extract_frame_features`; a real deployment swaps in a codec
    resize keeping the schema), then set bit (r,c) where the right
    neighbour is brighter: ``p[r][c+1] > p[r][c]`` — 64 bits, robust
    to brightness shifts since only the gradient sign survives.

    The hash ships as four 16-bit band values (sign-safe BIGINTs, and
    exactly the pigeonhole chunks the pair join buckets on) rather
    than one 64-bit word whose top bit would go negative in a signed
    long. Arrow-batched mapInPandas, vectorized per payload (cumsum
    slice sums — no per-cell Python); no shuffle.

    Images shorter than one byte per cell (72) are dropped on both
    engines: their empty slices make degenerate all-zero grids that
    band-match every other tiny image at hamming 0.
    """
    import numpy as np

    imgs = media.filter(
        (F.col("kind") == "image")
        & F.col("payload").isNotNull()
        & (F.octet_length("payload") >= _DHASH_CELLS)
    ).select("media_id", "payload")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_DHASH_CELLS + 1, dtype=np.int64)
        weights = 1 << np.arange(16, dtype=np.int64)
        for pdf in it:
            out = {"media_id": []}
            for k in range(_DHASH_BANDS):
                out[f"b{k}"] = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                edges = (idx * n) // _DHASH_CELLS
                cum = np.concatenate(([0], np.cumsum(a)))
                grid = (cum[edges[1:]] - cum[edges[:-1]]).reshape(
                    _DHASH_ROWS, _DHASH_COLS
                )
                bits = (grid[:, 1:] > grid[:, :-1]).astype(np.int64).ravel()
                out["media_id"].append(media_id)
                for k in range(_DHASH_BANDS):
                    out[f"b{k}"].append(
                        int((bits[16 * k : 16 * (k + 1)] * weights).sum())
                    )
            yield pd.DataFrame(out, columns=[f.name for f in DHASH.fields])

    return imgs.mapInPandas(_batches, schema=DHASH)


def image_dhash_pairs(
    media: DataFrame, max_hamming: int = _DHASH_MAX_HAMMING
) -> DataFrame:
    """Image near-dup pairs with dHash Hamming distance <= max_hamming
    — the training-pipeline image-dedup workhorse. Candidate
    generation is the simhash pigeonhole (dedup.py:simhash_pairs): 4
    bands of 16 bits, any pair within radius 3 agrees on >= 1 band, so
    pairs form only inside band-equality buckets — never all-pairs,
    and a 16-bit band keys ~n/65536 rows per bucket at scale (wider
    bands than simhash's 8-bit chunks exactly because image corpora
    are bigger than near-dup text clusters)."""
    hashes = track_persist(image_dhash(media).persist())
    band_arr = F.array(
        *[
            F.struct(F.lit(k).alias("band"), F.col(f"b{k}").alias("val"))
            for k in range(_DHASH_BANDS)
        ]
    )
    banded = hashes.select(
        "media_id",
        *[f"b{k}" for k in range(_DHASH_BANDS)],
        F.explode(band_arr).alias("c"),
    ).select(
        "media_id",
        *[f"b{k}" for k in range(_DHASH_BANDS)],
        F.col("c.band").alias("band"),
        F.col("c.val").alias("val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")))
        for k in range(_DHASH_BANDS)
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["media_a", "media_b"])
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("media_a", "media_b")
    )


def q_multimodal_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked image perceptual near-dup: the byte-slice decode
    is SQL-replayable under the ASCII invariant (runtime-asserted by
    :func:`ascii_guarded`), so the DuckDB oracle recomputes the full
    dHash + banding + Hamming pipeline from raw text and the driver
    hash attests the numpy kernel AND the pigeonhole join."""
    docs = read_table(spark, sf_dir, "documents")
    media = ascii_guarded(synthesize_media(docs))
    return image_dhash_pairs(media)


# Byte-as-char replay of the dHash kernel (ASCII invariant, as in
# ORACLE_FRAME_SAMPLE): pixel sums via prefix-free slice comprehensions,
# bit (r,c) at flat index b = idx - idx//9, bands = 16-bit windows.
# Kept as a WITH-body fragment (ending at the candidate-pair CTE) so
# the cluster/keep oracle below replays the identical pipeline; the
# pairs oracle string it composes into is byte-for-byte what shipped
# in round 11 (def-hash-stable).
_DHASH_CAND_CTES = f"""imgs AS (
  SELECT doc_id AS media_id, text AS payload, length(text) AS n
  FROM documents
  WHERE CAST(doc_id % 3 AS INT) = 0 AND text IS NOT NULL
    AND length(text) >= {_DHASH_CELLS}
),
pix AS (
  SELECT media_id, CAST(idx AS INT) AS idx,
         COALESCE(list_sum([ascii(substring(payload, i, 1))
                            for i in range(CAST(idx * n // {_DHASH_CELLS} AS INT) + 1,
                                           CAST((idx + 1) * n // {_DHASH_CELLS} AS INT) + 1)]),
                  0) AS p
  FROM imgs CROSS JOIN (SELECT unnest(range(0, {_DHASH_CELLS})) AS idx) ii
),
bitsrc AS (
  SELECT p0.media_id,
         CAST(p0.idx - p0.idx // {_DHASH_COLS} AS INT) AS b,
         CASE WHEN p1.p > p0.p THEN 1 ELSE 0 END AS bit
  FROM pix p0 JOIN pix p1
    ON p1.media_id = p0.media_id AND p1.idx = p0.idx + 1
  WHERE p0.idx % {_DHASH_COLS} < {_DHASH_COLS - 1}
),
hashes AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN b // 16 = 0 THEN CAST(bit AS BIGINT) << (b % 16) ELSE 0 END) AS BIGINT) AS b0,
         CAST(SUM(CASE WHEN b // 16 = 1 THEN CAST(bit AS BIGINT) << (b % 16) ELSE 0 END) AS BIGINT) AS b1,
         CAST(SUM(CASE WHEN b // 16 = 2 THEN CAST(bit AS BIGINT) << (b % 16) ELSE 0 END) AS BIGINT) AS b2,
         CAST(SUM(CASE WHEN b // 16 = 3 THEN CAST(bit AS BIGINT) << (b % 16) ELSE 0 END) AS BIGINT) AS b3
  FROM bitsrc GROUP BY media_id
),
banded AS (
  SELECT media_id, b0, b1, b2, b3, CAST(band AS INT) AS band,
         CASE band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS val
  FROM hashes CROSS JOIN (SELECT unnest(range(0, {_DHASH_BANDS})) AS band) bb
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS INT)
           AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.val = b.val AND a.media_id < b.media_id
)"""

ORACLE_IMAGE_DHASH_PAIRS = f"""
WITH {_DHASH_CAND_CTES}
SELECT media_a, media_b, hamming FROM cand
WHERE hamming <= {_DHASH_MAX_HAMMING} ORDER BY media_a, media_b
"""


def image_dedup_keep(media: DataFrame) -> DataFrame:
    """The detect→act completion of image dedup (text got it first:
    dup_spans → span_removal, pairs → clusters → keep_policy; this
    closes the same arc for media): dHash near-dup pairs → connected
    components (dedup.connected_components — min-label propagation,
    per-round shuffle O(|E|)) → canonical-keep. Within each near-dup
    cluster the KEPT copy is the one with the largest payload (bytes —
    the resolution/quality proxy a real image pipeline argmaxes before
    codecs enter the picture; ties → smallest media_id), everything
    else is marked a drop.

    Keep selection is all-aggregate (per-cluster max, then min id
    among the argmax ties — the dedup_keep_policy spelling): no
    per-cluster window, so one boilerplate-heavy giant cluster costs
    two bounded hash aggs, never a within-cluster sort. The
    cluster-level frames (one row per cluster) get no forced
    broadcast — AQE broadcasts them when small, which they are by
    construction at fixture SFs but not by any enforced bound.

    Returns (cluster_id, media_id, payload_bytes, keep) — one row per
    clustered image, exactly one keep=true per cluster.
    """
    from .dedup import connected_components

    pairs = image_dhash_pairs(media)
    comp = connected_components(pairs, src="media_a", dst="media_b").select(
        F.col("node").alias("media_id"), F.col("label").alias("cluster_id")
    )
    size = media.filter(
        (F.col("kind") == "image") & F.col("payload").isNotNull()
    ).select(
        "media_id", F.octet_length("payload").cast("long").alias("payload_bytes")
    )
    members = comp.join(size, "media_id")
    mx = members.groupBy("cluster_id").agg(
        F.max("payload_bytes").alias("__b_max")
    )
    keepers = (
        members.join(mx, "cluster_id")
        .where(F.col("payload_bytes") == F.col("__b_max"))
        .groupBy("cluster_id")
        .agg(F.min("media_id").alias("__keeper"))
    )
    return (
        members.join(keepers, "cluster_id")
        .select(
            "cluster_id",
            "media_id",
            "payload_bytes",
            (F.col("media_id") == F.col("__keeper")).alias("keep"),
        )
        .orderBy("cluster_id", "media_id")
    )


def q_multimodal_image_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked image dedup end-to-end: the DuckDB oracle
    replays the whole chain — dHash kernel (ASCII invariant), banded
    pigeonhole pairs, recursive-CTE transitive closure, argmax keep —
    so the driver hash attests candidate generation, clustering AND
    the keep decision in one value-hash."""
    docs = read_table(spark, sf_dir, "documents")
    media = ascii_guarded(synthesize_media(docs))
    return image_dedup_keep(media)


# Transitive closure + keep over the SAME candidate CTEs the pairs
# oracle uses (payload_bytes == imgs.n: octet_length == char length
# under the runtime-asserted ASCII invariant).
ORACLE_IMAGE_DEDUP_KEEP = f"""
WITH RECURSIVE {_DHASH_CAND_CTES},
pairs AS (
  SELECT media_a, media_b FROM cand WHERE hamming <= {_DHASH_MAX_HAMMING}
),
edges AS (
  SELECT media_a AS a, media_b AS b FROM pairs
  UNION
  SELECT media_b, media_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS media_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id
  FROM reach GROUP BY a
),
members AS (
  SELECT c.cluster_id, c.media_id, CAST(i.n AS BIGINT) AS payload_bytes
  FROM comp c JOIN imgs i ON i.media_id = c.media_id
),
mx AS (
  SELECT cluster_id, MAX(payload_bytes) AS b_max FROM members GROUP BY 1
),
keepers AS (
  SELECT m.cluster_id, MIN(m.media_id) AS keeper
  FROM members m JOIN mx ON m.cluster_id = mx.cluster_id
  WHERE m.payload_bytes = mx.b_max
  GROUP BY m.cluster_id
)
SELECT m.cluster_id, m.media_id, m.payload_bytes,
       m.media_id = k.keeper AS keep
FROM members m JOIN keepers k ON m.cluster_id = k.cluster_id
ORDER BY m.cluster_id, m.media_id
"""


# ---------------------------------------------------------------------------
# Audio perceptual fingerprint: energy-difference sign hash
# ---------------------------------------------------------------------------

_AFP_BITS = 32  # fingerprint width -> needs _AFP_BITS+1 windows
_AFP_NWIN = _AFP_BITS + 1  # proportional windows spanning the WHOLE clip
_AFP_MIN_LEN = 4 * _AFP_NWIN  # 132 samples -> every window >= 4 samples
_AFP_BANDS = 4  # 8-bit bands; pigeonhole chunks for hamming <= 3

AFP = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fp", T.LongType(), False),
        *[
            T.StructField(f"band_{k}", T.LongType(), False)
            for k in range(_AFP_BANDS)
        ],
    ]
)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """Perceptual audio fingerprint (Haitsma–Kalker 2002, simplified):
    cut the WHOLE clip into {bits+1} proportional windows, take each
    window's ENERGY (exact integer sum of squared samples under the
    byte-PCM decode stub), and set bit w when the energy RISES from
    window w to w+1 — the sign of the energy derivative, robust to
    volume scaling and mild noise, the classic broadcast-monitoring
    fingerprint.

    Round-13 upgrade over the r12 spelling: the windows are now
    PROPORTIONAL byte slices covering the entire clip (edge w =
    w·n/{nwin}, exactly the image dHash's length-normalized cell
    scheme) instead of a fixed 132-sample prefix. The prefix form was
    pure codegen SQL but fingerprinted only the clip's first 132
    samples — two near-duplicate clips differing in their opening
    samples never matched, and measured on the fixture it produced
    ZERO hamming≤3 candidates while the corpus demonstrably contains
    near-dup clips (Jaccard≥0.65 pairs inside the audio subset). The
    proportional form fingerprints the full signal and survives
    length scaling, at the cost of moving the kernel into an
    Arrow-batched mapInPandas (cumsum slice sums, vectorized per
    payload — no per-window Python), the exact trade the image arc
    already made.

    Returns (``media_id``, ``fp``, ``band_0..band_3``) per audio clip
    of at least {minlen} samples (shorter clips have no 4-sample
    window everywhere and are dropped deterministically — the audio
    twin of the image path's tiny-image drop). The four 8-bit bands
    are the pigeonhole chunks the hamming ≤ 3 candidate join buckets
    on — exactly the image dHash pair machinery (multimodal.py:630).
    Exactness: integer arithmetic end-to-end; the DuckDB oracle
    replays the construction from raw text under the runtime-asserted
    ASCII invariant. Scale shape: one Arrow-batched scan projection,
    no shuffle; the downstream band join shuffles only
    (band, media_id).
    """
    return _audio_fp_frame(media).orderBy("media_id")


def _audio_fp_frame(media: DataFrame) -> DataFrame:
    """The unordered fingerprint construction — the composition point
    for the dedup arc (sorting before a band join would be a wasted
    global sort; the public artifact entry adds the ORDER BY)."""
    import numpy as np

    auds = media.filter(
        (F.col("kind") == "audio")
        & F.col("payload").isNotNull()
        & (F.octet_length("payload") >= _AFP_MIN_LEN)
    ).select("media_id", "payload")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_AFP_NWIN + 1, dtype=np.int64)
        weights = 1 << np.arange(_AFP_BITS, dtype=np.int64)
        cols = [f.name for f in AFP.fields]
        for pdf in it:
            out = {c: [] for c in cols}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                edges = (idx * n) // _AFP_NWIN
                cum = np.concatenate(([0], np.cumsum(a * a)))
                e = cum[edges[1:]] - cum[edges[:-1]]
                bits = (e[1:] > e[:-1]).astype(np.int64)
                fp = int((bits * weights).sum())
                out["media_id"].append(media_id)
                out["fp"].append(fp)
                for k in range(_AFP_BANDS):
                    out[f"band_{k}"].append((fp >> (8 * k)) & 255)
            yield pd.DataFrame(out, columns=cols)

    return auds.mapInPandas(_batches, schema=AFP)


def q_multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ascii_guarded(synthesize_media(read_table(spark, sf_dir, "documents")))
    return audio_fingerprints(media)


# Byte-as-char replay of the proportional-window fingerprint kernel
# (ASCII invariant, as in _DHASH_CAND_CTES): window energies via
# prefix-free slice comprehensions over squared char codes, bit w set
# iff window w+1's energy strictly exceeds window w's, bands = 8-bit
# windows of the fingerprint. Kept as a WITH-body fragment so the
# dedup-keep oracle replays the identical construction.
_AFP_FP_CTES = f"""auds AS (
  SELECT doc_id AS media_id, text AS payload, length(text) AS n
  FROM documents
  WHERE CAST(doc_id % 3 AS INT) = 1 AND text IS NOT NULL
    AND length(text) >= {_AFP_MIN_LEN}
),
win AS (
  SELECT media_id, CAST(w AS INT) AS w,
         COALESCE(list_sum([CAST(ascii(substring(payload, i, 1)) AS BIGINT)
                            * ascii(substring(payload, i, 1))
                            for i in range(CAST(w * n // {_AFP_NWIN} AS INT) + 1,
                                           CAST((w + 1) * n // {_AFP_NWIN} AS INT) + 1)]),
                  0) AS e
  FROM auds CROSS JOIN (SELECT unnest(range(0, {_AFP_NWIN})) AS w) ww
),
fps AS (
  SELECT w0.media_id,
         CAST(SUM(CASE WHEN w1.e > w0.e
                       THEN CAST(1 AS BIGINT) << w0.w ELSE 0 END) AS BIGINT)
           AS fp
  FROM win w0 JOIN win w1
    ON w1.media_id = w0.media_id AND w1.w = w0.w + 1
  WHERE w0.w < {_AFP_BITS}
  GROUP BY w0.media_id
)"""

_AFP_BAND_EXPRS = ",\n       ".join(
    f"CAST((fp // {1 << (8 * k)}) % 256 AS BIGINT) AS band_{k}"
    for k in range(_AFP_BANDS)
)

# Banded pigeonhole candidates over the fingerprints — CTE names are
# disjoint from _DHASH_CAND_CTES so the streaming media-dedup oracle
# can compose both fragments in ONE statement.
_AFP_CAND_CTES = (
    _AFP_FP_CTES
    + f""",
abanded AS (
  SELECT media_id, fp, CAST(band AS INT) AS band,
         CASE band {" ".join(
             f"WHEN {k} THEN CAST((fp // {1 << (8 * k)}) % 256 AS BIGINT)"
             for k in range(_AFP_BANDS)
         )} END AS val
  FROM fps CROSS JOIN (SELECT unnest(range(0, {_AFP_BANDS})) AS band) abb
),
acand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
  FROM abanded a JOIN abanded b
    ON a.band = b.band AND a.val = b.val AND a.media_id < b.media_id
)"""
)


def _oracle_audio_fingerprint() -> str:
    return f"""
WITH {_AFP_FP_CTES}
SELECT media_id, fp,
       {_AFP_BAND_EXPRS}
FROM fps
ORDER BY media_id
"""


def media_fp_frame(media: DataFrame) -> DataFrame:
    """Unified perceptual-fingerprint frame over BOTH fingerprinted
    modalities: (``kind``, ``media_id``, ``c0..c3``) where the four
    c-columns are the modality's pigeonhole band values — 16-bit dHash
    bands for images, 8-bit energy-sign bands for audio. Because each
    modality's bands PARTITION its fingerprint bits, the Hamming
    distance is ``Σ bit_count(xor(c_k))`` for both, so one banded join
    serves image and audio candidates at once (keyed by kind, bands
    never cross modalities)."""
    img = image_dhash(media).select(
        F.lit("image").alias("kind"),
        "media_id",
        *[F.col(f"b{k}").alias(f"c{k}") for k in range(_DHASH_BANDS)],
    )
    aud = _audio_fp_frame(media).select(
        F.lit("audio").alias("kind"),
        "media_id",
        *[F.col(f"band_{k}").alias(f"c{k}") for k in range(_AFP_BANDS)],
    )
    return img.unionByName(aud)


def media_banded(fps: DataFrame) -> DataFrame:
    """Explode a :func:`media_fp_frame` into band-bucket rows
    (kind, media_id, c0..c3, band, val) — the join key side of the
    pigeonhole candidate generation."""
    n_bands = _DHASH_BANDS  # == _AFP_BANDS == 4 on both arcs
    band_arr = F.array(
        *[
            F.struct(F.lit(k).alias("band"), F.col(f"c{k}").alias("val"))
            for k in range(n_bands)
        ]
    )
    return fps.select(
        "kind",
        "media_id",
        *[f"c{k}" for k in range(n_bands)],
        F.explode(band_arr).alias("x"),
    ).select(
        "kind",
        "media_id",
        *[f"c{k}" for k in range(n_bands)],
        F.col("x.band").alias("band"),
        F.col("x.val").alias("val"),
    )


def audio_fp_pairs(
    media: DataFrame, max_hamming: int = _AFP_BANDS - 1
) -> DataFrame:
    """Audio near-dup candidate pairs at fingerprint Hamming distance
    <= max_hamming — the audio twin of :func:`image_dhash_pairs`. The
    four 8-bit bands are pigeonhole-complete for radius 3 over the
    32-bit fingerprint: any pair within the radius agrees on >= 1
    band, so candidates form only inside band-equality buckets —
    never all-pairs; at scale an 8-bit band keys ~n/256 clips per
    bucket (narrower than the image arc's 16-bit bands exactly
    because the fingerprint is 32 bits, not 64)."""
    fps = track_persist(_audio_fp_frame(media).persist())
    band_arr = F.array(
        *[
            F.struct(F.lit(k).alias("band"), F.col(f"band_{k}").alias("val"))
            for k in range(_AFP_BANDS)
        ]
    )
    banded = fps.select("media_id", "fp", F.explode(band_arr).alias("c")).select(
        "media_id",
        "fp",
        F.col("c.band").alias("band"),
        F.col("c.val").alias("val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).cast("int")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["media_a", "media_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def audio_dedup_keep(media: DataFrame) -> DataFrame:
    """The detect→act completion of AUDIO dedup (round-12 verdict item
    3): fingerprint near-dup pairs → connected components
    (dedup.connected_components — min-label propagation, O(|E|)
    shuffle per round) → canonical keep. Within each near-dup cluster
    the KEPT clip is the one with the largest payload (bytes — the
    bitrate/duration proxy before codecs enter the picture; ties →
    smallest media_id), everything else is a drop — the exact
    keep-policy spelling driver-proven on the image arc
    (:func:`image_dedup_keep`), consuming the audio fingerprint
    artifact unchanged as its docstring promised.

    All-aggregate keep selection (per-cluster max, then min id among
    argmax ties): no per-cluster window, so a giant cluster costs two
    bounded hash aggs, never a within-cluster sort; the cluster-level
    frames get no forced broadcast — AQE decides.

    Returns (``cluster_id``, ``media_id``, ``payload_bytes``,
    ``keep``) — one row per clustered clip, exactly one keep=true per
    cluster.
    """
    from .dedup import connected_components

    pairs = audio_fp_pairs(media)
    comp = connected_components(pairs, src="media_a", dst="media_b").select(
        F.col("node").alias("media_id"), F.col("label").alias("cluster_id")
    )
    size = media.filter(
        (F.col("kind") == "audio") & F.col("payload").isNotNull()
    ).select(
        "media_id", F.octet_length("payload").cast("long").alias("payload_bytes")
    )
    members = comp.join(size, "media_id")
    mx = members.groupBy("cluster_id").agg(F.max("payload_bytes").alias("__b_max"))
    keepers = (
        members.join(mx, "cluster_id")
        .where(F.col("payload_bytes") == F.col("__b_max"))
        .groupBy("cluster_id")
        .agg(F.min("media_id").alias("__keeper"))
    )
    return (
        members.join(keepers, "cluster_id")
        .select(
            "cluster_id",
            "media_id",
            "payload_bytes",
            (F.col("media_id") == F.col("__keeper")).alias("keep"),
        )
        .orderBy("cluster_id", "media_id")
    )


def q_multimodal_audio_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked audio dedup end-to-end: the DuckDB oracle
    replays the whole chain — the engine-shared fingerprint SQL text,
    banded pigeonhole pairs, recursive-CTE transitive closure, argmax
    keep — so the driver hash attests candidate generation, clustering
    AND the keep decision in one value-hash (the audio twin of
    ORACLE_IMAGE_DEDUP_KEEP)."""
    media = ascii_guarded(synthesize_media(read_table(spark, sf_dir, "documents")))
    return audio_dedup_keep(media)


def _oracle_audio_dedup_keep() -> str:
    return f"""
WITH RECURSIVE {_AFP_CAND_CTES},
pairs AS (
  SELECT media_a, media_b FROM acand WHERE hamming <= {_AFP_BANDS - 1}
),
edges AS (
  SELECT media_a AS a, media_b AS b FROM pairs
  UNION
  SELECT media_b, media_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS media_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id
  FROM reach GROUP BY a
),
members AS (
  SELECT c.cluster_id, c.media_id, CAST(a.n AS BIGINT) AS payload_bytes
  FROM comp c JOIN auds a ON a.media_id = c.media_id
),
mx AS (
  SELECT cluster_id, MAX(payload_bytes) AS b_max FROM members GROUP BY 1
),
keepers AS (
  SELECT m.cluster_id, MIN(m.media_id) AS keeper
  FROM members m JOIN mx ON m.cluster_id = mx.cluster_id
  WHERE m.payload_bytes = mx.b_max
  GROUP BY m.cluster_id
)
SELECT m.cluster_id, m.media_id, m.payload_bytes,
       m.media_id = k.keeper AS keep
FROM members m JOIN keepers k ON m.cluster_id = k.cluster_id
ORDER BY m.cluster_id, m.media_id
"""


QUERIES = {
    "multimodal_audio_fingerprint": q_multimodal_audio_fingerprint,
    "multimodal_audio_dedup_keep": q_multimodal_audio_dedup_keep,
    "multimodal_byte_stats": q_multimodal_byte_stats,
    "multimodal_features": q_multimodal_features,
    "multimodal_byte_entropy": q_multimodal_byte_entropy,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_scene_cuts": q_multimodal_scene_cuts,
    "multimodal_audio_windows": q_multimodal_audio_windows,
    "multimodal_image_dhash_pairs": q_multimodal_image_dhash_pairs,
    "multimodal_image_dedup_keep": q_multimodal_image_dedup_keep,
}

ORACLES = {
    "multimodal_audio_fingerprint": _oracle_audio_fingerprint(),
    "multimodal_audio_dedup_keep": _oracle_audio_dedup_keep(),
    "multimodal_byte_stats": ORACLE_BYTE_STATS,
    "multimodal_byte_entropy": ORACLE_BYTE_ENTROPY,
    "multimodal_frame_sample": ORACLE_FRAME_SAMPLE,
    "multimodal_scene_cuts": ORACLE_SCENE_CUTS,
    "multimodal_audio_windows": ORACLE_AUDIO_WINDOWS,
    "multimodal_image_dhash_pairs": ORACLE_IMAGE_DHASH_PAIRS,
    "multimodal_image_dedup_keep": ORACLE_IMAGE_DEDUP_KEEP,
}
