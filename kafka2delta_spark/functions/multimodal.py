"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw media as a
``binary`` column (or object-store URI) beside typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas transforms over ``mapInPandas`` — per-partition batch iterators, so
media libraries amortize setup per batch and bytes never take the
row-at-a-time pickling path.

The media libraries themselves (PIL/ffmpeg/torchaudio) are NOT in this
environment, so the actual decoders are stubbed behind
``NotImplementedError`` (clearly marked); what IS real — and tested, with a
SQL oracle — is the full Spark-side plumbing: binary column synthesis,
the mapInPandas batch shape, the output schema contract, and a
deterministic fake feature extractor whose arithmetic the oracle
reproduces byte-for-byte.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka2delta_spark.queryset import register
from kafka2delta_spark.sources.tables import load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("header_sum", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires an imaging library not present in this
    environment. STUB."""
    raise NotImplementedError("image decoding requires PIL/opencv (not installed)")


def decode_audio(payload: bytes) -> "object":
    """COMPRESSED audio decode (mp3/flac/ogg) — requires a codec library.
    STUB. Raw PCM needs no codec: see ``pcm_window_energy`` below, which
    is the real, tested decode path."""
    raise NotImplementedError("compressed-audio decoding requires soundfile/ffmpeg (not installed)")


def sample_video_frames(payload: bytes, every_n: int = 30) -> "list":
    """Real video frame sampling — requires ffmpeg. STUB."""
    raise NotImplementedError("video frame sampling requires ffmpeg (not installed)")


def fake_media_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor with the real batch shape:
    consumes (doc_id, payload) Arrow batches, emits typed features.
    Arithmetic is intentionally simple so a SQL oracle can replicate it:
        n_bytes     = len(payload)
        fake_width  = n_bytes % 640
        fake_height = n_bytes % 480
        header_sum  = sum of the first 16 byte values

    A NULL payload (a failed media fetch — inevitable in a 100 TB corpus)
    keeps its row and yields NULL features, matching SQL built-in
    semantics (``octet_length(NULL) IS NULL``) instead of crashing the
    task with a bare pandas/numpy error. Pandas nullable Int dtypes carry
    the NULLs losslessly through the Arrow batch back to Spark.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.str.len().astype("Int32")
        header_sum = payloads.map(
            lambda b: sum(b[:16]) if b is not None else None
        ).astype("Int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "fake_width": (n_bytes % 640).astype("Int32"),
                "fake_height": (n_bytes % 480).astype("Int32"),
                "header_sum": header_sum,
            }
        )


def extract_media_features(df: DataFrame) -> DataFrame:
    """The reusable multimodal operator: (doc_id, payload binary) →
    feature rows via Arrow-batched mapInPandas."""
    return df.select("doc_id", "payload").mapInPandas(
        fake_media_features, schema=FEATURE_SCHEMA
    )


@register(
    "q95_multimodal_features",
    oracle="""
    WITH feats AS (
        -- payload is the UTF-8 encoding of text: encode(), not ::BLOB
        -- (the cast rejects non-ASCII), and header_sum is the sum of the
        -- first 16 BYTES (hex-parsed off the blob — ord() would count
        -- code points, which diverge from bytes outside ASCII).
        -- Empty-payload contract: sum of zero bytes is 0, not NULL —
        -- DuckDB's list_sum([]) returns NULL, so COALESCE it to 0 for
        -- present-but-empty text while keeping NULL text -> NULL
        -- (matches the kernel's sum(b''[:16]) = 0 / None passthrough).
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CASE WHEN text IS NULL THEN NULL
                    ELSE COALESCE(
                        list_sum([('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT
                                  for i in range(1, least(17, octet_length(encode(text)) + 1))]),
                        0)
               END AS header_sum
        FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_bytes AS INT) AS n_bytes,
           CAST(n_bytes % 640 AS INT) AS fake_width,
           CAST(n_bytes % 480 AS INT) AS fake_height,
           CAST(header_sum AS BIGINT) AS header_sum
    FROM feats
    """,
)
def q95_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: synthesize a binary payload column
    (UTF-8 bytes of the document text — ASCII here, so byte values equal
    code points and the oracle can reproduce header_sum with ord()), run it
    through the Arrow-batched mapInPandas feature extractor, return typed
    features."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_media_features(with_payload)


@register(
    "q96_multimodal_metadata_join",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                   AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY source
    """,
)
def q96_multimodal_metadata_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-side aggregation over binary payload sizes — the
    partition-pruning-friendly access path (metadata only, payload column
    never read past the length)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(payload)).cast("bigint").alias("total_bytes"),
        F.max(F.length(payload)).cast("bigint").alias("max_bytes"),
    )


# Frame sampling: FPS/duration are metadata; choosing WHICH frames to
# decode is pure arithmetic and belongs JVM-side — only (payload, offsets)
# ever reach the Arrow-batched decoder (sample_video_frames, stubbed here).
FRAME_FPS = 24
FRAME_SAMPLES = 4  # uniform samples per video


@register(
    "q97_video_frame_sampling",
    oracle=f"""
    WITH meta AS (
        SELECT doc_id,
               octet_length(encode(text)) % 300 + 5 AS duration_s
        FROM documents),
    frames AS (
        SELECT doc_id, duration_s,
               duration_s * {FRAME_FPS} AS total_frames,
               unnest(range(0, {FRAME_SAMPLES})) AS frame_slot
        FROM meta)
    SELECT doc_id,
           CAST(frame_slot AS INT)                                  AS frame_slot,
           CAST(FLOOR(frame_slot * total_frames / {FRAME_SAMPLES}) AS BIGINT)
                                                                    AS frame_idx,
           ROUND(FLOOR(frame_slot * total_frames / {FRAME_SAMPLES})
                 * 1.0 / {FRAME_FPS}, 4)                            AS frame_time_s
    FROM frames
    """,
)
def q97_video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform video frame-sample planning from metadata only.

    Synthetic video metadata (duration derived deterministically from the
    payload length, {FRAME_FPS} fps) → {FRAME_SAMPLES} uniformly-spaced
    frame indices per video, computed with native ``sequence``/``explode``
    expressions. At 100 TB this is the decisive layout: frame selection
    reads ONLY metadata columns (parquet column pruning keeps the binary
    payload un-fetched), and the decode stage then receives (payload,
    frame_idx list) per video through the same Arrow-batched ``mapInPandas``
    contract as ``extract_media_features`` — ``sample_video_frames`` is the
    env-gated real decoder."""
    docs = load_table(spark, sf_dir, "documents")
    duration = (F.length(F.encode(F.col("text"), "UTF-8")) % 300 + 5).alias(
        "duration_s"
    )
    meta = docs.select("doc_id", duration).withColumn(
        "total_frames", F.col("duration_s") * FRAME_FPS
    )
    exploded = meta.select(
        "doc_id",
        "total_frames",
        F.explode(F.sequence(F.lit(0), F.lit(FRAME_SAMPLES - 1))).alias("frame_slot"),
    )
    frame_idx = F.floor(
        F.col("frame_slot") * F.col("total_frames") / FRAME_SAMPLES
    ).cast("bigint")
    return exploded.select(
        "doc_id",
        F.col("frame_slot").cast("int").alias("frame_slot"),
        frame_idx.alias("frame_idx"),
        F.round(frame_idx / FRAME_FPS, 4).alias("frame_time_s"),
    )


# Audio: raw PCM16 is a real decode target that needs NO codec library —
# it is what every audio decoder outputs — so unlike image/video the audio
# path here is genuinely end-to-end: bytes -> int16 samples -> windowed
# energy (the VAD / silence-detection front-end of a speech-data pipeline).
PCM_WINDOW = 64  # samples per analysis window
_PCM_REPEATS = 32  # payload = unhex(md5(text) * 32) = 512 bytes = 256 samples

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_id", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def pcm_window_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, payload) Arrow batches -> per-window PCM16 energy rows.

    Real decode: payload bytes are little-endian signed 16-bit samples
    (numpy ``frombuffer`` — zero-copy). Energy accumulates in int64 —
    EXACT, so engine-portable by construction; rms is derived per-row from
    those exact ints (sqrt(sum_sq/W) of identical ints is bit-identical
    everywhere). Trailing samples short of a full window are dropped; a
    NULL payload (failed fetch) contributes zero windows under the same
    contract rather than crashing numpy's frombuffer."""
    import numpy as np

    for pdf in batches:
        ids, wids, peaks, sumsqs = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                continue
            s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
            nw = len(s) // PCM_WINDOW
            if nw == 0:
                continue
            w = s[: nw * PCM_WINDOW].reshape(nw, PCM_WINDOW)
            ids.extend([doc_id] * nw)
            wids.extend(range(nw))
            peaks.extend(np.abs(w).max(axis=1).tolist())
            sumsqs.extend((w * w).sum(axis=1).tolist())
        sum_sq = pd.Series(sumsqs, dtype="int64")
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_id": pd.Series(wids, dtype="int32"),
                "peak": pd.Series(peaks, dtype="int32"),
                "sum_sq": sum_sq,
                "rms": (sum_sq / float(PCM_WINDOW)) ** 0.5,
            }
        )


_HEXVAL = "(strpos('0123456789abcdef', substring(h, {c}, 1)) - 1)"
_N_BYTES = _PCM_REPEATS * 16
_N_SAMPLES = _N_BYTES // 2


@register(
    "q95b_audio_pcm_windows",
    oracle=f"""
    WITH hx AS (
        -- NULL payloads decode to zero windows (the kernel's
        -- dropped-samples contract) -> absent here too
        SELECT doc_id, repeat(md5(text), {_PCM_REPEATS}) AS h FROM documents
        WHERE text IS NOT NULL),
    by AS (
        SELECT doc_id,
               [{_HEXVAL.format(c='2*j-1')} * 16 + {_HEXVAL.format(c='2*j')}
                for j in range(1, {_N_BYTES + 1})] AS bs
        FROM hx),
    smp AS (
        SELECT doc_id,
               [bs[2*i-1] + 256*bs[2*i]
                - CASE WHEN bs[2*i] >= 128 THEN 65536 ELSE 0 END
                for i in range(1, {_N_SAMPLES + 1})] AS s
        FROM by),
    win AS (
        SELECT doc_id, unnest(range(0, {_N_SAMPLES // PCM_WINDOW})) AS window_id, s
        FROM smp)
    SELECT doc_id,
           CAST(window_id AS INT) AS window_id,
           CAST(list_max([abs(x) for x in
                s[{PCM_WINDOW}*window_id+1 : {PCM_WINDOW}*(window_id+1)]]) AS INT)
               AS peak,
           CAST(list_sum([x*x for x in
                s[{PCM_WINDOW}*window_id+1 : {PCM_WINDOW}*(window_id+1)]]) AS BIGINT)
               AS sum_sq,
           sqrt(CAST(list_sum([x*x for x in
                s[{PCM_WINDOW}*window_id+1 : {PCM_WINDOW}*(window_id+1)]]) AS BIGINT)
                / {float(PCM_WINDOW)}) AS rms
    FROM win
    """,
)
def q95b_audio_pcm_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed PCM16 energy over a synthetic audio column — the one
    multimodal decode that is fully real in this environment (raw PCM is
    post-codec audio; no external library involved).

    Payload synthesis: ``unhex(repeat(md5(text), {_PCM_REPEATS}))`` — hex
    bytes cover the full 0-255 range, so negative samples (high byte ≥
    0x80) genuinely exercise the sign path, unlike ASCII text bytes.
    Decode + windowing run in the same Arrow-batched ``mapInPandas``
    contract as the other media extractors; the oracle re-derives the
    identical int16 samples from the hex string. All cross-sample math is
    int64 (exact); rms is per-row sqrt of exact ints — no float
    accumulation anywhere, so no engine-divergence risk at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id",
        F.unhex(F.repeat(F.md5(F.col("text")), _PCM_REPEATS)).alias("payload"),
    )
    return with_payload.mapInPandas(pcm_window_energy, schema=AUDIO_SCHEMA)


# PNG header geometry (the spec's fixed layout): 8-byte magic, 4-byte
# IHDR chunk length, 4-byte "IHDR" tag, then big-endian width(4),
# height(4), bit depth(1), color type(1). Resolution/aspect filtering —
# the most common media curation predicate — needs ONLY these 26 bytes.
_PNG_MAGIC_HEX = "89504E470D0A1A0A"


def _be4(col):
    """Int -> 4-byte big-endian binary, native exprs (hex -> pad -> unhex)."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), 8, "0"))


def synthesize_png_header(width, height, bit_depth, color_type):
    """Spec-valid PNG signature + IHDR prefix from typed columns — the
    test double for a real image blob (this environment has no imaging
    libs, but a header parser neither needs nor wants one)."""
    return F.concat(
        F.unhex(F.lit(_PNG_MAGIC_HEX)),
        _be4(F.lit(13)),
        F.encode(F.lit("IHDR"), "UTF-8"),
        _be4(width),
        _be4(height),
        F.unhex(F.lpad(F.hex(bit_depth.cast("bigint")), 2, "0")),
        F.unhex(F.lpad(F.hex(color_type.cast("bigint")), 2, "0")),
    )


def parse_png_header(payload):
    """(is_png, width, height, bit_depth, color_type) from a binary
    column — pure codegen'd binary slicing (substring on binary +
    conv(hex(...))), zero Python, zero decode. At 100 TB this is the
    operator that filters a media corpus by resolution while the actual
    pixel data never leaves parquet (column pruning keeps payload reads
    to the projected byte ranges of matching rows)."""

    def be_int(start, length):
        return F.conv(F.hex(F.substring(payload, start, length)), 16, 10).cast(
            "bigint"
        )

    is_png = F.hex(F.substring(payload, 1, 8)) == F.lit(_PNG_MAGIC_HEX)
    return (
        is_png.alias("is_png"),
        be_int(17, 4).alias("width"),
        be_int(21, 4).alias("height"),
        be_int(25, 1).alias("bit_depth"),
        be_int(26, 1).alias("color_type"),
    )


@register(
    "qx07_image_header_metadata",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           TRUE AS is_png,
           CAST(640 + doc_id % 1280 AS BIGINT) AS width,
           CAST(360 + doc_id % 720 AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 6 END AS BIGINT)
               AS color_type,
           ROUND((640 + doc_id % 1280) * 1.0 / (360 + doc_id % 720), 4)
               AS aspect
    FROM documents
    """,
)
def qx07_image_header_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image metadata WITHOUT an image library: synthesize spec-valid PNG
    signature+IHDR bytes from per-doc dimensions, then parse width/
    height/depth/color back out with native binary expressions. The
    oracle computes the expected values directly from doc_id arithmetic,
    so a parser that misreads any byte offset (or endianness) hash-fails.
    The synthesize->parse round trip is the honest test double for "read
    resolution from a real media blob": header parsing is byte slicing,
    not decoding, and belongs JVM-side."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    dims = docs.select(
        "doc_id",
        (F.lit(640) + F.col("doc_id") % 1280).alias("w"),
        (F.lit(360) + F.col("doc_id") % 720).alias("h"),
        F.lit(8).alias("bd"),
        F.when(F.col("doc_id") % 2 == 0, 2).otherwise(6).alias("ct"),
    )
    payloads = dims.select(
        "doc_id",
        synthesize_png_header(
            F.col("w"), F.col("h"), F.col("bd"), F.col("ct")
        ).alias("payload"),
    )
    parsed = payloads.select("doc_id", *parse_png_header(F.col("payload")))
    return parsed.select(
        "doc_id",
        "is_png",
        "width",
        "height",
        "bit_depth",
        "color_type",
        F.round(F.col("width") / F.col("height"), 4).alias("aspect"),
    )


# ---------------------------------------------------------------------------
# qx77: GPU batch planner over parsed image headers — group images by
# (orientation, pixel-size class) so a resize/encode kernel processes
# near-uniform shapes, then pack each class into fixed pixel-budget
# batches with q64's cumsum rule. This is the scheduling layer between
# qx07's metadata parse and the (env-gated) decoders: the plan is pure
# relational work and runs at full scale with or without image libs.
# ---------------------------------------------------------------------------

#: pixels per decode batch (~2 megapixel budget per kernel launch)
PIX_BUDGET = 1 << 21


def _qx77_oracle() -> str:
    return f"""
    WITH dims AS (
        SELECT doc_id,
               640 + doc_id % 1280 AS w,
               360 + doc_id % 720  AS h
        FROM documents),
    cls AS (
        SELECT doc_id, w * h AS px,
               CASE WHEN w > h THEN 'landscape'
                    WHEN w < h THEN 'portrait'
                    ELSE 'square' END
               || '_' ||
               CASE WHEN w * h >= 1000000 THEN 'large' ELSE 'small' END
                   AS shape_class
        FROM dims),
    cum AS (
        SELECT shape_class, px,
               SUM(px) OVER (PARTITION BY shape_class ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS c
        FROM cls),
    packed AS (
        SELECT shape_class, px, (c - 1) // {PIX_BUDGET} AS batch_id
        FROM cum)
    SELECT shape_class,
           CAST(batch_id AS BIGINT)  AS batch_id,
           CAST(COUNT(*) AS BIGINT)  AS n_images,
           CAST(SUM(px) AS BIGINT)   AS batch_pixels,
           CAST(SUM(px) * 10000 // {PIX_BUDGET} AS BIGINT) AS fill_e4
    FROM packed GROUP BY shape_class, batch_id
    """


@register("qx77_image_batch_plan", oracle=_qx77_oracle())
def qx77_image_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shape_class, batch_id, n_images, batch_pixels, fill_e4): decode
    batches per orientation × size class under a {PIX_BUDGET}-pixel
    budget, batch id = cumulative-pixels div budget (q64's parallel
    first-fit approximation — an image may straddle its boundary; the
    kernel's scatter handles the tail).

    Plan: dimensions come from the qx07 header-parse arithmetic (the
    documented stand-in for real blobs — batching logic is identical
    either way); the per-class cumulative sum is two_level_cumsum, so a
    corpus that is 99% landscape_small still packs in parallel instead
    of serializing into one task. Output is batches, not images —
    corpus_pixels/{PIX_BUDGET} rows."""
    from kafka2delta_spark.functions.pipeline import two_level_cumsum

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    dims = docs.select(
        "doc_id",
        (F.lit(640) + F.col("doc_id") % 1280).alias("w"),
        (F.lit(360) + F.col("doc_id") % 720).alias("h"),
    )
    cls = dims.select(
        "doc_id",
        (F.col("w") * F.col("h")).alias("px"),
        F.concat(
            F.when(F.col("w") > F.col("h"), F.lit("landscape"))
            .when(F.col("w") < F.col("h"), F.lit("portrait"))
            .otherwise(F.lit("square")),
            F.lit("_"),
            F.when(F.col("w") * F.col("h") >= 1_000_000, F.lit("large"))
            .otherwise(F.lit("small")),
        ).alias("shape_class"),
    )
    cum = two_level_cumsum(
        spark, cls, ["shape_class"], [F.col("doc_id")], "px"
    )
    packed = cum.select(
        "shape_class",
        "px",
        F.expr(f"(__cum - 1) div {PIX_BUDGET}").alias("batch_id"),
    )
    return packed.groupBy("shape_class", "batch_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px").cast("bigint").alias("batch_pixels"),
        F.expr(f"cast(sum(px) * 10000 div {PIX_BUDGET} as bigint)").alias(
            "fill_e4"
        ),
    )


# ---------------------------------------------------------------------------
# qx88: WAV/RIFF header audit — little-endian binary parsing (qx07's PNG
# parser is big-endian; real media corpora need both byte orders).
# Synthesize spec-valid RIFF/WAVE/fmt/data headers from per-doc
# parameters, parse them back with native binary slicing, and derive the
# audit columns an audio-ingest pipeline filters on (sample rate,
# channels, sample count, duration). No audio library: header parsing is
# byte arithmetic and belongs JVM-side; decoding stays env-gated.
# ---------------------------------------------------------------------------


def _le_bytes(col, n):
    """Little-endian n-byte binary of an integer column: big-endian hex,
    zero-padded to 2n chars, byte-pair-reversed, unhexed."""
    hx = F.lpad(F.hex(col.cast("bigint")), 2 * n, "0")
    pairs = [F.substring(hx, 2 * i + 1, 2) for i in range(n)]
    return F.unhex(F.concat(*reversed(pairs)))


def _le_int(payload, start, n):
    """Integer from n little-endian bytes at 1-based offset ``start``."""
    hx = F.hex(F.substring(payload, start, n))
    pairs = [F.substring(hx, 2 * i + 1, 2) for i in range(n)]
    return F.conv(F.concat(*reversed(pairs)), 16, 10).cast("bigint")


def synthesize_wav_header(sample_rate, channels, n_samples):
    """Spec-valid 44-byte PCM16 WAV header from typed columns."""
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    return F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        _le_bytes(data_size + 36, 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        _le_bytes(F.lit(16), 4),          # fmt chunk size
        _le_bytes(F.lit(1), 2),           # PCM
        _le_bytes(channels, 2),
        _le_bytes(sample_rate, 4),
        _le_bytes(byte_rate, 4),
        _le_bytes(block_align, 2),
        _le_bytes(F.lit(16), 2),          # bits per sample
        F.encode(F.lit("data"), "UTF-8"),
        _le_bytes(data_size, 4),
    )


def parse_wav_header(payload):
    """Audit columns from a binary WAV column — pure codegen'd slicing."""
    is_wav = (
        (F.substring(payload, 1, 4) == F.encode(F.lit("RIFF"), "UTF-8"))
        & (F.substring(payload, 9, 4) == F.encode(F.lit("WAVE"), "UTF-8"))
        & (F.substring(payload, 13, 4) == F.encode(F.lit("fmt "), "UTF-8"))
    )
    return (
        is_wav.alias("is_wav"),
        _le_int(payload, 23, 2).alias("channels"),
        _le_int(payload, 25, 4).alias("sample_rate"),
        _le_int(payload, 29, 4).alias("byte_rate"),
        _le_int(payload, 35, 2).alias("bits"),
        _le_int(payload, 41, 4).alias("data_size"),
    )


@register(
    "qx88_wav_header_audit",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           TRUE AS is_wav,
           CAST(1 + doc_id % 2 AS BIGINT)             AS channels,
           CAST(8000 + (doc_id % 5) * 4000 AS BIGINT) AS sample_rate,
           CAST(16 AS BIGINT)                         AS bits,
           CAST(1000 + doc_id % 9000 AS BIGINT)       AS n_samples,
           CAST((1000 + doc_id % 9000) * 1000
                // (8000 + (doc_id % 5) * 4000) AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def qx88_wav_header_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-corpus audit WITHOUT an audio library: synthesize spec-valid
    44-byte PCM16 WAV headers from per-doc parameters, parse them back
    with native little-endian binary slicing, and derive sample count
    (data_size / block_align) and duration (integer ms) — the columns an
    ingest pipeline filters on (wrong rate / mono-only / too-short).
    The oracle computes expectations from doc_id arithmetic, so any
    byte-offset or ENDIANNESS mistake hash-fails (qx07 covers the
    big-endian path; WAV is the little-endian one).

    Plan: per-row codegen expressions only — no Python, no decode; at
    100 TB the pixel/PCM payload never leaves parquet (column pruning),
    exactly like qx07."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(8000) + (F.col("doc_id") % 5) * 4000).alias("sr"),
        (F.lit(1) + F.col("doc_id") % 2).alias("ch"),
        (F.lit(1000) + F.col("doc_id") % 9000).alias("ns"),
    )
    payloads = params.select(
        "doc_id",
        synthesize_wav_header(F.col("sr"), F.col("ch"), F.col("ns")).alias(
            "payload"
        ),
    )
    parsed = payloads.select("doc_id", *parse_wav_header(F.col("payload")))
    return parsed.select(
        "doc_id",
        "is_wav",
        "channels",
        "sample_rate",
        "bits",
        F.expr("data_size div (channels * 2)").alias("n_samples"),
        F.expr("data_size * 1000 div byte_rate").alias("duration_ms"),
    )
