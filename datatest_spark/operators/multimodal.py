"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The engine treats media as ``binary`` payloads plus typed metadata
(schema below). Decode / resize / frame-sample kernels are *stubbed*
behind deterministic fakes (the image/audio libraries are not in this
container — the task brief mandates stubbing the decode while keeping
the Spark-side plumbing real): schemas, partitioning, mapInPandas batch
iteration, and Arrow transfer are all exercised for real and tested.

Swap ``_decode_image_stub`` for a PIL/libvips kernel in production; the
operator signatures do not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, modality string, n_bytes long, payload_hash string, "
    "features array<float>"
)


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random
    bytes derived from xxhash64 (JVM-side, no Python loops)."""
    df = spark.range(n_rows)
    h = F.abs(F.xxhash64(F.lit(seed), F.col("id")))
    payload = F.encode(
        F.concat(F.lit("BLOB:"), F.conv(h.cast("string"), 10, 16)), "utf-8"
    )
    return df.select(
        F.format_string("m%08d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (h % 3 + 1).cast("int"),
        ).alias("modality"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (h % 1920 + 1).cast("int").alias("width"),
        (h % 1080 + 1).cast("int").alias("height"),
        (h % 60000).cast("long").alias("duration_ms"),
    )


def _decode_image_stub(payload: bytes, out_dim: int) -> np.ndarray:
    """STUB decode/feature-extract: a real kernel would decode the image
    and pool features. The fake derives a deterministic float vector from
    the payload bytes so the pipeline is testable end-to-end.

    Raises NotImplementedError for non-bytes payloads the real decoder
    would reject."""
    if payload is None:
        raise NotImplementedError("real decoder required for streaming payloads")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(arr) == 0:
        return np.zeros(out_dim, dtype=np.float32)
    reps = int(np.ceil(out_dim / len(arr)))
    tiled = np.tile(arr, reps)[:out_dim]
    return ((tiled / 255.0) * 2 - 1).astype(np.float32)


def extract_features(
    media: DataFrame, out_dim: int = 16, batch_hint: int = 1024
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real plumbing: Arrow batch iteration, column pruning (only the
    columns the kernel needs are scanned), output schema declared up
    front. The decode kernel itself is the documented stub."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, out_dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_hash": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    pruned = media.select("media_id", "modality", "payload")
    return pruned.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, payload binary, width int, height int, "
    "orig_width int, orig_height int"
)


def _resize_stub(payload: bytes, out_w: int, out_h: int) -> bytes:
    """STUB resize kernel: a real kernel decodes, resamples, re-encodes.
    The fake derives a deterministic payload from (bytes, target dims) so
    the pipeline — batch shapes, binary round-trip, metadata rewrite —
    is exercised end-to-end without image libs."""
    if payload is None:
        raise NotImplementedError("real decoder required for null payloads")
    import hashlib

    tag = "{0}x{1}".format(out_w, out_h).encode()
    return hashlib.md5(payload + tag).digest() + tag


def resize_images(media: DataFrame, width: int, height: int,
                  skip_non_image: bool = True) -> DataFrame:
    """mapInPandas image resize over binary payloads (brief: decode /
    feature-extract / RESIZE / frame-sample as Pandas UDFs).

    Real plumbing: modality filter pushes into the scan, Arrow batches
    carry the binary column both ways, original dims preserved as
    metadata. The pixel kernel is the documented stub boundary."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        _resize_stub(p, width, height) if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                    "orig_width": pdf["width"],
                    "orig_height": pdf["height"],
                }
            )

    src = media.filter(F.col("modality") == "image") if skip_non_image else media
    pruned = src.select("media_id", "payload", "width", "height")
    return pruned.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def _sampled_times(media: DataFrame, every_ms: int) -> DataFrame:
    """Shared frame fan-out source: one row per video with the sampled
    timestamp ARRAY (not yet exploded). frame_sample_plan explodes it;
    sample_frames fans out inside the pandas kernel so each payload
    crosses the Arrow boundary exactly once."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        "payload",
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)).alias(
            "frame_ts"
        ),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (sequence/explode — JVM-side; the unused payload column is pruned by
    Catalyst). The actual frame decode is the same stubbed kernel
    boundary as extract_features."""
    return _sampled_times(media, every_ms).select(
        "media_id", F.explode("frame_ts").alias("frame_ts_ms")
    )


FRAME_SCHEMA = "media_id string, frame_ts_ms long, frame_payload binary"


def _frame_stub(payload: bytes, ts_ms: int) -> bytes:
    """STUB frame-decode kernel: a real kernel seeks the container to
    ts_ms and re-encodes the frame. The fake derives deterministic bytes
    from (payload, timestamp) so dedup/feature stages downstream see
    distinct per-frame payloads."""
    import hashlib

    tag = "@{0}".format(ts_ms).encode()
    return hashlib.md5(payload + tag).digest() + tag


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sample kernel stage (brief: decode / feature-extract /
    resize / FRAME-SAMPLE as Pandas UDFs).

    One Arrow row per video (payload + timestamp array); the
    ~duration/every_ms fan-out happens INSIDE the pandas kernel, so a
    payload is serialized once rather than once per frame — exploding
    first would multiply a production-sized payload by the frame count
    in shuffle/Arrow traffic. Output matches frame_sample_plan row for
    row; the per-frame decode is the documented stub."""

    # flush threshold balances the two failure modes: accumulating a
    # whole Arrow batch's fan-out (rows x frames x frame_size) OOMs the
    # Python worker with a real decode kernel, while one tiny batch per
    # short video drowns in Arrow framing overhead
    flush_rows = 4096

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tss, payloads = [], [], []
        for pdf in batches:
            for mid, p, ts_list in zip(
                pdf["media_id"], pdf["payload"], pdf["frame_ts"]
            ):
                # null duration -> null timestamp array: drop the row,
                # matching frame_sample_plan's explode (which emits
                # nothing for a null sequence) instead of crashing
                if ts_list is None:
                    continue
                for t in ts_list:
                    t = int(t)
                    ids.append(mid)
                    tss.append(t)
                    payloads.append(_frame_stub(p, t) if p is not None else None)
                if len(ids) >= flush_rows:
                    yield pd.DataFrame(
                        {"media_id": ids, "frame_ts_ms": tss,
                         "frame_payload": payloads}
                    )
                    ids, tss, payloads = [], [], []
        if ids:
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": tss, "frame_payload": payloads}
            )

    return _sampled_times(media, every_ms).mapInPandas(
        kernel, schema=FRAME_SCHEMA
    )
