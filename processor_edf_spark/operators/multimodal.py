"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas`` (SURVEY.md training-data extensions).

The Spark-side contract is fully real — schemas, batching, partitioning,
UDF signatures; only the codec calls are stubbed (image/audio libraries are
not available in this container).  Swap ``_decode_image_stub`` for a real
PIL/ffmpeg call and nothing else changes.

Design for 100 TB of media:
- payloads stay in ``binary`` columns read via ``binaryFile`` or parquet —
  never hex/base64 strings (2-8× inflation);
- decode/feature-extract runs in ``mapInPandas`` so one Python worker
  processes a whole Arrow batch per call;
- metadata (width/height/duration/codec) lives in sibling typed columns so
  filters on it push down without touching payload bytes (column pruning
  keeps the scan payload-free).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_usec", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: deterministic fake decoder (no codec libs in this
    container).  Returns (width, height, 8-dim feature) derived from the
    payload bytes so tests are reproducible.  Replace with PIL:
    ``img = PIL.Image.open(io.BytesIO(payload))`` — the Spark plumbing
    around it is unchanged."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    width = int(h[:4].sum()) % 4096 + 1
    height = int(h[4:8].sum()) % 4096 + 1
    feature = h.reshape(8, 8).mean(axis=1) / 255.0
    return width, height, feature


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract images: mapInPandas, one Arrow batch per
    call, payload never leaves the executor."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "n_bytes": [], "feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                w, h, feat = _decode_image_stub(data)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(data))
                rows["feature"].append(feat.tolist())
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_usec: int = 1_000_000, max_frames: int = 16) -> DataFrame:
    """Frame-sample videos: emits one row per sampled frame.  The decode is
    stubbed (deterministic byte slices); a real implementation calls the
    demuxer inside the same generator."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "t_usec": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n = min(max_frames, max(1, len(data) // 64))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["t_usec"].append(i * every_usec)
                    out["frame"].append(data[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(gen, schema=FRAME_SAMPLE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Payload-free metadata pass: byte size + content hash via column
    expressions only — the scan prunes the payload when downstream filters
    only touch these."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("content_sha256"),
    )
