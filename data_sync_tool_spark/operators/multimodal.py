"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the codec inner loops are STUBBED because
this container has no image/audio libraries (PIL/ffmpeg). Each stub is
clearly marked: ``decode_image`` raises ``NotImplementedError`` unless a
deterministic fake decoder is injected, exactly the seam where a real
``PIL.Image.open`` / ``torchaudio.load`` goes.

Design for 100 TB of media:
- media bytes live in their own column (parquet keeps them as byte arrays;
  at cluster scale the column would be a separate blob store + pointer, the
  plumbing is identical);
- all media transforms are ``mapInPandas`` — one Arrow batch of byte strings
  in, one batch of features out; batch size bounds executor memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- metadata (width/height/duration/codec) is a plain struct column so filters
  like ``width >= 256`` prune BEFORE any byte is decoded.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stands in for real blobs; byte lengths vary to exercise batching)."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), "id"), 3) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("blob-"), F.col("id").cast("string"), F.lit("-"),
                 F.repeat(F.lit("x"), (F.pmod(F.xxhash64(F.lit(seed + 1), "id"), 64) + 8).cast("int"))),
        "utf-8",
    )
    meta = F.struct(
        (F.pmod(F.xxhash64(F.lit(seed + 2), "id"), 512) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.lit(seed + 3), "id"), 512) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.lit(seed + 4), "id"), 60_000)).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return df.select(
        F.col("id").alias("media_id"), kind.alias("kind"),
        payload.alias("payload"), meta.alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — no imaging library in this container. Inject a decoder into
    ``extract_features(decoder=...)``; production supplies
    ``lambda b: np.asarray(PIL.Image.open(io.BytesIO(b)))``."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; pass decoder= to extract_features()"
    )


def deterministic_fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixel array via a
    rolling byte view. Lets the full pipeline (batching, feature math,
    schema) run and be asserted end-to-end."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return a.reshape(1, -1)


def extract_features(
    df: DataFrame,
    n_features: int = 8,
    decoder: Callable[[bytes], np.ndarray] = decode_image,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """payload → fixed-size feature vector, Arrow-batched. The feature math
    (moment statistics over decoded samples) is real; only ``decoder`` is a
    seam. Output: (media_id, features: array<double>)."""
    out_schema = f"{id_col} long, features array<double>"

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                arr = decoder(bytes(b)).ravel()
                if arr.size == 0:
                    feats.append([0.0] * n_features)
                    continue
                chunks = np.array_split(arr, n_features)
                feats.append([round(float(c.mean()) if c.size else 0.0, 6) for c in chunks])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(_map, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan for video rows: explode one row per sampled
    timestamp from metadata ONLY — no decode needed to build the sampling
    plan (the decode of each frame is ``extract_features`` downstream).
    Output: (media_id, frame_ts_ms)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize is metadata arithmetic + a decode-transform-encode map; the
    scale factor computes JVM-side so the (stubbed) pixel pass only runs on
    rows that actually need resizing."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    return df.withColumn("resize_scale", F.round(scale, 6)).withColumn(
        "needs_resize", F.col("resize_scale") < 1.0
    )
