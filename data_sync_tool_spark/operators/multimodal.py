"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested, and so is one full pixel path: a
dependency-free binary-PPM codec (encode/decode/nearest-neighbor resize in
pure numpy) drives synthesize→decode→feature-extract→resize end to end on
REAL images. Compressed codecs (jpeg/png, audio/video frames) remain an
injected-decoder seam — ``decode_image`` raises ``NotImplementedError`` for
them, exactly where a real ``PIL.Image.open`` / ``torchaudio.load`` goes
(neither library exists in this container).

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


# --------------------------------------------------------------- PPM codec
# A REAL image codec, dependency-free: binary PPM (P6) is raw RGB with a
# text header — decodable with numpy alone. Compressed formats (jpeg/png)
# remain the injected-decoder seam below.

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 array. Handles whitespace and
    ``#`` comments in the header per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, scale: float) -> np.ndarray:
    """Nearest-neighbor resize — pure index arithmetic, no libraries."""
    h, w = arr.shape[:2]
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    ri = np.minimum((np.arange(nh) / scale).astype(int), h - 1)
    ci = np.minimum((np.arange(nw) / scale).astype(int), w - 1)
    return arr[ri][:, ci]


# --------------------------------------------------------------- WAV codec
# Same story for audio: uncompressed PCM WAV is a RIFF header + int16
# samples — a REAL audio decode path with numpy alone.

def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) or (n, channels) int16 array → PCM WAV bytes."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    data = a.tobytes()
    block = n_ch * 2
    import struct

    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → ((n, channels) int16 array, sample_rate). Walks RIFF
    chunks (fmt/data in any order, unknown chunks skipped)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_ch, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            codec, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if codec != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or n_ch is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype=np.int16).reshape(-1, n_ch), rate


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode for PPM (P6) payloads; compressed formats are the
    injected-decoder seam (production supplies
    ``lambda b: np.asarray(PIL.Image.open(io.BytesIO(b)))``)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "only PPM decodes without an imaging library; pass decoder= for "
        "jpeg/png payloads"
    )


def decode_media(payload: bytes) -> np.ndarray:
    """Kind-sniffing decoder covering both real codecs — usable directly as
    ``extract_features(decoder=decode_media)`` over mixed media tables."""
    b = bytes(payload)
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:4] == b"RIFF":
        return decode_wav(b)[0].astype(np.float64)
    raise NotImplementedError("compressed codec: inject a decoder")


def deterministic_fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixel array via a
    rolling byte view. Lets the full pipeline (batching, feature math,
    schema) run and be asserted end-to-end."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return a.reshape(1, -1)


def synthesize_ppm_images(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic REAL images: gradient PPMs of varying sizes, built with
    numpy over Arrow batches — every payload decodes with any netpbm tool."""
    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "payload": [], "width": [], "height": []}
            for i in pdf["id"]:
                i = int(i)
                w = 16 + (i * 13 + seed) % 48
                h = 16 + (i * 7 + seed) % 48
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(x * 3 + y * 5 + c * 17 + i) % 256 for c in range(3)], axis=2
                ).astype(np.uint8)
                rows["media_id"].append(i)
                rows["kind"].append("image")
                rows["payload"].append(encode_ppm(img))
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    flat = spark.range(n).mapInPandas(
        _gen, schema="media_id long, kind string, payload binary, width int, height int"
    )
    meta = F.struct(
        F.col("width"), F.col("height"),
        F.lit(0).alias("duration_ms"), F.lit("image/x-portable-pixmap").alias("codec"),
    )
    return flat.select("media_id", "kind", "payload", meta.alias("meta"))


def apply_resize(
    df: DataFrame,
    max_side: int = 256,
    id_col: str = "media_id",
) -> DataFrame:
    """Full decode → nearest-neighbor resize → re-encode pass over the rows
    that NEED it (scale computed JVM-side first, so untouched rows skip the
    Python stage entirely via the pre-filter + union). PPM payloads only —
    the real pixel path, end to end. Output schema == input schema with
    payload/meta.width/meta.height updated."""
    planned = resize_plan(df, max_side)
    untouched = planned.filter(~F.col("needs_resize")).drop("resize_scale", "needs_resize")
    todo = planned.filter(F.col("needs_resize"))
    out_schema = df.schema

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for b, m, s in zip(pdf["payload"], pdf["meta"], pdf["resize_scale"]):
                img = resize_nearest(decode_ppm(bytes(b)), float(s))
                payloads.append(encode_ppm(img))
                m = dict(m)
                m["width"], m["height"] = int(img.shape[1]), int(img.shape[0])
                metas.append(m)
            out = pdf.drop(columns=["payload", "meta", "resize_scale", "needs_resize"])
            out["payload"] = payloads
            out["meta"] = metas
            yield out[[f.name for f in out_schema.fields]]

    return untouched.unionByName(todo.mapInPandas(_resize, schema=out_schema))


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
