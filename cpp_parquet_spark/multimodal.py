"""Multimodal (image/audio/video) column plumbing.

Media lives in the lake as opaque ``binary`` payload columns plus typed
metadata — the Spark-side concerns (schema, partition sizing for wide
binary rows, Arrow batch shape through mapInPandas, deterministic
feature extraction) are real and tested here; the actual pixel/sample
decoding depends on libraries this container doesn't ship (Pillow,
ffmpeg, soundfile), so the decode step is STUBBED: it raises
``NotImplementedError`` unless the payload is our deterministic synthetic
format, which the fake decoder parses for the tests.

Synthetic payload format (deterministic, self-describing)::

    magic  4B  b"SIMG" (image) / b"SAUD" (audio)
    width  4B  u32 LE          | n_samples 4B u32 LE
    height 4B  u32 LE          | rate      4B u32 LE
    body   width*height bytes  | n_samples bytes (u8 samples)

At 100 TB: payloads dominate row width, so the encode pipeline's
bytes-per-partition planner (partitioning.plan_num_parts) applies to the
payload column, and feature extraction is a narrow mapInPandas pass
whose Arrow batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MAGIC_IMAGE = b"SIMG"
MAGIC_AUDIO = b"SAUD"

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])


def synth_media(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    even ids become 'images' whose body is the text bytes, odd ids become
    'audio'. Width = min(len, 64), height = ceil(len/width)."""
    tb = F.col(text_col).cast("binary")
    n = F.octet_length(tb)
    w = F.least(n, F.lit(64))
    h = F.ceil(n / w).cast("int")
    is_img = F.col(id_col) % 2 == 0

    def le(c):  # u32 little-endian bytes (reverse() would coerce to string)
        c = c.cast("long")
        return F.unhex(F.concat(*[
            F.lpad(F.hex(F.shiftright(c, 8 * i).bitwiseAND(F.lit(255))),
                   2, "0") for i in range(4)]))

    img = F.concat(F.lit(MAGIC_IMAGE), le(w), le(h), tb)
    aud = F.concat(F.lit(MAGIC_AUDIO), le(n), le(F.lit(16000)), tb)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(is_img, "image/synthetic").otherwise("audio/synthetic")
         .alias("media_type"),
        F.when(is_img, img).otherwise(aud).alias("payload"))


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real JPEG/PNG decoding needs Pillow/libvips (absent here).
    The deterministic synthetic format decodes for tests; anything else
    raises."""
    if payload[:4] != MAGIC_IMAGE:
        raise NotImplementedError(
            "real image decoding requires Pillow/libvips, not shipped in "
            "this container; only the SIMG synthetic format is decodable")
    w = int(np.frombuffer(payload[4:8], "<u4")[0])
    h = int(np.frombuffer(payload[8:12], "<u4")[0])
    body = np.frombuffer(payload[12:], np.uint8)
    out = np.zeros(w * h, dtype=np.uint8)
    out[: body.shape[0]] = body[: w * h]
    return out.reshape(h, w)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """STUB: real audio decoding needs ffmpeg/soundfile (absent here)."""
    if payload[:4] != MAGIC_AUDIO:
        raise NotImplementedError(
            "real audio decoding requires ffmpeg/soundfile, not shipped in "
            "this container; only the SAUD synthetic format is decodable")
    ns = int(np.frombuffer(payload[4:8], "<u4")[0])
    rate = int(np.frombuffer(payload[8:12], "<u4")[0])
    body = np.frombuffer(payload[12:], np.uint8)[:ns]
    return body, rate


META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("magic", T.StringType()),
    T.StructField("dim1", T.LongType()),
    T.StructField("dim2", T.LongType()),
    T.StructField("body_mean", T.DoubleType()),
])


def extract_meta(media: DataFrame) -> DataFrame:
    """Typed metadata + a cheap feature (mean body byte) per payload via
    mapInPandas — the plumbing pattern for any real feature extractor
    (CLIP embedding, mel spectrogram, frame sampling): batched Arrow in,
    columnar out, no per-row Python beyond the numpy header parse."""
    def kernel(batches):
        for pdf in batches:
            pays = pdf["payload"]
            n = pays.str.len().to_numpy(np.int64)
            magic, d1, d2, mean = [], [], [], []
            for p in pays:                      # header peek: 12 bytes/row
                magic.append(p[:4].decode("ascii", "replace"))
                hdr = np.frombuffer(p[4:12], "<u4")
                d1.append(int(hdr[0])), d2.append(int(hdr[1]))
                body = np.frombuffer(p[12:], np.uint8)
                mean.append(float(body.mean()) if body.size else 0.0)
            # floor-at-6dp, not round: round-half ties break differently
            # across engines, floor on the identical double is bit-stable
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media_type": pdf["media_type"],
                "n_bytes": n, "magic": magic, "dim1": d1, "dim2": d2,
                "body_mean": np.floor(np.array(mean) * 1e6) / 1e6})

    return media.mapInPandas(kernel, META_SCHEMA)
