"""Multimodal (image/audio/video) column plumbing.

Media lives in the lake as opaque ``binary`` payload columns plus typed
metadata — the Spark-side concerns (schema, partition sizing for wide
binary rows, Arrow batch shape through mapInPandas, deterministic
feature extraction) are real and tested here.

Decoders come in two tiers (round 3):

* **Real container formats, pure numpy** — ``decode_wav`` (RIFF/WAVE
  PCM, 8/16-bit, any channel count) and ``decode_bmp`` (Windows
  BITMAPINFOHEADER, uncompressed 24-bit, bottom-up or top-down). These
  parse actual industry byte layouts with no external libraries, so the
  feature-extraction pipeline exercises genuine header/stride/alignment
  logic (4-byte BMP row padding, chunk walking past LIST/fact chunks).
  ``encode_wav``/``encode_bmp`` build valid files for synthesis + tests.
* **PNG (round 5)** — a REAL compressed-image codec after all: PNG is
  zlib (stdlib) + five scanline filters, so ``decode_png`` /
  ``encode_png`` implement the full format in pure numpy (8-bit
  gray/graya/RGB/RGBA/palette+tRNS, all filters both directions,
  validated against foreign-encoder files shipped in the container).
* **Compressed codecs needing absent libraries (JPEG/MP3/H.264)** —
  these require Pillow/ffmpeg/soundfile, which this container does not
  ship; the dispatchers raise ``NotImplementedError`` with the
  dependency named, and the deterministic SIMG/SAUD synthetic formats
  remain decodable for plumbing tests.

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
    """Sniffing image decode front door: REAL decoders for PNG
    (`decode_png`, pure numpy + stdlib zlib), baseline JPEG
    (`jpegcodec.decode_jpeg`, pure numpy Huffman + vectorized IDCT) and
    24-bit BMP (`decode_bmp`), plus the deterministic SIMG synthetic
    format for tests. Progressive JPEG / other containers raise with
    the feature named."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg
        return decode_jpeg(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] != MAGIC_IMAGE:
        raise NotImplementedError(
            "unrecognized image container; PNG, baseline JPEG, 24-bit "
            "BMP and the SIMG synthetic format are decodable")
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


# --- real container formats: RIFF/WAVE PCM and BMP, pure numpy ---------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 PCM samples (shape [n] mono or [n, ch]) -> canonical 44-byte
    RIFF/WAVE file (format 1 = PCM, 16 bits/sample, little-endian)."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    body = s.tobytes()
    block = ch * 2
    hdr = (b"RIFF" + np.uint32(36 + len(body)).tobytes() + b"WAVE"
           + b"fmt " + np.uint32(16).tobytes()
           + np.uint16(1).tobytes() + np.uint16(ch).tobytes()
           + np.uint32(rate).tobytes()
           + np.uint32(rate * block).tobytes()
           + np.uint16(block).tobytes() + np.uint16(16).tobytes()
           + b"data" + np.uint32(len(body)).tobytes())
    return hdr + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (samples int16[n, ch] (int16 even for
    8-bit input, rescaled per the WAV unsigned-8-bit convention), rate).

    Walks the chunk list (skipping LIST/fact/etc.), honors the fmt
    block alignment, and handles both 8- and 16-bit PCM. Compressed
    formats (format tag != 1) raise NotImplementedError naming the
    dependency that real decoding would need."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    raw = np.frombuffer(payload, np.uint8)
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos: pos + 4]
        size = int(raw[pos + 4: pos + 8].view("<u4")[0])
        body0 = pos + 8
        if cid == b"fmt ":
            f = raw[body0: body0 + 16]
            fmt = {"tag": int(f[0:2].view("<u2")[0]),
                   "ch": int(f[2:4].view("<u2")[0]),
                   "rate": int(f[4:8].view("<u4")[0]),
                   "bits": int(f[14:16].view("<u2")[0])}
        elif cid == b"data":
            data = raw[body0: body0 + size]
        pos = body0 + size + (size & 1)     # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag = fmt["tag"]
    if tag == 0xFFFE:          # WAVE_FORMAT_EXTENSIBLE: real tag is the
        tag = 1                # SubFormat GUID's first word; PCM assumed
    ch = max(fmt["ch"], 1)
    if tag == 1:
        if fmt["bits"] == 16:
            s = data.view("<i2")
        elif fmt["bits"] == 8:              # unsigned 8-bit convention
            s = (data.astype(np.int16) - 128) << 8
        else:
            raise NotImplementedError(
                f"{fmt['bits']}-bit PCM not supported")
    elif tag == 3:                          # IEEE float (round 5)
        if fmt["bits"] == 32:
            f32 = data.view("<f4")
        elif fmt["bits"] == 64:
            f32 = data.view("<f8")
        else:
            raise NotImplementedError(
                f"{fmt['bits']}-bit float WAV not supported")
        s = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    elif tag in (6, 7):                     # G.711 A-law / mu-law
        s = (_alaw_expand(data) if tag == 6 else _mulaw_expand(data))
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (compressed codec) needs "
            "ffmpeg/soundfile, not shipped in this container")
    n = s.shape[0] // ch
    return s[: n * ch].reshape(n, ch).astype(np.int16), fmt["rate"]


def _mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes -> int16 PCM (ITU G.711 table law, the exact
    256-entry expansion every telephony stack agrees on)."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign, -mag, mag)


def _alaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes -> int16 PCM (even-bit inversion + segment
    expansion per the spec)."""
    a = codes.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, mag, -mag)   # A-law: bit 7 SET = positive


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 RGB image [h, w, 3] -> uncompressed 24-bit bottom-up BMP
    (BITMAPINFOHEADER, rows padded to 4 bytes — the format's layout)."""
    h, w, c = img.shape
    assert c == 3
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up rows, BGR channel order (the BMP on-disk convention)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    off = 14 + 40
    hdr = (b"BM" + np.uint32(off + len(body)).tobytes()
           + np.uint32(0).tobytes() + np.uint32(off).tobytes()
           + np.uint32(40).tobytes()
           + np.int32(w).tobytes() + np.int32(h).tobytes()
           + np.uint16(1).tobytes() + np.uint16(24).tobytes()
           + np.uint32(0).tobytes() + np.uint32(len(body)).tobytes()
           + np.int32(2835).tobytes() + np.int32(2835).tobytes()
           + np.uint32(0).tobytes() + np.uint32(0).tobytes())
    return hdr + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> uint8 RGB image [h, w, 3].

    Handles the 4-byte row stride and both bottom-up (positive height)
    and top-down (negative height) layouts. Compressed BMP (BI_RLE*) and
    other bit depths raise NotImplementedError."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    raw = np.frombuffer(payload, np.uint8)
    off = int(raw[10:14].view("<u4")[0])
    w = int(raw[18:22].view("<i4")[0])
    h_raw = int(raw[22:26].view("<i4")[0])
    bpp = int(raw[28:30].view("<u2")[0])
    comp = int(raw[30:34].view("<u4")[0])
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp} needs Pillow/libvips, "
            "not shipped in this container")
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    rows = raw[off: off + h * stride].reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]       # BGR -> RGB
    if h_raw > 0:
        img = img[::-1]                            # bottom-up -> top-down
    return np.ascontiguousarray(img)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (8-bit depth, non-interlaced);
#: type 3 = palette indices, expanded through PLTE (+ tRNS) at the end
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _z
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _z.crc32(ctype + data)))


def encode_png(img: np.ndarray, filters: "np.ndarray | None" = None
               ) -> bytes:
    """REAL PNG encoder, pure numpy + stdlib zlib: 8-bit grayscale
    [h, w], RGB [h, w, 3] or RGBA [h, w, 4], non-interlaced. ``filters``
    optionally fixes the per-row filter type (0 none / 1 sub / 2 up /
    3 average / 4 paeth — all five implemented FORWARD here so the
    decoder's inverse direction is exercised against an independent
    construction); default all-zero."""
    import struct
    import zlib as _z
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    rows = img.reshape(h, w * ch).astype(np.int16)
    if filters is None:
        filters = np.zeros(h, np.uint8)
    prev = np.zeros(w * ch, np.int16)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        ft = int(filters[y])
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prev
        elif ft == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            ul = np.zeros_like(prev)
            ul[ch:] = prev[:-ch]
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), \
                np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            filt = cur - pred
        out.append(ft)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decoder, pure numpy + stdlib zlib: 8-bit depth,
    grayscale / gray+alpha / RGB / RGBA / palette (PLTE + optional tRNS
    alpha), non-interlaced; all five scanline filters
    (none/sub/up/average/paeth) inverted per the PNG spec.
    Sub/average/paeth carry an intra-row left dependency — sub inverts
    as a per-lane cumulative sum; average/paeth walk the row's PIXELS
    (w steps of ch-wide numpy ops). Sub-8-bit depths, 16-bit, and
    interlaced images raise NotImplementedError naming the feature."""
    import struct
    import zlib as _z
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = None
    ctype = depth = interlace = None
    plte = trns = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} "
            f"interlace={interlace} unsupported (8-bit non-interlaced "
            "gray/graya/RGB/RGBA only)")
    ch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(_z.decompress(bytes(idat)), np.uint8)
    rb = w * ch
    if raw.shape[0] != h * (rb + 1):
        raise ValueError("PNG: scanline payload length mismatch")
    raw = raw.reshape(h, rb + 1)
    fts = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)
    prev = np.zeros(rb, np.int16)
    out = np.empty((h, rb), np.uint8)
    for y in range(h):
        cur = rows[y]
        ft = int(fts[y])
        if ft == 0:
            rec = cur
        elif ft == 1:
            # recon[x] = filt[x] + recon[x-ch]: per-lane cumsum mod 256
            rec = np.cumsum(cur.reshape(w, ch), axis=0,
                            dtype=np.int64).reshape(rb)
        elif ft == 2:
            rec = cur + prev
        elif ft in (3, 4):
            rec = np.zeros(rb, np.int64)
            ul_row = np.zeros(rb, np.int16)
            ul_row[ch:] = prev[:-ch]
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = rec[x * ch - ch: x * ch] if x else \
                    np.zeros(ch, np.int64)
                if ft == 3:
                    rec[s] = cur[s] + ((left + prev[s]) >> 1)
                else:
                    up = prev[s].astype(np.int64)
                    ul = ul_row[s].astype(np.int64)
                    p = left + up - ul
                    pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), \
                        np.abs(p - ul)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                    np.where(pb <= pc_, up, ul))
                    rec[s] = cur[s] + pred
                rec[s] &= 0xFF     # next pixel's LEFT must be mod 256
        else:
            raise ValueError(f"PNG: unknown filter {ft}")
        rec = (rec & 0xFF).astype(np.uint8)
        out[y] = rec
        prev = rec.astype(np.int16)
    img = out.reshape(h, w, ch)
    if ctype == 3:                 # palette expansion (+ tRNS alpha)
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]
        if trns is None:
            return np.ascontiguousarray(rgb)
        alpha = np.full(256, 255, np.uint8)
        alpha[:trns.shape[0]] = trns
        return np.ascontiguousarray(
            np.concatenate([rgb, alpha[idx][:, :, None]], axis=2))
    return np.ascontiguousarray(img[:, :, 0] if ch == 1 else img)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling) — the pure-index
    numpy kernel a thumbnail/feature stage uses; no interpolation libs."""
    h, w = img.shape[:2]
    yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64),
                    h - 1)
    xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64),
                    w - 1)
    return img[yi][:, xi]


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


# --- real-format pipeline: synth WAV/BMP tables + feature extraction ---------
#
# Synthesis is a pure integer formula of doc_id, so a SQL oracle can
# recompute every feature from the SAME formula while the Spark side
# derives it by DECODING THE ACTUAL BYTES — matching rows prove the
# RIFF/BMP encode+decode round trip (headers, stride padding, bottom-up
# rows, interleaved channels) is bit-exact.

def _wav_params(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, channels, rate) — all small, all integer."""
    return 64 + doc_id % 64, 1 + doc_id % 2, 8000 + (doc_id % 3) * 4000


def _bmp_params(doc_id: int) -> tuple[int, int]:
    """(width, height)."""
    return 4 + doc_id % 5, 3 + doc_id % 4


WAV_MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def synth_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM WAV payloads: interleaved sample k of doc d is
    ``((d*31 + k*7) % 65536) - 32768`` (int16), frames/channels/rate from
    ``_wav_params``. Real RIFF bytes via encode_wav."""
    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            pays = []
            for d in ids.tolist():
                n, ch, rate = _wav_params(d)
                k = np.arange(n * ch, dtype=np.int64)
                s = ((d * 31 + k * 7) % 65536 - 32768).astype(np.int16)
                pays.append(encode_wav(s.reshape(n, ch), rate))
            yield pd.DataFrame({"doc_id": ids, "payload": pays})

    return df.select(F.col(id_col).cast("long").alias(id_col)) \
             .mapInPandas(kernel, WAV_MEDIA_SCHEMA)


WAV_FEAT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("rate", T.IntegerType()),
    T.StructField("amp_min", T.IntegerType()),
    T.StructField("amp_max", T.IntegerType()),
    T.StructField("amp_sum", T.LongType()),
])


def wav_features(media: DataFrame) -> DataFrame:
    """Decode the RIFF bytes and emit exact-integer audio features."""
    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("n_frames", "channels", "rate",
                                    "amp_min", "amp_max", "amp_sum")}
            for p in pdf["payload"]:
                s, rate = decode_wav(p)
                rows["n_frames"].append(s.shape[0])
                rows["channels"].append(s.shape[1])
                rows["rate"].append(rate)
                rows["amp_min"].append(int(s.min()))
                rows["amp_max"].append(int(s.max()))
                rows["amp_sum"].append(int(s.astype(np.int64).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return media.mapInPandas(kernel, WAV_FEAT_SCHEMA)


def synth_bmp_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 24-bit BMP payloads: pixel (y, x) channel c of doc d
    is ``(d + 11*y + 3*x + 77*c) % 256``; real BMP bytes via encode_bmp
    (bottom-up rows, 4-byte stride)."""
    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            pays = []
            for d in ids.tolist():
                w, h = _bmp_params(d)
                y, x, c = np.ogrid[:h, :w, :3]
                img = ((d + 11 * y + 3 * x + 77 * c) % 256).astype(np.uint8)
                pays.append(encode_bmp(img))
            yield pd.DataFrame({"doc_id": ids, "payload": pays})

    return df.select(F.col(id_col).cast("long").alias(id_col)) \
             .mapInPandas(kernel, WAV_MEDIA_SCHEMA)


BMP_FEAT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("r_sum", T.LongType()),
    T.StructField("g_sum", T.LongType()),
    T.StructField("b_sum", T.LongType()),
    T.StructField("thumb_sum", T.LongType()),
])


def bmp_features(media: DataFrame) -> DataFrame:
    """Decode the BMP bytes, emit exact channel sums + a 2x2
    nearest-neighbor thumbnail sum (exercises resize_nearest)."""
    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "r_sum", "g_sum",
                                    "b_sum", "thumb_sum")}
            for p in pdf["payload"]:
                img = decode_bmp(p)
                h, w = img.shape[:2]
                rows["width"].append(w)
                rows["height"].append(h)
                s = img.astype(np.int64).sum(axis=(0, 1))
                rows["r_sum"].append(int(s[0]))
                rows["g_sum"].append(int(s[1]))
                rows["b_sum"].append(int(s[2]))
                rows["thumb_sum"].append(
                    int(resize_nearest(img, 2, 2).astype(np.int64).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return media.mapInPandas(kernel, BMP_FEAT_SCHEMA)


def synth_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic RGB PNG payloads (same pixel law as the BMP
    fixture: ``(d + 11*y + 3*x + 77*c) % 256``) through the REAL PNG
    encoder, per-row filter type cycling 0..4 so every decoder filter
    branch runs inside the pipeline, not just in unit tests."""
    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            pays = []
            for d in ids.tolist():
                w, h = _bmp_params(d)
                y, x, c = np.ogrid[:h, :w, :3]
                img = ((d + 11 * y + 3 * x + 77 * c) % 256).astype(np.uint8)
                filters = ((np.arange(h) + d) % 5).astype(np.uint8)
                pays.append(encode_png(img, filters))
            yield pd.DataFrame({"doc_id": ids, "payload": pays})

    return df.select(F.col(id_col).cast("long").alias(id_col)) \
             .mapInPandas(kernel, WAV_MEDIA_SCHEMA)


def png_features(media: DataFrame) -> DataFrame:
    """Decode PNG bytes via the sniffing front door, emit exact channel
    sums + a 2x2 thumbnail sum — same schema as `bmp_features`, so the
    oracle law is shared."""
    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "r_sum", "g_sum",
                                    "b_sum", "thumb_sum")}
            for p in pdf["payload"]:
                img = decode_image(p)
                h, w = img.shape[:2]
                rows["width"].append(w)
                rows["height"].append(h)
                s = img.astype(np.int64).sum(axis=(0, 1))
                rows["r_sum"].append(int(s[0]))
                rows["g_sum"].append(int(s[1]))
                rows["b_sum"].append(int(s[2]))
                rows["thumb_sum"].append(
                    int(resize_nearest(img, 2, 2).astype(np.int64).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return media.mapInPandas(kernel, BMP_FEAT_SCHEMA)
