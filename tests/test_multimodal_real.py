"""Real container-format decoders (round 3): RIFF/WAVE PCM and 24-bit
BMP, pure numpy — the multimodal decode tier that needs no external
libraries. Compressed codecs still raise NotImplementedError naming
their dependency (the documented env limit)."""

import numpy as np
import pytest

from cpp_parquet_spark import multimodal as mm


def _wav_blob(tag=1, bits=16, ch=1, rate=8000, body=b"\x01\x00\x02\x00"):
    return (b"RIFF" + np.uint32(36 + len(body)).tobytes() + b"WAVE"
            + b"fmt " + np.uint32(16).tobytes()
            + np.uint16(tag).tobytes() + np.uint16(ch).tobytes()
            + np.uint32(rate).tobytes()
            + np.uint32(rate * ch * bits // 8).tobytes()
            + np.uint16(ch * bits // 8).tobytes()
            + np.uint16(bits).tobytes()
            + b"data" + np.uint32(len(body)).tobytes() + body)


def test_wav_roundtrip_mono_stereo_extremes():
    for ch in (1, 2, 4):
        s = np.arange(-6, 6, dtype=np.int16).reshape(-1, ch)
        s[0, 0], s[-1, -1] = -32768, 32767
        out, rate = mm.decode_wav(mm.encode_wav(s, 44100))
        assert rate == 44100
        assert np.array_equal(out, s)


def test_wav_chunk_walk_skips_list_chunks():
    """Real-world WAVs carry LIST/INFO chunks between fmt and data —
    the parser must walk past them (incl. odd-size word alignment)."""
    base = mm.encode_wav(np.array([[100], [-200]], np.int16), 8000)
    fmt_chunk = base[12:12 + 8 + 16]
    data_chunk = base[12 + 8 + 16:]
    junk = b"LIST" + np.uint32(5).tobytes() + b"INFOx" + b"\x00"  # padded
    blob = base[:12] + fmt_chunk + junk + data_chunk
    blob = blob[:4] + np.uint32(len(blob) - 8).tobytes() + blob[8:]
    s, rate = mm.decode_wav(blob)
    assert s.ravel().tolist() == [100, -200] and rate == 8000


def test_wav_8bit_unsigned_convention():
    s, _ = mm.decode_wav(_wav_blob(bits=8, body=bytes([0, 128, 255])))
    assert s.ravel().tolist() == [-32768, 0, 32512]


def test_wav_non_pcm_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        mm.decode_wav(_wav_blob(tag=85))       # MP3-in-WAV
    with pytest.raises(ValueError):
        mm.decode_wav(b"OggS" + b"\x00" * 40)


def test_bmp_roundtrip_all_strides_and_topdown():
    for w in range(1, 9):          # covers every 4-byte padding case
        img = (np.arange(w * 5 * 3) % 256).astype(np.uint8).reshape(5, w, 3)
        assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)
    # top-down variant (negative height)
    img = (np.arange(4 * 4 * 3) % 256).astype(np.uint8).reshape(4, 4, 3)
    blob = bytearray(mm.encode_bmp(img))
    blob[22:26] = np.int32(-4).tobytes()
    stride = 4 * 3                              # w=4 -> already aligned
    rows = np.frombuffer(bytes(blob[54:]), np.uint8).reshape(4, stride)
    flipped = rows[::-1].tobytes()
    assert np.array_equal(
        mm.decode_bmp(bytes(blob[:54]) + flipped), img)


def test_bmp_unsupported_depth_raises():
    img = np.zeros((2, 2, 3), np.uint8)
    blob = bytearray(mm.encode_bmp(img))
    blob[28:30] = np.uint16(8).tobytes()
    with pytest.raises(NotImplementedError):
        mm.decode_bmp(bytes(blob))
    with pytest.raises(ValueError):
        mm.decode_bmp(b"PNG\x00" + bytes(60))


def test_resize_nearest_pixel_centers():
    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    th = mm.resize_nearest(img, 2, 2)
    assert np.array_equal(th, img[np.ix_([1, 4], [2, 6])])
    up = mm.resize_nearest(img, 12, 16)        # upscale is legal too
    assert up.shape == (12, 16, 3)


def test_spark_wav_features_match_formula(spark, sf_dir):
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    feats = mm.wav_features(mm.synth_wav_media(docs)).collect()
    assert len(feats) == 40
    for r in feats:
        d = r["doc_id"]
        n, ch, rate = mm._wav_params(d)
        k = np.arange(n * ch, dtype=np.int64)
        s = (d * 31 + k * 7) % 65536 - 32768
        assert (r["n_frames"], r["channels"], r["rate"]) == (n, ch, rate)
        assert (r["amp_min"], r["amp_max"]) == (int(s.min()), int(s.max()))
        assert r["amp_sum"] == int(s.sum())


def test_spark_bmp_features_match_formula(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    feats = mm.bmp_features(mm.synth_bmp_media(docs)).collect()
    assert len(feats) == 40
    for r in feats:
        d = r["doc_id"]
        w, h = mm._bmp_params(d)
        y, x, c = np.ogrid[:h, :w, :3]
        img = ((d + 11 * y + 3 * x + 77 * c) % 256).astype(np.int64)
        assert (r["width"], r["height"]) == (w, h)
        assert (r["r_sum"], r["g_sum"], r["b_sum"]) == tuple(
            int(v) for v in img.sum(axis=(0, 1)))
        assert r["thumb_sum"] == int(
            mm.resize_nearest(img.astype(np.uint8), 2, 2)
              .astype(np.int64).sum())


def test_media_payload_codec_roundtrip_bytes(spark, sf_dir):
    """WAV payload bytes through encode_table/decode_table are
    byte-identical (the bin-column codec path on real RIFF blobs)."""
    from cpp_parquet_spark.engine import (EncodeConfig, decode_table,
                                          encode_table)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = mm.synth_wav_media(docs)
    cfg = EncodeConfig(keys=("doc_id",), salt_from=("doc_id",), num_parts=2,
                       order_keys=("doc_id",), table_name="m")
    dec = decode_table(encode_table(media, cfg))
    assert media.exceptAll(dec).count() == 0
    assert dec.exceptAll(media).count() == 0


def test_png_roundtrip_all_filters():
    # REAL PNG codec (pure numpy + stdlib zlib): every filter type
    # (none/sub/up/average/paeth) exercised forward (encoder) and
    # inverse (decoder) across shapes and channel counts
    import numpy as np

    from cpp_parquet_spark import multimodal as M
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 5), (17, 23), (64, 48)]:
        for ch in (None, 3, 4):
            img = rng.integers(0, 256, shape + ((ch,) if ch else ()),
                               dtype=np.uint8)
            for _ in range(3):
                filters = rng.integers(0, 5, shape[0]).astype(np.uint8)
                back = M.decode_png(M.encode_png(img, filters))
                assert np.array_equal(back, img), (shape, ch)


def test_png_decodes_foreign_files():
    # files written by OTHER encoders (real filter heuristics, palette
    # + tRNS) — independent-construction evidence for the decoder
    import glob as _glob

    import numpy as np

    from cpp_parquet_spark import multimodal as M
    candidates = sorted(_glob.glob(
        "/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/"
        "werkzeug/debug/shared/*.png"))
    if not candidates:
        import pytest as _pytest
        _pytest.skip("no foreign PNGs in this container")
    decoded = 0
    for p in candidates[:4]:
        try:
            img = M.decode_png(open(p, "rb").read())
        except NotImplementedError:
            continue                # interlaced / 16-bit: loud skip
        assert img.dtype == np.uint8 and img.size > 0
        decoded += 1
    assert decoded >= 1


def test_decode_image_sniffs_containers():
    import numpy as np

    from cpp_parquet_spark import multimodal as M
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_image(M.encode_png(img)), img)
    assert np.array_equal(M.decode_image(M.encode_bmp(img)), img)
    # JPEG payloads route to the real decoder (round 5); a truncated
    # one fails loudly there rather than silently
    import pytest as _pytest
    with _pytest.raises(ValueError, match="jpeg"):
        M.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with _pytest.raises(NotImplementedError, match="decodable"):
        M.decode_image(b"GIF89a" + b"\x00" * 32)


def test_wav_nonpcm_formats():
    # round 5: IEEE-float (tag 3) and G.711 A-law/mu-law (tags 6/7)
    # WAV decode — G.711 expansions pinned against the classic scalar
    # reference over ALL 256 codes
    import numpy as np

    from cpp_parquet_spark import multimodal as M

    def ulaw2lin(c):
        u = ~c & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw2lin(c):
        a = c ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(M._mulaw_expand(codes),
                          [ulaw2lin(int(c)) for c in codes])
    assert np.array_equal(M._alaw_expand(codes),
                          [alaw2lin(int(c)) for c in codes])

    def wav(tag, bits, body, block):
        return (b"RIFF" + np.uint32(36 + len(body)).tobytes() + b"WAVE"
                + b"fmt " + np.uint32(16).tobytes()
                + np.uint16(tag).tobytes() + np.uint16(1).tobytes()
                + np.uint32(8000).tobytes()
                + np.uint32(8000 * block).tobytes()
                + np.uint16(block).tobytes() + np.uint16(bits).tobytes()
                + b"data" + np.uint32(len(body)).tobytes() + body)

    s = (np.sin(np.linspace(0, 20, 300)) * 0.5).astype("<f4")
    dec, rate = M.decode_wav(wav(3, 32, s.tobytes(), 4))
    exp = np.clip(np.round(s.astype(np.float64) * 32767),
                  -32768, 32767).astype(np.int16)
    assert rate == 8000 and np.array_equal(dec[:, 0], exp)
    dec6, _ = M.decode_wav(wav(6, 8, bytes(codes), 1))
    assert np.array_equal(dec6[:, 0],
                          np.asarray([alaw2lin(int(c)) for c in codes],
                                     np.int16))
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="format tag"):
        M.decode_wav(wav(2, 4, b"\x00" * 16, 1))     # ADPCM: still out


def test_png_roundtrip_fuzz():
    from hypothesis import given, settings, strategies as st

    from cpp_parquet_spark import multimodal as M

    @settings(max_examples=40, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40),
           ch=st.sampled_from([0, 3, 4]), seed=st.integers(0, 10**6))
    def inner(h, w, ch, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 0 else (h, w, ch)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        filters = rng.integers(0, 5, h).astype(np.uint8)
        assert np.array_equal(
            M.decode_png(M.encode_png(img, filters)), img)

    inner()
