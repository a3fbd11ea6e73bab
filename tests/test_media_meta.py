"""Round-11 media header metadata: real JPEG (T.81 marker walk), MP3 (MPEG
frame chain + ID3v2), MP4 (ISO-BMFF box walk) parsers, plus the unified
attach_media_meta Spark pass over a mixed corpus."""

import struct

import pandas as pd
import pytest

from modin_spark.operators.media_codecs import (
    encode_jpeg_header,
    encode_mp3,
    encode_mp4_header,
    encode_png,
    encode_wav,
    jpeg_meta,
    mp3_meta,
    mp4_meta,
)


# ------------------------------------------------------------------- JPEG

def test_jpeg_meta_baseline_and_progressive():
    m = jpeg_meta(encode_jpeg_header(320, 240, components=3))
    assert (m["width"], m["height"], m["components"], m["progressive"]) == (320, 240, 3, False)
    m = jpeg_meta(encode_jpeg_header(17, 4000, components=1, progressive=True))
    assert (m["width"], m["height"], m["components"], m["progressive"]) == (17, 4000, 1, True)


def test_jpeg_meta_skips_segments_and_fill_bytes():
    # extra APPn segment + FF fill bytes before a marker are legal
    b = bytearray(encode_jpeg_header(64, 32, comment=b"hello world"))
    app1 = b"Exif\x00\x00" + bytes(10)
    seg = struct.pack(">BBH", 0xFF, 0xE1, len(app1) + 2) + app1
    b[2:2] = b"\xff" + seg  # fill byte, then APP1, right after SOI
    m = jpeg_meta(bytes(b))
    assert (m["width"], m["height"]) == (64, 32)


def test_jpeg_meta_rejects_non_jpeg():
    with pytest.raises(ValueError):
        jpeg_meta(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        jpeg_meta(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


# -------------------------------------------------------------------- MP3

def test_mp3_meta_frame_chain_and_duration():
    m = mp3_meta(encode_mp3(9, sr_idx=0, br_idx=9))
    assert m["sample_rate"] == 44100 and m["bitrate_kbps"] == 128
    assert m["frames"] == 9 and m["channels"] == 2
    assert m["duration_s"] == pytest.approx(9 * 1152 / 44100)


def test_mp3_meta_id3_skip_and_mono():
    m = mp3_meta(encode_mp3(3, sr_idx=2, br_idx=11, mono=True, id3_pad=777))
    assert m["sample_rate"] == 32000 and m["channels"] == 1
    assert m["frames"] == 3 and m["bitrate_kbps"] == 192


def test_mp3_meta_resync_before_first_frame():
    # garbage prefix before the first sync word is tolerated (stream rip)
    m = mp3_meta(b"\x00\x12\x34" + encode_mp3(2, sr_idx=1))
    assert m["sample_rate"] == 48000 and m["frames"] == 2


def test_mp3_meta_rejects_non_audio():
    with pytest.raises(ValueError):
        mp3_meta(b"RIFFxxxxWAVE" + bytes(20))


# -------------------------------------------------------------------- MP4

def test_mp4_meta_full_tree():
    m = mp4_meta(encode_mp4_header(90137, 1920, 1080, "avc1", "mp4a", brand="mp42"))
    assert m["brand"] == "mp42"
    assert m["duration_s"] == pytest.approx(90.137)
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["video_codec"] == "avc1" and m["audio_codec"] == "mp4a"


def test_mp4_meta_audio_only():
    m = mp4_meta(encode_mp4_header(2500, video_codec="", audio_codec="mp4a"))
    assert m["audio_codec"] == "mp4a" and "video_codec" not in m
    assert "width" not in m  # zero-dim audio tkhd must not report dimensions


def test_mp4_meta_rejects_non_bmff():
    with pytest.raises(ValueError):
        mp4_meta(bytes(24))


# ------------------------------------------------- unified Spark-side pass

def test_attach_media_meta_mixed_corpus(spark):
    import numpy as np

    from modin_spark.operators.multimodal import attach_media_meta

    rows = [
        (0, encode_png(np.zeros((4, 6), dtype=np.uint8))),
        (1, encode_jpeg_header(100, 50, progressive=True)),
        (2, encode_wav(np.zeros(800), 8000)),
        (3, encode_mp3(5, sr_idx=0, id3_pad=40)),
        (4, encode_mp4_header(3000, 320, 240, "avc1", "mp4a")),
        (5, b"not media at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = (
        attach_media_meta(df)
        .select("media_id", "media_meta.*")
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert list(got["kind"]) == ["image", "image", "audio", "audio", "video", "unknown", "unknown"]
    assert got.loc[0, "width"] == 6 and got.loc[0, "height"] == 4
    assert got.loc[1, "codec"] == "jpeg_progressive" and got.loc[1, "width"] == 100
    assert got.loc[2, "sample_rate"] == 8000 and got.loc[2, "duration_s"] == pytest.approx(0.1)
    assert got.loc[3, "format"] == "mp3" and got.loc[3, "duration_s"] == pytest.approx(5 * 1152 / 44100)
    assert got.loc[4, "codec"] == "avc1" and got.loc[4, "duration_s"] == pytest.approx(3.0)
    assert pd.isna(got.loc[5, "format"]) and pd.isna(got.loc[6, "width"])


def test_make_synthetic_media_mixed_kinds(spark):
    from modin_spark.operators.multimodal import attach_media_meta, make_synthetic_media

    df = make_synthetic_media(spark, n=10, kind="mixed")
    got = (attach_media_meta(df).select("media_id", "media_meta.kind", "media_meta.format")
           .toPandas().set_index("media_id").sort_index())
    assert got["format"].tolist() == ["png", "jpeg", "wav", "mp3", "mp4"] * 2
    assert got["kind"].tolist() == ["image", "image", "audio", "audio", "video"] * 2


# ------------------------------------------------------------- r14: JPEG
def test_jpeg_baseline_roundtrip_exact():
    """encode_jpeg_baseline -> decode_jpeg_baseline reproduces the IDCT of
    the original quantized coefficients bit-exactly (Huffman, DPCM, zigzag,
    ZRL/EOB, dequant all in play)."""
    import numpy as np

    from modin_spark.operators.media_codecs import (
        _IDCT_M, decode_jpeg_baseline, encode_jpeg_baseline)

    rng = np.random.default_rng(3)
    for trial in range(12):
        by, bx = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        q = rng.integers(1, 16, (8, 8)).astype(np.int64)
        coeffs = np.zeros((by, bx, 8, 8), dtype=np.int64)
        for r in range(by):
            for c in range(bx):
                idx = rng.integers(0, 64, 8)
                coeffs[r, c].ravel()[idx] = rng.integers(-40, 41, 8)
        data = encode_jpeg_baseline(coeffs, bx * 8, by * 8, q)
        img = decode_jpeg_baseline(data)
        exp = np.empty((by * 8, bx * 8))
        for r in range(by):
            for c in range(bx):
                exp[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = (
                    _IDCT_M.T @ (coeffs[r, c] * q).astype(float) @ _IDCT_M)
        exp = np.clip(np.round(exp) + 128, 0, 255).astype(np.uint8)
        assert (img == exp).all()
        # metadata parser agrees on the same stream
        from modin_spark.operators.media_codecs import jpeg_meta

        meta = jpeg_meta(data)
        assert (meta["width"], meta["height"]) == (bx * 8, by * 8)
        assert meta["progressive"] is False and meta["components"] == 1


def test_jpeg_decoder_rejects_non_baseline():
    import numpy as np
    import pytest

    from modin_spark.operators.media_codecs import (
        decode_jpeg_baseline, encode_jpeg_header)

    with pytest.raises(NotImplementedError):
        decode_jpeg_baseline(encode_jpeg_header(32, 32, progressive=True))
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\x00\x01")


def test_image_stats_sniffs_png_and_jpeg(spark):
    import numpy as np

    from modin_spark.operators.media_codecs import (
        encode_jpeg_baseline, encode_png)
    from modin_spark.operators.multimodal import image_stats

    arr = (np.arange(256) % 17).reshape(16, 16).astype(np.uint8)
    png = encode_png(arr)
    coeffs = np.zeros((2, 2, 8, 8), dtype=np.int64)
    coeffs[:, :, 0, 0] = 5
    jpg = encode_jpeg_baseline(coeffs, 16, 16, np.full((8, 8), 8, dtype=np.int64))
    df = spark.createDataFrame([(0, bytearray(png)), (1, bytearray(jpg))],
                               "media_id long, payload binary")
    rows = {r["media_id"]: r for r in image_stats(df).collect()}
    assert rows[0]["mean_lum"] == float(arr.mean())
    assert rows[1]["mean_lum"] == 133.0  # 128 + dc, flat blocks
    assert rows[1]["var_lum"] == 0.0
    assert rows[0]["width"] == rows[1]["width"] == 16


def test_jpeg_color444_roundtrip_exact():
    """4:4:4 YCbCr baseline: interleaved MCUs, two quant tables, JFIF
    color conversion — decode must equal the reference IDCT + T.871 matrix
    bit-exactly."""
    import numpy as np

    from modin_spark.operators.media_codecs import (
        _IDCT_M, decode_jpeg_baseline, encode_jpeg_color444, jpeg_meta)

    rng = np.random.default_rng(9)
    for _ in range(5):
        by, bx = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        qy = rng.integers(1, 10, (8, 8)).astype(np.int64)
        qc = rng.integers(1, 10, (8, 8)).astype(np.int64)
        co = np.zeros((3, by, bx, 8, 8), dtype=np.int64)
        for ci in range(3):
            for r in range(by):
                for c in range(bx):
                    co[ci, r, c].ravel()[rng.integers(0, 64, 5)] = rng.integers(-25, 26, 5)
        data = encode_jpeg_color444(co, bx * 8, by * 8, qy, qc)
        assert jpeg_meta(data)["components"] == 3
        rgb = decode_jpeg_baseline(data)
        planes = []
        for ci, qt in ((0, qy), (1, qc), (2, qc)):
            p = np.empty((by * 8, bx * 8))
            for r in range(by):
                for c in range(bx):
                    p[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = (
                        _IDCT_M.T @ (co[ci, r, c] * qt).astype(float) @ _IDCT_M)
            planes.append(p + 128)
        y, cb, cr = planes[0], planes[1] - 128, planes[2] - 128
        exp = np.stack([y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb], -1)
        exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)
        assert rgb.shape == exp.shape and (rgb == exp).all()
