"""Multimodal (image/audio/video) column operators.

Representation: opaque ``binary`` payload column + typed metadata struct
(format, width/height or sample_rate/duration, codec). The Spark-side
plumbing — schema, partition sizing, Arrow batch shape, mapInPandas
signatures — is real and tested. Decode is REAL for the two stdlib-
expressible formats (r7): PNG via zlib inflate + scanline unfilter and WAV
via the stdlib ``wave`` module (operators/media_codecs.py) back
``decode_stub=False`` for image decode / feature extraction / resize and
audio decode / features. JPEG pixel decode is REAL as of r14/r15 (baseline
+ progressive, media_codecs pure-numpy T.81 pipeline), as is MJPEG-in-AVI
video frame decode; MP3 SAMPLE decode remains stubbed (``decode_stub=True``
produces deterministic fake features) because the MPEG-1 polyphase window
is a tabulated constant not reproducible offline; swapping in torchaudio
later only changes the inner function body. HEADER metadata is
REAL as of r11: jpeg_meta (T.81 marker walk), mp3_meta (MPEG frame-header
chain + ID3v2 skip), mp4_meta (ISO-BMFF box walk) in media_codecs.py back
attach_media_meta — dimensions / sample rate / duration / codec, which is
what a pipeline filters and shards on.

Scale notes: media blobs make rows heavy — mapInPandas with
spark.sql.execution.arrow.maxRecordsPerBatch tuned low keeps Arrow batches
bounded; never collect; feature extraction is embarrassingly parallel
(narrow), so the only shuffle is whatever analysis follows.
"""

from __future__ import annotations

import hashlib
from struct import error as struct_error
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),      # image / audio / video / unknown
        T.StructField("format", T.StringType()),    # png / jpeg / wav / mp3 / mp4 ...
        T.StructField("codec", T.StringType()),     # avc1 / mp4a / pcm_s16 / mp3 ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def attach_image_meta(df: SDF, bin_col: str = "payload") -> SDF:
    """Parse header fields from the binary. REAL for PNG and JPEG payloads
    (IHDR / SOF marker walk via media_codecs in a vectorized pandas_udf);
    other payloads get the deterministic content-hash stub so mixed
    corpora stay testable end-to-end."""
    from modin_spark.operators.media_codecs import JPEG_MAGIC, PNG_MAGIC, jpeg_meta, png_meta

    @F.pandas_udf(IMAGE_META)
    def _meta(payloads: pd.Series) -> pd.DataFrame:
        fmts, ws, hs = [], [], []
        for b in payloads:
            b = bytes(b) if b is not None else b""
            if b.startswith(PNG_MAGIC):
                m = png_meta(b)
                fmts.append("png"); ws.append(m["width"]); hs.append(m["height"])
            elif b.startswith(JPEG_MAGIC):
                m = jpeg_meta(b)
                fmts.append("jpeg"); ws.append(m["width"]); hs.append(m["height"])
            else:  # stub metadata for non-decodable formats
                h = zlib_crc32(b)
                fmts.append("unknown"); ws.append(h % 1920 + 32); hs.append((h >> 8) % 1080 + 32)
        return pd.DataFrame({"format": fmts, "width": ws, "height": hs})

    return df.withColumn("meta", _meta(F.col(bin_col)))


def attach_media_meta(df: SDF, bin_col: str = "payload") -> SDF:
    """Unified REAL header-metadata pass over a mixed media corpus: one
    Arrow-vectorized pandas_udf sniffs the magic bytes and dispatches to the
    real parsers (png_meta / jpeg_meta / wav_meta / mp3_meta / mp4_meta).
    This is the 100 TB shard/filter primitive — dimensions, sample rate,
    duration and codec come straight out of the container headers with no
    pixel/sample decode, so the pass is scan-speed and embarrassingly
    parallel (no shuffle). Unparseable payloads yield kind='unknown' rather
    than failing the batch."""
    from modin_spark.operators import media_codecs as mc

    @F.pandas_udf(MEDIA_META)
    def _meta(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payloads:
            b = bytes(b) if b is not None else b""
            row = {"kind": "unknown", "format": None, "codec": None,
                   "width": None, "height": None, "sample_rate": None,
                   "channels": None, "duration_s": None}
            try:
                if b.startswith(mc.PNG_MAGIC):
                    m = mc.png_meta(b)
                    row.update(kind="image", format="png",
                               width=m["width"], height=m["height"])
                elif b.startswith(mc.JPEG_MAGIC):
                    m = mc.jpeg_meta(b)
                    row.update(kind="image", format="jpeg",
                               codec="jpeg_progressive" if m["progressive"] else "jpeg_baseline",
                               width=m["width"], height=m["height"])
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    m = mc.wav_meta(b)
                    row.update(kind="audio", format="wav", codec=m["codec"],
                               sample_rate=m["sample_rate"], channels=m["channels"],
                               duration_s=m["duration_s"])
                elif len(b) >= 12 and b[4:8] == b"ftyp":
                    m = mc.mp4_meta(b)
                    row.update(kind="video" if m.get("video_codec") else "audio",
                               format="mp4", codec=m.get("video_codec") or m.get("audio_codec"),
                               width=m.get("width"), height=m.get("height"),
                               duration_s=m.get("duration_s"))
                elif b[:3] == b"ID3" or (len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
                    m = mc.mp3_meta(b)
                    row.update(kind="audio", format="mp3", codec=m["codec"],
                               sample_rate=m["sample_rate"], channels=m["channels"],
                               duration_s=m["duration_s"])
            except (ValueError, NotImplementedError, struct_error):
                pass
            rows.append(row)
        out = pd.DataFrame(rows)
        for c, dt in (("width", "Int32"), ("height", "Int32"),
                      ("sample_rate", "Int32"), ("channels", "Int32")):
            out[c] = out[c].astype(dt)
        return out

    return df.withColumn("media_meta", _meta(F.col(bin_col)))


def zlib_crc32(b: bytes) -> int:
    import zlib

    return zlib.crc32(b) & 0xFFFFFFFF


def _fake_embedding(data: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector from content bytes."""
    dg = hashlib.sha256(data or b"").digest()
    rng = np.random.default_rng(int.from_bytes(dg[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def _decode_image(data: bytes) -> "np.ndarray":
    """Sniff + REAL-decode an image payload to (h, w, ch) uint8: PNG
    (media_codecs.decode_png) or JPEG — baseline SOF0 (r14) and
    progressive SOF2 (r15) both decode via media_codecs.decode_jpeg's
    marker sniff. Other formats raise."""
    from modin_spark.operators.media_codecs import (
        JPEG_MAGIC, PNG_MAGIC, decode_jpeg, decode_png)

    data = bytes(data)
    if data.startswith(PNG_MAGIC):
        return decode_png(data)
    if data.startswith(JPEG_MAGIC):
        arr = decode_jpeg(data)  # (h, w) gray or (h, w, 3) RGB
        return arr[:, :, None] if arr.ndim == 2 else arr
    raise ValueError("unsupported image payload (PNG or JPEG)")


def _png_feature_vec(data: bytes, dim: int) -> list:
    """REAL image features: [width, height, channels, mean, std, 8-bin luma
    histogram density...] padded with zeros to ``dim``. mean/std computed in
    float64 over all samples (mean of a 2^k-pixel gray image is exactly
    dyadic — exploited by the multimodal_png_stats oracle)."""
    arr = _decode_image(data)
    h, w, ch = arr.shape
    flat = arr.astype(np.float64)
    luma = flat.mean(axis=2)
    hist = np.histogram(luma, bins=8, range=(0.0, 256.0))[0] / float(h * w)
    feats = [float(w), float(h), float(ch), float(flat.mean()), float(flat.std())]
    feats.extend(float(x) for x in hist)
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return [float(np.float32(v)) for v in feats]


def image_features(df: SDF, bin_col: str = "payload", dim: int = 64, decode_stub: bool = True) -> SDF:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Output schema: input columns + feature array<float>. With
    ``decode_stub=False`` the decode is REAL for PNG and baseline-JPEG
    payloads (stdlib/numpy codecs, sniffed by magic bytes — see
    _decode_image); other formats raise. The mapInPandas shape (iterator
    of pandas batches) is the same contract a PIL/torch implementation
    would drop into for the remaining formats.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                feats = [_fake_embedding(b, dim).tolist() for b in pdf[bin_col]]
            else:
                feats = [_png_feature_vec(b, dim) for b in pdf[bin_col]]
            yield pdf.assign(features=feats)

    return df.mapInPandas(extract, out_schema)


def image_stats(df: SDF, bin_col: str = "payload") -> SDF:
    """REAL image decode -> exact float64 stats per row: width, height,
    mean luminance and population variance (PNG or baseline grayscale JPEG,
    sniffed by magic bytes). Unlike image_features' float32 vector, the
    float64 stats stay bit-exact for integer images whose pixel count is a
    power of two — the property the multimodal_{png,jpeg}_stats oracles
    replay in SQL. Scale shape: mapInPandas, per-row independent, no
    shuffle."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_lum", T.DoubleType()),
        T.StructField("var_lum", T.DoubleType()),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, mus, vs = [], [], [], []
            for b in pdf[bin_col]:
                arr = _decode_image(b).astype(np.float64)
                h, w = arr.shape[:2]
                mu = float(arr.mean())
                ws.append(w)
                hs.append(h)
                mus.append(mu)
                vs.append(float((arr * arr).mean() - mu * mu))
            yield pdf.assign(width=ws, height=hs, mean_lum=mus, var_lum=vs)

    return df.mapInPandas(extract, out_schema)


def image_channel_stats(df: SDF, bin_col: str = "payload") -> SDF:
    """REAL color decode -> exact float64 per-CHANNEL means (mean_r/g/b) +
    dimensions per row. Built for chroma-subsampled JPEG (r15: 4:2:0/4:2:2
    decode in media_codecs) where luminance alone can't witness the chroma
    reconstruction path; PNG and grayscale (channels broadcast) also work.
    Scale shape: mapInPandas, per-row independent, no shuffle."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, mr, mg, mb = [], [], [], [], []
            for b in pdf[bin_col]:
                arr = _decode_image(b).astype(np.float64)
                h, w = arr.shape[:2]
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                m = arr[:, :, :3].reshape(-1, 3).mean(axis=0)
                ws.append(w)
                hs.append(h)
                mr.append(float(m[0]))
                mg.append(float(m[1]))
                mb.append(float(m[2]))
            yield pdf.assign(width=ws, height=hs, mean_r=mr, mean_g=mg, mean_b=mb)

    return df.mapInPandas(extract, out_schema)


def audio_features(df: SDF, bin_col: str = "payload", dim: int = 32, decode_stub: bool = True) -> SDF:
    """Audio decode + feature extraction (MFCC-shaped) via mapInPandas.
    Same batch contract as image_features; real impl would use torchaudio."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("audio_features", T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                feats = [_fake_embedding(b, dim).tolist() for b in pdf[bin_col]]
            else:
                feats = [_wav_feature_vec(b, dim) for b in pdf[bin_col]]
            yield pdf.assign(audio_features=feats)

    return df.mapInPandas(extract, out_schema)


def _wav_feature_vec(data: bytes, dim: int) -> list:
    """REAL WAV features: [duration_s, rms, zero-crossing rate, 13 log-power
    spectral bands] padded with zeros to ``dim`` (stdlib-only codec,
    media_codecs.decode_wav; bands via numpy rFFT — MFCC-shaped without the
    mel filterbank dependency)."""
    from modin_spark.operators.media_codecs import decode_wav

    x, rate = decode_wav(bytes(data))
    mono = x.mean(axis=1)
    n = len(mono)
    dur = n / float(rate) if rate else 0.0
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    feats = [dur, rms, zcr]
    if n:
        spec = np.abs(np.fft.rfft(mono)) ** 2
        bands = np.array_split(spec, 13)
        feats.extend(float(np.log1p(b.mean())) if len(b) else 0.0 for b in bands)
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return [float(np.float32(v)) for v in feats]


def resize_images(df: SDF, bin_col: str = "payload", size: tuple[int, int] = (224, 224), decode_stub: bool = True) -> SDF:
    """Image resize. With ``decode_stub=False`` (PNG payloads) this is
    REAL: decode -> nearest-neighbour resample -> re-encode, payload
    replaced, meta rewritten from the actual new header. The stub keeps the
    old behaviour (payload passthrough, meta dims rewritten) for
    non-decodable formats."""
    if not decode_stub:
        from modin_spark.operators.media_codecs import encode_png, resize_nearest, decode_png

        out_schema = df.schema

        def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf[bin_col] = [
                    encode_png(resize_nearest(decode_png(bytes(b)), size)) for b in pdf[bin_col]
                ]
                yield pdf

        return attach_image_meta(df.mapInPandas(_resize, out_schema), bin_col)
    df = attach_image_meta(df, bin_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(size[0]).cast("int").alias("width"),
            F.lit(size[1]).cast("int").alias("height"),
        ),
    )


def sample_frames(df: SDF, bin_col: str = "payload", every_n: int = 10, decode_stub: bool = True) -> SDF:
    """Video frame sampling: emits (frame_idx, frame_payload) rows.

    ``decode_stub=False`` (r15): REAL decode for MJPEG-in-AVI payloads —
    media_codecs.decode_avi_frames walks the RIFF 'movi' list, decodes
    every ``every_n``-th '00dc' chunk through the full T.81 JPEG pipeline,
    and re-encodes each sampled frame as a real PNG payload. Runs inside
    mapInPandas (one input row fans out to its sampled frames) — per-row
    independent, no shuffle; inter-frame codecs raise. The stub path keeps
    the legacy posexplode shape for opaque payloads."""
    if not decode_stub:
        out_schema = T.StructType(df.schema.fields + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ])

        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from modin_spark.operators.media_codecs import (
                decode_avi_frames, encode_png)

            for pdf in batches:
                rows = []
                for _, row in pdf.iterrows():
                    for fi, arr in decode_avi_frames(bytes(row[bin_col]), every_n):
                        r = dict(row)
                        r["frame_idx"] = fi
                        r["frame_payload"] = encode_png(arr)
                        rows.append(r)
                yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

        return df.mapInPandas(extract, out_schema)
    n_frames = (F.crc32(F.col(bin_col)) % 50 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    exploded = df.withColumn("frame_idx", F.explode(idx))
    return exploded.withColumn("frame_payload", F.sha2(F.concat(F.col(bin_col), F.col("frame_idx").cast("binary")), 256).cast("binary"))


def video_frame_stats(df: SDF, bin_col: str = "payload", every_n: int = 1) -> SDF:
    """REAL video sample decode -> exact per-video stats: container dims,
    total frame count, number of sampled frames, and the mean luminance
    over every pixel of the sampled frames (float64 — exact for the dyadic
    pixel values the oracle constructs). MJPEG-in-AVI via
    media_codecs.decode_avi_frames; per-row independent, no shuffle."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sampled", T.IntegerType()),
        T.StructField("mean_lum", T.DoubleType()),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from modin_spark.operators.media_codecs import avi_meta, decode_avi_frames

        for pdf in batches:
            ws, hs, nf, ns, mus = [], [], [], [], []
            for b in pdf[bin_col]:
                data = bytes(b)
                meta = avi_meta(data)
                tot = 0.0
                cnt = 0
                npx = 0
                for _, arr in decode_avi_frames(data, every_n):
                    a = arr.astype(np.float64)
                    if a.ndim == 3:
                        a = a.mean(axis=2)
                    tot += float(a.sum())
                    npx += a.size
                    cnt += 1
                ws.append(int(meta.get("width", 0)))
                hs.append(int(meta.get("height", 0)))
                nf.append(int(meta.get("n_frames", 0)))
                ns.append(cnt)
                mus.append(tot / npx if npx else None)
            yield pdf.assign(width=ws, height=hs, n_frames=nf, sampled=ns,
                             mean_lum=mus)

    return df.mapInPandas(extract, out_schema)


def make_synthetic_media(spark, n: int = 100, seed: int = 42, kind: str = "raw") -> SDF:
    """Deterministic synthetic binary table for tests.

    kind="raw": opaque random bytes (exercises the stub paths).
    kind="png": REAL 16x16 grayscale PNGs, pixel(r, c) = (id*31 + r*16 + c)
    % 256 — decodable by the real codec and SQL-replayable (the
    multimodal_png_stats oracle recomputes mean brightness from the same
    arithmetic).
    kind="wav": REAL 0.25 s 8 kHz sine WAVs at id-dependent frequency.
    kind="jpeg"/"mp3"/"mp4": structurally valid HEADER streams with
    id-derived fields (r11 — parsed by the real header codecs; the
    entropy-coded payload stays the declared stub).
    kind="mixed": cycles png/jpeg/wav/mp3/mp4 for attach_media_meta tests."""
    rows = []
    rng = np.random.default_rng(seed)
    from modin_spark.operators import media_codecs as mc

    def mk(kd: str, i: int) -> bytes:
        if kd == "png":
            r, c = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
            arr = ((i * 31 + r * 16 + c) % 256).astype(np.uint8)
            return mc.encode_png(arr)
        if kd == "wav":
            t = np.arange(2000) / 8000.0
            return mc.encode_wav(0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t), 8000)
        if kd == "jpeg":
            return mc.encode_jpeg_header(32 + i * 3, 16 + i * 2,
                                         progressive=i % 2 == 1)
        if kd == "mp3":
            return mc.encode_mp3(3 + i % 5, sr_idx=i % 3, id3_pad=(i * 13) % 97)
        if kd == "mp4":
            return mc.encode_mp4_header(1000 + i * 137, 64 + i % 256, 48 + i % 32,
                                        video_codec="avc1", audio_codec="mp4a")
        return bytes(rng.integers(0, 256, size=64, dtype=np.uint8).tolist())

    cycle = ["png", "jpeg", "wav", "mp3", "mp4"]
    for i in range(n):
        kd = cycle[i % len(cycle)] if kind == "mixed" else kind
        rows.append((i, mk(kd, i)))
    return spark.createDataFrame(rows, T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]))
