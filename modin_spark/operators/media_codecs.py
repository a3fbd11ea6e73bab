"""REAL stdlib-only media codecs: PNG (zlib + struct + numpy) and WAV
(stdlib ``wave``). These back the non-stub paths of operators/multimodal.py
so image/audio decode, feature extraction, and resize are genuine for the
two formats the Python standard library can express — no PIL/cv2/torchaudio
needed. JPEG/MP3/video remain stubbed (declared: their codecs are not
stdlib-expressible).

PNG scope: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced; all five scanline filters
(None/Sub/Up/Average/Paeth) on decode; encode writes filter 0. This is the
subset every real-world encoder emits for the sizes a data pipeline
thumbnails at; unsupported shapes raise with a clear message rather than
silently degrading.

Reference parity note: modin has no media operators at all — this whole
module is net-new capability for the training-data-pipeline surface.

Scale: these run inside mapInPandas batches (bounded Arrow batches); the
decode is per-row independent — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _iter_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            break


def png_meta(data: bytes) -> dict:
    """Cheap header-only parse: format/width/height/bit depth/color type."""
    if not data or not data.startswith(PNG_MAGIC) or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data[16:29])
    return {
        "format": "png", "width": int(w), "height": int(h),
        "bit_depth": int(depth), "color_type": int(ctype),
        "interlaced": bool(interlace),
    }


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. Real inflate + unfilter."""
    meta = png_meta(data)
    if meta["bit_depth"] != 8:
        raise NotImplementedError("only 8-bit PNGs supported")
    if meta["interlaced"]:
        raise NotImplementedError("Adam7 interlacing not supported")
    w, h, ctype = meta["width"], meta["height"], meta["color_type"]
    ch = _CHANNELS[ctype]
    idat, plte = [], None
    for t, payload in _iter_chunks(data):
        if t == b"IDAT":
            idat.append(payload)
        elif t == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for r in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: cumulative along the row, per byte lane
            cur = (np.cumsum(line.reshape(w, ch), axis=0, dtype=np.uint32) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            cur = line + prev
        elif f == 3:  # Average — sequential in x, vectorized across lanes
            cur = np.zeros(stride, dtype=np.uint8)
            lineL, prevL, curL = (a.reshape(w, ch) for a in (line, prev, cur))
            left = np.zeros(ch, dtype=np.uint16)
            for x in range(w):
                v = lineL[x] + ((left + prevL[x]) >> 1).astype(np.uint8)
                curL[x] = v
                left = v.astype(np.uint16)
        elif f == 4:  # Paeth — sequential in x, vectorized across lanes
            cur = np.zeros(stride, dtype=np.uint8)
            lineL, prevL, curL = (a.reshape(w, ch) for a in (line, prev, cur))
            left = np.zeros(ch, dtype=np.int16)
            upleft = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                up = prevL[x].astype(np.int16)
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
                v = lineL[x] + pred.astype(np.uint8)
                curL[x] = v
                upleft = up
                left = v.astype(np.int16)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = cur
        prev = cur
    arr = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        arr = plte[arr[:, :, 0]]
    return arr


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (filter 0, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    idat = zlib.compress(raw, 6)

    def chunk(t: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + t + payload
            + struct.pack(">I", zlib.crc32(t + payload) & 0xFFFFFFFF)
        )

    return PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def resize_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour resize to (width, height) — pure index math."""
    tw, th = size
    h, w = arr.shape[:2]
    ri = (np.arange(th) * h // th).astype(np.int64)
    ci = (np.arange(tw) * w // tw).astype(np.int64)
    return arr[ri][:, ci]


def wav_meta(data: bytes) -> dict:
    """RIFF/WAVE header parse via stdlib wave."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate, nch, width, nframes = f.getframerate(), f.getnchannels(), f.getsampwidth(), f.getnframes()
    return {
        "codec": "pcm_s%d" % (8 * width), "sample_rate": int(rate),
        "channels": int(nch),
        "duration_s": float(nframes) / float(rate) if rate else 0.0,
    }


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n, channels), rate).
    PCM 16-bit and 8-bit supported (what stdlib wave reads)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate, nch, width = f.getframerate(), f.getnchannels(), f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError("only 8/16-bit PCM WAV supported")
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) -> 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()
