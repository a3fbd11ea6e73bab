"""REAL stdlib-only media codecs: PNG (zlib + struct + numpy) and WAV
(stdlib ``wave``). These back the non-stub paths of operators/multimodal.py
so image/audio decode, feature extraction, and resize are genuine for the
two formats the Python standard library can express — no PIL/cv2/torchaudio
needed. r14 adds a REAL baseline-JPEG codec (pure numpy Huffman + IDCT;
SOF0 grayscale and 4:4:4 YCbCr color — see the section at the bottom of
this file); r15 extends it to chroma-subsampled layouts (4:2:0 — the
dominant camera/web format — and 4:2:2, nearest-neighbor chroma
reconstruction), progressive (SOF2) streams (spectral selection +
successive approximation + EOB runs, T.81 Annex G), and MJPEG-in-AVI
video sample decode (RIFF walk + per-frame JPEG decode). MP3 sample
decode remains the one declared media stub: the MPEG-1 polyphase
synthesis window is a 512-entry tabulated constant with no closed form,
so a faithful from-scratch decode is not reproducible offline.

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

# --------------------------------------------------------------------------
# JPEG / MP3 / MP4 HEADER parsers (round 11). JPEG pixel decode became real
# in r14/r15 (baseline + progressive sections below); MP3/MP4 SAMPLE decode
# stays a declared stub — but the metadata a pipeline filters and shards
# on (dimensions, sample rate, duration, codec) lives in the container
# headers, which ARE plain byte structures. These are real parsers of the
# public formats (ITU T.81 marker segments, MPEG-1/2 audio frame headers +
# ID3v2 + Xing, ISO BMFF boxes), not decoders.

JPEG_MAGIC = b"\xff\xd8"
# SOF markers carrying frame dimensions: C0-C3, C5-C7, C9-CB, CD-CF
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
_JPEG_STANDALONE = set(range(0xD0, 0xDA)) | {0x01}  # RSTn, SOI, EOI, TEM


def jpeg_meta(data: bytes) -> dict:
    """Marker-segment walk (ITU T.81 B.1): SOI, then FF-prefixed segments
    with big-endian lengths, until a Start-Of-Frame marker yields precision,
    height, width, component count. progressive <=> SOF2 family."""
    if not data or not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG")
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        marker = data[pos + 1]
        while marker == 0xFF and pos + 2 < n:  # fill bytes are legal
            pos += 1
            marker = data[pos + 1]
        if marker in _JPEG_STANDALONE:
            if marker == 0xD9:  # EOI before any SOF
                break
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            prec, h, w, ncomp = struct.unpack(">BHHB", data[pos + 4 : pos + 10])
            return {
                "format": "jpeg", "width": int(w), "height": int(h),
                "bit_depth": int(prec), "components": int(ncomp),
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
            }
        pos += 2 + seglen
    raise ValueError("corrupt JPEG: no SOF marker")


def encode_jpeg_header(width: int, height: int, components: int = 3,
                       progressive: bool = False, comment: bytes = b"") -> bytes:
    """Structurally valid JPEG header stream (SOI + APP0/JFIF + COM + SOF +
    EOI) for testing the marker walk. Carries no entropy-coded scan — the
    full DCT codec is the declared stub."""
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof_marker = 0xC2 if progressive else 0xC0
    comps = b"".join(struct.pack(">BBB", i + 1, 0x11, 0) for i in range(components))
    sof = struct.pack(">BHHB", 8, height, width, components) + comps
    out = bytearray(JPEG_MAGIC)
    for marker, payload in ((0xE0, app0), (0xFE, comment), (sof_marker, sof)):
        out += struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload
    out += b"\xff\xd9"
    return bytes(out)


# MPEG audio frame header tables (public spec, ISO/IEC 11172-3 / 13818-3)
_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0]
_MP3_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (syncsafe 28-bit size), else 0."""
    if len(data) >= 10 and data[:3] == b"ID3":
        s = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        return 10 + s
    return 0


def mp3_meta(data: bytes) -> dict:
    """Skip ID3v2, parse the first MPEG audio frame header (version, layer,
    bitrate, sample rate, channel mode), then WALK the frame chain using the
    per-frame computed lengths to count frames exactly — duration is
    frames * samples_per_frame / sample_rate, which is also what a Xing
    header would assert for VBR files."""
    pos = _id3v2_size(data)
    n = len(data)
    first = None
    frames = 0
    while pos + 4 <= n:
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if first is None:
                pos += 1  # resync scan before the first frame only
                continue
            break
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3    # 1=III, 2=II, 3=I
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        mode = (b3 >> 6) & 0x3
        if version == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
            break  # reserved values: not a real frame
        sr = _MP3_SR[version][sr_idx]
        if layer == 1:  # Layer III
            kbps = (_MP3_BITRATE_V1L3 if version == 3 else _MP3_BITRATE_V2L3)[br_idx]
            spf = 1152 if version == 3 else 576
            flen = spf // 8 * kbps * 1000 // sr + padding
        elif layer == 3:  # Layer I
            kbps = _MP3_BITRATE_V1L3[br_idx]
            spf = 384
            flen = (12 * kbps * 1000 // sr + padding) * 4
        else:  # Layer II
            kbps = _MP3_BITRATE_V1L3[br_idx]
            spf = 1152
            flen = 144 * kbps * 1000 // sr + padding
        if first is None:
            first = {
                "codec": "mp3" if layer == 1 else ("mp2" if layer == 2 else "mp1"),
                "mpeg_version": {3: 1, 2: 2, 0: 25}[version],
                "bitrate_kbps": int(kbps), "sample_rate": int(sr),
                "channels": 1 if mode == 3 else 2, "samples_per_frame": spf,
            }
        frames += 1
        pos += max(flen, 4)
    if first is None:
        raise ValueError("not an MPEG audio stream")
    first["frames"] = frames
    first["duration_s"] = frames * first["samples_per_frame"] / first["sample_rate"]
    return first


def encode_mp3(n_frames: int, sr_idx: int = 0, br_idx: int = 9,
               mono: bool = False, id3_pad: int = 0) -> bytes:
    """Valid MPEG1 Layer III CBR frame chain (headers + zeroed payloads),
    optionally behind an ID3v2 tag — exercises the tag skip, the header
    field decode, and the frame walk."""
    out = bytearray()
    if id3_pad:
        out += b"ID3\x03\x00\x00" + bytes(
            [(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F, (id3_pad >> 7) & 0x7F, id3_pad & 0x7F]
        ) + bytes(id3_pad)
    sr = _MP3_SR[3][sr_idx]
    kbps = _MP3_BITRATE_V1L3[br_idx]
    flen = 144 * kbps * 1000 // sr
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0xC0 if mono else 0x00])
    for _ in range(n_frames):
        out += hdr + bytes(flen - 4)
    return bytes(out)


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_mp4(data: bytes, start: int, end: int, out: dict) -> None:
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body, bodyend = pos + 8, pos + size
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body, bodyend = pos + 16, pos + size
        if size < 8 or bodyend > end:
            break
        if btype == b"ftyp":
            out["brand"] = data[body : body + 4].decode("latin-1")
        elif btype == b"mvhd":
            ver = data[body]
            if ver == 1:
                ts, dur = struct.unpack(">IQ", data[body + 20 : body + 32])
            else:
                ts, dur = struct.unpack(">II", data[body + 12 : body + 20])
            out["duration_s"] = dur / ts if ts else 0.0
        elif btype == b"tkhd":
            ver = data[body]
            off = body + (84 if ver == 1 else 72)  # matrix end -> width
            w_fp, h_fp = struct.unpack(">II", data[off + 4 : off + 12])
            if w_fp and h_fp:
                out["width"] = w_fp >> 16
                out["height"] = h_fp >> 16
        elif btype == b"hdlr":
            out.setdefault("handlers", []).append(data[body + 8 : body + 12].decode("latin-1"))
        elif btype == b"stsd":
            fourcc = data[body + 12 : body + 16].decode("latin-1")
            h = (out.get("handlers") or ["?"])[-1]
            out["video_codec" if h == "vide" else "audio_codec"] = fourcc
        elif btype in _MP4_CONTAINERS:
            _walk_mp4(data, body, bodyend, out)
        pos = bodyend


def mp4_meta(data: bytes) -> dict:
    """ISO BMFF box walk: ftyp brand, mvhd duration, per-track tkhd
    dimensions + hdlr/stsd codecs (v0 and v1 box versions)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (mp4) file")
    out: dict = {"format": "mp4"}
    _walk_mp4(data, 0, len(data), out)
    out.pop("handlers", None)
    return out


def encode_mp4_header(duration_ms: int, width: int = 0, height: int = 0,
                      video_codec: str = "avc1", audio_codec: str | None = None,
                      brand: str = "isom") -> bytes:
    """Minimal valid ISO-BMFF metadata tree (ftyp + moov/mvhd + one trak per
    codec with tkhd/mdia/hdlr/minf/stbl/stsd) — no mdat; the sample decode
    is the declared stub."""
    ftyp = _mp4_box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isom")
    mvhd = _mp4_box(
        b"mvhd",
        bytes(4) + struct.pack(">IIII", 0, 0, 1000, duration_ms)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100) + bytes(10)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24) + struct.pack(">I", 3),
    )

    def trak(handler: bytes, fourcc: str, w: int, h: int) -> bytes:
        tkhd = _mp4_box(
            b"tkhd",
            bytes(4) + struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", duration_ms)
            + bytes(8) + struct.pack(">HHHH", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _mp4_box(b"mdhd", bytes(4) + struct.pack(">IIII", 0, 0, 1000, duration_ms) + struct.pack(">HH", 0x55C4, 0))
        hdlr = _mp4_box(b"hdlr", bytes(4) + bytes(4) + handler + bytes(12) + b"\x00")
        entry = struct.pack(">I", 16) + fourcc.encode("latin-1") + bytes(8)
        stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        return _mp4_box(b"trak", tkhd + mdia)

    traks = b""
    if video_codec:
        traks += trak(b"vide", video_codec, width, height)
    if audio_codec:
        traks += trak(b"soun", audio_codec, 0, 0)
    return ftyp + _mp4_box(b"moov", mvhd + traks)


# ---------------------------------------------------------------------------
# Baseline JPEG (r14): REAL entropy decode, pure numpy — ITU T.81 subset:
# SOF0 (baseline sequential DCT), Huffman coding, 8-bit grayscale (one
# component); r15 generalized it to chroma-subsampled color. Progressive
# streams decode via decode_jpeg_progressive (below); arithmetic coding and
# MP3 sample decode remain declared stubs. The decoder is a full
# T.81 pipeline (marker parse -> canonical Huffman -> DC DPCM + AC
# run-length -> dequantize -> inverse zigzag -> 2-D IDCT -> level shift),
# not a replay of the encoder below: it accepts any conforming grayscale
# baseline stream. Runs per-row inside mapInPandas batches (no shuffle).
# ---------------------------------------------------------------------------

# zigzag scan order (T.81 Figure A.6): _JPEG_ZIGZAG[k] = natural index of
# the k-th zigzag position
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# standard luminance Huffman tables (T.81 Annex K.3)
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_canonical(bits, vals):
    """symbol -> (code, length) via canonical assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _idct_matrix() -> np.ndarray:
    """M[u, x] = c(u)/2 * cos((2x+1) u pi / 16); f = M.T @ F @ M."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_IDCT_M = _idct_matrix()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg_baseline(coeffs: np.ndarray, width: int, height: int,
                         qtable: np.ndarray) -> bytes:
    """Baseline grayscale JPEG from QUANTIZED coefficient blocks.

    ``coeffs``: (by, bx, 8, 8) int array in NATURAL (row, col) frequency
    order; ``qtable``: (8, 8) natural order. Standard Annex-K luminance
    Huffman tables; blocks raster order; DC DPCM across blocks.
    """
    coeffs = np.asarray(coeffs, dtype=np.int64)
    by, bx = coeffs.shape[:2]
    q_zig = np.asarray(qtable, dtype=np.int64).ravel()[_JPEG_ZIGZAG]
    dc_tab = _huff_canonical(_STD_DC_BITS, _STD_DC_VALS)
    ac_tab = _huff_canonical(_STD_AC_BITS, _STD_AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">BB", 0, 67)[1:2] + b""  # placeholder fix below
    del out[2:]
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(int(v) for v in q_zig)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes([1, 0x11, 0])
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_STD_DC_VALS))
            + bytes([0x00]) + bytes(_STD_DC_BITS) + bytes(_STD_DC_VALS))
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_STD_AC_VALS))
            + bytes([0x10]) + bytes(_STD_AC_BITS) + bytes(_STD_AC_VALS))
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])

    w = _BitWriter()
    pred = 0
    for r in range(by):
        for c in range(bx):
            zz = coeffs[r, c].ravel()[_JPEG_ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _mag_cat(diff)
            code, ln = dc_tab[s]
            w.put(code, ln)
            if s:
                w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    code, ln = ac_tab[0x00]  # EOB
                    w.put(code, ln)
                    break
                while run >= 16:
                    code, ln = ac_tab[0xF0]  # ZRL
                    w.put(code, ln)
                    run -= 16
                v = int(zz[k])
                s = _mag_cat(v)
                code, ln = ac_tab[(run << 4) | s]
                w.put(code, ln)
                w.put(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v


def _huff_decode_tables(bits, vals):
    """(mincode, maxcode, valptr) per length for fast decode (T.81 F.2.2.3)."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        if bits[ln - 1]:
            valptr[ln] = k
            mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


def _huff_read(br: _BitReader, tab) -> int:
    mincode, maxcode, valptr, vals = tab
    code = br.bits(1)
    for ln in range(1, 17):
        if maxcode[ln] >= code:
            return vals[valptr[ln] + code - mincode[ln]]
        code = (code << 1) | br.bits(1)
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) GRAYSCALE JPEG to uint8 (H, W).

    Full T.81 pipeline: marker walk (DQT 8/16-bit, DHT, DRI, RSTn),
    canonical Huffman entropy decode, DC DPCM, AC run-length/ZRL/EOB,
    dequantize, inverse zigzag, orthonormal 2-D IDCT, +128 level shift,
    round + clip. Components: 1 (grayscale, returns (H, W)) or 3
    interleaved YCbCr with per-component sampling factors 1-2 — 4:4:4,
    4:2:2 and 4:2:0 (the dominant camera/web layout) all decode; subsampled
    chroma is reconstructed by nearest-neighbor pixel doubling, then the
    JFIF/T.871 matrix maps to (H, W, 3) RGB. Progressive (SOF2) streams
    raise here — route them to decode_jpeg_progressive (or use the
    decode_jpeg sniffing wrapper); arithmetic-coded streams raise
    NotImplementedError — the declared remaining stub surface.
    """
    if not data or not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], tuple] = {}
    dims = None  # (h, w)
    comps = []
    scan_tabs = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j:j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j:j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[_JPEG_ZIGZAG] = vals
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                hufftabs[(tc, th)] = _huff_decode_tables(bits, vals)
                j += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp, tq))
            if ncomp not in (1, 3) or any(
                (s >> 4) not in (1, 2) or (s & 15) not in (1, 2)
                for _, s, _ in comps
            ):
                raise NotImplementedError(
                    "decode_jpeg_baseline: 1 or 3 components with sampling "
                    "factors 1-2 only (covers 4:4:4, 4:2:2 and 4:2:0)")
            dims = (h, w)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"decode_jpeg_baseline: SOF{marker - 0xC0} not baseline-sequential")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_tabs = {}
            for ci in range(ns):
                cid = seg[1 + 2 * ci]
                tt = seg[2 + 2 * ci]
                scan_tabs[cid] = (tt >> 4, tt & 15)
            i = i + 2 + seg_len
            break
        i = i + 2 + seg_len
    if dims is None or scan_tabs is None:
        raise ValueError("corrupt JPEG: missing SOF0/SOS")

    # entropy-coded data: unstuff FF00, honor RSTn, stop at next marker
    ecs = bytearray()
    resets = []  # byte offsets in ecs where a restart occurred
    j = i
    while j < n - 1:
        b = data[j]
        if b == 0xFF:
            m = data[j + 1]
            if m == 0x00:
                ecs.append(0xFF)
                j += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn: byte-align + reset DC predictor
                resets.append(len(ecs))
                j += 2
                continue
            break  # EOI or next segment
        ecs.append(b)
        j += 1

    h, w = dims
    ncomp = len(comps)
    samps = [((s >> 4), (s & 15)) for _, s, _ in comps]
    hmax = max(h0 for h0, _ in samps)
    vmax = max(v0 for _, v0 in samps)
    # MCU grid: hmax*8 x vmax*8 pixels per MCU; each component contributes
    # h0*v0 blocks per MCU (T.81 A.2.3). Grayscale/4:4:4 degenerate to the
    # one-block-per-component case.
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    cq = [qtables[tq] for _, _, tq in comps]
    ctabs = [(hufftabs[(0, scan_tabs[cid][0])], hufftabs[(1, scan_tabs[cid][1])])
             for cid, _, _ in comps]
    br = _BitReader(bytes(ecs))
    reset_set = set(resets)
    planes = [np.empty((mcuy * v0 * 8, mcux * h0 * 8), dtype=np.float64)
              for h0, v0 in samps]
    preds = [0] * ncomp
    nmcu = 0
    coef = np.zeros(64, dtype=np.int64)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0 and reset_set:
                # byte-align to the recorded restart boundary
                br.acc = 0
                br.nbits = 0
                preds = [0] * ncomp
            for ci in range(ncomp):
                h0, v0 = samps[ci]
                dc_tab, ac_tab = ctabs[ci]
                for vb in range(v0):
                    for hb in range(h0):
                        coef[:] = 0
                        s = _huff_read(br, dc_tab)
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, ac_tab)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overrun")
                            coef[k] = _extend(br.bits(s), s)
                            k += 1
                        nat = np.zeros(64, dtype=np.int64)
                        nat[_JPEG_ZIGZAG] = coef
                        block = nat.reshape(8, 8) * cq[ci]
                        pix = _IDCT_M.T @ block.astype(np.float64) @ _IDCT_M
                        r0 = (my * v0 + vb) * 8
                        c0 = (mx * h0 + hb) * 8
                        planes[ci][r0:r0 + 8, c0:c0 + 8] = pix + 128
            nmcu += 1
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:h, :w]
    # upsample subsampled chroma to full resolution by nearest-neighbor
    # replication (2x pixel doubling — the standard fast-path reconstruction
    # for 4:2:0; self-encoded oracles replay the same rule exactly)
    for ci, (h0, v0) in enumerate(samps):
        if h0 != hmax or v0 != vmax:
            planes[ci] = np.repeat(
                np.repeat(planes[ci], vmax // v0, axis=0), hmax // h0, axis=1)
    # JFIF YCbCr -> RGB (ITU T.871), rounded then clipped
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)[:h, :w]


def encode_jpeg_color444(coeffs: np.ndarray, width: int, height: int,
                         qy: np.ndarray, qc: np.ndarray) -> bytes:
    """Baseline 4:4:4 YCbCr JPEG from QUANTIZED coefficient blocks.

    ``coeffs``: (3, by, bx, 8, 8) int array (Y, Cb, Cr planes) in NATURAL
    frequency order; ``qy``/``qc`` (8, 8) natural-order tables (slots 0/1).
    All three components point at the standard Annex-K luminance Huffman
    tables (legal per T.81 — table choice is per-scan-component). MCUs
    interleave Y, Cb, Cr with independent DC predictors.
    """
    coeffs = np.asarray(coeffs, dtype=np.int64)
    _, by, bx = coeffs.shape[:3]
    dc_tab = _huff_canonical(_STD_DC_BITS, _STD_DC_VALS)
    ac_tab = _huff_canonical(_STD_AC_BITS, _STD_AC_VALS)

    out = bytearray(b"\xff\xd8")
    for tq, qt in ((0, qy), (1, qc)):
        q_zig = np.asarray(qt, dtype=np.int64).ravel()[_JPEG_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in q_zig)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_STD_DC_VALS))
            + bytes([0x00]) + bytes(_STD_DC_BITS) + bytes(_STD_DC_VALS))
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_STD_AC_VALS))
            + bytes([0x10]) + bytes(_STD_AC_BITS) + bytes(_STD_AC_VALS))
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    w = _BitWriter()
    preds = [0, 0, 0]
    for r in range(by):
        for c in range(bx):
            for ci in range(3):
                zz = coeffs[ci, r, c].ravel()[_JPEG_ZIGZAG]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                s = _mag_cat(diff)
                code, ln = dc_tab[s]
                w.put(code, ln)
                if s:
                    w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
                k = 1
                while k < 64:
                    run = 0
                    while k < 64 and zz[k] == 0:
                        run += 1
                        k += 1
                    if k == 64:
                        code, ln = ac_tab[0x00]
                        w.put(code, ln)
                        break
                    while run >= 16:
                        code, ln = ac_tab[0xF0]
                        w.put(code, ln)
                        run -= 16
                    v = int(zz[k])
                    s = _mag_cat(v)
                    code, ln = ac_tab[(run << 4) | s]
                    w.put(code, ln)
                    w.put(v if v > 0 else v + (1 << s) - 1, s)
                    k += 1
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color420(coeffs_y: np.ndarray, coeffs_cb: np.ndarray,
                         coeffs_cr: np.ndarray, width: int, height: int,
                         qy: np.ndarray, qc: np.ndarray) -> bytes:
    """Baseline 4:2:0 (2x2 luma sampling) YCbCr JPEG from QUANTIZED
    coefficient blocks — the dominant camera/web chroma layout.

    ``coeffs_y``: (2*my, 2*mx, 8, 8); ``coeffs_cb``/``coeffs_cr``:
    (my, mx, 8, 8) int arrays in NATURAL frequency order, where
    my = ceil(height/16), mx = ceil(width/16). Each MCU interleaves 4 Y
    blocks (left-to-right, top-to-bottom) then Cb then Cr (T.81 A.2.3),
    with independent per-component DC predictors. Standard Annex-K
    luminance Huffman tables for all components.
    """
    coeffs_y = np.asarray(coeffs_y, dtype=np.int64)
    coeffs_cb = np.asarray(coeffs_cb, dtype=np.int64)
    coeffs_cr = np.asarray(coeffs_cr, dtype=np.int64)
    my, mx = coeffs_cb.shape[:2]
    assert coeffs_y.shape[:2] == (2 * my, 2 * mx), "Y grid must be 2x chroma"
    dc_tab = _huff_canonical(_STD_DC_BITS, _STD_DC_VALS)
    ac_tab = _huff_canonical(_STD_AC_BITS, _STD_AC_VALS)

    out = bytearray(b"\xff\xd8")
    for tq, qt in ((0, qy), (1, qc)):
        q_zig = np.asarray(qt, dtype=np.int64).ravel()[_JPEG_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in q_zig)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid, samp, tq in ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += bytes([cid, samp, tq])
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_STD_DC_VALS))
            + bytes([0x00]) + bytes(_STD_DC_BITS) + bytes(_STD_DC_VALS))
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_STD_AC_VALS))
            + bytes([0x10]) + bytes(_STD_AC_BITS) + bytes(_STD_AC_VALS))
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    w = _BitWriter()
    preds = [0, 0, 0]

    def put_block(zz, ci):
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        s = _mag_cat(diff)
        code, ln = dc_tab[s]
        w.put(code, ln)
        if s:
            w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                code, ln = ac_tab[0x00]  # EOB
                w.put(code, ln)
                break
            while run >= 16:
                code, ln = ac_tab[0xF0]  # ZRL
                w.put(code, ln)
                run -= 16
            v = int(zz[k])
            s = _mag_cat(v)
            code, ln = ac_tab[(run << 4) | s]
            w.put(code, ln)
            w.put(v if v > 0 else v + (1 << s) - 1, s)
            k += 1

    for r in range(my):
        for c in range(mx):
            for vb in range(2):
                for hb in range(2):
                    put_block(coeffs_y[2 * r + vb, 2 * c + hb].ravel()[_JPEG_ZIGZAG], 0)
            put_block(coeffs_cb[r, c].ravel()[_JPEG_ZIGZAG], 1)
            put_block(coeffs_cr[r, c].ravel()[_JPEG_ZIGZAG], 2)
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive JPEG (r15): REAL entropy decode of SOF2 streams — ITU T.81
# Annex G subset: spectral selection, successive approximation (DC and AC
# first + refinement scans), EOB runs, interleaved DC scans, per-component
# AC scans over sampling-factor sub-grids, restart markers. The matching
# encoder below emits a 4-scan grayscale stream (DC first Al=1, DC refine,
# AC first Al=1 with aggregated EOB runs, AC refine with libjpeg-style
# buffered correction bits) so a self-encoded stream exercises every decode
# path and the final coefficients are bit-identical to the baseline
# encoding of the same blocks — the property the exact oracle replays.
# MP3 sample decode remains the one declared media stub (the polyphase
# synthesis window is a 512-entry tabulated constant, not derivable).
# ---------------------------------------------------------------------------


def decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) Huffman JPEG to uint8 (H, W) or (H, W, 3).

    Accumulates DCT coefficients across every scan per T.81 Annex G:
    DC first scans store diff << Al (interleaved MCU walk when the scan
    lists >1 component); DC refinement reads one raw bit per block into
    bit Al; AC first scans run-length decode into coef << Al with EOBRUN
    skips; AC refinement applies the correction-bit algorithm (G.1.2.3:
    Huffman (r,1) inserts a new ±1<<Al after r zero-HISTORY positions,
    reading one correction bit for each already-nonzero coefficient passed
    over; EOB runs refine whole blocks). After the last scan: dequantize,
    inverse zigzag, IDCT, +128 level shift — identical back end to the
    baseline decoder, including nearest-neighbor chroma upsampling and the
    T.871 RGB matrix for 3-component streams."""
    if not data or not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], tuple] = {}
    dims = None
    comps = []
    restart_interval = 0
    coefs = None  # per component: (blocks_y, blocks_x, 64) int32, zigzag order
    samps = []
    hmax = vmax = 1
    mcux = mcuy = 0
    cdims = []  # per component: (blocks wide, blocks high) NON-interleaved dims
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + seg_len]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j:j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j:j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                qtables[tq] = vals.copy()  # zigzag order
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                hufftabs[(tc, th)] = _huff_decode_tables(bits, vals)
                j += 17 + nv
        elif marker == 0xC2:  # SOF2 progressive, Huffman
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp, tq))
            if ncomp not in (1, 3) or any(
                (s >> 4) not in (1, 2) or (s & 15) not in (1, 2)
                for _, s, _ in comps
            ):
                raise NotImplementedError(
                    "decode_jpeg_progressive: 1 or 3 components with "
                    "sampling factors 1-2 only")
            dims = (h, w)
            samps = [((s >> 4), (s & 15)) for _, s, _ in comps]
            hmax = max(h0 for h0, _ in samps)
            vmax = max(v0 for _, v0 in samps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = [np.zeros((mcuy * v0, mcux * h0, 64), dtype=np.int32)
                     for h0, v0 in samps]
            cdims = [((-(-(w * h0) // hmax) + 7) // 8, (-(-(h * v0) // vmax) + 7) // 8)
                     for h0, v0 in samps]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"decode_jpeg_progressive: SOF{marker - 0xC0} is not "
                "progressive-Huffman; use decode_jpeg_baseline for SOF0")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # one of possibly many scans
            if coefs is None:
                raise ValueError("corrupt JPEG: SOS before SOF2")
            ns = seg[0]
            scomps = []  # (component index, dc table id, ac table id)
            for ci in range(ns):
                cid = seg[1 + 2 * ci]
                tt = seg[2 + 2 * ci]
                idx = next(k for k, (c, _, _) in enumerate(comps) if c == cid)
                scomps.append((idx, tt >> 4, tt & 15))
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            # entropy-coded bytes for THIS scan (unstuff FF00; RSTn resets)
            ecs = bytearray()
            resets = []
            j = i + 2 + seg_len
            while j < n - 1:
                b = data[j]
                if b == 0xFF:
                    m = data[j + 1]
                    if m == 0x00:
                        ecs.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= m <= 0xD7:
                        resets.append(len(ecs))
                        j += 2
                        continue
                    break
                ecs.append(b)
                j += 1
            _decode_prog_scan(bytes(ecs), coefs, comps, samps, cdims,
                              mcux, mcuy, hmax, vmax, hufftabs, scomps,
                              ss, se, ah, al, restart_interval)
            i = j
            continue
        i = i + 2 + seg_len
    if dims is None or coefs is None:
        raise ValueError("corrupt JPEG: missing SOF2/SOS")

    h, w = dims
    ncomp = len(comps)
    planes = []
    for ci in range(ncomp):
        h0, v0 = samps[ci]
        q_zig = qtables[comps[ci][2]]
        by, bx = coefs[ci].shape[:2]
        dq = coefs[ci].astype(np.int64) * q_zig[None, None, :]
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[:, :, _JPEG_ZIGZAG] = dq
        blocks = nat.reshape(by, bx, 8, 8)
        # batched orthonormal IDCT over every block at once
        pix = np.einsum("ux,rcuv,vy->rcxy", _IDCT_M, blocks, _IDCT_M)
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        planes.append(plane)
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:h, :w]
    for ci, (h0, v0) in enumerate(samps):
        if h0 != hmax or v0 != vmax:
            planes[ci] = np.repeat(
                np.repeat(planes[ci], vmax // v0, axis=0), hmax // h0, axis=1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)[:h, :w]


def _decode_prog_scan(ecs, coefs, comps, samps, cdims, mcux, mcuy,
                      hmax, vmax, hufftabs, scomps, ss, se, ah, al,
                      restart_interval):
    """Decode ONE progressive scan into the per-component zigzag-order
    coefficient accumulators (T.81 G.2)."""
    br = _BitReader(ecs)
    eobrun = 0
    preds = {idx: 0 for idx, _, _ in scomps}

    def dc_first_block(idx, td, r, c):
        s = _huff_read(br, hufftabs[(0, td)])
        diff = _extend(br.bits(s), s) if s else 0
        preds[idx] += diff
        coefs[idx][r, c, 0] = preds[idx] << al

    def dc_refine_block(idx, r, c):
        if br.bits(1):
            coefs[idx][r, c, 0] |= (1 << al)

    def ac_first_block(blk, ta):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_read(br, hufftabs[(1, ta)])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    break
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC index overrun")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1

    def ac_refine_block(blk, ta):
        nonlocal eobrun
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_read(br, hufftabs[(1, ta)])
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += br.bits(r)
                        break
                    # r == 15: run of 16 zero-history positions, no new coef
                    newval = 0
                else:
                    if s != 1:
                        raise ValueError("corrupt JPEG: refinement s != 1")
                    newval = p1 if br.bits(1) else m1
                # advance over r zero-history coefficients, refining any
                # nonzero-history coefficients passed over
                while k <= se:
                    if blk[k] != 0:
                        if br.bits(1) and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            # EOB covers this block: refine every remaining nonzero coef
            while k <= se:
                if blk[k] != 0:
                    if br.bits(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            eobrun -= 1

    def at_restart(nunit):
        nonlocal eobrun
        if restart_interval and nunit and nunit % restart_interval == 0:
            br.acc = 0
            br.nbits = 0
            eobrun = 0
            for key in preds:
                preds[key] = 0

    if ss == 0:  # DC scan (interleaved when >1 component in scan)
        if len(scomps) > 1 or (len(comps) > 1 and len(scomps) == len(comps)):
            nmcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    at_restart(nmcu)
                    for idx, td, _ in scomps:
                        h0, v0 = samps[idx]
                        for vb in range(v0):
                            for hb in range(h0):
                                r0 = my * v0 + vb
                                c0 = mx * h0 + hb
                                if ah == 0:
                                    dc_first_block(idx, td, r0, c0)
                                else:
                                    dc_refine_block(idx, r0, c0)
                    nmcu += 1
        else:
            idx, td, _ = scomps[0]
            bw, bh = cdims[idx]
            nblk = 0
            for r0 in range(bh):
                for c0 in range(bw):
                    at_restart(nblk)
                    if ah == 0:
                        dc_first_block(idx, td, r0, c0)
                    else:
                        dc_refine_block(idx, r0, c0)
                    nblk += 1
    else:  # AC scan: always exactly one component, non-interleaved
        if len(scomps) != 1:
            raise ValueError("corrupt JPEG: interleaved AC scan")
        idx, _, ta = scomps[0]
        bw, bh = cdims[idx]
        nblk = 0
        for r0 in range(bh):
            for c0 in range(bw):
                at_restart(nblk)
                blk = coefs[idx][r0, c0]
                if ah == 0:
                    ac_first_block(blk, ta)
                else:
                    ac_refine_block(blk, ta)
                nblk += 1


class _ProgBitWriter(_BitWriter):
    """Bit writer with libjpeg-style buffered correction bits: during an
    AC-refinement zero-history run the correction bits of nonzero-history
    coefficients must be emitted AFTER the next Huffman code + sign bit
    (the decoder reads code, sign, then the run's correction bits)."""

    def __init__(self):
        super().__init__()
        self.pending: list[int] = []

    def defer(self, bit: int) -> None:
        self.pending.append(bit & 1)

    def flush_pending(self) -> None:
        for b in self.pending:
            self.put(b, 1)
        self.pending = []


def encode_jpeg_progressive(coeffs: np.ndarray, width: int, height: int,
                            qtable: np.ndarray) -> bytes:
    """Progressive (SOF2) grayscale JPEG from QUANTIZED coefficient blocks —
    four scans exercising every Annex-G decode path:

      1. DC first        Ss=0 Se=0  Ah=0 Al=1   (diffs of dc >> 1)
      2. DC refinement   Ss=0 Se=0  Ah=1 Al=0   (raw bit dc & 1 per block)
      3. AC first        Ss=1 Se=63 Ah=0 Al=1   (values trunc-toward-zero /2,
                                                 EOB runs aggregated)
      4. AC refinement   Ss=1 Se=63 Ah=1 Al=0   (new ±1s + correction bits)

    ``coeffs``: (by, bx, 8, 8) int array in NATURAL frequency order;
    ``qtable``: (8, 8) natural order. After all four scans the accumulated
    coefficients equal the originals exactly, so the decode is identical to
    the baseline encoding of the same blocks. Standard Annex-K tables."""
    coeffs = np.asarray(coeffs, dtype=np.int64)
    by, bx = coeffs.shape[:2]
    q_zig = np.asarray(qtable, dtype=np.int64).ravel()[_JPEG_ZIGZAG]
    dc_tab = _huff_canonical(_STD_DC_BITS, _STD_DC_VALS)
    # The Annex-K AC table has no EOBn symbols (r<<4, r=1..14) — those exist
    # only in progressive streams' custom tables. Emit a flat custom table:
    # every AC symbol at code length 8 (176 symbols < 255, so the reserved
    # all-ones code stays unused). Suboptimal compression, fully legal.
    prog_ac_vals = sorted({(r << 4) | s for r in range(16) for s in range(1, 11)}
                          | {r << 4 for r in range(15)} | {0xF0})
    prog_ac_bits = [0] * 7 + [len(prog_ac_vals)] + [0] * 8
    ac_tab = _huff_canonical(prog_ac_bits, prog_ac_vals)
    zz = np.stack([coeffs[r, c].ravel()[_JPEG_ZIGZAG]
                   for r in range(by) for c in range(bx)])  # (nblk, 64)
    nblk = by * bx

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(int(v) for v in q_zig)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes([1, 0x11, 0])
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_STD_DC_VALS))
            + bytes([0x00]) + bytes(_STD_DC_BITS) + bytes(_STD_DC_VALS))
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(prog_ac_vals))
            + bytes([0x10]) + bytes(prog_ac_bits) + bytes(prog_ac_vals))

    def sos(ss, se, ah, al):
        return b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, ss, se, (ah << 4) | al])

    # ---- scan 1: DC first, Al=1 (arithmetic shift keeps DPCM exact) ----
    out += sos(0, 0, 0, 1)
    w = _BitWriter()
    pred = 0
    for b in range(nblk):
        v = int(zz[b, 0]) >> 1
        diff = v - pred
        pred = v
        s = _mag_cat(diff)
        code, ln = dc_tab[s]
        w.put(code, ln)
        if s:
            w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += w.flush()

    # ---- scan 2: DC refinement, one raw bit per block ----
    out += sos(0, 0, 1, 0)
    w = _BitWriter()
    for b in range(nblk):
        w.put(int(zz[b, 0]) & 1, 1)
    out += w.flush()

    # ---- scan 3: AC first, Al=1, EOB runs aggregated across blocks ----
    out += sos(1, 63, 0, 1)
    w = _BitWriter()
    eobrun = 0

    def flush_eobrun():
        nonlocal eobrun
        while eobrun > 0:
            run = min(eobrun, 0x7FFF)
            r = run.bit_length() - 1
            code, ln = ac_tab[r << 4]
            w.put(code, ln)
            if r:
                w.put(run - (1 << r), r)
            eobrun -= run

    for b in range(nblk):
        hi = [int(v) // 2 if v >= 0 else -((-int(v)) // 2) for v in zz[b, 1:]]
        last = max((k for k, v in enumerate(hi) if v), default=-1)
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        run = 0
        for k in range(last + 1):
            v = hi[k]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_tab[0xF0]
                w.put(code, ln)
                run -= 16
            s = _mag_cat(v)
            code, ln = ac_tab[(run << 4) | s]
            w.put(code, ln)
            w.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 62:
            eobrun += 1
    flush_eobrun()
    out += w.flush()

    # ---- scan 4: AC refinement, Al=0 ----
    out += sos(1, 63, 1, 0)
    w = _ProgBitWriter()
    eobrun = 0
    eob_pending: list[int] = []  # correction bits covered by the open EOB run

    def flush_eobrun_refine():
        nonlocal eobrun, eob_pending
        while eobrun > 0:
            run = min(eobrun, 0x7FFF)
            r = run.bit_length() - 1
            code, ln = ac_tab[r << 4]
            w.put(code, ln)
            if r:
                w.put(run - (1 << r), r)
            eobrun -= run
        for bit in eob_pending:
            w.put(bit, 1)
        eob_pending = []

    for b in range(nblk):
        hist = [int(v) // 2 if v >= 0 else -((-int(v)) // 2) for v in zz[b, 1:]]
        newk = [k for k, v in enumerate(zz[b, 1:]) if hist[k] == 0 and v != 0]
        last_new = newk[-1] if newk else -1
        if last_new < 0:
            # whole block is EOB territory: its history correction bits ride
            # after the (aggregated) EOB code, in block order
            eobrun += 1
            for k, hv in enumerate(hist):
                if hv != 0:
                    eob_pending.append(int(zz[b, 1 + k]) & 1)
            if eobrun == 0x7FFF:
                flush_eobrun_refine()
            continue
        flush_eobrun_refine()
        run = 0  # still-zero positions since the last emitted symbol
        for k in range(last_new + 1):
            v = int(zz[b, 1 + k])
            if v == 0:
                run += 1
                continue
            # ZRLs must be emitted on reaching ANY nonzero while run > 15 —
            # including history coefficients — flushing the deferred
            # correction bits at that point, or the decoder (which stops
            # its run walk after 16 zeros) would read them early
            while run > 15:
                code, ln = ac_tab[0xF0]
                w.put(code, ln)
                run -= 16
                w.flush_pending()
            if hist[k] != 0:
                # nonzero history: correction bit, deferred past next code
                w.defer(v & 1)
                continue
            # newly nonzero (|v| == 1): emit (run, 1) + sign, then deferred
            code, ln = ac_tab[(run << 4) | 1]
            w.put(code, ln)
            w.put(1 if v > 0 else 0, 1)
            w.flush_pending()
            run = 0
        # remainder of the block (past the last new coefficient) opens an
        # EOB run; its history correction bits ride behind the aggregated
        # EOB code alongside any later all-EOB blocks'
        if last_new < 62:
            eobrun = 1
            eob_pending = [int(zz[b, 1 + k]) & 1
                           for k in range(last_new + 1, 63) if hist[k] != 0]
    flush_eobrun_refine()
    out += w.flush()

    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Sniff-and-dispatch JPEG decode: SOF0 baseline-sequential streams go
    to decode_jpeg_baseline, SOF2 progressive-Huffman streams to
    decode_jpeg_progressive. Returns (H, W) grayscale or (H, W, 3) RGB."""
    meta = jpeg_meta(data)
    if meta.get("progressive"):
        return decode_jpeg_progressive(data)
    return decode_jpeg_baseline(data)


# ---------------------------------------------------------------------------
# AVI / MJPEG video (r15): REAL video sample decode. Motion-JPEG is the
# one video codec the repo can decode faithfully from scratch — every frame
# is an independent T.81 JPEG, so the per-frame decode reuses the full
# baseline/progressive pipeline above, and the AVI (RIFF) container is a
# plain chunk walk. encode_avi_mjpeg + avi_meta + decode_avi_frames close
# the container/codec loop the same way encode_png/decode_png do for
# images. Inter-frame codecs (H.264 etc.) remain out of scope: their
# entropy decode is not reproducible offline.
# ---------------------------------------------------------------------------

AVI_MAGIC = b"RIFF"


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(list_type: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """AVI (RIFF) container around MJPEG frames — each ``frames[i]`` is a
    complete JPEG stream, stored as a '00dc' chunk in the 'movi' list with
    a standard idx1 keyframe index. Layout per the public AVI RIFF spec:
    hdrl(avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER))."""
    nf = len(frames)
    usec = 1_000_000 // max(fps, 1)
    maxsz = max((len(f) for f in frames), default=0)
    avih = struct.pack("<14I", usec, maxsz * fps, 0, 0x10, nf, 0, 1, maxsz,
                       width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
            1, fps, 0, nf, maxsz, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih)
                      + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                                   + _riff_chunk(b"strf", strf)))
    movi_payload = b""
    idx = b""
    for f in frames:
        # idx1 offsets point at the ckid, relative to the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_payload), len(f))
        movi_payload += _riff_chunk(b"00dc", f)
    movi = _riff_list(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_walk(data: bytes):
    """Yield (path, fourcc, payload_offset, size) for every chunk in an AVI
    RIFF tree, depth-first."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) stream")

    def walk(start: int, end: int, path: tuple):
        pos = start
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body = pos + 8
            if fourcc == b"LIST":
                ltype = data[body:body + 4]
                yield (path, b"LIST:" + ltype, body + 4, size - 4)
                yield from walk(body + 4, body + size, path + (ltype,))
            else:
                yield (path, fourcc, body, size)
            pos = body + size + (size % 2)

    yield from walk(12, len(data), ())


def avi_meta(data: bytes) -> dict:
    """Parse AVI container metadata: dimensions, fps, frame count, codec."""
    out = {"format": "avi", "kind": "video"}
    for path, fourcc, off, size in _avi_walk(data):
        if fourcc == b"avih":
            vals = struct.unpack("<14I", data[off:off + 56])
            usec, nf, w, h = vals[0], vals[4], vals[8], vals[9]
            out.update(width=int(w), height=int(h), n_frames=int(nf),
                       fps=(1_000_000 // usec if usec else 0),
                       duration_ms=int(nf * usec // 1000))
        elif fourcc == b"strh" and data[off:off + 4] == b"vids":
            out["codec"] = data[off + 4:off + 8].decode("ascii", "replace").strip()
    return out


def decode_avi_frames(data: bytes, every_n: int = 1,
                      max_frames: int | None = None):
    """REAL video frame sampling: walk the 'movi' list, take every
    ``every_n``-th '00dc' video chunk, decode each as an independent JPEG
    (baseline or progressive — MJPEG frames are plain T.81 streams).
    Yields (frame_index, ndarray). Non-MJPEG codecs raise."""
    meta = avi_meta(data)
    codec = meta.get("codec", "")
    if codec not in ("MJPG", "mjpg"):
        raise NotImplementedError(
            f"decode_avi_frames: codec {codec!r} not MJPEG — inter-frame "
            "video codecs are the declared stub surface")
    fi = 0
    taken = 0
    for path, fourcc, off, size in _avi_walk(data):
        if fourcc == b"00dc" and path and path[-1] == b"movi":
            if fi % every_n == 0:
                yield fi, decode_jpeg(data[off:off + size])
                taken += 1
                if max_frames is not None and taken >= max_frames:
                    return
            fi += 1
