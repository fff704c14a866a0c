"""Pure-numpy/stdlib media codecs — REAL kernels for the multimodal family.

The container has no imaging/audio libraries, but several real formats need
none: PPM/PGM (netpbm), 24-bit BMP, PCM WAV (stdlib ``wave``), and a raw
frame container (RVID) for video-style demuxing. Everything here is genuine
format parsing and genuine signal math (numpy bilinear interpolation, FFT
spectrograms) — no fakes. Formats that do need external codecs (JPEG/PNG)
remain stubbed in ``multimodal.py`` and are documented as such.

Reference parity note: the reference engine treats payloads as opaque bytes
end-to-end (machida decodes via user ``@decoder``); this module is the
100 TB-training-pipeline extension, not a port.

Every function is a plain (bytes|ndarray) -> (ndarray|bytes) kernel with no
Spark imports, so Spark operators can close over them; the module registers
itself for cloudpickle by-value serialization because executors do not have
``wallaroo_spark`` on their path (the engine ships no code to workers).
"""

from __future__ import annotations

import io
import struct
import sys as _sys
import wave

import numpy as np

try:  # pragma: no cover - vendored cloudpickle always present in pyspark>=3.3
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


# ---------------------------------------------------------------------------
# Format sniffing
# ---------------------------------------------------------------------------

def sniff_format(raw: bytes) -> str | None:
    """Identify a payload by magic bytes. Returns one of
    'ppm' | 'pgm' | 'bmp' | 'wav' | 'rvid' | 'png' | 'jpg' | None."""
    if raw[:2] == b"P6":
        return "ppm"
    if raw[:2] == b"P5":
        return "pgm"
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:4] == b"RVID":
        return "rvid"
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if raw[:3] == b"\xff\xd8\xff":
        return "jpg"
    return None


# ---------------------------------------------------------------------------
# Netpbm (PPM P6 = RGB, PGM P5 = gray), binary variants, maxval <= 255
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, 1) uint8 -> P5; (h, w, 3) uint8 -> P6."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim == 2:
        h, w = a.shape
        return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()
    if a.ndim == 3 and a.shape[2] == 3:
        h, w, _ = a.shape
        return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()
    raise ValueError(f"unsupported image shape {a.shape}")


def _pnm_header(raw: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse 'P6 w h maxval' allowing arbitrary whitespace and '#' comments
    (the real netpbm grammar). Returns (magic, w, h, maxval, data_offset)."""
    magic = raw[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(raw) and raw[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed netpbm header")
        vals.append(int(raw[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval, per spec
    w, h, maxval = vals
    return magic, w, h, maxval, pos


def decode_ppm(raw: bytes) -> np.ndarray:
    """P6 -> (h, w, 3) uint8; P5 -> (h, w, 1) uint8."""
    magic, w, h, maxval, off = _pnm_header(raw)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    c = 3 if magic == b"P6" else 1
    need = w * h * c
    data = np.frombuffer(raw, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, c)


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed (BI_RGB), BITMAPINFOHEADER, bottom-up rows
# padded to 4-byte boundaries. The only BMP variant worth supporting without
# a codec library; covers what cv2.imwrite/PIL produce for 24-bit.
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim == 3 and a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"unsupported image shape {a.shape}")
    h, w, _ = a.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    # pixel array: bottom-up, BGR byte order
    bgr = a[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = bgr.reshape(h, row_raw)
    pixels = rows.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(pixels)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def decode_bmp(raw: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 (top-down RGB)."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    header_size = struct.unpack_from("<I", raw, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * stride, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(raw: bytes) -> np.ndarray:
    """Dispatch by magic. Returns (h, w, c) uint8 with c in {1, 3}."""
    fmt = sniff_format(raw)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(raw)
    if fmt == "bmp":
        return decode_bmp(raw)
    raise ValueError(f"no codec for format {fmt!r} in this container")


# ---------------------------------------------------------------------------
# WAV — PCM16 via stdlib wave; samples as (n, channels) int16
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(a.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(a.tobytes())
    return buf.getvalue()


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, channels) int16, sample_rate)."""
    with wave.open(io.BytesIO(raw), "rb") as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        n = wf.getnframes()
        data = wf.readframes(n)
    if width != 2:
        raise ValueError(f"only PCM16 supported (width={width})")
    a = np.frombuffer(data, dtype=np.int16).reshape(-1, nch)
    return a, rate


# ---------------------------------------------------------------------------
# RVID — minimal raw-frame video container for demux-style kernels:
#   b'RVID' | u16 w | u16 h | u16 c | u16 reserved | u32 n_frames | frames
# Each frame is w*h*c raw bytes, frame-major. Stands in for a real demuxer
# (same iteration contract as e.g. PyAV's packet->frame loop).
# ---------------------------------------------------------------------------

def encode_rvid(frames: np.ndarray) -> bytes:
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        a = a[:, :, :, None]
    n, h, w, c = a.shape
    return struct.pack("<4sHHHHI", b"RVID", w, h, c, 0, n) + a.tobytes()


def rvid_info(raw: bytes) -> tuple[int, int, int, int]:
    """-> (w, h, c, n_frames) without touching frame bytes."""
    magic, w, h, c, _res, n = struct.unpack_from("<4sHHHHI", raw, 0)
    if magic != b"RVID":
        raise ValueError("not an RVID payload")
    return w, h, c, n


def iter_rvid_frames(raw: bytes, every: int = 1):
    """Yield (frame_idx, (h, w, c) uint8) for every ``every``-th frame.

    Slices the buffer lazily — sampling frame k reads only frame k's bytes,
    the demuxer contract that keeps frame-sampling cheap on long videos."""
    w, h, c, n = rvid_info(raw)
    frame_bytes = w * h * c
    off0 = 16
    for i in range(0, n, max(1, every)):
        off = off0 + i * frame_bytes
        frame = np.frombuffer(raw, dtype=np.uint8, count=frame_bytes, offset=off)
        yield i, frame.reshape(h, w, c)


# ---------------------------------------------------------------------------
# Signal kernels: bilinear resize, block-mean aHash, FFT spectrogram
# ---------------------------------------------------------------------------

def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear interpolation with half-pixel centers (the
    OpenCV/TF 'align_corners=False' convention). (h, w, c) uint8 -> same."""
    a = np.asarray(img)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w, c = a.shape
    if (out_h, out_w) == (h, w):
        return a[:, :, 0].copy() if squeeze else a.copy()
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    af = a.astype(np.float64)
    top = af[y0][:, x0] * (1 - wx) + af[y0][:, x1] * wx
    bot = af[y1][:, x0] * (1 - wx) + af[y1][:, x1] * wx
    out = top * (1 - wy[:, :, :]) + bot * wy[:, :, :]
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def luma(img: np.ndarray) -> np.ndarray:
    """(h, w, c) -> (h, w) integer-scaled BT.601 luma (exact int math:
    77R + 150G + 29B >> 8), so downstream comparisons are engine-exact."""
    a = np.asarray(img, dtype=np.int64)
    if a.ndim == 3 and a.shape[2] == 3:
        return (77 * a[:, :, 0] + 150 * a[:, :, 1] + 29 * a[:, :, 2]) >> 8
    return a[:, :, 0] if a.ndim == 3 else a


def ahash64(img: np.ndarray) -> int:
    """Real 64-bit average hash: luma -> 8x8 block sums -> bit i set iff
    block i's mean exceeds the global mean. All comparisons are
    cross-multiplied integers (block_sum * total_n > total_sum * block_n):
    exact on any engine, no float means."""
    ly = luma(img)
    h, w = ly.shape
    # integer block partition: block (r, q) covers rows [r*h//8, (r+1)*h//8)
    total_sum = int(ly.sum())
    total_n = h * w
    out = 0
    row_edges = [(r * h) // 8 for r in range(9)]
    col_edges = [(q * w) // 8 for q in range(9)]
    for r in range(8):
        r0, r1 = row_edges[r], row_edges[r + 1]
        for q in range(8):
            c0, c1 = col_edges[q], col_edges[q + 1]
            if r1 == r0 or c1 == c0:
                continue
            blk = ly[r0:r1, c0:c1]
            if int(blk.sum()) * total_n > total_sum * blk.size:
                out |= 1 << (r * 8 + q)
    return out


def spectrogram(samples: np.ndarray, frame: int = 256, hop: int | None = None) -> np.ndarray:
    """Mono float samples -> (n_frames, frame//2+1) power spectrogram via
    rFFT over rectangular frames (hop defaults to frame: non-overlapping, so
    Parseval holds exactly per frame — the property the tests pin)."""
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    hop = hop or frame
    n_frames = max(0, 1 + (len(x) - frame) // hop) if len(x) >= frame else 0
    if n_frames == 0:
        return np.zeros((0, frame // 2 + 1))
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.fft.rfft(x[idx], axis=1)
    return (spec.real**2 + spec.imag**2) / frame


def band_energies(samples: np.ndarray, n_bands: int = 8, frame: int = 256) -> np.ndarray:
    """Mono float samples -> length-``n_bands`` log-energy vector: the
    spectrogram's frequency axis split into equal bands, summed over time.
    The classic cheap audio fingerprint input."""
    sp = spectrogram(samples, frame=frame)
    if sp.shape[0] == 0:
        return np.zeros(n_bands)
    n_bins = sp.shape[1]
    edges = [(b * n_bins) // n_bands for b in range(n_bands + 1)]
    out = np.array(
        [sp[:, edges[b] : edges[b + 1]].sum() for b in range(n_bands)], dtype=np.float64
    )
    return np.log1p(out)
