"""Pure-Python image codec: binary PPM (P6) and uncompressed 24-bit BMP.

This container ships no image library (no PIL, no ffmpeg), which left
the real decode/resize paths of ``operators/multimodal.py`` permanently
skipped. These two formats are simple enough to decode with numpy alone
— no dependency, fully deterministic — so the *real* pixel path
(decode → feature/resize → re-encode) can execute in-container. PIL,
when importable, remains the fast path and handles compressed formats
(PNG/JPEG); this module is the fallback for the uncompressed ones.

Formats covered:
- PPM "P6" (Netpbm binary RGB, maxval ≤ 255): the classic interchange
  format — also what the fallback re-encoder emits.
- BMP: BITMAPINFOHEADER (40-byte), 24 bpp, BI_RGB (uncompressed),
  bottom-up or top-down (negative height), with 4-byte row padding.

Everything raises ``ValueError`` on malformed input rather than
mis-decoding silently.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_format(payload: bytes) -> str | None:
    """Return 'ppm' | 'bmp' | None from magic bytes."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def _ppm_read_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token, skipping '#' comments."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < n and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → HxWx3 uint8 array."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos = 2
    w_tok, pos = _ppm_read_token(payload, pos)
    h_tok, pos = _ppm_read_token(payload, pos)
    max_tok, pos = _ppm_read_token(payload, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(max_tok)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only ≤255)")
    pos += 1  # exactly one whitespace byte after maxval per spec
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    if maxval != 255:  # rescale to full range
        arr = (arr.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    return arr


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 array → P6 bytes (the fallback re-encode format)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 array, got shape {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → HxWx3 uint8 (RGB, top-down row order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = row_stride * h
    raster = payload[data_offset : data_offset + need]
    if len(raster) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[..., ::-1])  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 array, got shape {a.shape}")
    h, w = a.shape[:2]
    row_stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_stride), dtype=np.uint8)
    padded[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    raster = padded.tobytes()
    file_size = 54 + len(raster)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", file_size, 0, 0, 54,
        40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0,
    )
    return header + raster


def decode_any(payload: bytes) -> np.ndarray:
    """Sniff + decode the pure-Python formats; ValueError otherwise."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise ValueError(
        "unrecognized image format for the pure-Python decoder "
        "(supported without PIL: binary PPM 'P6', 24-bit BI_RGB BMP)"
    )


def resize_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downscale so that
    max(H, W) ≤ max_side; upscaling never happens (matches
    PIL.Image.thumbnail semantics)."""
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(h, w, 1))
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    if (nh, nw) == (h, w):
        return arr
    # sample source pixel centers — the textbook nearest grid
    ys = np.minimum(((np.arange(nh) + 0.5) * h / nh).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(nw) + 0.5) * w / nw).astype(np.int64), w - 1)
    return arr[ys][:, xs]
