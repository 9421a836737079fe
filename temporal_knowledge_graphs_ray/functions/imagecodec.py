"""Pure-numpy image codecs: 24-bit uncompressed BMP and binary PPM (P6).

The container has no PIL/cv2/ffmpeg, but these two formats are fully
decodable with numpy alone, which turns the multimodal decode/resize
stages (stages/multimodal.py) into REAL kernels for real byte payloads —
not stand-ins — while compressed formats stay behind the honest
NotImplementedError gate.

Formats:
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  24 bpp, BI_RGB (no compression), rows 4-byte padded, bottom-up by
  default (negative height = top-down). Pixels stored BGR; decoded to
  RGB HxWx3 uint8.
- PPM: ``P6\\n<w> <h>\\n255\\n`` + raw RGB rows (maxval 255 only).

Both decoders reject anything outside that envelope with ValueError —
a truncated or exotic payload must fail loudly, not decode garbage.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"
PPM_MAGIC = b"P6"


def sniff_format(payload: bytes) -> str | None:
    """'bmp' | 'ppm' | None (undecodable here)."""
    if payload[:2] == BMP_MAGIC:
        return "bmp"
    if payload[:2] == PPM_MAGIC:
        return "ppm"
    return None


# ---------------------------------------------------------------- BMP ----

def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects HxWx3 uint8")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", BMP_MAGIC, offset + data_size, 0, 0,
                         offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    # bottom-up rows, BGR order, 4-byte padded
    bgr = img[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = np.ascontiguousarray(bgr).tobytes()
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> HxWx3 uint8 RGB."""
    if len(payload) < 54 or payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB decodes here")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    stride = (w * 3 + 3) & ~3
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ---------------------------------------------------------------- PPM ----

def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> binary PPM (P6, maxval 255)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects HxWx3 uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> HxWx3 uint8 RGB. Header tokens may
    be separated by any whitespace and ``#`` comments (the spec)."""
    if payload[:2] != PPM_MAGIC:
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval; a single
    # whitespace byte follows maxval, then raw pixel data
    pos = 2
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3:
        # skip whitespace and comments
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos:pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < n and payload[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    if pos >= n or not payload[pos:pos + 1].isspace():
        raise ValueError("malformed PPM header terminator")
    pos += 1
    w, h, maxval = vals
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (w={w}, h={h}, maxval={maxval})")
    need = pos + w * h * 3
    if n < need:
        raise ValueError(f"truncated PPM: {n} < {need} bytes")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3).copy()


# ------------------------------------------------------------- common ----

_DECODERS = {"bmp": decode_bmp, "ppm": decode_ppm}
_ENCODERS = {"bmp": encode_bmp, "ppm": encode_ppm}


def decode_image(payload: bytes) -> tuple[np.ndarray, str]:
    """Sniff + decode; returns (HxWx3 uint8 RGB, format)."""
    fmt = sniff_format(payload)
    if fmt is None:
        raise ValueError("undecodable payload (not BMP/PPM)")
    return _DECODERS[fmt](payload), fmt


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps (the classic sample-grid
    kernel: source index = floor((i + 0.5) * src/dst))."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(new_h) + 0.5) * (h / new_h)).astype(np.int64),
                    h - 1)
    xs = np.minimum(((np.arange(new_w) + 0.5) * (w / new_w)).astype(np.int64),
                    w - 1)
    return img[ys][:, xs]
