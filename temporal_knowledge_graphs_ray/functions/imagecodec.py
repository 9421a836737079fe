"""Pure-numpy image codecs: 24-bit BMP, binary PPM (P6) and 8-bit PNG.

The container has no PIL/cv2/ffmpeg, but these formats are fully
decodable with stdlib zlib + numpy alone, which turns the multimodal
decode/resize stages (stages/multimodal.py) into REAL kernels for real
byte payloads — not stand-ins — while the remaining compressed formats
(JPEG, DCT-anything) stay behind the honest NotImplementedError gate.

Formats:
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  24 bpp, BI_RGB (no compression), rows 4-byte padded, bottom-up by
  default (negative height = top-down). Pixels stored BGR; decoded to
  RGB HxWx3 uint8.
- PPM: ``P6\\n<w> <h>\\n255\\n`` + raw RGB rows (maxval 255 only).
- PNG: 8-bit non-interlaced, color types 0/2/3/4/6, all five row
  filters reversed (zlib inflate + numpy unfilter); alpha dropped and
  gray/palette expanded to RGB. 16-bit / interlaced raise.

All decoders reject anything outside their envelope with ValueError —
a truncated or exotic payload must fail loudly, not decode garbage.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"
PPM_MAGIC = b"P6"


def sniff_format(payload: bytes) -> str | None:
    """'bmp' | 'ppm' | 'png' | None (undecodable here)."""
    if payload[:2] == BMP_MAGIC:
        return "bmp"
    if payload[:2] == PPM_MAGIC:
        return "ppm"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
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


# ---------------------------------------------------------------- PNG ----

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# bytes per pixel by PNG color type at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 8-bit truecolor PNG (filter 0 rows, one zlib
    IDAT) — a valid minimal encoder any PNG reader accepts."""
    import zlib

    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = img.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8),  # filter byte 0 per row
         np.ascontiguousarray(img).reshape(h, w * 3)], axis=1).tobytes()
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _png_unfilter(raw: np.ndarray, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse the per-row PNG filters (types 0-4) -> (h, stride) bytes.

    Sub is a per-lane prefix sum (vectorized cumsum mod 256); Up is a
    vectorized running add; Average and Paeth have a true sequential
    dependency along x and fall back to a per-pixel loop for just the
    rows that use them (encoders that matter for the test/multimodal
    path emit filter 0; real-world rows with 3/4 decode correctly,
    slower)."""
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y]
        cur = data[y]
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: per-lane prefix sum
            rec = cur.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pcc:
                    pred = a
                elif pb <= pcc:
                    pred = b
                else:
                    pred = c
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> HxWx3 uint8 RGB.

    Color types: 0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA (alpha
    dropped, gray replicated). 16-bit and interlaced PNGs raise
    ValueError — outside the pure-numpy subset, loud by contract."""
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    n = len(payload)
    ihdr = None
    idat = bytearray()
    plte: bytes | None = None
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("malformed IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 \
            or ctype not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype}, "
            f"interlace={interlace}); 8-bit non-interlaced only")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    bpp = _PNG_CHANNELS[ctype]
    stride = w * bpp
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG pixel stream: {e}") from e
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    img = _png_unfilter(raw, h, stride, bpp).reshape(h, w, bpp)
    if ctype == 2:
        return np.ascontiguousarray(img)
    if ctype == 6:
        return np.ascontiguousarray(img[:, :, :3])
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    # ctype 3: palette lookup
    if plte is None or len(plte) % 3:
        raise ValueError("paletted PNG without a valid PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = img[:, :, 0]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("PNG palette index out of range")
    return pal[idx]


# ------------------------------------------------------------- common ----

_DECODERS = {"bmp": decode_bmp, "ppm": decode_ppm, "png": decode_png}
_ENCODERS = {"bmp": encode_bmp, "ppm": encode_ppm, "png": encode_png}


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
