"""[EXT] Pure-Python image codec for LOSSLESS raster formats.

Real pixel decoding with no external library: Windows BMP (8/24/32-bit
uncompressed BI_RGB, bottom-up and top-down, row padding, palette),
binary PPM (P6) / PGM (P5), and PNG — r9 the 8-bit plane, r10 the
FULL matrix: every legal depth/color-type combination (1/2/4/8/16-bit,
color types 0/2/3/4/6), all five scanline filters, and both interlace
methods including Adam7 7-pass (inflate is stdlib ``zlib``). These
formats have fully public layouts (the BMP file format, Netpbm, and
the PNG specification), so "no codecs in the container" stops being a
reason to stub — the mm_* operators decode actual pixels through this
module — and, since r11, baseline JPEG through the sibling
``jpegcodec`` (huffman + IDCT, stdlib+numpy, public ITU-T T.81 spec).
Remaining entropy-coded refusals (progressive JPEG, RLE-BMP) stay
loud NotImplementedError: a silent fake would poison downstream
features.

The grayscale conversion is the integer ITU-R BT.601 luma
``(299*R + 587*G + 114*B) // 1000`` — exact for achromatic pixels
(R=G=B=v → v), so gray-payload round trips are lossless and both
engines of the correctness gate can reproduce the math bit-for-bit.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "DecodedImage",
    "decode_bmp",
    "decode_image",
    "decode_png",
    "decode_ppm",
    "encode_bmp_gray",
    "encode_png_gray",
    "encode_ppm_gray",
]


class DecodedImage:
    """Decoded raster: ``width``, ``height``, ``codec``, and ``gray`` —
    top-down row-major 8-bit luma samples as an int64 numpy array of
    len w*h (r12: was list[int] — the numpy plane removes the ~10-50×
    per-pixel Python constant the audio path shed in r11; values are
    identical integers)."""

    __slots__ = ("width", "height", "codec", "gray")

    def __init__(self, width: int, height: int, codec: str, gray):
        self.width = width
        self.height = height
        self.codec = codec
        self.gray = np.asarray(gray, dtype=np.int64).reshape(-1)


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def encode_bmp_gray(width: int, height: int, pixels: list[int]) -> bytes:
    """24-bit uncompressed BMP from top-down row-major gray samples
    (each written as R=G=B). Standard layout: BITMAPFILEHEADER +
    BITMAPINFOHEADER, rows bottom-up, each padded to 4 bytes."""
    if width <= 0 or height <= 0 or len(pixels) != width * height:
        raise ValueError("pixels must be width*height gray samples")
    row_size = (3 * width + 3) & ~3
    img_size = row_size * height
    off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", off + img_size, 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
        2835, 2835, 0, 0,
    )
    pad = b"\x00" * (row_size - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):  # file order is bottom-up
        row = bytearray()
        for x in range(width):
            v = pixels[y * width + x] & 0xFF
            row += bytes((v, v, v))  # little-endian BGR; equal channels
        rows.append(bytes(row) + pad)
    return file_hdr + info_hdr + b"".join(rows)


def encode_ppm_gray(width: int, height: int, pixels: list[int]) -> bytes:
    """Binary PPM (P6, maxval 255) from top-down gray samples."""
    if width <= 0 or height <= 0 or len(pixels) != width * height:
        raise ValueError("pixels must be width*height gray samples")
    body = bytearray()
    for v in pixels:
        v &= 0xFF
        body += bytes((v, v, v))
    return f"P6\n{width} {height}\n255\n".encode() + bytes(body)


def decode_bmp(payload: bytes) -> DecodedImage:
    """Decode an uncompressed BMP (BI_RGB; 8-bit paletted, 24- or
    32-bit) to gray samples. Compressed BMP (BI_RLE4/8, BI_PNG/JPEG)
    and sub-byte depths refuse loudly."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP is not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            "compressed BMP (RLE/PNG/JPEG embedding) needs a codec library"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bpp BMP is not supported")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    palette: list[int] | None = None
    if bpp == 8:
        # palette sits between the info header and the pixel data;
        # entries are 4-byte BGRX
        pal_off = 14 + hdr_size
        n_entries = (data_off - pal_off) // 4
        if n_entries <= 0:
            raise ValueError("8-bpp BMP without a palette")
        palette = []
        for i in range(n_entries):
            b, g, r, _x = struct.unpack_from("<BBBB", payload, pal_off + 4 * i)
            palette.append(_luma(r, g, b))
    bytes_pp = bpp // 8
    row_size = (bytes_pp * width + 3) & ~3
    need = data_off + row_size * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        payload, np.uint8, count=row_size * height, offset=data_off
    ).reshape(height, row_size)
    if bpp == 8:
        pal = np.asarray(palette, dtype=np.int64)
        idx = rows[:, :width].astype(np.int64)
        g2 = pal[idx]
    else:  # 24/32-bit little-endian BGR(A)
        px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
        px = px.astype(np.int64)
        g2 = (299 * px[:, :, 2] + 587 * px[:, :, 1] + 114 * px[:, :, 0]) // 1000
    if not top_down:
        g2 = g2[::-1]
    return DecodedImage(width, height, "bmp", g2.reshape(-1))


def decode_ppm(payload: bytes) -> DecodedImage:
    """Decode binary PPM (P6) / PGM (P5), maxval ≤ 255."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, width, height, maxval — whitespace separated, with
    # '#' comments allowed through the maxval token
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    i += 1  # single whitespace after maxval, then raster
    width, height, maxval = (int(t) for t in tokens)
    if not 0 < maxval <= 65535:
        raise ValueError(f"invalid PPM maxval {maxval}")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PPM dimensions")
    chans = 3 if payload[:2] == b"P6" else 1
    # maxval > 255 → 2-byte big-endian samples (r10); normalize any
    # maxval to 8-bit via v*255//maxval (exact for 255 and 65535)
    wide = maxval > 255
    bpc = 2 if wide else 1
    if len(payload) < i + width * height * chans * bpc:
        raise ValueError("truncated PPM raster")
    n = width * height * chans
    if wide:
        ch = np.frombuffer(payload, ">u2", count=n, offset=i).astype(np.int64)
    else:
        ch = np.frombuffer(payload, np.uint8, count=n, offset=i).astype(np.int64)
    ch = ch.reshape(-1, chans)
    if (ch > maxval).any():
        # a sample above maxval would scale past 255 and poison
        # the 8-bit gray contract (code review r10) — malformed
        # input refuses loudly like every other codec error
        raise ValueError("PPM sample exceeds declared maxval")
    if chans == 3:
        v = (299 * ch[:, 0] + 587 * ch[:, 1] + 114 * ch[:, 2]) // 1000
    else:
        v = ch[:, 0]
    gray = v * 255 // maxval if maxval != 255 else v
    return DecodedImage(width, height, "ppm" if chans == 3 else "pgm", gray)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png_gray(width: int, height: int, pixels: list[int]) -> bytes:
    """8-bit grayscale PNG (color type 0, filter 0 rows) from top-down
    samples. IDAT uses STORED deflate blocks (zlib level 0), so the
    payload size is deterministic: for raster bytes n = h*(w+1) ≤ one
    stored block, total = 8 (sig) + 25 (IHDR) + 12 + (n+11) (IDAT) +
    12 (IEND) = 68 + n — the mm_decode oracle recomputes it in SQL."""
    if width <= 0 or height <= 0 or len(pixels) != width * height:
        raise ValueError("pixels must be width*height gray samples")
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        raw += bytes(v & 0xFF for v in pixels[y * width : (y + 1) * width])
    if len(raw) > 60000:
        # larger rasters split into multiple stored blocks and the
        # size formula above stops holding — refuse rather than emit
        # a payload the oracle can't predict
        raise ValueError("encode_png_gray: raster exceeds one stored block")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    idat = zlib.compress(bytes(raw), 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# PNG depths legal per color type (spec §11.2.2)
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 pass grids: (x_start, y_start, x_step, y_step), spec order
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(
    raw: bytes, pos: int, stride: int, height: int, bpp: int
) -> tuple[list[bytes], int]:
    """Unfilter ``height`` scanlines of ``stride`` bytes starting at
    ``raw[pos]``; ``bpp`` is the FILTER byte offset — ceil bytes per
    pixel, min 1 (spec: sub-byte depths filter with bpp=1). Returns
    (rows, position after the last scanline)."""
    rows: list[bytes] = []
    prev = bytes(stride)
    for _y in range(height):
        if pos + 1 + stride > len(raw):
            raise ValueError("truncated PNG raster")
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up — no left-dependency, vectorizable
            line = bytearray(
                (
                    np.frombuffer(bytes(line), np.uint8)
                    + np.frombuffer(prev, np.uint8)
                ).tobytes()
            )
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"invalid PNG filter type {ftype}")
        prev = bytes(line)
        rows.append(prev)
    return rows, pos


def _png_line_gray(
    line: bytes, n_pix: int, ctype: int, depth: int, plte: list[int] | None
) -> np.ndarray:
    """One unfiltered scanline → n_pix 8-bit gray samples (int64
    array; numpy-vectorized r12, identical integers). 16-bit samples
    reduce via the high byte (the standard 16→8 map, exact for
    v*257-scaled values); sub-byte gray scales by 255/(2^depth-1)."""
    la = np.frombuffer(line, np.uint8)
    if depth < 8:  # ctype 0 (gray) or 3 (palette), MSB-first packing
        vmax = (1 << depth) - 1
        scale = 255 // vmax
        # pixels never straddle bytes (8//depth per byte), so the
        # MSB-first bit stream is the pixel stream
        bits = np.unpackbits(la)[: n_pix * depth].reshape(n_pix, depth)
        weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.int64)
        v = (bits.astype(np.int64) * weights).sum(axis=1)
        if ctype == 0:
            return v * scale
        if (v >= len(plte)).any():  # type: ignore[arg-type]
            raise ValueError("PNG palette index out of range")
        return np.asarray(plte, dtype=np.int64)[v]
    step = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype] * (depth // 8)
    hi = depth // 8  # byte stride between channels; sample high byte
    px = la[: n_pix * step].reshape(n_pix, step).astype(np.int64)
    if ctype == 0 or ctype == 4:
        return px[:, 0]
    if ctype == 3:
        idx = px[:, 0]
        if (idx >= len(plte)).any():  # type: ignore[arg-type]
            raise ValueError("PNG palette index out of range")
        return np.asarray(plte, dtype=np.int64)[idx]
    # 2 (RGB) / 6 (RGBA)
    return (299 * px[:, 0] + 587 * px[:, hi] + 114 * px[:, 2 * hi]) // 1000


def decode_png(payload: bytes) -> DecodedImage:
    """Decode PNG to gray samples via stdlib zlib: every legal
    depth/color-type combination (1/2/4/8/16-bit; gray / RGB /
    palette / gray+alpha / RGBA), scanline filters 0-4, and both
    interlace methods (none + Adam7 7-pass, r10). 16-bit samples
    reduce to 8-bit via the high byte."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr: tuple | None = None
    plte: list[int] | None = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError("malformed PNG IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = [
                _luma(data[i], data[i + 1], data[i + 2])
                for i in range(0, len(data) - 2, 3)
            ]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PNG dimensions")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if ctype not in _PNG_DEPTHS:
        raise ValueError(f"invalid PNG color type {ctype}")
    if depth not in _PNG_DEPTHS[ctype]:
        raise ValueError(
            f"invalid PNG depth {depth} for color type {ctype}"
        )
    chans = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # zlib.error would escape the (NotImplementedError, ValueError)
        # contract Decoder.decode's PIL/Fake fallback relies on
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    bpp = max(1, chans * depth // 8)
    g2 = np.zeros((height, width), dtype=np.int64)
    passes = (
        [(0, 0, 1, 1)] if interlace == 0 else list(_ADAM7)
    )
    rpos = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # pass empty for this image size
        stride = (pw * chans * depth + 7) // 8
        rows, rpos = _png_unfilter(raw, rpos, stride, ph, bpp)
        for ry, line in enumerate(rows):
            g2[y0 + ry * dy, x0::dx] = _png_line_gray(
                line, pw, ctype, depth, plte
            )
    return DecodedImage(width, height, "png", g2.reshape(-1))


def decode_image(payload: bytes) -> DecodedImage | None:
    """Sniff + decode the formats this module understands, None when
    the magic is unrecognized (caller falls back to PIL or the fake).
    Baseline JPEG decodes through ``ext.jpegcodec`` (r11); progressive
    / arithmetic / 12-bit JPEG still raise NotImplementedError, which
    the caller routes to the PIL hook for exotic variants."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    return None
