"""[EXT] Pure-Python image codec for UNCOMPRESSED raster formats.

Real pixel decoding with no external library: Windows BMP (8/24/32-bit
uncompressed BI_RGB, bottom-up and top-down, row padding, palette) and
binary PPM (P6). These two formats have fully public, fixed layouts
(the BMP file format and Netpbm specs), so "no codecs in the container"
stops being a reason to stub — the mm_* operators decode actual pixels
through this module. Compressed formats (PNG/JPEG/RLE-BMP) still refuse
loudly with NotImplementedError: inflate/DCT genuinely need a library,
and a silent fake would poison downstream features.

The grayscale conversion is the integer ITU-R BT.601 luma
``(299*R + 587*G + 114*B) // 1000`` — exact for achromatic pixels
(R=G=B=v → v), so gray-payload round trips are lossless and both
engines of the correctness gate can reproduce the math bit-for-bit.
"""

from __future__ import annotations

import struct

__all__ = [
    "DecodedImage",
    "decode_bmp",
    "decode_image",
    "decode_ppm",
    "encode_bmp_gray",
    "encode_ppm_gray",
]


class DecodedImage:
    """Decoded raster: ``width``, ``height``, ``codec``, and ``gray`` —
    top-down row-major 8-bit luma samples (list of ints, len w*h)."""

    __slots__ = ("width", "height", "codec", "gray")

    def __init__(self, width: int, height: int, codec: str, gray: list[int]):
        self.width = width
        self.height = height
        self.codec = codec
        self.gray = gray


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
    gray = [0] * (width * height)
    for file_row in range(height):
        y = file_row if top_down else height - 1 - file_row
        base = data_off + file_row * row_size
        for x in range(width):
            p = base + x * bytes_pp
            if bpp == 8:
                gray[y * width + x] = palette[payload[p]]  # type: ignore[index]
            else:  # 24/32-bit little-endian BGR(A)
                b, g, r = payload[p], payload[p + 1], payload[p + 2]
                gray[y * width + x] = _luma(r, g, b)
    return DecodedImage(width, height, "bmp", gray)


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
    if maxval > 255:
        raise NotImplementedError("16-bit PPM is not supported")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PPM dimensions")
    chans = 3 if payload[:2] == b"P6" else 1
    if len(payload) < i + width * height * chans:
        raise ValueError("truncated PPM raster")
    gray = [0] * (width * height)
    for k in range(width * height):
        p = i + k * chans
        if chans == 3:
            gray[k] = _luma(payload[p], payload[p + 1], payload[p + 2])
        else:
            gray[k] = payload[p]
    return DecodedImage(width, height, "ppm" if chans == 3 else "pgm", gray)


def decode_image(payload: bytes) -> DecodedImage | None:
    """Sniff + decode the formats this module understands, None when
    the magic is unrecognized (caller falls back to PIL or the fake)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    return None
