"""[EXT] Pure-Python baseline JPEG codec (ITU-T T.81 / JFIF).

Closes the last image-plane refusal (r10 verdict item 10): baseline
sequential DCT JPEG — the overwhelmingly dominant variant in web-scale
corpora — decoded with no external library. Everything here derives
from the public ITU-T T.81 specification: canonical Huffman tables
(Annex C), the zig-zag order (Figure 5), byte stuffing / restart
markers (F.1.2.3), MCU interleave (A.2.3), and the Annex K reference
quantization + Huffman tables used by the encoder. The DCT pair is the
separable orthonormal DCT-II via numpy float64 — T.81 does not
bit-specify the IDCT, so decoded samples are "an" IDCT within spec
tolerance; the codec is self-consistent (flat blocks round-trip
EXACTLY: a constant block is DC-only, and DC survives quantization by
q[0] when the value is a multiple of it).

Scope, refusing loudly outside it (a silent fake would poison
downstream features):
- decode: baseline DCT (SOF0), 8-bit, grayscale or YCbCr with any
  sampling factors, restart intervals, stuffed bytes. Progressive
  (SOF2), extended (SOF1), lossless, arithmetic coding, 12-bit, and
  Adobe CMYK refuse with NotImplementedError.
- encode: grayscale baseline with the Annex K luminance table scaled
  to a flat-field-exact quantization, standard Annex K Huffman tables.

The decoder's ``gray`` output is the Y component directly: JPEG's Y
IS the BT.601 luma this module's image plane standardizes on, and it
is stored at full resolution in every common sampling layout — no
chroma reconstruction is needed for the gray plane (Cb/Cr blocks are
still entropy-DECODED to keep the bitstream position honest).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_jpeg",
    "encode_jpeg_gray",
]

# zig-zag index order (T.81 Figure 5): ZIGZAG[k] = raster index of the
# k-th coefficient in transmission order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 luminance quantization table (quality-50 reference), in
# raster order
K1_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# Annex K.3: typical luminance DC/AC Huffman tables as (BITS, HUFFVAL)
K3_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K3_DC_VALS = list(range(12))
K3_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
K3_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: row k = c(k) cos((2n+1)kπ/16)."""
    C = np.zeros((8, 8))
    for k in range(8):
        ck = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            C[k, n] = ck * np.cos((2 * n + 1) * k * np.pi / 16)
    return C


_DCT = _dct_matrix()


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: {(length, code) → symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Encoder direction: {symbol → (length, code)}."""
    return {v: lc for lc, v in _build_huffman(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing removed and RSTn markers surfaced via ``sync_restart``."""

    def __init__(self, buf: bytes, start: int):
        self.buf = buf
        self.pos = start
        self.bit = 0
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        buf = self.buf
        b = buf[self.pos]
        if b == 0xFF:
            nxt = buf[self.pos + 1] if self.pos + 1 < len(buf) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # EOI or next marker reached mid-read: pad with 1s,
                # like every conforming decoder (T.81 F.2.2.5)
                self.cur = (self.cur << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at the current byte position."""
        self.nbits = 0
        self.cur = 0
        buf = self.buf
        # skip fill bits to the marker
        while self.pos + 1 < len(buf):
            if buf[self.pos] == 0xFF and 0xD0 <= buf[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _RestartPending(Exception):
    pass


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coeff: np.ndarray) -> np.ndarray:
    """8x8 dequantized raster-order coefficients → spatial samples
    (level-shifted +128, clamped to 0..255, uint8)."""
    s = _DCT.T @ coeff @ _DCT
    return np.clip(np.round(s) + 128, 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes):
    """Baseline JPEG → ``imagecodec.DecodedImage`` (gray = Y plane).

    Truncated/corrupt payloads raise ValueError (never IndexError /
    struct.error): the multimodal Decoder catches
    (NotImplementedError, ValueError) to fall back to PIL/fake, and a
    leaked IndexError would kill the whole mapInPandas task (review
    r11)."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, StopIteration, struct.error) as exc:
        # KeyError: scan references an undeclared quant/huffman table id
        # (e.g. DQT segment stripped) — same corrupt-payload class.
        raise ValueError(f"truncated or corrupt JPEG: {exc}") from exc


def _decode_jpeg(payload: bytes):
    from .imagecodec import DecodedImage

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization table")
                q = np.zeros(64)
                for k in range(64):
                    q[ZIGZAG[k]] = body[i + 1 + k]
                qtables[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                htables[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (non-baseline) not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xEE and body[:5] == b"Adobe":
            transform = body[11] if len(body) > 11 else 0
            if transform == 2 or (transform == 0 and frame is None):
                raise NotImplementedError("Adobe YCCK/CMYK JPEG")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tabs = struct.unpack_from(">BB", body, 1 + 2 * c)
                comp = next(
                    x for x in frame["comps"] if x["id"] == cs
                )
                scan.append(
                    {"c": comp, "dc": tabs >> 4, "ac": tabs & 0x0F}
                )
            if len(scan) != len(frame["comps"]):
                raise NotImplementedError("multi-scan JPEG")
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qtables,
                htables, restart_interval, DecodedImage,
            )
        pos += 2 + seglen
    raise ValueError("no SOS marker")


def _decode_scan(
    payload, start, frame, scan, qtables, htables, restart_interval, DecodedImage
):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcw, mch = 8 * hmax, 8 * vmax
    mcus_x = (w + mcw - 1) // mcw
    mcus_y = (h + mch - 1) // mch
    # Y plane only (gray contract): component 0 buffers at its own
    # sampled resolution; Y is full-res whenever hmax/vmax equal its
    # factors (every common layout: 4:4:4, 4:2:0, 4:2:2, grayscale)
    y0 = comps[0]
    yw, yh = mcus_x * y0["h"] * 8, mcus_y * y0["v"] * 8
    yplane = np.zeros((yh, yw), dtype=np.uint8)
    reader = _BitReader(payload, start)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for si, sc in enumerate(scan):
                comp = sc["c"]
                q = qtables[comp["tq"]]
                dct = htables.get((0, sc["dc"]))
                act = htables.get((1, sc["ac"]))
                if dct is None or act is None:
                    raise ValueError("missing Huffman table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeff = np.zeros(64)
                        try:
                            t = _decode_symbol(reader, dct)
                            diff = _extend(reader.receive(t), t)
                            pred[comp["id"]] += diff
                            coeff[0] = pred[comp["id"]]
                            k = 1
                            while k < 64:
                                rs = _decode_symbol(reader, act)
                                r4, s4 = rs >> 4, rs & 0x0F
                                if s4 == 0:
                                    if r4 == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r4
                                if k > 63:
                                    raise ValueError("AC run overflow")
                                coeff[ZIGZAG[k]] = _extend(
                                    reader.receive(s4), s4
                                )
                                k += 1
                        except _RestartPending as exc:
                            raise ValueError(
                                "restart marker inside MCU"
                            ) from exc
                        if si == 0:  # Y only reaches pixels
                            block = _idct_block(
                                coeff.reshape(8, 8) * q
                            )
                            py = (my * comp["v"] + by) * 8
                            px = (mx * comp["h"] + bx) * 8
                            yplane[py : py + 8, px : px + 8] = block
    # crop the Y plane to image dimensions at Y's sampling resolution
    ys_w = -(-w * y0["h"] // hmax)  # ceil(w * h_y / hmax)
    ys_h = -(-h * y0["v"] // vmax)
    crop = yplane[:ys_h, :ys_w]
    if (ys_w, ys_h) != (w, h):
        # sub-sampled Y (rare): nearest-neighbour upsample to w×h
        iy = (np.arange(h) * ys_h // h).clip(0, ys_h - 1)
        ix = (np.arange(w) * ys_w // w).clip(0, ys_w - 1)
        crop = crop[np.ix_(iy, ix)]
    return DecodedImage(w, h, "jpeg", crop.reshape(-1))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (T.81 F.1.2.3)


def encode_jpeg_gray(
    width: int,
    height: int,
    pixels,
    flat_q: int = 0,
    color: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline grayscale JFIF from top-down 8-bit samples.

    ``flat_q`` > 0 replaces the Annex K luminance table with a uniform
    table of that step — with ``flat_q=1`` a flat (constant) image
    round-trips EXACTLY (constant block → DC-only DCT → no
    quantization loss), giving the test suite a bit-exact anchor for
    the decoder without an external reference codec.

    ``color=True`` writes a 3-component 4:4:4 YCbCr stream with
    NEUTRAL chroma (Cb=Cr=128 → all-zero coefficient blocks): the
    image is visually identical gray, but the bitstream exercises the
    decoder's interleaved-MCU and skip-non-Y paths. ``restart_interval``
    emits DRI + RSTn markers every N MCUs (decoder resync coverage)."""
    arr = np.asarray(pixels, dtype=np.int64).reshape(height, width)
    if width <= 0 or height <= 0:
        raise ValueError("empty image")
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("samples must be 8-bit")
    q = (
        np.full((8, 8), flat_q, dtype=np.float64)
        if flat_q
        else np.array(K1_LUMA_Q, dtype=np.float64).reshape(8, 8)
    )
    dc_codes = _huffman_codes(K3_DC_BITS, K3_DC_VALS)
    ac_codes = _huffman_codes(K3_AC_BITS, K3_AC_VALS)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    # edge-replicate padding keeps block boundaries artifact-free
    padded = np.pad(
        arr, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
    ).astype(np.float64) - 128.0
    writer = _BitWriter()

    def write_block(zz: list[int], pred: int) -> int:
        diff = zz[0] - pred
        t = diff.bit_length() if diff else 0
        ln, code = dc_codes[t]
        writer.write(code, ln)
        if t:
            writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                writer.write(code, ln)  # ZRL
                run -= 16
            s = abs(v).bit_length()
            ln, code = ac_codes[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]
            writer.write(code, ln)  # EOB
        return zz[0]

    ncomp = 3 if color else 1
    pred = [0] * ncomp
    zero_zz = [0] * 64
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            mcu += 1
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coeff = _DCT @ block @ _DCT.T
            quant = np.round(coeff / q).astype(np.int64)
            zz = [int(quant.reshape(-1)[ZIGZAG[k]]) for k in range(64)]
            pred[0] = write_block(zz, pred[0])
            for c in range(1, ncomp):  # neutral chroma: all-zero block
                pred[c] = write_block(zero_zz, pred[c])
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    qz = bytes(
        [0]
        + [int(q.reshape(-1)[ZIGZAG[k]]) for k in range(64)]
    )
    dht_dc = bytes([0x00] + K3_DC_BITS + K3_DC_VALS)
    dht_ac = bytes([0x10] + K3_AC_BITS + K3_AC_VALS)
    if color:
        sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
            (1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)
        )
        sos = bytes((3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    else:
        sof = struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0))
        sos = bytes((1, 1, 0x00, 0, 63, 0))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, qz)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + dri
        + seg(0xC0, sof)
        + seg(0xDA, sos)
        + bytes(writer.out)
        + b"\xff\xd9"
    )
