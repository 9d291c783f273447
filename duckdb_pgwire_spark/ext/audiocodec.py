"""[EXT] Pure-Python audio codec for uncompressed WAV (RIFF PCM).

Real sample decoding with no external library: the RIFF/WAVE container
with PCM payloads — integer 8/16/24/32-bit, mono and interleaved
stereo, chunk-walking that skips unknown chunks (LIST, fact, cue) the
way real files carry them, and (r12) IEEE-float PCM (format tag 3,
32/64-bit) scaled onto the 16-bit integer grid. The layout is fully
public (the RIFF spec and the Microsoft WAVE format), so the
mm_audio_* operators decode actual samples through this module,
mirroring how ``ext.imagecodec`` keeps the image plane stub-free.
Compressed formats (MP3, AAC, ADPCM) refuse loudly with
NotImplementedError: entropy decoding genuinely needs a library, and a
silent fake would poison downstream features.

All DECODED samples are exact integers (integer PCM as stored —
8-bit recentred, 24-bit sign-extended; float PCM deterministically
quantized half-away-from-zero to the 16-bit grid at decode), so both
engines of the correctness gate can reproduce every derived statistic
bit-for-bit downstream of the decode.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "DecodedAudio",
    "decode_wav",
    "encode_wav_pcm16",
]


class DecodedAudio:
    """Decoded clip: ``sample_rate``, ``n_channels``, ``bits``, and
    ``samples`` — per-channel-interleaved exact integer samples
    (16-bit: as stored; 8-bit: value - 128).

    ``samples_np`` is the decode's native representation (int32
    ndarray straight off ``np.frombuffer`` — the r10 verdict's
    vectorization item: the pure-Python unpack loop was a ~10-50x
    constant factor on the same bytes). ``samples`` materializes the
    plain-list view for small-clip callers and tests."""

    __slots__ = ("sample_rate", "n_channels", "bits", "samples_np")

    def __init__(
        self, sample_rate: int, n_channels: int, bits: int, samples
    ):
        self.sample_rate = sample_rate
        self.n_channels = n_channels
        self.bits = bits
        self.samples_np = np.asarray(samples, dtype=np.int32)

    @property
    def samples(self) -> list[int]:
        return self.samples_np.tolist()

    @property
    def n_frames(self) -> int:
        return len(self.samples_np) // self.n_channels


def encode_wav_pcm16(
    sample_rate: int, samples, n_channels: int = 1
) -> bytes:
    """Canonical 44-byte-header WAV from interleaved signed 16-bit
    samples. Total size is exactly ``44 + 2*len(samples)`` — the
    SQL-predictable property the mm_audio oracles lean on."""
    if sample_rate <= 0 or n_channels <= 0:
        raise ValueError("sample_rate and n_channels must be positive")
    if len(samples) % n_channels != 0:
        raise ValueError("samples must interleave complete frames")
    arr = np.asarray(samples)
    if arr.size and not np.issubdtype(arr.dtype, np.integer):
        raise ValueError("samples must be integers")
    arr = arr.astype(np.int64, copy=False)
    if arr.size:
        bad = arr[(arr < -32768) | (arr > 32767)]
        if bad.size:
            raise ValueError(f"sample {int(bad[0])} outside int16 range")
    data = arr.astype("<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> DecodedAudio:
    """Chunk-walking RIFF/WAVE decoder for PCM.

    Accepts any chunk order, skips unknown chunks (word-aligned, the
    RIFF rule), requires one ``fmt `` before ``data``. Integer PCM:
    16/32-bit decode as stored, 24-bit sign-extends the 3-byte frames,
    8-bit (stored unsigned) recentres to signed. IEEE-float PCM
    (format tag 3, 32/64-bit — r12) scales the normalized [-1,1]
    samples to the 16-bit grid, clipping out-of-range. ADPCM and other
    compressed tags refuse with NotImplementedError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_tag = n_channels = sample_rate = bits = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated chunk " + repr(cid))
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt_tag, n_channels, sample_rate, _brate, _balign, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if fmt_tag == 0xFFFE and clen >= 26:
                # WAVE_FORMAT_EXTENSIBLE: the real format is the first
                # two bytes of the subformat GUID
                (fmt_tag,) = struct.unpack_from("<H", body, 24)
        elif cid == b"data":
            if fmt_tag is None:
                raise ValueError("data chunk before fmt")
            if fmt_tag == 3:
                # IEEE-float PCM (r12 stretch; public WAVE spec):
                # normalized [-1, 1] floats scale to the 16-bit
                # integer grid (round-half-away like every practical
                # converter), out-of-range clips
                if bits == 32:
                    f = np.frombuffer(body, dtype="<f4", count=clen // 4)
                elif bits == 64:
                    f = np.frombuffer(body, dtype="<f8", count=clen // 8)
                else:
                    raise NotImplementedError(
                        f"{bits}-bit float PCM not supported"
                    )
                # NaN samples (malformed encoders) clamp to 0 rather
                # than poison the int cast
                f64 = np.nan_to_num(f.astype(np.float64))
                scaled = np.clip(
                    np.sign(f64) * np.floor(np.abs(f64) * 32767.0 + 0.5),
                    -32768,
                    32767,
                )
                samples = scaled.astype(np.int32)
                bits = 16  # downstream stats see the integer grid
            elif fmt_tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {fmt_tag} (non-PCM) not supported"
                )
            elif bits == 16:
                n = clen // 2
                samples = np.frombuffer(
                    body, dtype="<i2", count=n
                ).astype(np.int32)
            elif bits == 8:
                samples = np.frombuffer(body, dtype=np.uint8).astype(
                    np.int32
                ) - 128
            elif bits == 24:
                # 3-byte little-endian signed (r12): widen via uint8
                # triplets — (b2<<16 | b1<<8 | b0) sign-extended
                n = clen // 3
                b3 = np.frombuffer(body, np.uint8, count=n * 3).reshape(
                    n, 3
                ).astype(np.int32)
                v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
                samples = np.where(v >= 1 << 23, v - (1 << 24), v)
            elif bits == 32:
                samples = np.frombuffer(
                    body, dtype="<i4", count=clen // 4
                ).astype(np.int32)
            else:
                raise NotImplementedError(f"{bits}-bit PCM not supported")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if samples is None:
        raise ValueError("no data chunk")
    if n_channels in (None, 0) or sample_rate in (None, 0):
        raise ValueError("invalid fmt chunk")
    if len(samples) % n_channels != 0:
        # trailing partial frame: drop it, like every practical reader
        samples = samples[: len(samples) - len(samples) % n_channels]
    return DecodedAudio(sample_rate, n_channels, bits, samples)
