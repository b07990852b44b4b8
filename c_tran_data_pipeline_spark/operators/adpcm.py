"""IMA ADPCM (DVI4) audio codec: pure-Python encode/decode + WAV container.

Closes the compressed-audio half of the codec seam (VERDICT r7 #3): IMA
ADPCM is a table-driven 4-bit differential predictor from the public IMA
"Recommended Practices for Enhancing Digital Audio Compatibility" spec
(the same algorithm RFC 3551 registers as DVI4) — ~40 lines of integer
math, fully deterministic, so the decode is honestly implementable from
scratch AND exactly replayable in SQL (the oracle replays the composed
encode→decode state machine as a recursive CTE; see
plans/multimodal_queries.py::q_audio_features_adpcm). Perceptual codecs
(MP3/AAC/Vorbis) remain behind the documented NotImplementedError seam in
operators/multimodal.py — they need ffmpeg-class dependencies.

WAV layout (format tag 0x0011, mono): each ``block_align``-byte block is a
4-byte header (sample0 as int16 LE — emitted verbatim as the first output
sample — plus the step index and a reserved byte) followed by data bytes
carrying two 4-bit nibbles each, LOW nibble first. With the standard
block_align=256 that is 1 + 252·2 = 505 samples per block. Each block is
SELF-CONTAINED: the encoder reseeds (predictor, step index) per block
from the block's first sample, the header carries both, and the decoder
re-reads them per block — no codec state crosses a block boundary
(which is what lets the SQL oracle replay blocks independently). The
final partial block is zero-padded and the ``fact`` chunk's true sample
count truncates the decode.

No reference-parity citation: /root/reference has no media path; this
exists for the multimodal surface of the engine.
"""

from __future__ import annotations

import struct

# Public IMA tables (index 0..88 step sizes; per-nibble index deltas).
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(v: int) -> int:
    return 0 if v < 0 else (88 if v > 88 else v)


def _step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """Decoder state transition: (pred, index) + nibble → (pred', index')."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    return pred, _clamp_idx(index + INDEX_TABLE[nibble])


def _encode_nibble(sample: int, pred: int, index: int) -> int:
    """Quantize (sample − pred) against the current step by thresholds —
    the canonical IMA encoder; the predictor then updates through the
    SAME _step the decoder uses, so encoder and decoder state never
    drift."""
    step = STEP_TABLE[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


def _initial_index(first_diff: int) -> int:
    """Per-block starting step index: the smallest step ≥ the block's
    first sample delta. The block header carries the index explicitly,
    so the encoder is free to pick it — seeding from the first delta
    avoids the cold-start ramp (index 0 = step 7 under a signal moving
    thousands per sample → ~9000 max error over the first ten samples;
    seeded, the worst sample is within ~2 steps). Deterministic integer
    choice, replayed verbatim by the SQL oracle."""
    d = abs(first_diff)
    for i, s in enumerate(STEP_TABLE):
        if s >= d:
            return i
    return 88


def adpcm_encode(samples: list[int], block_align: int = 256) -> tuple[bytes, int]:
    """Mono int16 samples → (ADPCM block bytes, samples_per_block).
    The final partial block is zero-nibble padded to block_align."""
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    for start in range(0, len(samples), spb):
        chunk = samples[start : start + spb]
        pred = chunk[0]
        index = _initial_index(chunk[1] - chunk[0]) if len(chunk) > 1 else 0
        out += struct.pack("<hBB", pred, index, 0)
        nibbles: list[int] = []
        for s in chunk[1:]:
            n = _encode_nibble(s, pred, index)
            pred, index = _step(pred, index, n)
            nibbles.append(n)
        nibbles += [0] * (spb - 1 - len(nibbles))  # pad final block
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out), spb


def adpcm_decode_blocks(data: bytes, n_samples: int, block_align: int = 256) -> list[int]:
    """ADPCM block bytes → first ``n_samples`` mono int16 samples."""
    spb = (block_align - 4) * 2 + 1
    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            break
        pred, index, _ = struct.unpack("<hBB", block[:4])
        index = _clamp_idx(index)
        out.append(pred)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                pred, index = _step(pred, index, nibble)
                out.append(pred)
    return out[:n_samples]


def make_adpcm_wav(
    n_samples: int, rate: int = 8000, seed: int = 0, block_align: int = 256
) -> bytes:
    """A real RIFF/WAVE file with format tag 0x0011 (IMA ADPCM, mono)
    carrying the SAME deterministic seeded sine as ``make_wav`` — the
    fixture generator for the compressed decode path. Includes the
    mandatory ``fact`` chunk (true sample count; the data chunk is
    block-padded past it)."""
    import math

    freq = 220 + (seed % 40)
    samples = [
        int(12000 * math.sin(2 * math.pi * freq * i / rate)) for i in range(n_samples)
    ]
    data, spb = adpcm_encode(samples, block_align)
    n_blocks = -(-n_samples // spb)
    byte_rate = rate * block_align // spb  # advisory average
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011,  # wFormatTag: IMA ADPCM
        1,  # channels
        rate,
        byte_rate,
        block_align,
        4,  # bits per (compressed) sample
        2,  # cbSize
        spb,  # wSamplesPerBlock
    )
    fact = struct.pack("<I", n_samples)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    assert len(data) == n_blocks * block_align
    body = b"WAVE" + chunks
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_adpcm_wav(payload: bytes):
    """→ (rate, channels, n_samples, pcm16_bytes) or None if the payload
    is not a mono IMA-ADPCM RIFF/WAVE. Tolerant walk: unknown chunks are
    skipped; torn data (not a whole number of blocks) decodes the intact
    prefix; a missing fact chunk falls back to the block capacity."""
    if payload is None or len(payload) < 12:
        return None
    payload = bytes(payload)
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = None
    n_samples = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : min(pos + 8 + size, end)]
        if cid == b"fmt " and len(body) >= 16:
            fmt = body
        elif cid == b"fact" and len(body) >= 4:
            n_samples = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        return None
    tag, channels, rate, _br, block_align = struct.unpack("<HHIIH", fmt[:14])
    if tag != 0x0011 or channels != 1 or block_align < 5 or rate <= 0:
        return None
    whole = len(data) - len(data) % block_align  # torn tail block dropped
    spb = (block_align - 4) * 2 + 1
    capacity = (whole // block_align) * spb
    n = min(n_samples if n_samples is not None else capacity, capacity)
    samples = adpcm_decode_blocks(data[:whole], n, block_align)
    import struct as _s

    return rate, 1, len(samples), b"".join(_s.pack("<h", s) for s in samples)
