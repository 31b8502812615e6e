"""WAV (RIFF PCM) codec — stdlib only.

The audio sibling of `datapipe/png.py` / `datapipe/jpeg.py`: canonical
uncompressed WAV decodes FOR REAL — RIFF chunk walk, fmt parse
(PCM 8/16-bit, mono/stereo), interleaved frame deinterleave — and the
matching encoder synthesizes test payloads. PCM is lossless, so unlike
JPEG the d12d oracle needs no special content class: every synthesized
sample round-trips bit-exactly and a SQL oracle recomputes statistics
straight from the sample formula.

OUT OF SCOPE (documented boundary, raises NotImplementedError):
compressed codecs (MP3/AAC/FLAC — format tags other than 1/PCM),
>2 channels, 24/32-bit depths, and WAVE_FORMAT_EXTENSIBLE. Malformed
RIFF structure raises ValueError (corruption surfaces loudly, matching
the PNG/JPEG contract).

PRODUCTION SWAP: PCM decode is cheap enough to keep, but to cover the
compressed boundary at production scale pass an ffmpeg/soundfile
wrapper via `extract_audio_features(decode_fn=...)` — same
mapInPandas contract, identical schema (see
`tests/test_multimodal.py::test_decode_fn_injection`).
"""

from __future__ import annotations

import struct

# one malicious header must not allocate unbounded sample buffers
MAX_SAMPLES = 1 << 24


def is_wav(payload: bytes | None) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def encode_wav(
    sample_rate: int, channels: int, samples: list[list[int]]
) -> bytes:
    """PCM16 encode. `samples` is per-channel lists of equal length,
    values in int16 range; channels interleave per the RIFF spec."""
    if channels not in (1, 2) or len(samples) != channels:
        raise ValueError("encode_wav supports 1 or 2 channels")
    n = len(samples[0])
    if any(len(s) != n for s in samples):
        raise ValueError("channel length mismatch")
    frames = bytearray()
    for i in range(n):
        for c in range(channels):
            v = samples[c][i]
            if not -32768 <= v <= 32767:
                raise ValueError("sample out of int16 range")
            frames += struct.pack("<h", v)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + bytes(frames))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode PCM WAV -> (sample_rate, channels, per-channel samples).
    8-bit samples are recentred to signed (v - 128) so both depths
    share a zero-centred domain."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    # honor the DECLARED RIFF extent (same contract as avi.py): a size
    # past the payload is corruption, and trailing bytes beyond it must
    # not be parsed as chunks (a stray trailing 'data' would silently
    # win over the real one)
    (riff_len,) = struct.unpack("<I", payload[4:8])
    end = 8 + riff_len
    if end > len(payload):
        raise ValueError("RIFF size runs past payload end")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + clen > end:
            raise ValueError("RIFF chunk runs past payload end")
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd lengths carry a pad byte
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if sample_rate <= 0:
        raise ValueError("invalid sample rate in fmt chunk")
    if audio_format != 1:
        raise NotImplementedError(
            f"compressed WAV (format tag {audio_format}) is out of scope "
            "— PCM only"
        )
    if channels not in (1, 2):
        raise NotImplementedError(">2 channels out of scope")
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit depth out of scope (8/16)")
    width = bits // 8
    if block_align != channels * width:
        raise ValueError("block_align inconsistent with channels/depth")
    if len(data) % (channels * width) != 0:
        # ADVICE r5: a data chunk cut mid-frame is corruption — surface
        # it loudly like every other malformed-RIFF case instead of
        # silently dropping the trailing partial frame
        raise ValueError(
            f"data chunk length {len(data)} is not a whole number of "
            f"{channels * width}-byte frames (truncated mid-frame)"
        )
    n = len(data) // (channels * width)
    if n > MAX_SAMPLES:
        raise ValueError(f"sample count exceeds the {MAX_SAMPLES} cap")
    out: list[list[int]] = [[] for _ in range(channels)]
    if bits == 16:
        vals = struct.unpack(f"<{n * channels}h", data[: n * channels * 2])
    else:
        vals = [b - 128 for b in data[: n * channels]]
    for c in range(channels):
        out[c] = list(vals[c::channels])
    return sample_rate, channels, out
