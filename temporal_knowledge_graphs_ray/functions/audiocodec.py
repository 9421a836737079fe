"""Pure-stdlib audio codec: PCM WAV decode/encode + numpy DSP kernels.

The container has no soundfile/librosa/ffmpeg, but RIFF/WAVE PCM is
fully decodable with struct + numpy — which makes the audio leg of the
multimodal stages (stages/multimodal.py) REAL for real byte payloads,
the same way imagecodec.py does for BMP/PPM/PNG. Compressed audio
(MP3/AAC/OGG) stays behind the honest NotImplementedError gate at the
stage level.

Envelope:
- WAV: RIFF/WAVE, ``fmt `` chunk with audio_format 1 (integer PCM,
  8/16/32-bit) or 3 (float32), any channel count / sample rate; decoded
  to float32 in [-1, 1], shape (n_samples, n_channels).
- encode: 16-bit PCM writer (the interchange default).
- DSP: linear-interpolation resample, fixed-size framing, per-frame
  RMS energy + zero-crossing rate — the feature-extraction kernels a
  training pipeline computes per clip, all vectorized numpy.

Everything outside the envelope raises ValueError — a truncated or
exotic payload must fail loudly, not decode garbage.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float32 [-1,1] (n,) or (n, ch) -> 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("encode_wav expects (n,) or (n, ch) samples")
    n, ch = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767) \
        .astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM/float WAV bytes -> (float32 (n, ch) in [-1,1], sample_rate)."""
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n = len(payload)
    fmt_info = None
    data: bytes | None = None
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            if length < 16 or len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt_info = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            if len(body) < length:
                raise ValueError(
                    f"truncated WAV data: {len(body)} < {length} bytes")
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt_info
    if ch < 1 or rate < 1:
        raise ValueError(f"bad WAV fmt (channels={ch}, rate={rate})")
    if audio_format == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        # 8-bit WAV is unsigned with 128 as zero
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    elif audio_format == 1 and bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float32) \
            / 2147483648.0
    elif audio_format == 3 and bits == 32:
        arr = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, "
            f"bits={bits}); integer PCM 8/16/32 or float32 only")
    if len(arr) % ch:
        raise ValueError("WAV data length not divisible by channel count")
    return arr.reshape(-1, ch), rate


def resample_linear(samples: np.ndarray, src_rate: int,
                    dst_rate: int) -> np.ndarray:
    """(n, ch) float32 -> (m, ch) at dst_rate via linear interpolation
    (the resize_nearest analogue for audio; a real pipeline swaps in a
    windowed-sinc kernel without touching the stage shape)."""
    if src_rate == dst_rate or samples.shape[0] == 0:
        return samples
    n = samples.shape[0]
    m = max(1, int(round(n * dst_rate / src_rate)))
    src_pos = np.arange(m, dtype=np.float64) * (n - 1) / max(m - 1, 1)
    lo = np.floor(src_pos).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = (src_pos - lo).astype(np.float32)[:, None]
    return (samples[lo] * (1.0 - frac) + samples[hi] * frac) \
        .astype(np.float32)


def frame_samples(mono: np.ndarray, frame_len: int,
                  hop: int | None = None) -> np.ndarray:
    """(n,) -> (n_frames, frame_len) strided windows (tail dropped)."""
    if mono.ndim != 1:
        raise ValueError("frame_samples expects mono (n,)")
    if hop is None:
        hop = frame_len
    if frame_len < 1 or hop < 1:
        raise ValueError("frame_len and hop must be >= 1")
    n_frames = 1 + (len(mono) - frame_len) // hop if len(mono) >= frame_len \
        else 0
    if n_frames <= 0:
        return np.zeros((0, frame_len), np.float32)
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    return mono[idx]


def frame_features(frames: np.ndarray) -> dict[str, np.ndarray]:
    """Per-frame RMS energy + zero-crossing rate, vectorized."""
    if frames.size == 0:
        return {"rms": np.zeros(0, np.float32),
                "zcr": np.zeros(0, np.float32)}
    rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1)) \
        .astype(np.float32)
    signs = np.signbit(frames)
    zcr = (signs[:, 1:] != signs[:, :-1]).mean(axis=1).astype(np.float32)
    return {"rms": rms, "zcr": zcr}
