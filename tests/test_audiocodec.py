"""Pure-stdlib WAV codec + audio stages: PCM round-trips, DSP kernels
against numpy oracles, actor-pool decode/feature/resample stages over
REAL WAV payloads, loud gates outside the envelope."""

from __future__ import annotations

import numpy as np
import pytest

from temporal_knowledge_graphs_ray.functions.audiocodec import (
    decode_wav,
    encode_wav,
    frame_features,
    frame_samples,
    resample_linear,
    sniff_wav,
)


class TestWavCodec:
    def test_roundtrip_mono_16bit(self):
        t = np.arange(800) / 8000.0
        wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        payload = encode_wav(wave, 8000)
        assert sniff_wav(payload)
        out, rate = decode_wav(payload)
        assert rate == 8000 and out.shape == (800, 1)
        # 16-bit quantization: encode scales by 32767, decode by
        # 32768, so the worst case is ~1.5/32768
        np.testing.assert_allclose(out[:, 0], wave, atol=2.0 / 32768)

    def test_roundtrip_stereo(self):
        rng = np.random.default_rng(2)
        s = rng.uniform(-0.9, 0.9, size=(500, 2)).astype(np.float32)
        out, rate = decode_wav(encode_wav(s, 44100))
        assert rate == 44100 and out.shape == (500, 2)
        np.testing.assert_allclose(out, s, atol=2.0 / 32768)

    def test_8bit_and_float32_variants(self):
        import struct

        # hand-built 8-bit WAV: two samples, 128 = zero, 255 ~ +1
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        data = bytes([128, 255, 0, 64])
        body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 4) + data)
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        out, rate = decode_wav(payload)
        assert out.shape == (4, 1)
        assert abs(out[0, 0]) < 1e-6 and out[1, 0] > 0.98 \
            and out[2, 0] < -0.99
        # float32 WAV (format 3)
        fmt3 = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
        samples = np.array([0.25, -0.5], dtype="<f4").tobytes()
        body3 = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt3
                 + b"data" + struct.pack("<I", 8) + samples)
        out3, r3 = decode_wav(b"RIFF" + struct.pack("<I", len(body3))
                              + body3)
        assert r3 == 16000
        np.testing.assert_allclose(out3[:, 0], [0.25, -0.5], atol=1e-7)

    def test_rejects_outside_envelope(self):
        with pytest.raises(ValueError):
            decode_wav(b"not a wav")
        good = encode_wav(np.zeros(100, np.float32), 8000)
        with pytest.raises(ValueError):
            decode_wav(good[:-50])  # truncated data chunk
        # unsupported bits (24-bit PCM)
        import struct

        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 3) + bytes(3))
        with pytest.raises(ValueError):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


class TestDspKernels:
    def test_resample_identity_and_ratio(self):
        s = np.arange(100, dtype=np.float32)[:, None] / 100
        assert resample_linear(s, 8000, 8000) is s
        up = resample_linear(s, 8000, 16000)
        assert up.shape[0] == 200
        # linear interp of a linear ramp is the same ramp
        np.testing.assert_allclose(up[:, 0],
                                   np.linspace(0, 99 / 100, 200),
                                   atol=1e-6)
        down = resample_linear(s, 8000, 4000)
        assert down.shape[0] == 50

    def test_framing_and_features_oracle(self):
        mono = np.array([1, -1, 1, -1, 0.5, 0.5, 0.5, 0.5, 9],
                        dtype=np.float32)
        frames = frame_samples(mono, 4)
        assert frames.shape == (2, 4)  # tail sample dropped
        feats = frame_features(frames)
        # frame 0: alternating +-1 -> rms 1, zcr 1.0 (3/3 crossings)
        np.testing.assert_allclose(feats["rms"][0], 1.0, atol=1e-6)
        np.testing.assert_allclose(feats["zcr"][0], 1.0, atol=1e-6)
        # frame 1: constant 0.5 -> rms 0.5, zcr 0
        np.testing.assert_allclose(feats["rms"][1], 0.5, atol=1e-6)
        np.testing.assert_allclose(feats["zcr"][1], 0.0, atol=1e-6)
        # hop < frame_len overlaps
        assert frame_samples(mono, 4, hop=2).shape == (3, 4)
        assert frame_samples(np.zeros(2, np.float32), 4).shape == (0, 4)


@pytest.mark.usefixtures("ray_session")
class TestAudioStages:
    def test_decode_features_resample_pipeline(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.multimodal import (
            audio_features,
            decode_audio,
            resample_audio,
            synth_audio_table,
        )

        tbl = synth_audio_table(6, seed=11)
        ds = rd.from_arrow(tbl)
        meta = decode_audio(ds, fake=False).to_pandas() \
            .sort_values("media_id", ignore_index=True)
        assert len(meta) == 6
        assert set(meta["sample_rate"]) == {8000, 16000}
        assert set(meta["channels"]) == {1, 2}
        assert (meta["duration_sec"] > 0.19).all()
        assert (meta["n_samples"]
                == (meta["duration_sec"] * meta["sample_rate"])
                .round()).all()

        feats = audio_features(ds, frame_len=512).to_pandas() \
            .sort_values("media_id", ignore_index=True)
        # sine+noise clips carry real energy and crossings
        assert (feats["rms_mean"] > 0.1).all()
        assert (feats["zcr_mean"] > 0.0).all()
        assert (feats["n_frames"] > 0).all()

        res = resample_audio(ds, target_rate=12000).to_pandas()
        assert (res["sample_rate"] == 12000).all()
        # re-decode the resampled payloads: rate took, duration kept
        from temporal_knowledge_graphs_ray.functions.audiocodec import (
            decode_wav,
        )

        orig = {r["media_id"]: r for _, r in meta.iterrows()}
        for _, row in res.iterrows():
            samples, rate = decode_wav(row["payload"])
            assert rate == 12000
            want = orig[row["media_id"]]["duration_sec"]
            assert abs(samples.shape[0] / 12000 - want) < 0.01

    def test_strict_gate_on_non_wav_audio(self):
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.multimodal import (
            decode_audio,
        )

        tbl = pa.table({
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([b"ID3\x04mp3-ish bytes"], pa.binary()),
            "media_type": pa.array(["audio"], pa.string()),
            "n_bytes": pa.array([15], pa.int64()),
        })
        with pytest.raises(Exception):
            decode_audio(rd.from_arrow(tbl), fake=False).to_pandas()
        out = decode_audio(rd.from_arrow(tbl), fake=True).to_pandas()
        assert len(out) == 1  # deterministic stand-in


def test_mutation_fuzz_exception_contract():
    """Corrupted/truncated WAV payloads raise only ValueError /
    NotImplementedError (the decode-stage policy types) — e.g. a
    declared-16 fmt chunk whose body was cut must not leak
    struct.error. Seeded mutations of a real encoded WAV."""
    import random

    from temporal_knowledge_graphs_ray.functions import audiocodec

    rng = random.Random(20260820)
    base = audiocodec.encode_wav(
        np.sin(np.linspace(0, 10, 500)).astype(np.float32).reshape(-1, 1),
        8000)
    for _ in range(4000):
        b = bytearray(base)
        for _m in range(rng.randint(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        blob = bytes(b)[: rng.randrange(4, len(b) + 1)]
        try:
            audiocodec.decode_wav(blob)
        except (ValueError, NotImplementedError):
            pass
