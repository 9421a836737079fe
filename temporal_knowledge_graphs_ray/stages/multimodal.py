"""Multimodal column plumbing (scale addition; decode stubbed).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata. The Ray-side plumbing — schema, actor-pool signature, small
batch sizes for large payloads, output layout — is real and tested; the
actual decode is stubbed (no image/audio libraries in this container):
``DecodeStage`` raises NotImplementedError unless ``fake=True``, in which
case it produces a deterministic fake decode (dimensions derived from the
payload bytes) so the pipeline shape is exercised end-to-end.
"""

from __future__ import annotations

import pyarrow as pa

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
        # real decoder init goes here (model/codec load, once per actor)

    def _decode(self, payload: bytes, media_type: str) -> tuple[int, int, int]:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires an image/audio library not present "
                "in this container; construct DecodeStage(fake=True) for "
                "the deterministic stand-in"
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
