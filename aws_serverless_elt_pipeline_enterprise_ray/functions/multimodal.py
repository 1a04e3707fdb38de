"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata columns
alongside. The Ray-side plumbing (schemas, small batches for fat rows,
actor-pool stages, output layout) is real and tested; the actual codec
step is STUBBED because no image/audio libraries exist in this
container: ``DecodeStub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it derives deterministic pseudo-metadata
from the bytes so pipelines and tests can exercise the full path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: canonical multimodal schema fragment
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),  # "image" | "audio" | "video"
        pa.field("n_bytes", pa.int64()),
    ]
)


def attach_binary_payload(
    batch: pa.Table, src_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Wrap a source column as an opaque binary payload with byte-count
    metadata (zero-copy cast: string -> binary reuses buffers)."""
    payload = pc.cast(batch[src_col], pa.binary())
    return pa.table(
        {
            "media_id": pc.cast(batch[id_col], pa.int64()),
            "payload": payload,
            "media_type": pa.array(["image"] * len(batch), pa.string()),
            "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
        }
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    Real deployments replace ``_decode`` with PIL/torchaudio/ffmpeg
    calls (loaded once per actor here in ``__init__``). In this
    container the codec is unavailable, so: ``fake=False`` raises
    ``NotImplementedError``; ``fake=True`` emits deterministic
    metadata derived from the payload bytes (stable across processes).

    Fat-row guidance: pass a small ``batch_size`` (e.g. 32-256) to
    ``map_batches`` so batch x concurrency fits the worker heap.
    """

    def __init__(self, fake: bool = False, target_size: tuple[int, int] = (224, 224)):
        self.fake = fake
        self.target = target_size

    def _decode(self, payload: bytes) -> dict:
        if not self.fake:
            raise NotImplementedError(
                "no image/audio codecs in this environment; construct "
                "DecodeStub(fake=True) for deterministic fake decode"
            )
        n = len(payload)
        head = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
        return {
            "width": 64 + head % 1024,
            "height": 64 + (head >> 10) % 1024,
            "n_frames": 1 + n % 16,
            "feat_checksum": int(np.uint64(head) * np.uint64(1000003) + np.uint64(n)),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self._decode(p) for p in batch["payload"].to_pylist()]
        out = batch.drop_columns(["payload"])  # decoded stages drop fat bytes
        for key, typ in (
            ("width", pa.int64()),
            ("height", pa.int64()),
            ("n_frames", pa.int64()),
            ("feat_checksum", pa.int64()),
        ):
            vals = [int(m[key]) & 0x7FFFFFFFFFFFFFFF for m in metas]
            out = out.append_column(key, pa.array(vals, typ))
        return out


class FrameSampler:
    """Video-style frame sampling stub: emits ``every_nth`` frame index
    rows per media item (flat_map-shaped expansion done batch-wise)."""

    def __init__(self, every_nth: int = 4):
        self.n = every_nth

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, nf in zip(
            batch["media_id"].to_pylist(), batch["n_frames"].to_pylist()
        ):
            for f in range(0, nf, self.n):
                ids.append(mid)
                frames.append(f)
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()), "frame_idx": pa.array(frames, pa.int64())}
        )


def resize_batch_fake(batch: pa.Table, size=(224, 224)) -> pa.Table:
    """Deterministic 'resize': records the target dims (the real op
    would transform decoded tensors; plumbing kept identical)."""
    n = len(batch)
    return (
        batch.append_column("resized_w", pa.array([size[0]] * n, pa.int64()))
        .append_column("resized_h", pa.array([size[1]] * n, pa.int64()))
    )
