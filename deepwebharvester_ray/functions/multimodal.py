"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with metadata columns
alongside.  The actual codec decode is STUBBED (image/audio libraries are
not available in this container): ``DecodeStage`` raises
``NotImplementedError`` unless constructed with ``fake=True``, in which
case it emits a deterministic byte-histogram "feature vector" so the Ray
plumbing — schema, small batch sizes for large payloads, actor signature,
output layout — is real and tested end-to-end.

Scale notes: binary payloads are MBs per row → run these stages with small
``batch_size`` (16-64) so batch × concurrency fits worker heaps, and let
blocks split (SURVEY §7.5 hard part 7 applies identically to html pages).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from .. import runtime_env

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",  # (or avi; fine for sniffing demo)
    b"ID3": "audio/mp3",
    b"<!DO": "text/html",
    b"<htm": "text/html",
}


def binary_metadata_batch(batch: pa.Table, binary_column: str = "payload") -> pa.Table:
    """Attach (n_bytes, sniffed_type) metadata for a binary column."""
    payloads = batch.column(binary_column).to_pylist()
    sizes, types = [], []
    for b in payloads:
        b = b or b""
        sizes.append(len(b))
        kind = "application/octet-stream"
        for magic, name in _MAGIC.items():
            if b.startswith(magic):
                kind = name
                break
        types.append(kind)
    out = {n: batch.column(n) for n in batch.column_names}
    out["n_bytes"] = pa.array(sizes, pa.int64())
    out["sniffed_type"] = pa.array(types, pa.string())
    return pa.table(out)


N_FEATURES = 16


class DecodeStage:
    """Actor-pool decode / feature-extract stage for binary payloads.

    Real deployments plug a codec (PIL/ffmpeg/torchvision) into
    ``_decode``; in this container the codec is absent, so:

    * ``fake=False`` (default) → ``NotImplementedError`` at decode time
      (clearly marked stub).
    * ``fake=True`` → deterministic 16-bin byte histogram, L1-normalized,
      as the "feature vector" — exercises the full actor-pool plumbing.
    """

    def __init__(self, binary_column: str = "payload", fake: bool = False) -> None:
        self._col = binary_column
        self._fake = fake
        # real codecs would be loaded HERE, once per actor
        self._bins = np.linspace(0, 256, N_FEATURES + 1)

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self._fake:
            raise NotImplementedError(
                "codec decode not available in this environment; "
                "construct DecodeStage(fake=True) for the deterministic stub"
            )
        arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=self._bins)
        total = max(1, hist.sum())
        return (hist / total).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(b) for b in batch.column(self._col).to_pylist()]
        out = {n: batch.column(n) for n in batch.column_names if n != self._col}
        out["features"] = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32(), N_FEATURES)
        )
        return pa.table(out)


def decode_features(
    ds,
    binary_column: str = "payload",
    fake: bool = False,
    batch_size: int = 32,
    concurrency=(1, 8),
):
    """Run the decode stage as an actor pool with payload-appropriate
    batch sizing."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_args=(binary_column, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        runtime_env=runtime_env(),
    )


def frame_sample_stub(n_frames: int = 4):
    """Video frame-sampling stage factory — STUB.

    Returns a map_batches-compatible callable that raises
    ``NotImplementedError`` (no video codec in this container).  The
    signature documents the intended contract: binary video column in,
    ``list<binary>[n_frames]`` of sampled frames out.
    """

    def _stage(batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            f"frame sampling ({n_frames} frames) requires a video codec; "
            "not available in this environment"
        )

    return _stage
