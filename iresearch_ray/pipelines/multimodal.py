"""Multimodal columns: opaque binary payloads + typed metadata stages.

The container ships no image/audio codecs, so the DECODE kernels are
stubbed (deterministic fake or NotImplementedError), but the Ray-side
plumbing — schema, actor-pool signature, batch sizing for large binary
rows, output layout — is real and tested.  Swap `_decode_stub` for a real
decoder (PIL/libvips/ffmpeg) in `__init__` and nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DecodeFeatureBatch:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    ``fake='deterministic'`` derives a stable pseudo-feature from the
    payload bytes (testable end-to-end); ``fake=None`` raises
    NotImplementedError where the real codec call belongs.
    Use small ``batch_size`` (e.g. 16-64) for multi-MB payloads so
    batch x concurrency fits the worker heap.
    """

    def __init__(self, payload_column: str = "html", feature_dim: int = 16,
                 fake: str | None = "deterministic"):
        self.payload_column = payload_column
        self.feature_dim = feature_dim
        self.fake = fake
        # real decoder handles/models load HERE, once per actor

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        if self.fake == "deterministic":
            h = np.frombuffer(payload[: 8 * self.feature_dim].ljust(
                8 * self.feature_dim, b"\0"), dtype=np.uint64)
            return (h % np.uint64(1000)).astype(np.float32) / np.float32(1000)
        raise NotImplementedError(
            "image/audio codecs unavailable in this environment; "
            "plug a real decoder here")

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b[self.payload_column].to_pylist()
        feats = np.stack([self._decode_stub(p or b"") for p in payloads])
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        keep = [n for n in b.column_names if n != self.payload_column]
        out = b.select(keep)
        out = out.append_column("payload_bytes", pa.array(sizes))
        out = out.append_column("feature",
                                pa.array(list(feats), type=pa.list_(pa.float32())))
        return out


def decode_features(ds, payload_column: str = "html", feature_dim: int = 16,
                    concurrency: int = 2, batch_size: int = 64):
    """Pipeline wrapper: large-binary-safe actor-pool decode stage."""
    return ds.map_batches(
        DecodeFeatureBatch,
        fn_constructor_kwargs=dict(payload_column=payload_column,
                                   feature_dim=feature_dim),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
