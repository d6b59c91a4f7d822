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
                    concurrency: int = 2, batch_size: int = 64,
                    fake: str | None = "deterministic"):
    """Pipeline wrapper: large-binary-safe actor-pool decode stage."""
    return ds.map_batches(
        DecodeFeatureBatch,
        fn_constructor_kwargs=dict(payload_column=payload_column,
                                   feature_dim=feature_dim, fake=fake),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


class ResizeBatch:
    """Actor-pool stage: binary image payload -> resized payload +
    (width, height) metadata columns.

    ``fake='deterministic'`` subsamples the payload bytes evenly down to
    ``target_w * target_h`` pseudo-pixels (testable end-to-end, output
    size exactly proportional to the target box); ``fake=None`` raises
    where the real PIL/libvips call belongs.  Small ``batch_size`` keeps
    batch x concurrency of multi-MB payloads inside the worker heap.
    """

    def __init__(self, payload_column: str = "image", target_w: int = 64,
                 target_h: int = 64, fake: str | None = "deterministic"):
        self.payload_column = payload_column
        self.target_w, self.target_h = int(target_w), int(target_h)
        self.fake = fake
        # real image library handles load HERE, once per actor

    def _resize_stub(self, payload: bytes) -> bytes:
        if self.fake != "deterministic":
            raise NotImplementedError(
                "image codecs unavailable in this environment; "
                "plug a real resizer here")
        n = self.target_w * self.target_h
        if not payload:
            return b"\0" * n
        src = np.frombuffer(payload, dtype=np.uint8)
        idx = np.linspace(0, len(src) - 1, n).astype(np.int64)
        return src[idx].tobytes()

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b[self.payload_column].to_pylist()
        resized = [self._resize_stub(p or b"") for p in payloads]
        keep = [n for n in b.column_names if n != self.payload_column]
        out = b.select(keep)
        out = out.append_column("resized", pa.array(resized, pa.binary()))
        out = out.append_column("width", pa.array(
            np.full(len(resized), self.target_w, dtype=np.int64)))
        out = out.append_column("height", pa.array(
            np.full(len(resized), self.target_h, dtype=np.int64)))
        return out


def resize_images(ds, payload_column: str = "image", target_w: int = 64,
                  target_h: int = 64, concurrency: int = 2,
                  batch_size: int = 64, fake: str | None = "deterministic"):
    """Pipeline wrapper: large-binary-safe actor-pool resize stage."""
    return ds.map_batches(
        ResizeBatch,
        fn_constructor_kwargs=dict(payload_column=payload_column,
                                   target_w=target_w, target_h=target_h,
                                   fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class FrameSampleBatch:
    """Actor-pool stage: binary video payload -> one OUTPUT ROW PER
    SAMPLED FRAME (map_batches with a fan-out table: passthrough columns
    are replicated via take, so a 1-row input can emit many rows).

    ``fake='deterministic'`` treats the payload as fixed-size
    ``frame_bytes`` chunks and keeps every ``every_n``-th chunk up to
    ``max_frames`` — frame COUNTS are a pure function of payload size,
    so the plumbing is exactly SQL-checkable; ``fake=None`` raises where
    the real ffmpeg/pyav demux belongs.
    """

    def __init__(self, payload_column: str = "video",
                 frame_bytes: int = 256, every_n: int = 2,
                 max_frames: int = 8, fake: str | None = "deterministic"):
        self.payload_column = payload_column
        self.frame_bytes = int(frame_bytes)
        self.every_n = int(every_n)
        self.max_frames = int(max_frames)
        self.fake = fake
        # real demuxer handles load HERE, once per actor

    def _frames_stub(self, payload: bytes) -> list[bytes]:
        if self.fake != "deterministic":
            raise NotImplementedError(
                "video codecs unavailable in this environment; "
                "plug a real frame demuxer here")
        n_chunks = -(-len(payload) // self.frame_bytes) if payload else 0
        picks = range(0, n_chunks, self.every_n)
        return [payload[i * self.frame_bytes:(i + 1) * self.frame_bytes]
                for i in list(picks)[: self.max_frames]]

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b[self.payload_column].to_pylist()
        rows, fidx, frames = [], [], []
        for r, p in enumerate(payloads):
            for j, fr in enumerate(self._frames_stub(p or b"")):
                rows.append(r)
                fidx.append(j)
                frames.append(fr)
        keep = [n for n in b.column_names if n != self.payload_column]
        out = b.select(keep).take(pa.array(rows, pa.int64()))
        out = out.append_column("frame_idx",
                                pa.array(fidx, pa.int64()))
        out = out.append_column("frame", pa.array(frames, pa.binary()))
        return out


def sample_frames(ds, payload_column: str = "video", frame_bytes: int = 256,
                  every_n: int = 2, max_frames: int = 8,
                  concurrency: int = 2, batch_size: int = 16,
                  fake: str | None = "deterministic"):
    """Pipeline wrapper: frame-sampling fan-out stage (small batches —
    each input row multiplies into up to ``max_frames`` binary rows)."""
    return ds.map_batches(
        FrameSampleBatch,
        fn_constructor_kwargs=dict(payload_column=payload_column,
                                   frame_bytes=frame_bytes, every_n=every_n,
                                   max_frames=max_frames, fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
