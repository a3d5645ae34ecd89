"""Multimodal column stages: image/audio treated as opaque ``large_binary``
columns with typed metadata. The Ray-side plumbing (schemas, actor-pool
signatures, small batches for large payloads, output layout) is real and
tested; the actual codec work is STUBBED — the sandbox has no image/audio
libraries — behind ``DecodeBackend``: the default ``FakeDecodeBackend`` is
deterministic (derives pseudo-dimensions/features from the bytes), and
``PillowBackend.__init__`` raises ``NotImplementedError`` unless PIL is
importable.

Usage shape (the part that matters at scale)::

    media.map_batches(ImageDecoder, fn_constructor_kwargs={...},
                      concurrency=(2, 8), batch_size=32,   # small: big payloads
                      num_cpus=1, batch_format="pyarrow")
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("format", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("feature", pa.list_(pa.float32())),  # embedding-like feature vector
    ]
)


class FakeDecodeBackend:
    """Deterministic stand-in for a real image decoder: format from magic-ish
    prefix, dims/features from a hash of the bytes. Lets every downstream
    stage (resize plan, feature index, layout) be built and tested for real."""

    def decode(self, data: bytes) -> tuple[str, int, int]:
        h = int.from_bytes(hashlib.blake2b(data or b"", digest_size=8).digest(), "little")
        fmt = ["jpeg", "png", "gif"][h % 3]
        return fmt, 64 + h % 1920, 64 + (h >> 16) % 1080

    def features(self, data: bytes, dim: int = 16) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(data or b"", digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed & 0xFFFFFFFF)
        return rng.standard_normal(dim).astype(np.float32)


class PillowBackend:  # pragma: no cover - requires PIL, absent in sandbox
    def __init__(self):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image decoding requires Pillow, not available in this "
                "environment; use FakeDecodeBackend"
            ) from e


class ImageDecoder:
    """Actor-pool stage: backend built once per actor (__init__), batches of
    binary payloads decoded per __call__. Keep batch_size small (payload ×
    batch × concurrency must fit the worker heap)."""

    def __init__(self, backend: str = "fake", feature_dim: int = 16):
        if backend == "fake":
            self.backend = FakeDecodeBackend()
        elif backend == "pillow":
            self.backend = PillowBackend()
        else:
            raise ValueError(f"unknown decode backend {backend!r}")
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        bodies = batch["body"].to_pylist()
        fmts, ws, hs, feats = [], [], [], []
        for b in bodies:
            fmt, w, h = self.backend.decode(b or b"")
            fmts.append(fmt)
            ws.append(w)
            hs.append(h)
            feats.append(self.backend.features(b or b"", self.feature_dim).tolist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": batch["span_idx"].cast(pa.int32()),
                "media_ref": batch["url"] if "url" in batch.schema.names else batch["media_ref"],
                "n_bytes": pa.array([len(b or b"") for b in bodies], pa.int64()),
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        ).cast(MEDIA_META_SCHEMA)
