"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/feature kernels need codec libraries that are NOT in this
container, so the kernels are STUBBED behind ``DecodeUnavailable`` /
deterministic fakes — the Ray-side plumbing (schema, actor-pool stage,
batch sizing, output layout) is real and tested.

Scale notes: decode stages are actor pools (model/codec loaded once per actor
in ``__init__``), small ``batch_size`` because payloads are large, and
``num_cpus`` per actor sized to the codec's threading.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class DecodeUnavailable(NotImplementedError):
    """Raised when a real codec would be required (not present in this env)."""


IMAGE_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("sha16", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


class ImageFeatureActor:
    """Actor-pool ``map_batches`` stage: decode → resize → feature vector.

    Use as ``ds.map_batches(ImageFeatureActor, concurrency=N, batch_size=32,
    num_cpus=1, fn_constructor_kwargs={"fake": True})``. With ``fake=True``
    (this container) it produces a deterministic 16-dim byte-histogram
    feature instead of decoding; with ``fake=False`` it raises
    DecodeUnavailable where PIL/libjpeg would be called.
    """

    def __init__(self, media_col: str = "media", id_col: str = "doc_id", fake: bool = True):
        # per-actor one-time setup (codec/model load goes here)
        self.media_col = media_col
        self.id_col = id_col
        self.fake = fake

    def _decode(self, blob: bytes) -> tuple[int, int]:
        if not self.fake:
            raise DecodeUnavailable("image codec not available in this environment")
        # deterministic fake decode: pretend dims from the payload hash
        h = hashlib.blake2b(blob, digest_size=4).digest()
        return 64 + h[0] % 192, 64 + h[1] % 192

    def _feature(self, blob: bytes) -> np.ndarray:
        # 16-bin byte histogram, L1-normalized — deterministic, codec-free
        arr = np.frombuffer(blob, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(16, dtype=np.float32)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
        return hist / hist.sum()

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.media_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        rows = {k: [] for k in ("doc_id", "media_type", "n_bytes", "sha16", "width", "height", "feature")}
        for i, blob in zip(ids, blobs):
            blob = blob or b""
            w, h = self._decode(blob)
            rows["doc_id"].append(i)
            rows["media_type"].append("image/fake")
            rows["n_bytes"].append(len(blob))
            rows["sha16"].append(hashlib.blake2b(blob, digest_size=8).hexdigest())
            rows["width"].append(w)
            rows["height"].append(h)
            rows["feature"].append(self._feature(blob).tolist())
        return pa.table(rows, schema=IMAGE_META_SCHEMA)


def image_features(ds, media_col: str = "media", id_col: str = "doc_id", concurrency: int = 2):
    """Actor-pool feature extraction over a binary media column."""
    return ds.map_batches(
        ImageFeatureActor,
        fn_constructor_kwargs={"media_col": media_col, "id_col": id_col, "fake": True},
        batch_size=32,  # large payloads → small batches
        batch_format="pyarrow",
        concurrency=concurrency,
    )
