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
        ("digest16", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


class ImageFeatureActor:
    """Actor-pool ``map_batches`` stage: decode → resize → feature vector.

    Use as ``ds.map_batches(ImageFeatureActor, concurrency=N, batch_size=32,
    num_cpus=1)``. The codec probe runs ONCE per actor in ``__init__``
    (the stateful-stage pattern):

    * ``fake=None`` (default) — auto: use PIL when importable, else the
      deterministic fake.
    * ``fake=True`` — force the codec-free path: 16-dim byte-histogram
      feature + payload-hash pseudo-dimensions (this container has no
      image libraries, so this is what CI exercises).
    * ``fake=False`` — require a real codec; raises DecodeUnavailable from
      ``__init__`` when none is importable (no silent fake shipping).

    Real path (when PIL exists): decode → RGB → true (width, height) →
    4×4 grayscale thumbnail, L1-normalized, as the 16-dim feature."""

    def __init__(
        self,
        media_col: str = "media",
        id_col: str = "doc_id",
        fake: bool | None = None,
    ):
        # per-actor one-time setup: probe/import the codec here, not per batch
        self.media_col = media_col
        self.id_col = id_col
        self._pil = None
        if fake is not True:
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                if fake is False:
                    raise DecodeUnavailable(
                        "image codec (PIL) not available in this environment"
                    )
        self.fake = self._pil is None

    def _decode_real(self, blob: bytes) -> tuple[int, int, np.ndarray]:
        import io

        img = self._pil.open(io.BytesIO(blob)).convert("L")
        w, h = img.size
        thumb = np.asarray(img.resize((4, 4)), dtype=np.float32).reshape(-1)
        s = thumb.sum()
        return w, h, (thumb / s if s > 0 else thumb)

    def _decode_fake(self, blob: bytes) -> tuple[int, int]:
        # deterministic fake decode: pretend dims from the payload hash.
        # md5 digest bytes [8:16] little-endian == DuckDB md5_number_lower,
        # so the contract oracle recomputes width/height bit-for-bit
        v = int.from_bytes(hashlib.md5(blob).digest()[8:16], "little")
        return 64 + (v & 0xFF) % 192, 64 + ((v >> 8) & 0xFF) % 192

    def _feature_fake(self, blob: bytes) -> np.ndarray:
        # 16-bin byte histogram, L1-normalized — deterministic, codec-free
        arr = np.frombuffer(blob, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(16, dtype=np.float32)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
        return hist / hist.sum()

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.media_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        rows = {k: [] for k in ("doc_id", "media_type", "n_bytes", "digest16", "width", "height", "feature")}
        for i, blob in zip(ids, blobs):
            blob = blob or b""
            if self.fake:
                w, h = self._decode_fake(blob)
                feat = self._feature_fake(blob)
                mt = "image/fake"
            else:
                try:
                    w, h, feat = self._decode_real(blob)
                    mt = "image/decoded"
                except Exception:
                    # undecodable payload on the real path → null-ish row
                    w, h, feat = 0, 0, np.zeros(16, dtype=np.float32)
                    mt = "image/error"
            rows["doc_id"].append(i)
            rows["media_type"].append(mt)
            rows["n_bytes"].append(len(blob))
            rows["digest16"].append(hashlib.md5(blob).hexdigest()[:16])
            rows["width"].append(w)
            rows["height"].append(h)
            rows["feature"].append(np.asarray(feat, dtype=np.float32).tolist())
        return pa.table(rows, schema=IMAGE_META_SCHEMA)


def image_features(
    ds,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int = 2,
    fake: bool | None = None,
):
    """Actor-pool feature extraction over a binary media column. ``fake``
    as in :class:`ImageFeatureActor` (default: auto-upgrade to a real codec
    when one is importable on the workers)."""
    return ds.map_batches(
        ImageFeatureActor,
        fn_constructor_kwargs={"media_col": media_col, "id_col": id_col, "fake": fake},
        batch_size=32,  # large payloads → small batches
        batch_format="pyarrow",
        concurrency=concurrency,
    )


FRAME_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("frame_idx", pa.int64()),
        ("ts_ms", pa.int64()),
        ("n_frames", pa.int64()),
    ]
)


class FrameSampleActor:
    """Actor-pool ``map_batches`` stage: video payload → every ``stride``-th
    frame descriptor (the frame-sampling step ahead of a vision encoder).

    Same honesty contract as :class:`ImageFeatureActor`: ``fake=None``
    auto-uses cv2 when importable, else a DETERMINISTIC ARITHMETIC fake —
    ``n_frames = n_bytes % 97 + 1`` at a nominal 30 fps — chosen so the
    Ray-side plumbing (explode to one row per sampled frame, actor pool,
    small batches) is exercised end-to-end AND the output is SQL-checkable
    (the fake is plain arithmetic on the payload length, no hashing).
    ``fake=False`` raises :class:`DecodeUnavailable` when no codec exists.
    """

    def __init__(
        self,
        media_col: str = "media",
        id_col: str = "doc_id",
        stride: int = 30,
        fake: bool | None = None,
    ):
        self.media_col = media_col
        self.id_col = id_col
        self.stride = int(stride)
        self._cv2 = None
        if fake is not True:
            try:
                import cv2  # noqa: F401

                self._cv2 = cv2
            except ImportError:
                if fake is False:
                    raise DecodeUnavailable(
                        "video codec (cv2) not available in this environment"
                    )
        self.fake = self._cv2 is None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        col = batch[self.media_col]
        if len(batch) == 0 or pa.types.is_null(col.type):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int64()),
                    "ts_ms": pa.array([], pa.int64()),
                    "n_frames": pa.array([], pa.int64()),
                },
                schema=FRAME_SCHEMA,
            )
        if not self.fake:
            raise DecodeUnavailable(
                "real cv2 frame decode not wired in this environment"
            )
        n_bytes = np.asarray(
            [len(b) if b is not None else 0 for b in col.to_pylist()],
            dtype=np.int64,
        )
        n_frames = n_bytes % 97 + 1
        n_sampled = (n_frames - 1) // self.stride + 1
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), n_sampled)
        # within-doc sample ordinal 0..n_sampled-1, vectorized
        starts = np.cumsum(n_sampled) - n_sampled
        ordinal = np.arange(len(doc_of), dtype=np.int64) - starts[doc_of]
        frame_idx = ordinal * self.stride
        ts_ms = frame_idx * 1000 // 30  # nominal 30 fps
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of]),
                "frame_idx": pa.array(frame_idx),
                "ts_ms": pa.array(ts_ms),
                "n_frames": pa.array(n_frames[doc_of]),
            },
            schema=FRAME_SCHEMA,
        )


def frame_sample(
    ds,
    media_col: str = "media",
    id_col: str = "doc_id",
    stride: int = 30,
    concurrency: int = 2,
    fake: bool | None = None,
):
    """Actor-pool frame sampling over a binary video column — one output row
    per sampled frame. ``fake`` as in :class:`FrameSampleActor`."""
    return ds.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={
            "media_col": media_col,
            "id_col": id_col,
            "stride": stride,
            "fake": fake,
        },
        batch_size=32,  # large payloads → small batches
        batch_format="pyarrow",
        concurrency=concurrency,
    )


AUDIO_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("duration_ms", pa.int64()),
        ("n_windows", pa.int64()),
    ]
)


class AudioFeatureActor:
    """Actor-pool ``map_batches`` stage: audio payload → duration + analysis
    window count (the framing step ahead of an audio encoder).

    Honesty contract as in :class:`ImageFeatureActor`: auto-probes
    ``soundfile`` in ``__init__`` (``fake=False`` raises
    :class:`DecodeUnavailable` when absent); the codec-free fake treats the
    payload as 16 kHz mono 8-bit PCM — ``duration_ms = n_bytes * 1000 //
    16000``, 25 ms windows at 10 ms hop — plain arithmetic on the payload
    length, so the plumbing is SQL-checkable end-to-end."""

    def __init__(
        self, media_col: str = "media", id_col: str = "doc_id", fake: bool | None = None
    ):
        self.media_col = media_col
        self.id_col = id_col
        self._sf = None
        if fake is not True:
            try:
                import soundfile  # noqa: F401

                self._sf = soundfile
            except ImportError:
                if fake is False:
                    raise DecodeUnavailable(
                        "audio codec (soundfile) not available in this environment"
                    )
        self.fake = self._sf is None

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.media_col]
        if len(batch) == 0 or pa.types.is_null(col.type):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                    "duration_ms": pa.array([], pa.int64()),
                    "n_windows": pa.array([], pa.int64()),
                },
                schema=AUDIO_SCHEMA,
            )
        if not self.fake:
            raise DecodeUnavailable(
                "real soundfile decode not wired in this environment"
            )
        n_bytes = np.asarray(
            [len(b) if b is not None else 0 for b in col.to_pylist()],
            dtype=np.int64,
        )
        duration_ms = n_bytes * 1000 // 16000
        # 25 ms windows at 10 ms hop; 0 when shorter than one window
        n_windows = np.where(
            duration_ms >= 25, (duration_ms - 25) // 10 + 1, 0
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_bytes": pa.array(n_bytes),
                "duration_ms": pa.array(duration_ms),
                "n_windows": pa.array(n_windows),
            },
            schema=AUDIO_SCHEMA,
        )


def audio_features(
    ds,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int = 2,
    fake: bool | None = None,
):
    """Actor-pool audio framing over a binary media column. ``fake`` as in
    :class:`AudioFeatureActor`."""
    return ds.map_batches(
        AudioFeatureActor,
        fn_constructor_kwargs={"media_col": media_col, "id_col": id_col, "fake": fake},
        batch_size=32,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
