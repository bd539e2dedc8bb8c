"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Codec tiers (probed ONCE per actor in ``__init__``):

* third-party (PIL / cv2 / soundfile) when importable — decodes any format
  the library supports;
* builtin pure-stdlib codecs (``ops/codecs.py``: PNG via zlib + numpy
  unfiltering, WAV via stdlib ``wave``) — always available, REAL decode of
  the formats they recognize by magic bytes;
* deterministic fakes for everything else — honest, hash-checkable stand-ins
  so the Ray-side plumbing (schema, actor-pool stage, batch sizing, output
  layout) is exercised end-to-end even on undecodable payloads.

``fake=True`` forces tier 3 (what the SQL-oracle contract entries pin);
``fake=None`` (auto) dispatches per payload: real decode when a codec
recognizes it, fake otherwise; ``fake=False`` is strict-real — undecodable
payloads become zeroed ``*/error`` rows, never fakes.  Video has no builtin
codec, so its real path still requires cv2 (``DecodeUnavailable``).

Scale notes: decode stages are actor pools (model/codec loaded once per actor
in ``__init__``), small ``batch_size`` because payloads are large, and
``num_cpus`` per actor sized to the codec's threading.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from infidex_ray.ops import codecs as _codecs


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

    * ``fake=None`` (default) — auto: PIL when importable decodes every
      payload; otherwise PNG-magic payloads go through the builtin stdlib
      PNG decoder (``ops/codecs.py``) and everything else gets the
      deterministic fake (``media_type`` tells them apart per row).
    * ``fake=True`` — force the codec-free path: 16-dim byte-histogram
      feature + payload-hash pseudo-dimensions (what the SQL-oracle
      contract entries pin, so they hash identically in any environment).
    * ``fake=False`` — strict real: PIL if importable, else builtin PNG
      only; undecodable payloads become zeroed ``image/error`` rows,
      never fakes.

    Real path: decode → true (width, height) → 4×4 grayscale box
    thumbnail, L1-normalized, as the 16-dim feature (ITU-R 601 luma)."""

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
                pass  # builtin PNG decoder still provides a real path
        # tri-state per-payload dispatch mode (see class docstring)
        self.mode = "fake" if fake is True else ("strict" if fake is False else "auto")
        self.fake = fake is True  # back-compat attribute

    def _decode_real(self, blob: bytes) -> tuple[int, int, np.ndarray, str]:
        """True decode: PIL when present, else the builtin stdlib PNG codec.
        Raises on undecodable payloads (callers map that to error/fake rows
        per the mode)."""
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(blob)).convert("L")
            w, h = img.size
            thumb = np.asarray(img.resize((4, 4)), dtype=np.float32).reshape(-1)
            mt = "image/decoded"
        else:
            px = _codecs.decode_png(blob)  # raises CodecError on non-PNG
            h, w = px.shape[:2]
            gray = _codecs.png_luma(px)
            thumb = _codecs.box_thumbnail(gray, 4, 4).reshape(-1)
            mt = "image/png"
        s = thumb.sum()
        return w, h, (thumb / s if s > 0 else thumb), mt

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
            # per-payload dispatch: auto tries a real decode when a codec
            # claims the payload (PIL: always; builtin: PNG magic), else fake
            try_real = self.mode == "strict" or (
                self.mode == "auto"
                and (self._pil is not None or blob.startswith(_codecs.PNG_MAGIC))
            )
            if try_real:
                try:
                    w, h, feat, mt = self._decode_real(blob)
                except Exception:
                    if self.mode == "strict":
                        # undecodable on the strict path → null-ish row
                        w, h, feat = 0, 0, np.zeros(16, dtype=np.float32)
                        mt = "image/error"
                    else:
                        try_real = False
            if not try_real:
                w, h = self._decode_fake(blob)
                feat = self._feature_fake(blob)
                mt = "image/fake"
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

    Codec tiers as in :class:`ImageFeatureActor`: ``soundfile`` when
    importable, else the builtin stdlib WAV parser (``ops/codecs.py``) for
    RIFF/WAVE-magic payloads — a REAL decode (true frame count / sample
    rate). ``fake=True`` pins the codec-free fake the SQL-oracle contract
    uses: payload treated as 16 kHz mono 8-bit PCM — ``duration_ms =
    n_bytes * 1000 // 16000``, 25 ms windows at 10 ms hop — plain
    arithmetic on the payload length, so the plumbing is SQL-checkable
    end-to-end. ``fake=None`` dispatches per payload (real when a codec
    claims it, fake otherwise); ``fake=False`` is strict-real (undecodable
    payloads → zeroed rows)."""

    def __init__(
        self, media_col: str = "media", id_col: str = "doc_id", fake: bool | None = None
    ):
        self.media_col = media_col
        self.id_col = id_col
        self._sf = None
        if fake is not True:
            try:
                import soundfile

                self._sf = soundfile
            except ImportError:
                pass  # builtin WAV parser still provides a real path
        self.mode = "fake" if fake is True else ("strict" if fake is False else "auto")
        self.fake = fake is True  # back-compat attribute

    def _decode_real(self, blob: bytes) -> int:
        """True duration_ms via soundfile (any format) or the builtin WAV
        parser; raises on payloads neither codec claims."""
        if self._sf is not None:
            import io

            info = self._sf.info(io.BytesIO(blob))
            return int(info.frames * 1000 // max(int(info.samplerate), 1))
        return _codecs.decode_wav(blob)["duration_ms"]

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
        blobs = [b if b is not None else b"" for b in col.to_pylist()]
        n_bytes = np.asarray([len(b) for b in blobs], dtype=np.int64)
        duration_ms = n_bytes * 1000 // 16000  # fake: 16 kHz mono 8-bit PCM
        if self.mode != "fake":
            for i, b in enumerate(blobs):
                claimed = self._sf is not None or _codecs.sniff(b) == "wav"
                if self.mode == "strict" or claimed:
                    try:
                        duration_ms[i] = self._decode_real(b)
                    except Exception:
                        if self.mode == "strict":
                            duration_ms[i] = 0  # undecodable, strict → zeroed
                        # auto: keep the fake duration for unclaimed payloads
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


DHASH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("dhash", pa.int64()),
    ]
)


class ImageDHashActor:
    """Actor-pool ``map_batches`` stage: image payload → 64-bit difference
    hash (dHash) — the perceptual fingerprint behind image near-dedup
    (resize survives recompression/scaling; Hamming ≤ 3 ≈ same picture).

    Same tri-state honesty contract as :class:`ImageFeatureActor`:

    * real path (PIL, else builtin stdlib PNG): decode → grayscale →
      box-resample to 9×8 → bit (r·8+c) = 1 iff px[r, c+1] > px[r, c].
    * fake path (what SQL-oracle contract entries pin): the 72 grid
      pixels come straight from the payload hash —
      ``px[i] = md5_number_lower(md5_hex(blob) || ':' || i) % 256`` —
      so DuckDB recomputes every BIT of the hash, making even the fake
      plumbing value-checked end-to-end (the image_meta convention).
    """

    def __init__(
        self,
        media_col: str = "media",
        id_col: str = "doc_id",
        fake: bool | None = None,
    ):
        self.media_col = media_col
        self.id_col = id_col
        self._pil = None
        if fake is not True:
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                pass
        self.mode = "fake" if fake is True else ("strict" if fake is False else "auto")

    @staticmethod
    def _pack_bits(grid: np.ndarray) -> int:
        """(8, 9) grid → 64-bit dHash as SIGNED int64 (uint64 bit view)."""
        left = grid[:, :-1]
        right = grid[:, 1:]
        bits = (right > left).astype(np.uint64).reshape(-1)  # r*8 + c order
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        return int((bits * weights).sum(dtype=np.uint64).astype(np.int64))

    def _dhash_real(self, blob: bytes) -> tuple[int, str]:
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(blob)).convert("L")
            # BOX resample to match the builtin box_thumbnail path — the
            # default (BICUBIC) would make the hash depend on whether PIL
            # is installed
            box = getattr(
                getattr(self._pil, "Resampling", self._pil), "BOX", None
            )
            grid = np.asarray(
                img.resize((9, 8), box) if box is not None
                else img.resize((9, 8)),
                dtype=np.float64,
            )
            return self._pack_bits(grid), "image/decoded"
        px = _codecs.decode_png(blob)
        grid = _codecs.box_thumbnail(_codecs.png_luma(px), 8, 9)
        return self._pack_bits(grid.astype(np.float64)), "image/png"

    def _dhash_fake(self, blob: bytes) -> int:
        hx = hashlib.md5(blob).hexdigest()
        px = np.asarray(
            [
                int.from_bytes(
                    hashlib.md5(f"{hx}:{i}".encode()).digest()[8:16], "little"
                )
                % 256
                for i in range(72)
            ],
            dtype=np.int64,
        ).reshape(8, 9)
        return self._pack_bits(px)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.media_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_id, out_mt, out_h = [], [], []
        for i, blob in zip(ids, blobs):
            blob = blob or b""
            try_real = self.mode == "strict" or (
                self.mode == "auto"
                and (self._pil is not None or blob.startswith(_codecs.PNG_MAGIC))
            )
            if try_real:
                try:
                    h, mt = self._dhash_real(blob)
                except Exception:
                    if self.mode == "strict":
                        h, mt = 0, "image/error"
                    else:
                        try_real = False
            if not try_real:
                h, mt = self._dhash_fake(blob), "image/fake"
            out_id.append(i)
            out_mt.append(mt)
            out_h.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "media_type": pa.array(out_mt, pa.string()),
                "dhash": pa.array(out_h, pa.int64()),
            },
            schema=DHASH_SCHEMA,
        )


def image_dhash(
    ds,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int = 2,
    fake: bool | None = None,
):
    """Actor-pool dHash over a binary media column (see
    :class:`ImageDHashActor`)."""
    return ds.map_batches(
        ImageDHashActor,
        fn_constructor_kwargs={
            "media_col": media_col,
            "id_col": id_col,
            "fake": fake,
        },
        batch_size=32,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def image_dup_pairs(
    ds,
    max_hamming: int = 3,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int = 2,
    fake: bool | None = None,
    max_bucket_size: int = 512,
):
    """Image near-duplicate pairs: dHash per image (actor pool), then the
    shared pigeonhole Hamming engine (:func:`ops.dedup.hash_dup_pairs` —
    the SimHash machinery, reused verbatim for perceptual hashes). Returns
    ``(id_a, id_b, hamming)`` with Hamming ≤ ``max_hamming``."""
    from .dedup import hash_dup_pairs

    hashed = image_dhash(ds, media_col, id_col, concurrency, fake).drop_columns(
        ["media_type"]
    )
    # the actor's output schema names the id "doc_id" regardless of the
    # input id_col — address the NORMALIZED column, not the caller's name
    return hash_dup_pairs(
        hashed, "dhash", "doc_id", max_hamming, max_bucket_size
    )


FINGERPRINT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("fingerprint", pa.int64()),
    ]
)


class AudioFingerprintActor:
    """Actor-pool ``map_batches`` stage: audio payload → 64-bit energy-
    contour fingerprint (the Shazam-lite shape: a recompression-tolerant
    hash for audio near-dedup; Hamming ≤ 3 ≈ same recording).

    Real path (stdlib ``wave``): PCM samples → 65 equal bins of integer
    energy (Σ sample², exact via a cumsum-difference — empty bins are 0)
    → bit ``i`` = 1 iff ``E[i+1] > E[i]``. Fake path (what the SQL-oracle
    contract pins): the 65 window energies come straight from the payload
    hash — ``e[i] = md5_number_lower(md5_hex(blob) || ':' || i) % 2³²`` —
    so DuckDB recomputes every bit (the :class:`ImageDHashActor`
    convention). Tri-state ``fake`` dispatch as everywhere in this module.
    """

    def __init__(
        self,
        media_col: str = "media",
        id_col: str = "doc_id",
        fake: bool | None = None,
    ):
        self.media_col = media_col
        self.id_col = id_col
        self.mode = "fake" if fake is True else ("strict" if fake is False else "auto")

    @staticmethod
    def _pack(e: np.ndarray) -> int:
        bits = (e[1:] > e[:-1]).astype(np.uint64)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        return int((bits * weights).sum(dtype=np.uint64).astype(np.int64))

    def _fp_real(self, blob: bytes) -> tuple[int, str]:
        samples, _fr = _codecs.wav_samples(blob)
        n = len(samples)
        if n == 0:
            return 0, "audio/wav"
        sq = samples.astype(np.int64) ** 2
        cs = np.concatenate([[0], np.cumsum(sq)])
        edges = (np.arange(66, dtype=np.int64) * n) // 65
        e = cs[edges[1:]] - cs[edges[:-1]]
        return self._pack(e), "audio/wav"

    def _fp_fake(self, blob: bytes) -> int:
        hx = hashlib.md5(blob).hexdigest()
        e = np.asarray(
            [
                int.from_bytes(
                    hashlib.md5(f"{hx}:{i}".encode()).digest()[8:16], "little"
                )
                % (1 << 32)
                for i in range(65)
            ],
            dtype=np.int64,
        )
        return self._pack(e)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.media_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_id, out_mt, out_h = [], [], []
        for i, blob in zip(ids, blobs):
            blob = blob or b""
            try_real = self.mode == "strict" or (
                self.mode == "auto" and _codecs.sniff(blob) == "wav"
            )
            if try_real:
                try:
                    h, mt = self._fp_real(blob)
                except Exception:
                    if self.mode == "strict":
                        h, mt = 0, "audio/error"
                    else:
                        try_real = False
            if not try_real:
                h, mt = self._fp_fake(blob), "audio/fake"
            out_id.append(i)
            out_mt.append(mt)
            out_h.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "media_type": pa.array(out_mt, pa.string()),
                "fingerprint": pa.array(out_h, pa.int64()),
            },
            schema=FINGERPRINT_SCHEMA,
        )


def audio_fingerprint(
    ds,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int = 2,
    fake: bool | None = None,
):
    """Actor-pool audio fingerprint (see :class:`AudioFingerprintActor`)."""
    return ds.map_batches(
        AudioFingerprintActor,
        fn_constructor_kwargs={
            "media_col": media_col,
            "id_col": id_col,
            "fake": fake,
        },
        batch_size=32,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def audio_dup_pairs(
    ds,
    max_hamming: int = 3,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int = 2,
    fake: bool | None = None,
    max_bucket_size: int = 512,
):
    """Audio near-duplicate pairs: fingerprint per payload (actor pool) →
    the shared pigeonhole Hamming engine (:func:`ops.dedup.hash_dup_pairs`).
    Returns ``(id_a, id_b, hamming)``."""
    from .dedup import hash_dup_pairs

    hashed = audio_fingerprint(
        ds, media_col, id_col, concurrency, fake
    ).drop_columns(["media_type"])
    # actor output id column is always "doc_id" (see image_dup_pairs)
    return hash_dup_pairs(
        hashed, "fingerprint", "doc_id", max_hamming, max_bucket_size
    )


def image_dedup_corpus(
    ds,
    max_hamming: int = 3,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int = 2,
    fake: bool | None = None,
    num_partitions: int | None = None,
):
    """End-to-end image near-dedup: dHash pairs → connected components →
    anti-join, keeping one representative (the min id) per perceptual
    cluster — the visual sibling of ``dedup_corpus_ds`` for a crawl's
    image payloads. Composition of :func:`image_dup_pairs` and
    ``ops.dedup.dedup_corpus_ds`` (label propagation + anti-join; size-
    gated to a driver union-find below the broadcast threshold). Returns
    the surviving rows of ``ds``."""
    from .dedup import dedup_corpus_ds

    pairs = image_dup_pairs(
        ds, max_hamming, media_col, id_col, concurrency, fake
    )
    return dedup_corpus_ds(ds, pairs, id_col, num_partitions)
