"""Audio fingerprint: real stdlib-WAV decode path + near-dup mining."""

import numpy as np
import pyarrow as pa


def _wav_of(samples: np.ndarray) -> bytes:
    from infidex_ray.ops import codecs

    return codecs.encode_wav(samples.astype(np.int16))


def test_real_wav_fingerprint_near_dup(ray_session):
    import ray.data

    from infidex_ray.ops.multimodal import audio_dup_pairs, audio_fingerprint

    rng = np.random.RandomState(5)
    t_ax = np.arange(16000)
    # amplitude-modulated tone: strong energy contour
    base = (
        8000
        * np.sin(t_ax * 0.05)
        * (0.2 + 0.8 * np.abs(np.sin(t_ax * 0.0007)))
    ).astype(np.int16)
    near = np.clip(base.astype(np.int32) + rng.randint(-8, 9, len(base)),
                   -32768, 32767).astype(np.int16)  # tiny noise
    far = (8000 * np.sin(t_ax * 0.013) *
           (0.2 + 0.8 * np.abs(np.cos(t_ax * 0.0003)))).astype(np.int16)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "media": pa.array(
                [_wav_of(base), _wav_of(near), _wav_of(far)], pa.binary()
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    fp = audio_fingerprint(ds).to_pandas().set_index("doc_id")
    assert (fp["media_type"] == "audio/wav").all()

    def ham(a, b):
        return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(fp.loc[1, "fingerprint"], fp.loc[2, "fingerprint"]) <= 3
    assert ham(fp.loc[1, "fingerprint"], fp.loc[3, "fingerprint"]) > 10
    pairs = audio_dup_pairs(ds, max_hamming=3).to_pandas()
    assert list(zip(pairs["id_a"], pairs["id_b"])) == [(1, 2)]


def test_fingerprint_empty_and_fake_determinism(ray_session):
    import ray.data

    from infidex_ray.ops.multimodal import audio_fingerprint

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "media": pa.array([b"", b"same", b"same"], pa.binary()),
        }
    )
    got = (
        audio_fingerprint(ray.data.from_arrow(t), fake=True)
        .to_pandas()
        .set_index("doc_id")
    )
    assert (got["media_type"] == "audio/fake").all()
    assert got.loc[2, "fingerprint"] == got.loc[3, "fingerprint"]
    assert got.loc[1, "fingerprint"] != got.loc[2, "fingerprint"]
    # empty WAV (real path): zero samples -> fingerprint 0
    from infidex_ray.ops import codecs

    t2 = pa.table(
        {
            "doc_id": pa.array([9], pa.int64()),
            "media": pa.array(
                [codecs.encode_wav(np.zeros(0, dtype=np.int16))], pa.binary()
            ),
        }
    )
    got2 = audio_fingerprint(ray.data.from_arrow(t2)).to_pandas()
    assert got2["fingerprint"].tolist() == [0]
    assert got2["media_type"].tolist() == ["audio/wav"]
