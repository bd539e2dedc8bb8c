"""Image dHash: bit-pack correctness, real builtin-PNG decode path,
near-dup pair mining through the shared pigeonhole engine."""

import numpy as np
import pyarrow as pa


def test_pack_bits_by_hand():
    from infidex_ray.ops.multimodal import ImageDHashActor

    grid = np.zeros((8, 9), dtype=np.float64)
    grid[0, 1] = 5.0  # bit (r=0, c=0): right > left -> bit 0 set
    grid[7, 8] = 9.0  # bit (r=7, c=7): bit 63 set -> sign bit
    h = ImageDHashActor._pack_bits(grid)
    # bit 0 and bit 63 — int64 view makes the value negative
    assert np.uint64(h & 0xFFFFFFFFFFFFFFFF) == (np.uint64(1) | (np.uint64(1) << np.uint64(63)))
    assert h < 0
    # bit (0,1): grid[0,2](=0) > grid[0,1](=5) is False — only 2 bits set
    assert bin(h & 0xFFFFFFFFFFFFFFFF).count("1") == 2


def _png_of(gray: np.ndarray) -> bytes:
    from infidex_ray.ops import codecs

    return codecs.encode_png(gray.astype(np.uint8))


def test_real_png_dhash_near_dup(ray_session):
    import ray.data

    from infidex_ray.ops.multimodal import image_dhash, image_dup_pairs

    rng = np.random.RandomState(3)
    base = (rng.rand(32, 36) * 255).astype(np.uint8)
    # near-dup: tiny brightness jitter; far: independent image
    near = np.clip(base.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    far = (rng.rand(32, 36) * 255).astype(np.uint8)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "media": pa.array(
                [_png_of(base), _png_of(near), _png_of(far)], pa.binary()
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    hashed = image_dhash(ds).to_pandas().set_index("doc_id")
    # builtin codec (no PIL in this env) decodes for real
    assert (hashed["media_type"] == "image/png").all()

    def ham(a, b):
        return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(hashed.loc[1, "dhash"], hashed.loc[2, "dhash"]) <= 3
    assert ham(hashed.loc[1, "dhash"], hashed.loc[3, "dhash"]) > 10

    pairs = image_dup_pairs(ds, max_hamming=3).to_pandas()
    assert list(zip(pairs["id_a"], pairs["id_b"])) == [(1, 2)]


def test_fake_dhash_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from infidex_ray.ops.multimodal import image_dhash

    texts = ["alpha", "beta", "", "alpha"]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "media": pa.array([s.encode() for s in texts], pa.binary()),
        }
    )
    got = (
        image_dhash(ray.data.from_arrow(t), fake=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("d", pa.table({"doc_id": t["doc_id"],
                                "text": pa.array(texts, pa.string())}))
    want = con.execute(
        "WITH b AS (SELECT doc_id, md5(text) AS hx FROM d), "
        "px AS (SELECT doc_id, i, CAST(md5_number_lower(hx || ':' || "
        "CAST(i AS VARCHAR)) % 256 AS BIGINT) AS p FROM b CROSS JOIN "
        "(SELECT unnest(generate_series(0, 71)) AS i)), "
        "bits AS (SELECT a.doc_id, (a.i // 9) * 8 + (a.i % 9) AS bp, "
        "CASE WHEN nb.p > a.p THEN 1 ELSE 0 END AS bit FROM px a JOIN px nb "
        "ON nb.doc_id = a.doc_id AND nb.i = a.i + 1 WHERE a.i % 9 < 8), "
        "s AS (SELECT doc_id, sum(CASE WHEN bit = 1 THEN CAST(1 AS HUGEINT) "
        "<< bp ELSE CAST(0 AS HUGEINT) END) AS u FROM bits GROUP BY doc_id) "
        "SELECT doc_id, CAST(CASE WHEN u >= CAST('9223372036854775808' AS "
        "HUGEINT) THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u "
        "END AS BIGINT) AS dhash FROM s ORDER BY doc_id"
    ).df()
    assert got["dhash"].tolist() == want["dhash"].tolist()
    # identical payloads -> identical hashes
    assert got.loc[0, "dhash"] == got.loc[3, "dhash"]


def test_image_dedup_corpus_real_path(ray_session):
    import ray.data

    from infidex_ray.ops.multimodal import image_dedup_corpus

    rng = np.random.RandomState(11)
    imgs = []
    for g in range(4):  # 4 clusters of 2 near-identical images
        base = (rng.rand(24, 27) * 255).astype(np.uint8)
        near = np.clip(base.astype(np.int16) + 1, 0, 255).astype(np.uint8)
        imgs += [base, near]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "media": pa.array([_png_of(x) for x in imgs], pa.binary()),
        }
    )
    kept = image_dedup_corpus(
        ray.data.from_arrow(t), max_hamming=3
    ).to_pandas()
    # one representative (the min id) per cluster
    assert sorted(kept["doc_id"].tolist()) == [0, 2, 4, 6]
