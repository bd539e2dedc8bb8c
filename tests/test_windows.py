"""Event-windowing, sampling and heavy-hitter operators."""

import numpy as np
import pytest

US = 1_000_000
HOUR = 3600 * US


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data

    # Two users; user 1 has a session boundary exactly AT the gap (must NOT
    # split — the rule is strictly greater-than) and one clearly past it.
    gap = 1800 * US
    rows = [
        # user 1: events at t0, t0+gap (same session), t0+gap+gap+1us (new)
        {"event_id": 1, "user_id": 1, "ts_us": 0, "value": 1.0},
        {"event_id": 2, "user_id": 1, "ts_us": gap, "value": 2.0},
        {"event_id": 3, "user_id": 1, "ts_us": 2 * gap + 1, "value": 4.0},
        # user 2: single event
        {"event_id": 4, "user_id": 2, "ts_us": 5 * US, "value": 8.0},
        # user 1 again, out of order in the input — sorted inside the group
        {"event_id": 5, "user_id": 1, "ts_us": gap // 2, "value": 16.0},
    ]
    import pyarrow as pa

    tbl = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts_us"] for r in rows], pa.timestamp("us")),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
        }
    )
    return ray.data.from_arrow(tbl)


def test_sessionize_gap_semantics(events_ds):
    from infidex_ray.ops.windows import sessionize

    df = sessionize(events_ds).sort(["user_id", "session_id"]).to_pandas()
    u1 = df[df.user_id == 1].reset_index(drop=True)
    # exactly-at-gap stays in session; past-gap splits -> 2 sessions
    assert list(u1.session_id) == [1, 2]
    assert list(u1.n_events) == [3, 1]
    assert u1.loc[0, "sum_value"] == pytest.approx(19.0)  # 1 + 16 + 2
    assert u1.loc[0, "duration_us"] == 1800 * US
    assert u1.loc[1, "sum_value"] == pytest.approx(4.0)
    u2 = df[df.user_id == 2].reset_index(drop=True)
    assert len(u2) == 1 and u2.loc[0, "n_events"] == 1
    assert u2.loc[0, "session_start_us"] == 5 * US


def test_tumbling_window_matches_naive(events_ds):
    from infidex_ray.ops.windows import tumbling_window

    df = (
        tumbling_window(events_ds, width_s=1800.0, type_col="user_id")
        .sort(["window_start_us", "user_id"])
        .to_pandas()
    )
    # window 0: events 1 (v=1) + 5 (v=16) for user 1, event 4 (v=8) user 2
    w0u1 = df[(df.window_start_us == 0) & (df.user_id == 1)].iloc[0]
    assert w0u1.n_events == 2 and w0u1.sum_value == pytest.approx(17.0)
    w0u2 = df[(df.window_start_us == 0) & (df.user_id == 2)].iloc[0]
    assert w0u2.n_events == 1 and w0u2.sum_value == pytest.approx(8.0)
    # event 2 lands exactly on the 1800s boundary -> second window
    w1 = df[df.window_start_us == 1800 * US].iloc[0]
    assert w1.n_events == 1 and w1.sum_value == pytest.approx(2.0)


def test_sample_split_disjoint_union(ray_session):
    import ray.data
    from infidex_ray.ops.sampling import sample_hash, sample_split

    ds = ray.data.range(1000).map_batches(
        lambda b: {"doc_id": b["id"]}, batch_format="numpy"
    )
    a = sample_split(ds, 0.0, 0.3, key_col="doc_id").to_pandas()
    b = sample_split(ds, 0.3, 1.0, key_col="doc_id").to_pandas()
    assert set(a.doc_id).isdisjoint(set(b.doc_id))
    assert len(a) + len(b) == 1000
    # rate window [0, r) == sample_hash(r)
    h = sample_hash(ds, 0.3, key_col="doc_id").to_pandas()
    assert set(h.doc_id) == set(a.doc_id)
    # deterministic across reruns (as a set — block completion order is
    # not stable under the streaming executor); roughly the requested rate
    h2 = sample_hash(ds, 0.3, key_col="doc_id").to_pandas()
    assert sorted(h.doc_id) == sorted(h2.doc_id)
    assert 0.2 < len(h) / 1000 < 0.4
    # a different salt draws a (almost surely) different sample
    s2 = sample_hash(ds, 0.3, key_col="doc_id", salt="s1").to_pandas()
    assert set(s2.doc_id) != set(h.doc_id)


def test_heavy_hitters_order_and_ties(ray_session):
    import ray.data
    from infidex_ray.ops.textstats import heavy_hitters

    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "b b b A a\tc\nc"},
            {"doc_id": 1, "text": "  a c  "},
        ]
    )
    df = heavy_hitters(docs, k=2).to_pandas()
    # counts: a=3 (A lowercased), b=3, c=3 -> tie broken lexicographically
    assert list(df.token) == ["a", "b"]
    assert list(df.n) == [3, 3]


def test_group_quantiles_matches_numpy(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from infidex_ray.ops.dedup import round_half_up4_arr
    from infidex_ray.ops.textstats import group_quantiles

    rng = np.random.default_rng(7)
    n = 500
    groups = rng.choice(["de", "en", "fr"], size=n)
    vals = rng.integers(0, 10_000, size=n)
    tbl = pa.table(
        {"lang": pa.array(groups), "n_chars": pa.array(vals, pa.int64())}
    )
    # multiple blocks so map_groups must actually co-group across blocks
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = (
        group_quantiles(ds, "lang", "n_chars")
        .sort("lang")
        .to_pandas()
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    for i, (lang, sub) in enumerate(df.groupby("lang")):
        row = got.iloc[i]
        assert row["lang"] == lang and row["n"] == len(sub)
        for q, col in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.9, "q90")]:
            want = round_half_up4_arr(
                np.asarray([np.quantile(sub.n_chars.to_numpy(float), q)])
            )[0]
            assert row[col] == want, (lang, col)


def test_top_k_per_group_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from infidex_ray.ops.sampling import top_k_per_group

    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame(
        {
            "grp": rng.choice(["a", "b", "c", "d"], n),
            # few distinct scores -> rank ties broken by id
            "score": rng.integers(0, 9, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    # many small blocks to exercise the per-block partial top-k phase
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(13)
    got = (
        top_k_per_group(ds, "grp", "score", "id", k=5)
        .sort(["grp", "rank"])
        .to_pandas()
    )
    want = (
        df.sort_values(["grp", "score", "id"], ascending=[True, False, True])
        .groupby("grp")
        .head(5)
        .reset_index(drop=True)
    )
    want["rank"] = want.groupby("grp").cumcount() + 1
    assert got[["grp", "score", "id", "rank"]].values.tolist() == want[
        ["grp", "score", "id", "rank"]
    ].values.tolist()


def test_stratified_sample_per_group_rates(ray_session):
    """Per-stratum keep decisions match the hash reference; default rate
    covers unlisted strata; deterministic across reruns."""
    import pyarrow as pa
    import ray.data
    from infidex_ray.ops.dedup import _md5_u64
    from infidex_ray.ops.sampling import SAMPLE_MOD, stratified_sample

    n = 900
    langs = ["en", "de", "zh"] * (n // 3)
    tbl = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "lang": pa.array(langs)}
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    rates = {"en": 0.25, "zh": 0.75}
    got = stratified_sample(ds, rates, "lang", default_rate=0.0).to_pandas()
    want = {
        i
        for i, l in zip(range(n), langs)
        if _md5_u64(f"s0:{i}") % SAMPLE_MOD
        < int(rates.get(l, 0.0) * SAMPLE_MOD)
    }
    assert set(got.doc_id) == want
    assert (got.lang != "de").all()  # default 0.0 drops unlisted strata
    got2 = stratified_sample(ds, rates, "lang", default_rate=0.0).to_pandas()
    assert sorted(got2.doc_id) == sorted(got.doc_id)


def test_hopping_window(ray_session):
    import datetime as dt

    import ray.data

    from infidex_ray.ops.windows import hopping_window

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        {"ts": base, "event_type": "a", "value": 1.0},
        {"ts": base + dt.timedelta(seconds=950), "event_type": "a", "value": 2.0},
    ]
    out = (
        hopping_window(
            ray.data.from_items(rows), width_s=3600.0, stride_s=900.0
        )
        .to_pandas()
        .sort_values(["window_start_us", "event_type"])
        .reset_index(drop=True)
    )
    base_us = int(base.timestamp() * 1_000_000)
    s = 900 * 1_000_000
    # event 1 covers windows starting base, base-s, base-2s, base-3s;
    # event 2 (at +950s) covers base+s, base, base-s, base-2s
    exp = {
        base_us - 3 * s: (1, 1.0),
        base_us - 2 * s: (2, 3.0),
        base_us - 1 * s: (2, 3.0),
        base_us: (2, 3.0),
        base_us + s: (1, 2.0),
    }
    got = {
        int(r.window_start_us): (int(r.n_events), float(r.sum_value))
        for r in out.itertuples()
    }
    assert got == exp

    import pytest

    with pytest.raises(ValueError):
        hopping_window(ray.data.from_items(rows), width_s=3600.0, stride_s=1000.0)


def test_temperature_mix_rates(ray_session):
    """alpha=0.5 keep-rate is sqrt(n_min/n_stratum); the smallest stratum is
    kept whole (rate 1.0) and the per-row decision matches the md5
    reference exactly."""
    import math

    import pyarrow as pa
    import ray.data
    from infidex_ray.ops.dedup import _md5_u64
    from infidex_ray.ops.sampling import SAMPLE_MOD, temperature_mix

    langs = ["en"] * 800 + ["de"] * 150 + ["zh"] * 50
    n = len(langs)
    tbl = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "lang": pa.array(langs)}
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = temperature_mix(ds, "lang", alpha=0.5).to_pandas()
    counts = {"en": 800, "de": 150, "zh": 50}
    ppm = {
        l: int(math.floor(math.sqrt(50 / c) * SAMPLE_MOD))
        for l, c in counts.items()
    }
    want = {
        i
        for i, l in zip(range(n), langs)
        if _md5_u64(f"temp:{i}") % SAMPLE_MOD < ppm[l]
    }
    assert set(got.doc_id) == want
    # the smallest stratum survives intact (rate exactly 1.0)
    assert (got.lang == "zh").sum() == 50
    # alpha=1 keeps everything
    full = temperature_mix(ds, "lang", alpha=1.0).to_pandas()
    assert len(full) == n


def test_weighted_sample_min_hash(ray_session):
    """Top-k by min-of-w md5 draws matches a brute-force reference; zero
    weights never win; partial top-k across blocks loses nothing."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from infidex_ray.ops.dedup import _md5_u64
    from infidex_ray.ops.sampling import weighted_sample

    n = 400
    w = [(i * 3) % 6 for i in range(n)]  # includes zeros
    tbl = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "w": pa.array(w, pa.int64())}
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    k = 25
    got = weighted_sample(ds, "w", k=k, salt="ws").to_pandas()
    mins = {
        i: min(_md5_u64(f"ws:{i}:{j}") for j in range(wi))
        for i, wi in zip(range(n), w)
        if wi > 0
    }
    ref = sorted(mins.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    assert got.doc_id.tolist() == [i for i, _ in ref]
    assert got["rank"].tolist() == list(range(1, k + 1))
    assert got.draw_mod.tolist() == [m % 10**15 for _, m in ref]
    assert set(got.doc_id).isdisjoint({i for i, wi in zip(range(n), w) if wi == 0})


def test_keep_latest_per_key(ray_session):
    """Latest row per key by (ts, event_id) desc, across blocks; output
    carries every original column with ts normalized to epoch-us int64."""
    import datetime as dt

    import ray.data

    from infidex_ray.ops.windows import keep_latest

    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(200):
        rows.append(
            {
                "event_id": eid,
                "ts": base + dt.timedelta(minutes=(eid * 37) % 97),
                "user_id": eid % 13,
                "event_type": f"t{eid % 3}",
                "value": float(eid),
            }
        )
    # exact tie on ts for user 5: higher event_id must win
    rows.append(
        {"event_id": 999, "ts": rows[5]["ts"], "user_id": 5,
         "event_type": "tie", "value": -1.0}
    )
    ds = ray.data.from_items(rows).repartition(7)
    got = {r["user_id"]: r for r in keep_latest(ds).take_all()}
    assert len(got) == 13
    best = {}
    for r in rows:
        ts_us = int(r["ts"].timestamp() * 1_000_000)
        k = r["user_id"]
        cand = (ts_us, r["event_id"])
        if k not in best or cand > best[k][:2]:
            best[k] = (ts_us, r["event_id"], r["value"])
    for k, (ts_us, eid, val) in best.items():
        assert got[k]["event_id"] == eid
        assert got[k]["ts_us"] == ts_us
        assert got[k]["value"] == val


def test_keep_earliest_per_key(ray_session):
    """First-wins counterpart: min ts per key, exact-tie to SMALLEST id."""
    import datetime as dt

    import ray.data

    from infidex_ray.ops.windows import keep_earliest

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"event_id": 10, "ts": base + dt.timedelta(minutes=5), "user_id": 1},
        {"event_id": 11, "ts": base + dt.timedelta(minutes=1), "user_id": 1},
        {"event_id": 12, "ts": base + dt.timedelta(minutes=1), "user_id": 1},  # tie → 11 wins
        {"event_id": 20, "ts": base, "user_id": 2},
    ]
    got = {r["user_id"]: r["event_id"] for r in keep_earliest(
        ray.data.from_items(rows).repartition(3)).take_all()}
    assert got == {1: 11, 2: 20}
