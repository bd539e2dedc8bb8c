"""WARC ingest parsing and χ² token-label association."""

import numpy as np
import pyarrow as pa


def test_warc_roundtrip_adversarial_bodies(ray_session):
    import ray.data

    from infidex_ray.ops.warc import build_warc_record, warc_extract

    # bodies that defeat pattern-splitting parsers: embedded WARC version
    # lines, header-like lines, blank CRLF runs, multi-byte UTF-8
    bodies = [
        "plain",
        "WARC/1.0\r\nWARC-Type: response\r\n\r\nfake inner record",
        "Content-Length: 9999\r\n\r\n\r\n\r\n",
        "héllo wörld — ünïcode ☃ 日本語",
        "",
        "HTTP/1.1 404 Not Found\r\n\r\nnested http",
    ]
    blob = b"".join(
        build_warc_record(f"http://x/{i}", "2024-01-01T00:00:00Z", b.encode("utf-8"))
        for i, b in enumerate(bodies)
    )
    ds = ray.data.from_arrow(pa.table({"payload": pa.array([blob], pa.binary())}))
    out = warc_extract(ds).to_pandas().sort_values("uri").reset_index(drop=True)
    assert len(out) == len(bodies)
    assert out["body_text"].tolist() == bodies
    assert (out["status"] == 200).all()
    assert out["n_body_bytes"].tolist() == [
        len(b.encode("utf-8")) for b in bodies
    ]


def test_warc_non_http_record_and_nulls(ray_session):
    import ray.data

    from infidex_ray.ops.warc import parse_warc_records, warc_extract

    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 12\r\n\r\n"
        b"robots: none"
        b"\r\n\r\n"
    )
    recs = parse_warc_records(raw)
    assert len(recs) == 1
    assert recs[0]["warc_type"] == "warcinfo"
    assert recs[0]["status"] == -1
    assert recs[0]["body"] == b"robots: none"
    ds = ray.data.from_arrow(
        pa.table({"payload": pa.array([raw, None], pa.binary())})
    )
    out = warc_extract(ds).to_pandas()
    assert len(out) == 1 and out.iloc[0]["warc_type"] == "warcinfo"


def test_token_label_chi2_hand_counts(ray_session):
    import ray.data

    from infidex_ray.ops.vectorize import token_label_chi2

    # 4 docs: "hot" in both en docs only -> perfect association (chi2 = N);
    # "the" in all docs -> zero other-column -> NULL; "cold" in 1 of each.
    tbl = pa.table(
        {
            "text": pa.array(
                [
                    "the hot cold",
                    "the hot",
                    "the cold",
                    "the",
                ]
            ),
            "lang": pa.array(["en", "en", "de", None]),
        }
    )
    out = (
        token_label_chi2(
            ray.data.from_arrow(tbl).repartition(2), min_df=1
        )
        .to_pandas()
        .set_index("token")
    )
    assert out.loc["hot", "a"] == 2 and out.loc["hot", "df"] == 2
    assert out.loc["hot", "chi2"] == 4.0  # perfect 2x2 association: chi2 = N
    assert np.isnan(out.loc["the", "chi2"])  # in every doc -> NULL
    assert out.loc["cold", "a"] == 1 and out.loc["cold", "df"] == 2
