"""WARC source/sink: round-trip, Common-Crawl gzip convention,
byte-determinism, mixed-record skipping, and source-agnostic pipelining
(extract stage runs over WARC-sourced pages unchanged)."""
from __future__ import annotations

import gzip
import json

import pyarrow as pa
import pytest


def _pages(n: int) -> pa.Table:
    return pa.table({
        "url": pa.array([f"http://h{i % 5}.example/p/{i}" for i in
                         range(n)], pa.string()),
        "warc_ts": pa.array([1_700_000_000_000_000 + i * 1_000_003
                             for i in range(n)], pa.timestamp("us")),
        "html": pa.array([f"<html><title>t{i}</title><body>Paragraph "
                          f"body number {i} — café.</body></html>"
                          .encode() for i in range(n)], pa.binary()),
        "text": pa.array([f"Paragraph body number {i} — café."
                          for i in range(n)], pa.string()),
    })


def test_warc_response_roundtrip_deterministic(ray_session, tmp_path):
    import ray

    from deepwebharvester_ray.warc import read_warc, write_warc

    t = _pages(120)
    out_a, out_b = tmp_path / "a", tmp_path / "b"
    sa = write_warc(ray.data.from_arrow(t).repartition(6), str(out_a),
                    n_shards=4)
    sb = write_warc(ray.data.from_arrow(t).repartition(2), str(out_b),
                    n_shards=4)
    assert sa["n_samples"] == sb["n_samples"] == 120
    man_a = json.loads((out_a / "manifest.json").read_text())
    man_b = json.loads((out_b / "manifest.json").read_text())
    assert man_a == man_b  # byte-identical shards across block layouts

    back = read_warc(str(out_a)).to_pandas().sort_values(
        "url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == want["url"].tolist()
    assert back["warc_ts"].tolist() == want["warc_ts"].tolist()
    assert back["html"].tolist() == want["html"].tolist()
    assert (back["record_type"] == "response").all()
    assert (back["http_status"] == 200).all()


def test_warc_wet_conversion_and_plain(ray_session, tmp_path):
    import ray

    from deepwebharvester_ray.warc import read_warc, write_warc

    t = _pages(60)
    out = tmp_path / "wet"
    s = write_warc(ray.data.from_arrow(t), str(out),
                   record_type="conversion", n_shards=2,
                   gzip_records=False)
    assert s["n_samples"] == 60
    files = sorted(out.glob("shard-*.warc"))
    assert files and all(f.suffix == ".warc" for f in files)
    back = read_warc(str(out)).to_pandas().sort_values(
        "url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert back["text"].tolist() == want["text"].tolist()
    assert (back["record_type"] == "conversion").all()


def test_warc_skips_non_content_records(ray_session, tmp_path):
    """Real Common Crawl shards interleave warcinfo/request/metadata
    records with responses; the parser must skip them (and cope with a
    second-precision WARC-Date)."""
    from deepwebharvester_ray.warc import _parse_records, read_warc

    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"WARC-Date: 2023-11-14T22:13:20Z\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://a.example/\r\n"
           b"WARC-Date: 2023-11-14T22:13:20Z\r\n"
           b"Content-Type: application/http; msgtype=request\r\n"
           b"Content-Length: 18\r\n\r\nGET / HTTP/1.1\r\n\r\n\r\n\r\n")
    body = b"<html>hi</html>"
    http = (b"HTTP/1.1 301 Moved\r\nContent-Length: "
            + str(len(body)).encode() + b"\r\n\r\n" + body)
    resp = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://a.example/\r\n"
            b"WARC-Date: 2023-11-14T22:13:20Z\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode()
            + b"\r\n\r\n" + http + b"\r\n\r\n")
    recs = _parse_records(info + req + resp)
    assert len(recs) == 1
    url, ts_us, rtype, status, html, text = recs[0]
    assert url == "http://a.example/" and rtype == "response"
    assert status == 301 and html == body
    assert ts_us == 1_700_000_000_000_000

    # and through the Dataset reader, as one multi-member gzip shard
    p = tmp_path / "mixed.warc.gz"
    p.write_bytes(gzip.compress(info, mtime=0)
                  + gzip.compress(req, mtime=0)
                  + gzip.compress(resp, mtime=0))
    rows = read_warc(str(p)).take_all()
    assert len(rows) == 1 and rows[0]["http_status"] == 301


def test_warc_feeds_extract_stage(ray_session, tmp_path):
    """Source-agnosticism: WARC-sourced pages run the standard extract
    stage and yield the same titles/text as the in-memory table."""
    import ray

    from deepwebharvester_ray.extract import extract_batch
    from deepwebharvester_ray.warc import read_warc, write_warc

    t = _pages(40)
    out = tmp_path / "w"
    write_warc(ray.data.from_arrow(t), str(out), n_shards=2)

    def to_page(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("url"),
                         "html": batch.column("html")})

    got = (read_warc(str(out))
           .map_batches(to_page, batch_format="pyarrow")
           .map_batches(extract_batch, batch_format="pyarrow")
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(got) == 40
    assert got["title"].str.startswith("t").all()
    assert got["text"].str.contains("Paragraph body number").all()


def test_warc_bad_record_type_raises(ray_session, tmp_path):
    import ray

    from deepwebharvester_ray.warc import write_warc

    with pytest.raises(ValueError):
        write_warc(ray.data.from_arrow(_pages(3)), str(tmp_path / "x"),
                   record_type="metadata")


def test_cdx_index_and_random_access(ray_session, tmp_path):
    """The CDX side of the archive contract: (a) every record indexed
    with its SURT key sorted contiguously per domain, (b) the (offset,
    length) ranges are REAL random-access handles — slicing exactly
    those bytes out of the shard and decompressing one gzip member
    yields the record, with no shard scan, (c) fetch_records resolves
    urls through the index and returns the same rows read_warc would."""
    import ray

    from deepwebharvester_ray.warc import (fetch_records, read_cdx, surt,
                                           write_warc)

    t = _pages(80)
    out = tmp_path / "arch"
    write_warc(ray.data.from_arrow(t), str(out), n_shards=3)

    idx = read_cdx(str(out)).to_pandas()
    assert len(idx) == 80
    assert set(idx["url"]) == set(t.column("url").to_pylist())
    # per-index-file keys are sorted (the binary-search contract)
    for f in sorted(out.glob("shard-*.cdx")):
        keys = [ln.split(" ", 1)[0] for ln in
                f.read_text().splitlines() if ln]
        assert keys == sorted(keys)

    # raw byte-range slice parses standalone (true random access)
    row = idx.sort_values("urlkey").iloc[7]
    blob = (out / row["filename"]).read_bytes()
    import gzip as _gz

    from deepwebharvester_ray.warc import _parse_records

    rec = _parse_records(_gz.decompress(
        blob[row["offset"]:row["offset"] + row["length"]]))
    assert len(rec) == 1 and rec[0][0] == row["url"]

    wanted = [f"http://h{i % 5}.example/p/{i}" for i in (3, 41, 77)]
    got = fetch_records(str(out), wanted).to_pandas().sort_values(
        "url").reset_index(drop=True)
    assert got["url"].tolist() == sorted(wanted)
    want_html = {u: h for u, h in zip(t.column("url").to_pylist(),
                                      t.column("html").to_pylist())}
    assert all(got.loc[i, "html"] == want_html[got.loc[i, "url"]]
               for i in range(3))
    assert (got["http_status"] == 200).all()


def test_surt_keys():
    from deepwebharvester_ray.warc import surt

    assert surt("http://Sub.Example.COM:80/A?b=1") == "com,example,sub)/a?b=1"
    assert surt("https://example.com") == "com,example)/"
    # one domain's pages sort contiguously
    ks = sorted([surt("http://a.example/x"), surt("http://b.other/y"),
                 surt("http://a.example/z")])
    assert ks[0].startswith("example,a)") and ks[1].startswith("example,a)")


def test_warc_revisit_delta_export(ray_session, tmp_path):
    """ISO 28500 §6.7.2 revisit dedup: unchanged pages become
    header-only revisit records (identical-payload-digest profile)
    through BOTH lookup paths; changed pages round-trip their new
    payload; delta CDX preserves the payload digest so a CHAINED delta
    against the delta archive still dedups; the base resolves point
    lookups for unchanged content."""
    import ray

    from deepwebharvester_ray.warc import (fetch_records, read_cdx,
                                           read_warc, write_warc,
                                           write_warc_delta)

    urls = [f"http://site{i % 3}.onion/p{i}" for i in range(10)]
    ts0 = 1_700_000_000_000_000
    base_tbl = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([ts0 + i * 1_000_000 for i in range(10)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([f"<html>body {i}</html>".encode()
                          for i in range(10)], pa.binary()),
    })
    new_html = [(f"<html>CHANGED {i}</html>".encode() if i % 3 == 0
                 else f"<html>body {i}</html>".encode())
                for i in range(10)]
    delta_tbl = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([ts0 + 10 ** 9 + i * 1_000_000
                             for i in range(10)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(new_html, pa.binary()),
    })
    bd, dd, dd2 = (str(tmp_path / d) for d in ("base", "delta", "delta2"))
    write_warc(ray.data.from_arrow(base_tbl).repartition(3), bd,
               n_shards=4)
    for cutoff in (2_000_000, 0):   # broadcast, then forced join path
        info = write_warc_delta(
            ray.data.from_arrow(delta_tbl).repartition(2), dd, bd,
            n_shards=4, broadcast_cutoff=cutoff)
        assert info["n_revisit"] == 6 and info["n_response"] == 4

    rows = read_warc(dd).take_all()
    types = {r["url"]: r["record_type"] for r in rows}
    assert sum(1 for t in types.values() if t == "revisit") == 6
    got = {r["url"]: r["html"] for r in rows
           if r["record_type"] == "response"}
    for i in (0, 3, 6, 9):
        assert got[urls[i]] == new_html[i]

    bidx = {r["url"]: r["digest"] for r in read_cdx(bd).take_all()}
    didx = {r["url"]: (r["digest"], r["rtype"])
            for r in read_cdx(dd).take_all()}
    for i in range(10):
        d, rt = didx[urls[i]]
        if i % 3 == 0:
            assert rt == "response" and d != bidx[urls[i]]
        else:
            assert rt == "revisit" and d == bidx[urls[i]]

    # chained delta: C identical to B → all revisit against the DELTA
    c_tbl = delta_tbl.set_column(
        delta_tbl.schema.get_field_index("warc_ts"), "warc_ts",
        pa.array([ts0 + 2 * 10 ** 9 + i * 1_000_000 for i in range(10)],
                 pa.int64()).cast(pa.timestamp("us")))
    info2 = write_warc_delta(ray.data.from_arrow(c_tbl), dd2, dd,
                             n_shards=4)
    assert info2["n_revisit"] == 10 and info2["n_response"] == 0

    fr = fetch_records(bd, [urls[1]]).take_all()
    assert fr and b"body 1" in fr[0]["html"]


def test_warc_revisit_record_headers(ray_session, tmp_path):
    """The revisit record bytes carry the spec's profile, digest and
    WARC-Refers-To* headers, and its Refers-To id equals the base
    record's uuid5(url) id."""
    import uuid

    from deepwebharvester_ray.warc import (_REVISIT_PROFILE,
                                           _record_bytes)

    rec = _record_bytes("http://a.onion/x", 1_700_000_000_000_000, b"",
                        "revisit", refers_to_url="http://a.onion/x",
                        refers_to_ts_us=1_600_000_000_000_000,
                        payload_digest="ab" * 20)
    assert b"WARC-Type: revisit" in rec
    assert b"WARC-Profile: " + _REVISIT_PROFILE in rec
    assert b"WARC-Payload-Digest: sha1:" + b"ab" * 20 in rec
    rid = uuid.uuid5(uuid.NAMESPACE_URL, "http://a.onion/x")
    assert f"WARC-Refers-To: <urn:uuid:{rid}>".encode() in rec
    assert b"WARC-Refers-To-Date: 2020-09-13" in rec
    assert b"Content-Length: 0" in rec
