"""Sitemap protocol source/sink: parse variants (namespaced, bare,
gzip, index fan-out), robots.txt discovery, deterministic publishing,
spec-cap enforcement, and round-trip."""
from __future__ import annotations

import gzip
import json

import pyarrow as pa
import pytest

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_parse_urlset_variants():
    from deepwebharvester_ray.sitemap import parse_sitemap_xml

    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
    <urlset {NS}>
      <url><loc>http://a.example/1</loc>
           <lastmod>2024-03-05</lastmod>
           <changefreq>Daily</changefreq><priority>0.8</priority></url>
      <url><loc>http://a.example/2</loc>
           <lastmod>2024-03-05T06:07:08Z</lastmod></url>
      <url><loc>http://a.example/3</loc>
           <lastmod>not-a-date</lastmod><priority>bogus</priority></url>
    </urlset>"""
    kind, entries = parse_sitemap_xml(xml.encode())
    assert kind == "urlset" and len(entries) == 3
    assert entries[0] == ("http://a.example/1", 1709596800000000,
                          "daily", 800000)
    assert entries[1][1] == 1709618828000000
    assert entries[2] == ("http://a.example/3", -1, "", -1)

    # no namespace at all (seen in the wild) + gzip
    bare = b"<urlset><url><loc>http://b.example/</loc></url></urlset>"
    kind, entries = parse_sitemap_xml(gzip.compress(bare))
    assert kind == "urlset" and entries == [("http://b.example/", -1,
                                             "", -1)]
    with pytest.raises(ValueError):
        parse_sitemap_xml(b"<html></html>")


def test_robots_sitemap_discovery():
    from deepwebharvester_ray.sitemap import sitemap_urls_from_robots

    txt = ("User-agent: *\nDisallow: /private\n"
           "Sitemap: http://x.example/sitemap_index.xml\n"
           "sitemap:http://x.example/extra.xml  # comment\n")
    assert sitemap_urls_from_robots(txt) == [
        "http://x.example/sitemap_index.xml",
        "http://x.example/extra.xml"]


def test_write_read_roundtrip_with_index(ray_session, tmp_path):
    import ray

    from deepwebharvester_ray.sitemap import read_sitemaps, write_sitemaps

    n = 150
    t = pa.table({
        "url": pa.array([f"http://h{i % 7}.example/page/{i}"
                         for i in range(n)], pa.string()),
        "lastmod_us": pa.array([1_700_000_000_000_000 + i * 1_000_000
                                for i in range(n)], pa.int64()),
        "changefreq": pa.array(["weekly"] * n, pa.string()),
        "priority_ppm": pa.array([((i % 10) + 1) * 100_000
                                  for i in range(n)], pa.int64()),
    })
    out_a, out_b = tmp_path / "a", tmp_path / "b"
    sa = write_sitemaps(ray.data.from_arrow(t).repartition(5), str(out_a),
                        n_shards=3)
    sb = write_sitemaps(ray.data.from_arrow(t).repartition(2), str(out_b),
                        n_shards=3)
    assert sa["n_urls"] == sb["n_urls"] == n
    assert (json.loads((out_a / "manifest.json").read_text())
            == json.loads((out_b / "manifest.json").read_text()))
    assert (out_a / "sitemap_index.xml").exists()

    # reading the DIRECTORY picks up the index, expands it, and parses
    # each shard once (the index itself contributes no url rows)
    back = read_sitemaps(str(out_a)).to_pandas().sort_values(
        "url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(back) == n
    assert back["url"].tolist() == want["url"].tolist()
    assert back["lastmod_us"].tolist() == want["lastmod_us"].tolist()
    assert back["priority_ppm"].tolist() == want["priority_ppm"].tolist()
    assert (back["changefreq"] == "weekly").all()

    # reading only the index file fans out to the same rows
    via_idx = read_sitemaps(str(out_a / "sitemap_index.xml"))
    assert via_idx.count() == n


def test_spec_cap_asserted(ray_session, tmp_path):
    import ray

    import deepwebharvester_ray.sitemap as sm

    t = pa.table({"url": pa.array(
        [f"http://one.example/{i}" for i in range(30)], pa.string())})
    old = sm.SPEC_MAX_URLS
    sm.SPEC_MAX_URLS = 10  # shrink the cap to make the breach cheap
    try:
        with pytest.raises(Exception):
            sm.write_sitemaps(ray.data.from_arrow(t),
                              str(tmp_path / "cap"), n_shards=1)
    finally:
        sm.SPEC_MAX_URLS = old


def test_sitemap_seeds_feed_frontier_filter(ray_session, tmp_path):
    """Integration: sitemap-sourced URLs run the crawl seed validity
    partition unchanged (source-agnostic seeds)."""
    import ray

    from deepwebharvester_ray.corpus import doc_url
    from deepwebharvester_ray.sitemap import read_sitemaps, write_sitemaps
    from deepwebharvester_ray.urlops import is_valid_onion_url

    urls = [doc_url(i) for i in range(20)] + ["http://bad example/x"]
    t = pa.table({"url": pa.array(urls, pa.string())})
    out = tmp_path / "s"
    write_sitemaps(ray.data.from_arrow(t), str(out), n_shards=2)
    got = read_sitemaps(str(out)).to_pandas()
    valid = [u for u in got["url"] if is_valid_onion_url(u)]
    assert sorted(valid) == sorted(doc_url(i) for i in range(20))
