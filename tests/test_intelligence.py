"""IOC + threat semantics vs the reference (intelligence.py:239-337)."""
import json

import pyarrow as pa

from deepwebharvester_ray.intelligence import (
    classify_threat,
    extract_iocs,
    intelligence_batch,
)


def test_ipv4_private_excluded():
    text = "hosts 203.0.113.5 10.0.0.1 192.168.1.1 127.0.0.1 169.254.0.1 8.8.8.8"
    iocs = extract_iocs(text)
    assert iocs["ipv4"] == ["203.0.113.5", "8.8.8.8"]


def test_emails_dedup_sorted():
    text = "b@example.com a@example.com b@example.com user.name+tag@example.co.uk"
    assert extract_iocs(text)["emails"] == [
        "a@example.com",
        "b@example.com",
        "user.name+tag@example.co.uk",
    ]


def test_hashes():
    md5 = "d41d8cd98f00b204e9800998ecf8427e"
    sha1 = "da39a3ee5e6b4b0d3255bfef95601890afd80709"
    sha256 = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    iocs = extract_iocs(f"x {md5} y {sha1} z {sha256}")
    assert iocs["md5"] == [md5]
    assert iocs["sha1"] == [sha1]
    assert iocs["sha256"] == [sha256]


def test_cve_uppercased():
    iocs = extract_iocs("cve-2021-44228 and CVE-2023-44487")
    assert iocs["cves"] == ["CVE-2021-44228", "CVE-2023-44487"]


def test_onion_and_domains():
    onion = "a" * 56 + ".onion"
    iocs = extract_iocs(f"visit {onion} or example.com today")
    assert iocs["onion_addresses"] == [onion]
    assert "example.com" in iocs["domains"]


def test_url_cap_50():
    text = " ".join(f"https://example.com/page{i:03d}" for i in range(60))
    iocs = extract_iocs(text)
    assert len(iocs["urls"]) == 50
    assert iocs["urls"] == sorted(iocs["urls"])


def test_pgp_and_total():
    iocs = extract_iocs("-----BEGIN PGP PUBLIC KEY BLOCK----- a@example.com")
    assert iocs["pgp_present"] is True
    # total excludes pgp flag
    assert iocs["ioc_total"] == len(iocs["emails"]) + len(iocs["domains"])


def test_threat_empty():
    t = classify_threat("completely neutral words here")
    assert t == {
        "categories": [],
        "risk_score": 0.0,
        "risk_label": "Low",
        "keyword_hits": {},
    }


def test_threat_density_formula():
    # 10 words, 1 hit of "malware" → density = min(1/(10/1000),1)=1 → 0.95*10=9.5
    text = "malware w1 w2 w3 w4 w5 w6 w7 w8 w9"
    t = classify_threat(text)
    assert t["risk_score"] == 9.5
    assert t["risk_label"] == "Critical"
    assert t["categories"] == ["Malware & Ransomware"]
    assert t["keyword_hits"] == {"Malware & Ransomware": 1}


def test_threat_low_density():
    # 2000 words, 1 hit → density 0.5 → score 0.5*0.95*10=4.75 → Medium,
    # but categories only keeps score>1.0 → kept
    text = "malware " + "w " * 1999
    t = classify_threat(text)
    assert t["risk_label"] == "Medium"
    assert abs(t["risk_score"] - 4.75) < 1e-9


def test_threat_substring_count_semantics():
    # reference uses str.count → substrings match inside words
    t = classify_threat("buyer " + "w " * 999)  # "buy" matches inside "buyer"
    assert t["keyword_hits"].get("Marketplace") == 1


def test_risk_bounds():
    t = classify_threat("malware ransomware exploit " * 50)
    assert 0.0 <= t["risk_score"] <= 10.0


def test_batch_stage():
    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "text": ["contact a@example.com malware w1 w2", None],
        }
    )
    out = intelligence_batch(batch)
    assert out.column("emails").to_pylist() == [["a@example.com"], []]
    assert out.column("risk_label").to_pylist()[0] == "Critical"
    assert out.column("risk_score").to_pylist()[1] == 0.0
    hits = json.loads(out.column("keyword_hits").to_pylist()[0])
    assert hits["Malware & Ransomware"] == 1
    assert out.column("ioc_total").to_pylist() == [2, 0]  # email + example.com domain
