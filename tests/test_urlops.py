"""URL op semantics vs the reference (extractor.py:17-70)."""
from deepwebharvester_ray import urlops

VALID = "http://" + "a" * 56 + ".onion/page"
VALID_ROOT = "http://" + "b2" * 28 + ".onion"


def test_valid_onion():
    assert urlops.is_valid_onion_url(VALID)
    assert urlops.is_valid_onion_url(VALID_ROOT + "/")
    assert urlops.is_valid_onion_url("HTTPS://" + "A" * 56 + ".ONION/")


def test_invalid_onion():
    assert not urlops.is_valid_onion_url("http://example.com")
    assert not urlops.is_valid_onion_url("http://" + "a" * 16 + ".onion/")  # v2
    assert not urlops.is_valid_onion_url("ftp://" + "a" * 56 + ".onion/")
    assert not urlops.is_valid_onion_url("a" * 56 + ".onion")  # no scheme
    assert not urlops.is_valid_onion_url("http://" + "a" * 56 + ".onionx/")
    # base32 alphabet excludes 0,1,8,9
    assert not urlops.is_valid_onion_url("http://" + "a" * 55 + "1.onion/")


def test_valid_root_no_slash():
    # regex requires (/|$) after .onion
    assert urlops.is_valid_onion_url(VALID_ROOT)


def test_canonicalize():
    c = urlops.canonicalize_url
    host = "a" * 56 + ".onion"
    # lowercase scheme+host
    assert c(f"HTTP://{host.upper()}/Page") == f"http://{host}/Page"
    # trailing slash stripped on non-root
    assert c(f"http://{host}/p/") == f"http://{host}/p"
    # root path kept as /
    assert c(f"http://{host}") == f"http://{host}/"
    assert c(f"http://{host}/") == f"http://{host}/"
    # fragment dropped
    assert c(f"http://{host}/p#frag") == f"http://{host}/p"
    # query sorted, empties dropped
    assert c(f"http://{host}/p?b=2&a=1&c=") == f"http://{host}/p?a=1&b=2"


def test_blacklist():
    bl = urlops.normalize_blacklist(["/login", "/Register/"])
    host = "http://" + "a" * 56 + ".onion"
    assert urlops.is_blacklisted(f"{host}/login", bl)
    assert urlops.is_blacklisted(f"{host}/LOGIN/", bl)
    assert urlops.is_blacklisted(f"{host}/register", bl)
    assert urlops.is_blacklisted(f"{host}/x/login", bl)  # endswith semantics
    assert not urlops.is_blacklisted(f"{host}/loginx", bl)
    assert not urlops.is_blacklisted(f"{host}/page", bl)


def test_base_domain_and_host():
    url = "http://" + "a" * 56 + ".onion/deep/path?q=1"
    assert urlops.get_base_domain(url) == "http://" + "a" * 56 + ".onion"
    assert urlops.get_host(url) == "a" * 56 + ".onion"


def test_url_hash_stable():
    h1 = urlops.url_hash64(VALID)
    h2 = urlops.url_hash64(VALID)
    assert h1 == h2
    assert h1 != urlops.url_hash64(VALID + "x")
    import numpy as np

    arr = urlops.batch_url_hash64([VALID, VALID + "x"])
    assert arr.dtype == np.uint64
    assert int(arr[0]) == h1


def test_normalize_url_rfc3986():
    """Spec normalization: unreserved triplets decode, retained hex
    uppercases, dot segments collapse (incl. root-climb clamp and the
    directory-slash preservation), default ports drop, malformed %
    left alone."""
    from deepwebharvester_ray.urlops import normalize_url_rfc3986 as f

    assert f("HTTP://Ex.COM:80/a/./b/../b/%7ex?q=%2f") \
        == "http://ex.com/a/b/~x?q=%2F"
    assert f("https://h:443/x") == "https://h/x"
    assert f("https://h:8443/x") == "https://h:8443/x"  # non-default kept
    assert f("http://h/../../a") == "http://h/a"
    assert f("http://h/a/b/.") == "http://h/a/b/"
    assert f("http://h/a/b/..") == "http://h/a/"
    assert f("http://h") == "http://h/"
    assert f("http://h/%41%5a%61") == "http://h/AZa"   # unreserved decode
    assert f("http://h/%2fup") == "http://h/%2Fup"     # reserved stays
    assert f("http://h/100%") == "http://h/100%"       # malformed % kept
    assert f("http://h/a%2") == "http://h/a%2"
    assert f("http://h/a#frag") == "http://h/a"        # fragment dropped
