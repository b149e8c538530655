"""deepwebharvester_ray — a Ray-Data-native rebuild of the
servais1983/deepwebharvester crawl→extract→intelligence engine.

The reference is a thread-pool BFS crawler over live Tor HTTP
(`/root/reference/deepwebharvester/crawler.py`).  This package re-expresses
the same semantics as Ray Data pipelines over Parquet corpora of
Common-Crawl-style pages:

* ``urlops``        — URL validation / canonicalization / hashing (extractor.py:17-70)
* ``extract``       — HTML → title/text/content_hash/links   (extractor.py:95-133)
* ``intelligence``  — IOC regexes + threat scoring           (intelligence.py:239-337)
* ``corpus``        — deterministic synthetic page-corpus generator
* ``oracle``        — single-process reference-semantics BFS oracle (crawler.py:214-273)
* ``state``         — sharded seen-set actors (cuckoo filter) + scheduler
* ``pipelines``     — the generation-loop crawl pipeline + driver queries
* ``functions``     — training-data ops: dedup, ANN, text analysis, multimodal
* ``sinks``         — Parquet (primary) + JSON/CSV/SQLite parity sinks (storage.py)

Nothing in this package calls ``ray.init()``; the caller owns the session.
"""

__version__ = "0.1.0"

import os as _os
from pathlib import Path as _Path

REPO_ROOT = str(_Path(__file__).resolve().parent.parent)


def runtime_env() -> dict:
    """Runtime env ensuring Ray workers can import this package even when
    the driver's cwd / sys.path doesn't include the repo root (the package
    is path-imported, not pip-installed)."""
    existing = _os.environ.get("PYTHONPATH", "")
    path = REPO_ROOT if not existing else f"{REPO_ROOT}:{existing}"
    return {"env_vars": {"PYTHONPATH": path}}
