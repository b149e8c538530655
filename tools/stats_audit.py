"""Per-stage Dataset.stats() audit — the measure-don't-guess loop.

Runs one driver query (default: extract_pages, the headline's data
plane), materializes it, and prints Ray Data's own per-operator stats —
wall time, CPU time, blocked-on-input time, rows/bytes per block — so a
stage whose wall is NOT dominated by useful compute shows up
immediately (scheduling-bound stages read as high wall / low CPU; an
under-partitioned sort reads as one giant straggler block).

Usage:
    python tools/stats_audit.py [query_name] [sf_dir]

Every stage-level tuning decision recorded in CLAUDE.md / BASELINE.md
(the ~32 MB/partition read sizing, the shuffle_partitions coalesce
knobs, per-block combiner batching) came out of exactly this loop.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "extract_pages"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    try:
        from deepwebharvester_ray.pipelines.queries import build_queries

        qs = build_queries()
        if name not in qs:
            raise SystemExit(
                f"unknown query {name!r}; one of: {sorted(qs)}")
        res = qs[name](sf_dir)
        if hasattr(res, "materialize"):
            res = res.materialize()
        if hasattr(res, "stats"):
            print(res.stats())
        else:
            print(f"{name} returned {type(res).__name__} (no .stats())")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
