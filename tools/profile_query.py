"""Per-stage Ray Data profile of one catalog query.

    python tools/profile_query.py <query_name> [sf_dir]

Runs the named `queries()` entry against sf_dir (default
/root/testdata/sf0.01), materializes the result, and prints the dataset's
`stats()` — per-operator wall time, rows in/out, memory, spill — followed
by a one-line summary.  This is the feedback loop the performance
discipline calls for: after an operator works, read its stats until wall
time is dominated by useful compute, not shuffle or scheduling floor.

Owns its Ray session (tools are CLI entry points; library code never
calls ray.init).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 log_to_driver=False)
    try:
        from deepwebharvester_ray.pipelines.queries import build_queries

        qs = build_queries()
        if name not in qs:
            print(f"unknown query {name!r}; {len(qs)} known")
            raise SystemExit(2)
        # warm the worker pool first: the first Dataset execution in a
        # fresh session pays ~3-4 s of startup that would otherwise be
        # misattributed to the profiled query's first stage (CLAUDE.md)
        r0 = qs[name](sf_dir)
        if hasattr(r0, "materialize"):
            r0.materialize()
        t0 = time.monotonic()
        res = qs[name](sf_dir)
        if hasattr(res, "materialize"):
            res = res.materialize()
        wall = time.monotonic() - t0
        if hasattr(res, "stats"):
            print(res.stats())
            n_rows = res.count()
        else:  # pyarrow.Table / DataFrame results have no stats
            n_rows = len(res)
            print("(driver-side result — no Dataset stats)")
        print(f"\n=== {name}: {n_rows} rows in {wall:.2f}s (warm) "
              f"over {sf_dir} ===")
    finally:
        if owns_session:   # never tear down a caller's session
            ray.shutdown()


if __name__ == "__main__":
    main()
