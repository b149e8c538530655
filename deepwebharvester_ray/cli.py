"""Command-line entry point (reference cli.py:183-361 parity).

The reference CLI wires: parse args → merge config → verify connection →
crawl → intelligence → persist to all sinks → HTML report → summary
print.  This CLI does the same with the live Tor network replaced by a
``--corpus`` Parquet directory of pages (BASELINE.json input_hint)::

    python -m deepwebharvester_ray \
        --corpus /tmp/dwh_corpus/sf0.001_x1_v2 \
        --url http://<56-char-v3>.onion/d/0 --url ... \
        --output-dir /tmp/out --max-depth 2 --max-pages 20 --report

Exit codes mirror the reference (cli.py:108-152): 0 success, 2 bad
arguments / no valid seeds, 1 runtime failure.
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path
from typing import List, Optional

from .config import CrawlSettings, load_settings

logger = logging.getLogger(__name__)


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="deepwebharvester-ray",
        description="Ray-Data-native crawl→extract→intelligence engine "
        "over a Parquet page corpus",
    )
    p.add_argument("--corpus", required=True,
                   help="Parquet corpus directory (the simulated network)")
    p.add_argument("--url", action="append", default=[],
                   help="seed URL (repeatable)")
    p.add_argument("--config", help="YAML config file (crawler: section)")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--max-depth", type=int)
    p.add_argument("--max-pages", type=int)
    p.add_argument("--delay", type=float, help="crawl delay (virtual s)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the run dir's checkpoint manifest")
    p.add_argument("--run-dir", help="checkpoint/run directory "
                   "(default <output-dir>/run)")
    p.add_argument("--no-json", action="store_true")
    p.add_argument("--no-csv", action="store_true")
    p.add_argument("--no-sqlite", action="store_true")
    p.add_argument("--report", action="store_true", help="write HTML report")
    p.add_argument("--intel", action="store_true", default=True,
                   help="run IOC/threat intelligence (default on)")
    p.add_argument("--verbose", "-v", action="store_true")
    return p


def _print_summary(run, out) -> None:
    """Reference cli.py:54-81 summary block."""
    s = run.stats
    lines = [
        "=" * 60,
        "CRAWL SUMMARY",
        "=" * 60,
        f"  Sites (seeds):       {s['sites_crawled']}",
        f"  Pages crawled:       {s['pages_crawled']}",
        f"  Pages failed:        {s['pages_failed']}",
        f"  Pages skipped:       {s['pages_skipped']}",
        f"  Pages deduplicated:  {s['pages_deduplicated']}",
        f"  Generations:         {s['generations']}",
    ]
    for fmt, path in out.items():
        lines.append(f"  {fmt.upper():<6} output:       {path}")
    lines.append("=" * 60)
    print("\n".join(lines))


def main(argv: Optional[List[str]] = None) -> int:
    args = _build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    if not Path(args.corpus).exists():
        print(f"error: corpus directory not found: {args.corpus}", file=sys.stderr)
        return 2

    overrides = {}
    if args.max_depth is not None:
        overrides["max_depth"] = args.max_depth
    if args.max_pages is not None:
        overrides["max_pages"] = args.max_pages
    if args.delay is not None:
        overrides["crawl_delay"] = args.delay
    cfg: CrawlSettings = load_settings(args.config, **overrides)

    seeds = list(args.url)
    if not seeds:
        print("error: at least one --url seed is required", file=sys.stderr)
        return 2

    from .urlops import is_valid_onion_url

    if not any(is_valid_onion_url(u) for u in seeds):
        print("error: no valid v3 .onion seed URLs", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", log_to_driver=args.verbose)

    from . import report as report_mod
    from . import sinks
    from .pipelines.crawl import run_crawl

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    run_dir = args.run_dir or str(out_dir / "run")

    try:
        run = run_crawl(
            args.corpus, seeds, cfg=cfg, run_dir=run_dir,
            resume=args.resume, with_intel=args.intel,
        )
    except KeyboardInterrupt:
        # reference cli.py:294-295: partial results still persist — the
        # checkpoint manifest holds every complete generation
        print("interrupted — checkpoint retained; re-run with --resume",
              file=sys.stderr)
        return 1
    except Exception as exc:  # noqa: BLE001
        logger.error("crawl failed: %s", exc)
        return 1

    results = run.results_table()
    out = sinks.save_all(
        results, str(out_dir),
        json_output=not args.no_json,
        csv_output=not args.no_csv,
        sqlite_output=not args.no_sqlite,
    )
    if args.report:
        out["report"] = report_mod.generate(run.results_dataset(), str(out_dir))

    _print_summary(run, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
