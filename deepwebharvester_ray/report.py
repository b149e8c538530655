"""Aggregates + HTML report over crawl results (reference report.py).

All wide work is expressed as Ray Data aggregates over the results
Dataset; only the final small aggregate tables are pulled to the driver
for rendering (reference renders from full in-memory lists,
report.py:266-300 — here the report is a driver-side projection of
distributed groupbys, SURVEY §2.5 A1-A8).

The reference's matplotlib/networkx 3D graph PNG (visualizer.py) is
reimplemented dependency-free (SURVEY §2.1 S12): deterministic
hub-and-spoke layout + numpy canvas + a stdlib zlib PNG encoder — see
:func:`save_graph_png`.
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

    # the stats below consume the dataset ~7 times (count, aggregate,
    # two groupbys, sort+limit, map_batches, per-site rollup) — pin ONE
    # execution of the upstream pipeline instead of re-running the full
    # read/extract/intel chain per consumer
    ds = ds.materialize()

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


# ── crawl-graph PNG sink (reference visualizer.py:146-280) ──────────────────
#
# The reference renders a site-hub → page graph with networkx spring
# layout + matplotlib 3D.  Neither library exists in this environment, so
# the sink is DEPENDENCY-FREE: a deterministic hub-and-spoke layout (site
# hubs on a ring, pages on sub-rings around their hub — the reference's
# own sphere fallback, visualizer.py:268-280, projected to 2D), edges and
# discs drawn on a numpy RGB canvas, encoded with the stdlib-only PNG
# writer below (public PNG spec: IHDR/IDAT/IEND, filter 0, zlib).

_RISK_RGB = {
    "critical": (220, 53, 69),
    "high": (253, 126, 20),
    "medium": (255, 193, 7),
    "low": (40, 167, 69),
    "unknown": (134, 142, 150),
}
_GRAPH_PAGE_CAP = 500  # display cap, reference visualizer caps similarly


def _write_png(rgb, path: Path) -> None:
    """Encode an (H, W, 3) uint8 array as a PNG file — stdlib only."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = rgb.shape
    # one 0x00 filter byte per scanline, prepended vectorized
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = rgb.reshape(h, w * 3)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    path.write_bytes(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def _draw_line(canvas, x0, y0, x1, y1, color) -> None:
    import numpy as np

    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    h, w, _ = canvas.shape
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    canvas[ys[ok], xs[ok]] = color


def _draw_disc(canvas, cx, cy, r, color) -> None:
    import numpy as np

    h, w, _ = canvas.shape
    y0, y1 = max(0, cy - r), min(h, cy + r + 1)
    x0, x1 = max(0, cx - r), min(w, cx + r + 1)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    canvas[yy[mask], xx[mask]] = color


def save_graph_png(
    ds, output_dir: str, filename: str = "network_graph.png",
    size: int = 800,
) -> Optional[Path]:
    """Render the site→page crawl graph to a PNG (reference
    visualizer.py:146-280, save_png) without matplotlib/networkx.

    The data plane reduces first: only (site, url, depth[, risk_label])
    of the first ``_GRAPH_PAGE_CAP`` pages reach the driver — the sink is
    a bounded driver-side projection like the HTML report."""
    import math

    import numpy as np

    cols = [c for c in ("site", "url", "depth", "risk_label")
            if c in ds.schema().names]
    rows = ds.select_columns(cols).limit(_GRAPH_PAGE_CAP).take_all()

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / filename

    canvas = np.full((size, size, 3), 17, dtype=np.uint8)  # dark bg
    center = size // 2

    sites: Dict[str, List[dict]] = {}
    for r in rows:
        sites.setdefault(r.get("site", "?"), []).append(r)
    site_names = sorted(sites)
    n_sites = max(len(site_names), 1)

    hub_r = 0.55 * center if n_sites > 1 else 0.0
    page_ring = 0.28 * center if n_sites > 1 else 0.8 * center
    edge_col = (70, 70, 90)

    for si, site in enumerate(site_names):
        th = 2 * math.pi * si / n_sites
        hx = int(center + hub_r * math.cos(th))
        hy = int(center + hub_r * math.sin(th))
        pages = sites[site]
        # worst page risk colors the hub (reference _build_graph)
        order = ["unknown", "low", "medium", "high", "critical"]
        worst = max(
            (p.get("risk_label", "unknown") for p in pages),
            key=lambda lbl: order.index(lbl) if lbl in order else 0,
            default="unknown",
        )
        for pi, page in enumerate(pages):
            ph = 2 * math.pi * pi / max(len(pages), 1)
            px = int(hx + page_ring * math.cos(ph) * 0.9)
            py = int(hy + page_ring * math.sin(ph) * 0.9)
            _draw_line(canvas, hx, hy, px, py, edge_col)
            _draw_disc(
                canvas, px, py, 4,
                _RISK_RGB.get(page.get("risk_label", "unknown"),
                              _RISK_RGB["unknown"]),
            )
        _draw_disc(canvas, hx, hy, 9, _RISK_RGB.get(worst,
                                                    _RISK_RGB["unknown"]))

    _write_png(canvas, path)
    return path
