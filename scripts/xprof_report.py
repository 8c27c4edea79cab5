#!/usr/bin/env python
"""Offline XProf hot-op report from a jax.profiler trace directory.

Usage: python scripts/xprof_report.py <trace_dir> [top_n]

Finds the .xplane.pb under <trace_dir>, runs the XProf op_profile/hlo_stats
converters offline (no TensorBoard server), and prints the top ops by
self-time -- the table backing README's roofline paragraph.
"""

import glob
import json
import sys


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    xplane = sorted(xplanes)[-1]
    print(f"# {xplane}", flush=True)

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # gviz DataTable: cols are {"id"/"label"/...} dicts, rows are {"c": [...]}.
    tbl = obj[0] if isinstance(obj, list) else obj
    rows = tbl["rows"]
    header = [(c.get("label") or c.get("id") or "") if isinstance(c, dict)
              else str(c) for c in tbl["cols"]]

    def col(*name_frags):
        """First column index whose label contains any fragment (in
        fragment priority order); None-safe -- index 0 is a valid hit."""
        for frag in name_frags:
            for i, h in enumerate(header):
                if frag.lower() in str(h).lower():
                    return i
        return None

    i_cat = col("category")
    i_expr = col("expression", "name")
    i_time = col("total time", "self time", "time (us)")
    i_occ = col("occurrences")
    if i_expr is None or i_time is None:
        sys.exit(f"unrecognized hlo_stats schema: {header}")
    items = []
    for r in rows:
        c = r["c"] if isinstance(r, dict) else r
        vals = [x.get("v") if isinstance(x, dict) else x for x in c]
        try:
            t = float(vals[i_time])
        except (TypeError, ValueError):
            continue
        items.append((t, vals[i_cat] if i_cat is not None else "",
                      (vals[i_occ] if i_occ is not None else ""),
                      str(vals[i_expr])[:110]))
    items.sort(reverse=True)
    total = sum(t for t, *_ in items)
    print(f"{'us_total':>10} {'pct':>6} {'occ':>5}  category / expression")
    for t, cat, occ, expr in items[:top_n]:
        print(f"{t:10.1f} {100 * t / total:5.1f}% {occ!s:>5}  [{cat}] {expr}")
    print(f"total accounted: {total:.1f} us")


if __name__ == "__main__":
    main()
