#!/usr/bin/env python3
"""Bench-trust health check over BENCH_DETAIL.json.

Reports the r14-verdict trust metrics: per-entry max/median spread,
median/min inflation, storage_bytes flatness across each pass (the
breadcrumb proving the block-sweep keeps the session from degrading),
and optionally a per-query diff against a previous round's BENCH file.

Usage: python3 tools/bench_health.py [BENCH_DETAIL.json] [prev_BENCH_rN.json]
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    with open(path) as f:
        line = f.read().strip()
    if line.startswith("BENCH_DETAIL "):
        line = line[len("BENCH_DETAIL "):]
    d = json.loads(line)

    stats = d.get("query_stats", {})
    spread5 = {k: v for k, v in stats.items()
               if v["median"] > 0 and v["max"] / v["median"] > 5}
    infl4 = {k: v for k, v in stats.items()
             if v["min"] > 0 and v["median"] / v["min"] > 4}
    total = sum(v["median"] for v in stats.values())
    print(f"entries: {len(stats)}  total(median): {total:.1f} s")
    print(f"max/median > 5x: {len(spread5)}")
    for k, v in sorted(spread5.items(), key=lambda t: -t[1]['max'] / t[1]['median'])[:10]:
        print(f"  {k}: median {v['median']:.2f} max {v['max']:.2f}")
    print(f"median/min > 4x: {len(infl4)}")
    for k, v in sorted(infl4.items(), key=lambda t: -t[1]['median'] / t[1]['min'])[:10]:
        print(f"  {k}: min {v['min']:.2f} median {v['median']:.2f}")

    passes = d.get("query_passes", [])
    if passes and "storage_bytes" in passes[0]:
        bypass = {}
        for r in passes:
            bypass.setdefault(r["pass"], []).append(r["storage_bytes"])
        print("storage_bytes per pass (first / p50 / max / last, MB):")
        for p, vals in sorted(bypass.items()):
            s = sorted(vals)
            print(f"  pass {p}: {vals[0]/1e6:.0f} / {s[len(s)//2]/1e6:.0f} / "
                  f"{max(vals)/1e6:.0f} / {vals[-1]/1e6:.0f}")
        # positional check: late-position walls vs early (the r14 smell)
        for p, _ in sorted(bypass.items()):
            rs = [r for r in passes if r["pass"] == p]
            rs.sort(key=lambda r: r["pos"])
            n = len(rs)
            early = sum(r["wall"] for r in rs[:n // 4])
            late = sum(r["wall"] for r in rs[-(n // 4):])
            print(f"  pass {p}: wall sum first-quartile {early:.1f} s, "
                  f"last-quartile {late:.1f} s")

    # contention attribution (round 16): load_avg rides every query-lane
    # record, io_ms + load_avg every MBps rep — a slow rep under high
    # ambient load / disk-busy indicts the shared box, not the code
    if passes and "load_avg" in passes[0]:
        las = sorted(r["load_avg"] for r in passes)
        print(f"query-lane load_avg: min {las[0]:.1f} / p50 "
              f"{las[len(las)//2]:.1f} / max {las[-1]:.1f}")
    mbps = d.get("mbps_passes", [])
    if mbps:
        worst = sorted((r for r in mbps if r.get("mbps")),
                       key=lambda r: r["mbps"])[:3]
        for r in worst:
            extras = "".join(
                f" {k}={r[k]}" for k in ("load_avg", "io_ms") if k in r)
            print(f"  slowest mbps rep: {r['family']} #{r['rep']} "
                  f"{r['mbps']:.0f} MB/s{extras}")
    if d.get("mbps_note"):
        print(f"mbps_note: {d['mbps_note'][:120]}...")

    slowest = sorted(stats.items(), key=lambda t: -t[1]["median"])[:10]
    print("slowest 10 (median):")
    for k, v in slowest:
        print(f"  {k}: {v['median']:.2f} s (min {v['min']:.2f} max {v['max']:.2f})")

    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            prev = json.load(f)
        pq = prev.get("query_stats") or prev.get("queries", {})
        print(f"diff vs {sys.argv[2]} (median ratio, top 12 regressions):")
        diffs = []
        for k, v in stats.items():
            pv = pq.get(k)
            if pv is None:
                continue
            pmed = pv["median"] if isinstance(pv, dict) else pv
            if pmed and pmed > 0.2:
                diffs.append((v["median"] / pmed, k, pmed, v["median"]))
        for r, k, a, b in sorted(diffs, reverse=True)[:12]:
            print(f"  {k}: {a:.2f} -> {b:.2f} ({r:.1f}x)")
        print("top 12 improvements:")
        for r, k, a, b in sorted(diffs)[:12]:
            print(f"  {k}: {a:.2f} -> {b:.2f} ({r:.1f}x)")


if __name__ == "__main__":
    main()
