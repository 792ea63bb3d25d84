#!/usr/bin/env python3
"""Convert `graft.Scaling` stdout into the SCALING.md markdown table.

Usage: scaling_table.py <scaling_stdout_log> [top_n]

Reads the final TSV block (query\t<sfA>_s\t<sfB>_s\tratio\trows...\t
jobs...\ttask_ms...\tload...) and emits a markdown table sorted by
descending ratio, plus contention-attribution flags: an entry whose
wall ratio is >= 2x its task_ms ratio is marked "contention" (wall
inflated while executor work stayed flat — the in-artifact form of the
r17 dedup_cluster attribution).
"""
import sys


def main() -> None:
    log = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    lines = open(log, errors="replace").read().splitlines()
    hdr_i = max(i for i, l in enumerate(lines) if l.startswith("query\t"))
    hdr = lines[hdr_i].split("\t")
    rows = []
    for l in lines[hdr_i + 1:]:
        parts = l.split("\t")
        if len(parts) != len(hdr):
            continue
        rows.append(dict(zip(hdr, parts)))

    def f(v):
        try:
            return float(v)
        except ValueError:
            return float("nan")

    for r in rows:
        r["_ratio"] = f(r[hdr[3]])
        # TSV layout: query, sfA_s, sfB_s, ratio, rows_a, rows_b,
        # jobs_a, jobs_b, task_ms_a, task_ms_b, load_a, load_b —
        # task_ms ratio is hdr[9]/hdr[8] (r18 shipped hdr[8]/hdr[7],
        # i.e. task_ms_sfA/jobs_sfB: garbage; fixed + re-published)
        ta, tb = f(r[hdr[8]]), f(r[hdr[9]])
        # ta == 0 must not suppress the flag: zero->nonzero work is
        # work-driven (ratio inf, never flags), but flat-ZERO work
        # under an inflating wall is the strongest metadata/contention
        # signal of all (ratio 1, flags whenever wall > 3x)
        if ta > 0:
            r["_task_ratio"] = tb / ta
        elif tb > 0:
            r["_task_ratio"] = float("inf")
        else:
            r["_task_ratio"] = 1.0
        wall_r, task_r = r["_ratio"], r["_task_ratio"]
        r["_flag"] = (
            "contention" if task_r == task_r and wall_r >= 2 * task_r and wall_r > 3
            else "")
    rows.sort(key=lambda r: -(r["_ratio"] if r["_ratio"] == r["_ratio"] else -1))
    cols = hdr + ["task_ratio", "flag"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows[:top_n]:
        print("| " + " | ".join(
            [r[h] for h in hdr]
            + [f"{r['_task_ratio']:.2f}", r["_flag"]]) + " |")
    n_cont = sum(1 for r in rows if r["_flag"])
    print(f"\n{len(rows)} entries; {n_cont} flagged contention "
          "(wall ratio >= 2x task_ms ratio and > 3x)")


if __name__ == "__main__":
    main()
