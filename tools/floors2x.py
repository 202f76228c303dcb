"""Floors-dominate proof for index_build scaling (r4 verdict #1): run the
index_build stage pair at the standard scaling corpus (650k points) AND at
2x (1.85M points), same session ordering, and compare per-build-stage
N->4N efficiencies. If the sub-0.6 efficiencies at 650k are fixed job
floors (scheduling, sampling passes, manifest/commit, per-job setup) and
not a scale defect, they must RISE as per-stage work grows to amortize
the floors. Logs to BENCH/floors2x.jsonl (NOT runs.jsonl — different
workload, must never merge into the stage-pair minima) and writes
BENCH/FLOORS_2X.md.

Usage: python tools/floors2x.py [reps] [extra_points_2x]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pairstage import run_leg  # returncode-checked bench subprocess

LOG = os.path.join(ROOT, "BENCH", "floors2x.jsonl")
REPORT = os.path.join(ROOT, "BENCH", "FLOORS_2X.md")
SF = "/root/testdata/sf0.1"
BUILD_STAGES = ("covers", "keys", "pairs", "postings")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    extra2x = int(sys.argv[2]) if len(sys.argv) > 2 else 1_700_000
    legs = []
    if os.path.exists(LOG):
        with open(LOG) as f:
            legs = [json.loads(l) for l in f]
    if "--report-only" not in sys.argv:
        for rep in range(reps):
            # interleave scales within a rep so both see the same window;
            # alternate leg order across reps (pairstage discipline)
            for extra, tag in ((500_000, "1x"), (extra2x, "2x")):
                os.environ["SPARK_GRAFT_EXTRA_POINTS"] = str(extra)
                order = (2, 8) if rep % 2 == 0 else (8, 2)
                for cpus in order:
                    t0 = time.time()
                    sec, bs = run_leg(SF, cpus, "index_build")
                    rec = {
                        "tag": tag, "rep": rep, "cpus": cpus, "sec": sec,
                        "extra": extra, "build_stages": bs,
                        "leg_wall": round(time.time() - t0, 1),
                    }
                    legs.append(rec)
                    with open(LOG, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                    print(json.dumps(rec), flush=True)

    def eff(lo, hi):
        return round((lo / hi) / 4, 3)

    lines = [
        "# BENCH/FLOORS_2X — does the index_build scaling gap amortize with corpus size?",
        "",
        "Same stage-paired method as BENCH/BASELINE_STAGE.md, but each rep runs",
        "the index_build pair at TWO corpus sizes back-to-back (1x = the standard",
        f"650k-point scaling config; 2x = {extra2x + 150_000:,} points). If the",
        "per-build-stage efficiencies rise at 2x, the 1x gap is fixed job floors",
        "amortizing, not a parallelism defect in the plan.",
        "",
        "| rep | scale | total @2 | total @8 | eff | " + " | ".join(
            f"{s} eff" for s in BUILD_STAGES) + " |",
        "|---|---|---|---|---|" + "---|" * len(BUILD_STAGES),
    ]
    by = {}
    for r in legs:
        by.setdefault((r["rep"], r["tag"]), {})[r["cpus"]] = r
    for (rep, tag), d in sorted(by.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        if 2 not in d or 8 not in d:
            continue
        lo, hi = d[2], d[8]
        cells = [
            str(rep), tag, f"{lo['sec']:.1f}", f"{hi['sec']:.1f}",
            f"{eff(lo['sec'], hi['sec']):.3f}",
        ]
        for s in BUILD_STAGES:
            a, b = lo["build_stages"].get(s), hi["build_stages"].get(s)
            cells.append(f"{eff(a, b):.3f}" if a and b else "—")
        lines.append("| " + " | ".join(cells) + " |")
    lines.append("")
    with open(REPORT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {REPORT}")


if __name__ == "__main__":
    main()
