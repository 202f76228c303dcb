"""Scaling-efficiency evidence (north_rule): run bench.py on IDENTICAL
input at two parallelism levels (default local[8] vs local[32] — the
sandbox stand-in for N vs 4N executors) and report throughput at both plus
efficiency = (T_N / T_4N) / 4. Writes BENCH/BASELINE.md.

Usage: python tools/scaling.py [sf_dir] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    lo = run(sf_dir, n_low)
    hi = run(sf_dir, n_high)
    ratio = n_high / n_low
    eff_total = (lo["value"] / hi["value"]) / ratio
    per_q = {}
    for q in lo["queries"]:
        if q in hi["queries"] and hi["queries"][q] > 0:
            per_q[q] = round((lo["queries"][q] / hi["queries"][q]) / ratio, 3)

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    md = os.path.join(ROOT, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write("# BENCH/BASELINE — measured throughput + scaling efficiency\n\n")
        f.write(
            f"Identical input (`{sf_dir}`), identical job, two parallelism "
            f"levels (`local[{n_low}]` vs `local[{n_high}]`) — the sandbox "
            "evidence for the north_rule's N vs 4N executor criterion.\n\n"
        )
        f.write("| metric | local[%d] | local[%d] |\n|---|---|---|\n" % (n_low, n_high))
        f.write(f"| pipeline wall (sec) | {lo['value']} | {hi['value']} |\n")
        f.write(
            f"| throughput (rows/sec) | {lo['throughput_rows_per_sec']} | "
            f"{hi['throughput_rows_per_sec']} |\n"
        )
        f.write(f"| points indexed | {lo['n_points']} | {hi['n_points']} |\n\n")
        f.write(f"**Scaling efficiency (whole pipeline)** = (T{n_low}/T{n_high})/{ratio:g} = **{eff_total:.3f}**\n\n")
        f.write("Per-query efficiency (same formula):\n\n")
        f.write("| query | sec @%d | sec @%d | efficiency |\n|---|---|---|---|\n" % (n_low, n_high))
        for q, e in per_q.items():
            f.write(f"| {q} | {lo['queries'][q]} | {hi['queries'][q]} | {e} |\n")
        f.write(
            "\nNotes: small-scale wall times carry fixed Spark job-submission "
            "overhead that a real 100 TB run amortizes; the parallel-work "
            "stages (index build, covering UDF, query joins) are the "
            "signal.\n"
        )
    print(json.dumps({"eff_total": eff_total, "low": lo, "high": hi}))
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
