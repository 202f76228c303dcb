"""Attribute per-query bench drift (r3 verdict What's-wrong #3): run a
named set of driver-contract queries INTERLEAVED for N reps inside one
local[32] session at sf0.1 and report per-rep times + per-query minima.

The r2->r3 bench deltas in question (ann_cosine_topk 0.96->4.46s,
text_stats 0.24->1.10s, text_tokens_bpe 0.15->0.88s) came from single
bench.py runs, whose per-query times on this shared VM drift far beyond
the code signal (see memory: minhash 6.3-13.3s back-to-back, same config).
Interleaved minima are the only comparable number; dedup_simhash rides
along as a heavier control.

Usage: python tools/attrib.py [reps] [query ...]
Prints one JSON line: {"queries": {name: {"reps": [...], "min": ...}},
"sf": ..., "cpus": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT = ["ann_cosine_topk", "text_stats", "text_tokens_bpe", "dedup_simhash"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from rgm import benchqueries as bq
    from rgm.session import get_spark

    spark = get_spark(app_name="rgm-attrib", cpus=cpus)
    out = {n: [] for n in names}
    # one warmup pass (JVM/codegen/Arrow init) so rep 0 is comparable
    for n in names:
        bq.QUERIES[n](spark, sf_dir).count()
    for rep in range(reps):
        for n in names:
            t0 = time.time()
            bq.QUERIES[n](spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            out[n].append(dt)
            print(f"rep {rep} {n}: {dt}s", file=sys.stderr)
    spark.stop()
    print(
        json.dumps(
            {
                "queries": {
                    n: {"reps": v, "min": min(v), "median": sorted(v)[len(v) // 2]}
                    for n, v in out.items()
                },
                "sf": sf_dir,
                "cpus": cpus,
                "warmup": True,
            }
        )
    )


if __name__ == "__main__":
    main()
