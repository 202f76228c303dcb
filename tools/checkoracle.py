"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry through Spark AND its oracle_sql() through
DuckDB on the same sf dir, compare row count / schema (sorted column names)
/ exact values (rows sorted, dtype-sensitive — mirrors the driver's
type-sensitive value hash).

Usage: python tools/checkoracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        ka = getattr(av.dtype, "kind", "O")
        kb = getattr(bv.dtype, "kind", "O")
        if ka == "f" or kb == "f":
            if not (ka == kb == "f"):
                return False  # type-width / type-kind mismatch
            if not np.array_equal(av, bv, equal_nan=True):
                return False
        else:
            if ka in "iu" and kb in "iu":
                if av.dtype != bv.dtype:
                    return False
            if not (pd.Series(av).astype(object).fillna("\0null") ==
                    pd.Series(bv).astype(object).fillna("\0null")).all():
                return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from rgm.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark(app_name="rgm-checkoracle")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    results: dict[str, dict] = {}
    # fixture-pinned oracles: ann_ivf_topk's oracle re-executes the probe
    # from fixtures/ivf_centroids.parquet, which is trained on the sf0.01
    # embeddings (the sf the driver gate runs at). The sf0.001 embeddings
    # are a DIFFERENT 500-row table, so at any other sf the engine (which
    # correctly trains on the corpus it is given) mismatches the fixture
    # BY CONSTRUCTION (ADVICE r3 #4) — skip rather than report a bogus red.
    sf_pinned = {
        "ann_ivf_topk": "/root/testdata/sf0.01",
        "ann_ivf_topk_q": "/root/testdata/sf0.01",
    }
    for name, fn in queries.items():
        if only and name not in only:
            continue
        pin = sf_pinned.get(name)
        if pin is not None and os.path.realpath(sf_dir) != os.path.realpath(pin):
            print(f"{name:28s} SKIP      oracle fixture pinned to {pin}")
            continue
        res = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            res["spark_rows"] = len(sdf)
            if name not in oracles:
                res["err"] = "no_oracle"
            else:
                odf = con.execute(oracles[name]).df()
                res["oracle_rows"] = len(odf)
                res["rows_match"] = len(sdf) == len(odf)
                sc, oc = _canon(sdf), _canon(odf)
                res["schema_match"] = list(sc.columns) == list(oc.columns)
                res["hash_match"] = bool(
                    res["rows_match"] and res["schema_match"] and _values_equal(sc, oc)
                )
                if not res["hash_match"] and res["rows_match"] and res["schema_match"]:
                    # print a small diff hint
                    for c in sc.columns:
                        av, bv = sc[c], oc[c]
                        if str(av.dtype) != str(bv.dtype):
                            print(f"  [{name}] dtype diff col={c}: {av.dtype} vs {bv.dtype}",
                                  file=sys.stderr)
                        elif not _values_equal(sc[[c]], oc[[c]]):
                            neq = (av.astype(object).fillna("\0") != bv.astype(object).fillna("\0"))
                            idx = list(np.nonzero(neq.to_numpy())[0][:3])
                            print(f"  [{name}] value diff col={c} rows={idx}: "
                                  f"{[ (av.iloc[i], bv.iloc[i]) for i in idx ]}",
                                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            res["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = res
        tag = ("GREEN" if res["hash_match"] else
               ("NO_ORACLE" if res["err"] == "no_oracle" else "FAIL"))
        print(f"{name:28s} {tag:9s} spark={res['spark_rows']} "
              f"oracle={res['oracle_rows']} err={res['err']}")

    n_green = sum(1 for r in results.values() if r["hash_match"])
    print(f"\n{n_green}/{len(results)} hash-green")
    out = os.path.join(ROOT, "tools", "checkoracle_last.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
