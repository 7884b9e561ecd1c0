"""CLI for the driver-style correctness gate.

Thin wrapper over ``pvt_spark.queries.compare_against_oracle`` — runs
every registry query on Spark and its DuckDB oracle twin over the same
parquet tables, comparing row count + sorted-column value frames.

Usage:
    python scripts/oracle_check.py [--sf /root/testdata/sf0.01]
        [--only q13_pip,q34] [--out /tmp/oracle.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-list of query-name prefixes")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_ORACLE_SF"] = args.sf
    from pvt_spark.queries import REGISTRY, compare_against_oracle
    from pvt_spark.session import get_spark

    names = None
    if args.only:
        pre = tuple(p.strip() for p in args.only.split(","))
        names = {k for k in REGISTRY if k.startswith(pre)}

    spark = get_spark(app_name="oracle_check")
    t0 = time.time()
    results = compare_against_oracle(spark, args.sf, names=names)
    fails = [
        k for k, v in results.items()
        if v.get("error") or (v.get("oracle") != "rows-only" and not v.get("match"))
    ]
    for k, v in results.items():
        status = "FAIL" if k in fails else "PASS"
        print(f"{status} {k} {json.dumps({kk: vv for kk, vv in v.items() if kk != 'sample'})}")
        if k in fails and "sample" in v:
            print(v["sample"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, default=str)
    print(f"\n{len(results) - len(fails)}/{len(results)} pass in "
          f"{time.time() - t0:.0f}s" + (f"; FAIL: {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
