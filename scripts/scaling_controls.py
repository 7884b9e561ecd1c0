#!/usr/bin/env python3
"""No-engine-code scaling controls for the N->4N criterion.

Measures what THIS BOX gives vanilla Spark under the identical pinned
protocol the engine is judged by — the engine cannot out-scale its
host. Two controls per round 2's analysis:

- shuffle: pure-JVM `spark.range -> groupBy.agg` (ParallelGC, same
  session factory the engine uses). Round-2 box: 0.845 at 2->8.
- arrow: pandas-UDF compute, no shuffle (Arrow transfer + Python
  worker lane). Round-2 box: 0.80 at 2->8.

    python scripts/scaling_controls.py --low 1 --high 4 [--cpu-offset 8]

Each level runs in a fresh taskset-pinned subprocess with a warmup,
and samples the 4M-point Hilbert host fingerprint immediately before
the measured run (same discipline as scaling_campaign.py).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys, time, json
sys.path.insert(0, {repo!r})
import numpy as np
from pvt_spark import hilbert as hb
from pvt_spark.session import get_spark

def calib():
    x = (np.arange(4_000_000, dtype=np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    y = (np.arange(4_000_000, dtype=np.uint64) * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
    t0 = time.time(); hb.xy2h(x, y, 32); return round(time.time() - t0, 2)

spark = get_spark(master="local[{cores}]", app_name="scaling-control")
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
import pandas as pd

def shuffle_job(n):
    (spark.range(n)
        .withColumn("k", (F.col("id") * 2654435761) % 1_000_000)
        .groupBy("k").agg(F.sum("id"), F.count("*"))
        .write.format("noop").mode("overwrite").save())

@F.pandas_udf(DoubleType())
def sink(v: pd.Series) -> pd.Series:
    x = v.to_numpy(np.float64)
    return pd.Series(np.sqrt(x * 1.7 + 0.3) * np.log1p(x))

def arrow_job(n):
    (spark.range(n).withColumn("v", F.col("id").cast("double"))
        .select(F.sum(sink(F.col("v"))))
        .write.format("noop").mode("overwrite").save())

shuffle_job(2_000_000); arrow_job(2_000_000)  # warmup
# one calib IMMEDIATELY before each measured job (the jobs are minutes
# apart on a box that swings 2-3x minute-to-minute) — ADVICE r3
c_shuffle = calib()
t0 = time.time(); shuffle_job({n_shuffle}); t_shuffle = time.time() - t0
c_arrow = calib()
t0 = time.time(); arrow_job({n_arrow}); t_arrow = time.time() - t0
spark.stop()
print("RESULT", json.dumps({{"calib_shuffle": c_shuffle, "calib_arrow": c_arrow,
                             "shuffle": round(t_shuffle, 2),
                             "arrow": round(t_arrow, 2)}}))
"""


def run_pinned(cores: int, offset: int, n_shuffle: int, n_arrow: int) -> dict:
    script = RUNNER.format(repo=REPO, cores=cores, n_shuffle=n_shuffle, n_arrow=n_arrow)
    cpu_list = f"{offset}-{offset + cores - 1}" if cores > 1 else str(offset)
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-u", "-c", script],
        capture_output=True, text=True, check=True, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line.split(None, 1)[1])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--cpu-offset", type=int, default=0)
    ap.add_argument("--shuffle-rows", type=int, default=400_000_000)
    ap.add_argument("--arrow-rows", type=int, default=100_000_000)
    args = ap.parse_args()
    res = {}
    for cores in (args.high, args.low):
        res[cores] = run_pinned(cores, args.cpu_offset, args.shuffle_rows, args.arrow_rows)
        print(f"cores {cores}: {json.dumps(res[cores])}", flush=True)
    lo, hi = res[args.low], res[args.high]
    print(json.dumps({
        "low": args.low, "high": args.high,
        "eff_shuffle": round(lo["shuffle"] * args.low / (hi["shuffle"] * args.high), 3),
        "eff_arrow": round(lo["arrow"] * args.low / (hi["arrow"] * args.high), 3),
        "calib_shuffle_low": lo["calib_shuffle"], "calib_shuffle_high": hi["calib_shuffle"],
        "calib_arrow_low": lo["calib_arrow"], "calib_arrow_high": hi["calib_arrow"],
    }))


if __name__ == "__main__":
    main()
