#!/usr/bin/env python3
"""Per-stage scaling diagnosis: run the build pinned at two core counts
and report each stage's wall (from lineage sidecars) + efficiency.

    python scripts/stage_scaling.py --pages 400000 --low 2 --high 8
    python scripts/stage_scaling.py --mode local-cluster ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys, json, os, time, shutil
sys.path.insert(0, {repo!r})
import numpy as np
from pvt_spark import hilbert as hb
from pvt_spark.plans.pipeline import BuildConfig, build_planet
from pvt_spark.session import get_spark
from pvt_spark.sources.pages import synthesize_pages

# host fingerprint right before the measured build (campaign discipline)
_cx = (np.arange(4_000_000, dtype=np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
_cy = (np.arange(4_000_000, dtype=np.uint64) * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
_t0 = time.time(); hb.xy2h(_cx, _cy, 32); _calib = round(time.time() - _t0, 2)

spark = get_spark(master={master!r}, app_name="stage-scaling")
spark.sparkContext.setLogLevel("ERROR")
pages_path = os.path.join({root!r}, "pages_{pages}")
if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
    synthesize_pages(spark, {pages}, seed=42).write.mode("overwrite").parquet(pages_path)
planet = os.path.join({root!r}, "planet_run")
shutil.rmtree(planet, ignore_errors=True)
pages = spark.read.parquet(pages_path)
t0 = time.time()
build_planet(spark, pages, planet, BuildConfig(leaf_zoom=12))
wall = time.time() - t0
stages = {{}}
for name in os.listdir(planet):
    lp = os.path.join(planet, name, "_lineage.json")
    if os.path.exists(lp):
        with open(lp) as f:
            stages[name] = json.load(f)["wall_sec"]
spark.stop()
print("RESULT", json.dumps({{"wall": wall, "stages": stages, "calib": _calib}}))
"""


def run_pinned(
    master: str, cores: int, pages: int, root: str, warm: bool,
    offset: int = 0, serial: bool = False,
) -> dict:
    script = RUNNER.format(repo=REPO, master=master, pages=pages, root=root)
    cpu_list = f"{offset}-{offset + cores - 1}" if cores > 1 else str(offset)
    env = dict(os.environ)
    # size the session for the measured width (same as scaling_bench.py)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    if serial:
        # serialize the pipeline's concurrent stage pools so each stage's
        # lineage wall measures its own plan, not co-scheduling
        env["PVT_SERIAL_STAGES"] = "1"
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
    ap.add_argument("--pages", type=int, default=400_000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--mode", default="local", choices=["local", "local-cluster"])
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mem", type=int, default=4096)
    ap.add_argument("--cpu-offset", type=int, default=0,
                    help="first CPU to pin to (keeps clear of other pinned runs)")
    ap.add_argument("--serial", action="store_true",
                    help="serialize concurrent stages for clean per-stage walls")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    root = args.root or tempfile.mkdtemp(prefix="pvt_stagescale_")
    os.makedirs(root, exist_ok=True)

    def master_for(cores: int) -> str:
        if args.mode == "local":
            return f"local[{cores}]"
        n_exec = max(1, cores // args.exec_cores)
        return f"local-cluster[{n_exec},{args.exec_cores},{args.exec_mem}]"

    res = {}
    for cores in (args.high, args.low):
        run_pinned(master_for(cores), cores, 20_000, root, warm=True,
                   offset=args.cpu_offset, serial=args.serial)  # warmup
        res[cores] = run_pinned(master_for(cores), cores, args.pages, root,
                                warm=False, offset=args.cpu_offset,
                                serial=args.serial)
    lo, hi = res[args.low], res[args.high]
    eff = (lo["wall"] * args.low) / (hi["wall"] * args.high)
    rows = []
    for name in sorted(lo["stages"]):
        tl, th = lo["stages"][name], hi["stages"].get(name, float("nan"))
        se = (tl * args.low) / (th * args.high) if th else float("nan")
        rows.append((name, tl, th, round(se, 3)))
    print(json.dumps({
        "mode": args.mode, "pages": args.pages,
        "t_low": round(lo["wall"], 2), "t_high": round(hi["wall"], 2),
        "calib_low": lo.get("calib"), "calib_high": hi.get("calib"),
        "efficiency": round(eff, 3),
        "stages": [{"stage": n, "t_low": a, "t_high": b, "eff": e} for n, a, b, e in rows],
    }, indent=1))


if __name__ == "__main__":
    main()
