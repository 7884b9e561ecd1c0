#!/usr/bin/env python3
"""Two-parallelism scaling evidence for the north rule (BASELINE.md).

A real N-vs-4N-executor comparison needs a cluster; this sandbox runs
the identical build at two CPU-PINNED parallelism levels instead:

    python scripts/scaling_bench.py --pages 1500000 --low 2 --high 8

Pinning (taskset) bounds the JVM *and* its Python workers to exactly N
cores — unpinned local[N] lets pandas-UDF workers spill onto unused host
cores, silently flattering the low-parallelism run (measured: unpinned
local[4] beat pinned local[4] by 1.5x).

Reports raw throughput at both levels, measured efficiency
(T_low*N_low)/(T_high*N_high), and — when --pages2 is given — the
fixed-overhead-corrected marginal efficiency from two input sizes.
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
import sys, json, tempfile
sys.path.insert(0, {repo!r})
from bench import _build_once
r = _build_once({master!r}, {pages}, {root!r})
print("RESULT", json.dumps(r))
"""


def run_pinned(cores: int, pages: int, root: str, master: str | None = None) -> dict:
    script = RUNNER.format(
        repo=REPO, master=master or f"local[{cores}]", pages=pages, root=root
    )
    cpu_list = f"0-{cores - 1}" if cores > 1 else "0"
    env = dict(os.environ)
    # size the session for the cores it actually has (a real N-executor
    # cluster is configured for N, not for the dev box's core count)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-u", "-c", script],
        capture_output=True,
        text=True,
        check=True,
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line.split(None, 1)[1])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_500_000)
    ap.add_argument("--pages2", type=int, default=0, help="second size for marginal eff")
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument(
        "--mode", default="local", choices=["local", "local-cluster"],
        help="local-cluster runs SEPARATE executor JVMs (N vs 4N executors)",
    )
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mem", type=int, default=4096)
    ap.add_argument("--root", default=None, help="shared dir (reuses generated pages)")
    args = ap.parse_args()
    root = args.root or tempfile.mkdtemp(prefix="pvt_scaling_")
    os.makedirs(root, exist_ok=True)

    def master_for(cores: int) -> str | None:
        if args.mode == "local":
            return None
        n_exec = max(1, cores // args.exec_cores)
        return f"local-cluster[{n_exec},{args.exec_cores},{args.exec_mem}]"

    res = {}
    for cores in (args.high, args.low):
        # warmup build (JVM/codegen/python-worker init), then measure
        run_pinned(cores, 20_000, root, master_for(cores))
        res[cores] = run_pinned(cores, args.pages, root, master_for(cores))
    eff = (res[args.low]["wall_sec"] * args.low) / (res[args.high]["wall_sec"] * args.high)
    out = {
        "pages": args.pages,
        "low_cores": args.low,
        "high_cores": args.high,
        "t_low_sec": round(res[args.low]["wall_sec"], 2),
        "t_high_sec": round(res[args.high]["wall_sec"], 2),
        "pages_per_sec_low": round(res[args.low]["pages_per_sec"], 1),
        "pages_per_sec_high": round(res[args.high]["pages_per_sec"], 1),
        "tiles_per_sec_high": round(res[args.high]["tiles_per_sec"], 1),
        "efficiency": round(eff, 3),
    }
    if args.pages2:
        r2 = {}
        for cores in (args.high, args.low):
            r2[cores] = run_pinned(cores, args.pages2, root)
        dlow = r2[args.low]["wall_sec"] - res[args.low]["wall_sec"]
        dhigh = r2[args.high]["wall_sec"] - res[args.high]["wall_sec"]
        out["marginal_efficiency"] = round((dlow * args.low) / (dhigh * args.high), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
