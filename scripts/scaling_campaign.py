#!/usr/bin/env python3
"""Repeat campaign for the north-rule scaling criterion.

Runs the pinned 1->4-core protocol (scripts/scaling_bench.py) N times at
a fixed input size, appending one JSON line per repeat to --out, then
prints a summary (median/min/max efficiency, per-level walls). Repeats
are whole fresh protocol runs — each level in its own warmed-up pinned
subprocess — so the reported spread is the protocol's true run-to-run
noise, not within-process variance.

    python scripts/scaling_campaign.py --pages 6000000 --repeats 5 \
        --out BENCH/scaling_r3.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scaling_bench import run_pinned  # noqa: E402


def _calib_hilbert() -> float:
    """Single-core 4M-point Hilbert encode (bench.py's host fingerprint):
    sampled immediately before each measured run so every repeat carries
    the box's state-of-the-moment next to its wall time."""
    import numpy as np

    from pvt_spark import hilbert as hb

    x = (np.arange(4_000_000, dtype=np.uint64) * np.uint64(2654435761)) & np.uint64(
        0xFFFFFFFF
    )
    y = (np.arange(4_000_000, dtype=np.uint64) * np.uint64(2246822519)) & np.uint64(
        0xFFFFFFFF
    )
    t0 = time.time()
    hb.xy2h(x, y, 32)
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=6_000_000)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--root", default="/tmp/pvt_scaling_campaign")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)

    # repeat ids continue from any existing --out lines so a combined
    # JSONL never carries duplicate rep keys across invocations
    rep0 = 0
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            rep0 = sum(1 for line in f if line.strip())

    results = []
    for rep in range(rep0, rep0 + args.repeats):
        rec = {"rep": rep, "pages": args.pages, "low": args.low, "high": args.high}
        # alternate level order per repeat: slow host drift (minutes
        # timescale) then biases the ratio both ways instead of one
        order = (args.high, args.low) if rep % 2 == 0 else (args.low, args.high)
        for cores in order:
            run_pinned(cores, 20_000, args.root)  # warmup (JVM/codegen init)
            rec[f"calib{cores}"] = _calib_hilbert()
            t0 = time.time()
            r = run_pinned(cores, args.pages, args.root)
            rec[f"t{cores}"] = round(r["wall_sec"], 2)
            rec[f"pps{cores}"] = round(r["pages_per_sec"], 1)
            print(f"rep {rep} cores {cores}: {r['wall_sec']:.1f}s "
                  f"calib {rec[f'calib{cores}']}s "
                  f"(incl. warmup {time.time() - t0 - r['wall_sec']:.0f}s overhead)",
                  flush=True)
        rec["efficiency"] = round(
            (rec[f"t{args.low}"] * args.low) / (rec[f"t{args.high}"] * args.high), 3
        )
        results.append(rec)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    effs = sorted(r["efficiency"] for r in results)
    summary = {
        "pages": args.pages,
        "repeats": args.repeats,
        "eff_median": round(statistics.median(effs), 3),
        "eff_min": effs[0],
        "eff_max": effs[-1],
        "t_low_median": round(statistics.median(r[f"t{args.low}"] for r in results), 1),
        "t_high_median": round(statistics.median(r[f"t{args.high}"] for r in results), 1),
    }
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
