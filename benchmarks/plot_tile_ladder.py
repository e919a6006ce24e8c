"""Render the measured FE tile/rot ladder (the TPU analogue of the
reference's NTPB x NB execution-time grid,
``results/execution_time_comparison.png``).

Reads the fe_micro.py CSVs committed under benchmarks/out/ and writes
fe_tile_ladder.png: throughput vs tile_rows, one line per rot level.

Run: python benchmarks/plot_tile_ladder.py
"""

from __future__ import annotations

import csv
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def load(fname):
    rows = []
    with open(os.path.join(OUT, fname)) as f:
        for rec in csv.DictReader(f):
            if rec.get("ms") == "ERROR":
                continue
            rows.append({k: (v if k == "box" else float(v))
                         for k, v in rec.items() if v})
    return rows


def main() -> int:
    data = []
    for f in ("fe_tile_ladder_tiles.csv", "fe_rot_ladder.csv",
              "fe_rot4_tiles.csv", "fe_rot4_small_tiles.csv",
              "fe_rot_ladder_unroll8.csv"):
        try:
            rows = load(f)
        except FileNotFoundError:
            continue
        for r in rows:
            r.setdefault("rot", 1.0)
            data.append(r)

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for rot, marker in ((1, "o"), (2, "s"), (4, "^")):
        pts = {}
        for r in data:
            if int(r["rot"]) == rot and r["box"] == "hc":
                t = int(r["tile_rows"])
                pts[t] = max(pts.get(t, 0.0), r["gpathsteps"])
        if not pts:
            continue
        xs = sorted(pts)
        ax.plot(xs, [pts[x] for x in xs], marker=marker,
                label=f"rot={rot}")
    ax.axhline(99.1, color="k", ls="--", lw=1,
               label="reference GPU (99.1 G)")
    ax.set_xscale("log", base=2)
    ax.set_xlabel("tile_rows (paths per tile / 128)")
    ax.set_ylabel("G path·steps/s (2^19 base paths x N=10^4, rng=tpu)")
    ax.set_title("FE fused-kernel tile/rot ladder — TPU v5e "
                 "(execution_time_comparison parity)")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    out = os.path.join(OUT, "fe_tile_ladder.png")
    fig.savefig(out, dpi=120)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
