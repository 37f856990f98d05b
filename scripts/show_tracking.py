#!/usr/bin/env python
"""Plot the per-keyframe tracking log from a run directory
(parity with the reference's scripts/show_tracking.py: keyframe interval,
parallax, translation, rotation, mappoint count, time cost over time).

Usage: python scripts/show_tracking.py <rundir> [--save out.png]
"""

import argparse
import os

import numpy as np

PANELS = [
    ("interval", 1, "s"),
    ("parallax", 2, "px"),
    ("translation", 3, "m"),
    ("rotation", 4, "deg"),
    ("mappoints", 5, ""),
    ("timecost", 6, "ms"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rundir")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    log = np.loadtxt(os.path.join(args.rundir, "tracking.txt"), ndmin=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = log[:, 0] - log[0, 0]
    fig, axes = plt.subplots(3, 2, figsize=(11, 8), sharex=True)
    for ax, (name, col, unit) in zip(axes.flat, PANELS):
        ax.plot(t, log[:, col], lw=1.0)
        ax.grid(alpha=0.3)
        ax.set_title(f"{name}: avg {np.average(log[:, col]):.2f} {unit}")
    for ax in axes[-1]:
        ax.set_xlabel("t (s)")
    fig.tight_layout()
    out = args.save or os.path.join(args.rundir, "tracking.png")
    fig.savefig(out, dpi=120)
    print(out)


if __name__ == "__main__":
    main()
