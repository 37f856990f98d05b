#!/usr/bin/env python
"""Plot per-round solver statistics from a run directory
(parity with the reference's scripts/show_statistics.py)."""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rundir")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    path = os.path.join(args.rundir, "statistics.txt")
    with open(path) as f:
        header = f.readline().lstrip("# ").split()
        rows = np.array([[float(x) for x in line.split()] for line in f])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = [c for c in header if c != "t"]
    t = rows[:, header.index("t")]
    fig, axes = plt.subplots(
        (len(cols) + 1) // 2, 2, figsize=(11, 2.5 * ((len(cols) + 1) // 2))
    )
    for ax, c in zip(np.ravel(axes), cols):
        ax.plot(t, rows[:, header.index(c)])
        ax.set_title(c)
        ax.grid(True)
    fig.tight_layout()
    out = args.save or os.path.join(args.rundir, "statistics.png")
    fig.savefig(out, dpi=110)
    print("saved", out)


if __name__ == "__main__":
    main()
