#!/usr/bin/env python
"""Plot the TUM-format trajectory.csv of a run directory (ground track +
height), parity with the reference's evo-based inspection."""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rundir")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    rows = np.loadtxt(os.path.join(args.rundir, "trajectory.csv"))
    t, p = rows[:, 0], rows[:, 1:4]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.5))
    ax1.plot(p[:, 1], p[:, 0], "-")
    ax1.set_xlabel("East (m)")
    ax1.set_ylabel("North (m)")
    ax1.axis("equal")
    ax1.grid(True)
    ax2.plot(t - t[0], -p[:, 2])
    ax2.set_xlabel("t (s)")
    ax2.set_ylabel("height (m)")
    ax2.grid(True)
    fig.tight_layout()
    out = args.save or os.path.join(args.rundir, "trajectory.png")
    fig.savefig(out, dpi=110)
    print("saved", out)


if __name__ == "__main__":
    main()
