#!/usr/bin/env python
"""Plot the camera-IMU extrinsic / time-delay history from a run directory
(parity with the reference's scripts/show_extrinsic.py: translation xyz,
rotation euler xyz, td over time; columns as written by
``engine/outputs.py::write_extrinsic``).

Usage: python scripts/show_extrinsic.py <rundir> [--save out.png]
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rundir")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    ext = np.loadtxt(os.path.join(args.rundir, "extrinsic.txt"), ndmin=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = ext[:, 0] - ext[0, 0]
    fig, axes = plt.subplots(3, 1, figsize=(9, 8), sharex=True)
    for i, lbl in enumerate("XYZ"):
        axes[0].plot(t, ext[:, 1 + i], label=lbl, lw=1.0)
        axes[1].plot(t, ext[:, 4 + i], label=lbl, lw=1.0)
    axes[0].set_title("translation t_b_c (m)")
    axes[1].set_title("rotation euler (deg)")
    axes[2].plot(t, ext[:, 7], lw=1.0)
    axes[2].set_title("time delay td (s)")
    axes[2].set_xlabel("t (s)")
    for ax in axes:
        ax.grid(alpha=0.3)
        if ax.get_legend_handles_labels()[0]:
            ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    out = args.save or os.path.join(args.rundir, "extrinsic.png")
    fig.savefig(out, dpi=120)
    print(out)


if __name__ == "__main__":
    main()
