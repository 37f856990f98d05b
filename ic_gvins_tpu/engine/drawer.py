"""Visualization: tracked-feature image annotation + trajectory/map plots.

Parity with the reference Drawer/DrawerRviz (``tracking/drawer.cc:25-69``,
``ROS/drawer_rviz.cc``): no ROS in this environment, so the drawer renders
matplotlib figures / annotated numpy images on demand (offline-friendly).
"""

from __future__ import annotations

import numpy as np


def annotate_tracked_image(img, pts, valid, radius: int = 3):
    """Return an RGB uint8 image with tracked features marked (the
    reference draws red/blue circles per tracked feature)."""
    img = np.asarray(img)
    if img.ndim == 2:
        rgb = np.stack([img] * 3, axis=-1)
    else:
        rgb = img.copy()
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]
    for (x, y), ok in zip(np.asarray(pts), np.asarray(valid)):
        if not ok:
            continue
        xi, yi = int(round(x)), int(round(y))
        if not (radius <= xi < w - radius and radius <= yi < h - radius):
            continue
        rgb[yi - radius : yi + radius + 1, xi - radius : xi + radius + 1, 0] = 255
        rgb[yi - radius : yi + radius + 1, xi - radius : xi + radius + 1, 1:] //= 2
    return rgb


def plot_trajectory(ax, times, positions, truth=None, label="estimate"):
    """North-East ground track (matplotlib axis)."""
    p = np.asarray(positions)
    ax.plot(p[:, 1], p[:, 0], "-", label=label)
    if truth is not None:
        t = np.asarray(truth)
        ax.plot(t[:, 1], t[:, 0], "--", label="truth")
    ax.set_xlabel("East (m)")
    ax.set_ylabel("North (m)")
    ax.axis("equal")
    ax.legend()


def plot_statistics(ax_grid, stats: list[dict]):
    """Cost / culled / node-count curves (parity show_statistics.py)."""
    ts = [s["t"] for s in stats]
    keys = ["cost0", "cost1", "culled", "n_nodes"]
    for ax, k in zip(np.ravel(ax_grid), keys):
        ax.plot(ts, [s[k] for s in stats])
        ax.set_title(k)
        ax.set_xlabel("t (s)")
