"""Result writers in reference-compatible column formats.

Parity with the reference output files (``ic_gvins.cc:68-73``,
``misc.cc:440-522``, ``ic_gvins.cc:964-1067``):

* ``gvins.nav``       — 0, time, pos (deg/deg/m or local m), vel, att(deg)
* ``IMU_ERR.txt``     — time, bg(deg/hr), ba(mGal)  (text instead of .bin)
* ``trajectory.csv``  — TUM format: time px py pz qx qy qz qw (evo-ready)
* ``statistics.txt``  — per-round solver statistics
* ``extrinsic.txt``   — time, t_b_c, euler(q_b_c), td

The nav writer decimates 10x like the reference (``misc.cc:443-445``).
"""

from __future__ import annotations

import os

import numpy as np

from ..common.angle import R2D
from ..common import rotation as rot


class RunWriter:
    def __init__(self, outdir: str, origin_blh=None):
        """``origin_blh`` (lat rad, lon rad, h m): when given, gvins.nav
        rows carry the *geodetic* position/attitude like the reference
        (``Earth::local2global`` at ``misc.cc:452``, lat/lon in degrees);
        when None the local n-frame position is written instead (synthetic
        runs with no geographic origin)."""
        os.makedirs(outdir, exist_ok=True)
        self.outdir = outdir
        self.origin_blh = (
            np.asarray(origin_blh, np.float64) if origin_blh is not None else None
        )
        self._nav = open(os.path.join(outdir, "gvins.nav"), "w")
        self._err = open(os.path.join(outdir, "IMU_ERR.txt"), "w")
        self._traj = open(os.path.join(outdir, "trajectory.csv"), "w")
        self._stat = open(os.path.join(outdir, "statistics.txt"), "w")
        self._ext = open(os.path.join(outdir, "extrinsic.txt"), "w")
        self._counts = 0

    def write_nav(self, state, decimate: int = 10):
        self._counts += 1
        if (self._counts - 1) % decimate:
            return
        import jax.numpy as jnp

        t = float(state.time)
        p = np.asarray(state.p)
        v = np.asarray(state.v)
        q = jnp.asarray(state.q)
        if self.origin_blh is not None:
            from ..common import earth

            r_g, blh = earth.pose_local_to_global(
                jnp.asarray(self.origin_blh), rot.quat_to_matrix(q),
                jnp.asarray(p, jnp.float64),
            )
            att = np.asarray(rot.matrix_to_euler(r_g)) * R2D
            pos = np.array(blh)
            pos[:2] *= R2D
        else:
            att = np.asarray(rot.quat_to_euler(q)) * R2D
            pos = p
        bg = np.asarray(state.bg) * R2D * 3600.0
        ba = np.asarray(state.ba) * 1e5
        self._nav.write(
            f"0 {t:.9f} " + " ".join(f"{x:.9f}" for x in (*pos, *v, *att)) + "\n"
        )
        self._err.write(
            f"{t:.9f} " + " ".join(f"{x:.6f}" for x in (*bg, *ba)) + "\n"
        )
        q = np.asarray(state.q)  # w x y z -> TUM x y z w
        self._traj.write(
            f"{t:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
            f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
        )

    def write_statistics(self, row: dict):
        keys = sorted(row)
        if self._stat.tell() == 0:
            self._stat.write("# " + " ".join(keys) + "\n")
        self._stat.write(" ".join(str(row[k]) for k in keys) + "\n")

    def write_tracking(self, t, interval=0.0, parallax=0.0, translation=0.0,
                       rotation=0.0, n_mappoints=0, cost_ms=0.0, **_):
        """Per-keyframe tracking log in the reference's tracking.txt column
        layout (``tracking.cc:297-315``, plotted by show_tracking.py):
        t, keyframe interval (s), mean parallax (px), translation (m),
        rotation (deg), tracked mappoints, frontend time cost (ms)."""
        if not hasattr(self, "_track"):
            self._track = open(os.path.join(self.outdir, "tracking.txt"), "w")
        self._track.write(
            f"{t:.9f} {interval:.6f} {parallax:.3f} {translation:.6f} "
            f"{rotation:.6f} {int(n_mappoints)} {cost_ms:.3f}\n"
        )

    def write_mappoints(self, points):
        """Landmark cloud, one world position per row (parity mappoint.txt,
        3 columns, ``ic_gvins.cc:69,1704``)."""
        from .fileio import FileSaver

        with FileSaver(os.path.join(self.outdir, "mappoint.txt"), 3) as fs:
            fs.dumpn(points)

    def write_extrinsic(self, t, ext_p, ext_q, td):
        import jax.numpy as jnp

        att = np.asarray(rot.quat_to_euler(jnp.asarray(ext_q))) * R2D
        p = np.asarray(ext_p)
        self._ext.write(
            f"{t:.9f} " + " ".join(f"{x:.6f}" for x in (*p, *att)) + f" {float(td):.6f}\n"
        )

    def close(self):
        files = [self._nav, self._err, self._traj, self._stat, self._ext]
        if hasattr(self, "_track"):
            files.append(self._track)
        for f in files:
            f.flush()
            f.close()
