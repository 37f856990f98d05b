"""Benchmark: full GVINS keyframe round on TPU.

Measures EVERY stage a visual keyframe pays, fused into ONE jitted
program per batch of sequences:

* bidirectional pyramidal KLT tracking (Pallas kernel, 256 features,
  4-level pyramid, 256x320 frames),
* grid Shi-Tomasi detection + subpixel refinement (feature replenish),
* IMU preintegration of the inter-keyframe interval (128-sample scan),
* two-view triangulation of the window's landmarks,
* the two-phase LM sliding-window optimization round (12 nodes x 192
  landmarks, 20 iterations),
* Schur marginalization of the oldest node + window slide (the dense
  eigendecomposition the reference pays per slide).

Reports the FULL keyframe round as the headline (frames/s/chip =
batch / t_round) plus the kernel-only round (track+optimize, round 1's
metric) and the stage split as extra fields.
Prints ONE JSON line. Baseline: the reference is "real-time" on a desktop
CPU at the KAIST camera rate of 10 fps (BASELINE.md), one optimization
round + one tracked frame per keyframe -> vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
BATCH = int(_os.environ.get("BENCH_BATCH", "32"))  # knee of the batch-scaling curve (BENCH_NOTES r5)
N_NODES = 12
N_LANDMARKS = 192
ITERS = 20
N_FEATURES = 256
IMG_H, IMG_W = 256, 320
REFERENCE_FPS = 10.0


# v5e public peaks (jax-ml scaling book): 197 TFLOP/s bf16 MXU (f32
# matmuls run at roughly half), 819 GB/s HBM. Used for roofline fractions
# only; fractions are labeled with these assumptions.
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32 = 98.5e12
PEAK_HBM_GBS = 819.0


def _time(fn, *args, reps=7, pipe_reps=10):
    """Two measurements per stage (the r3->r4 '2x regression' was exactly
    the difference between them — BENCH_NOTES round 5):

    * PIPELINED (headline): ``pipe_reps`` async dispatches, ONE sync,
      /reps — the device-throughput cost of the stage as a production
      pipeline pays it (back-to-back programs, dispatch overlapped with
      execution). This is the r1-r3 discipline.
    * SYNCED: individually block_until_ready'd repetitions (median/min/
      cv) — per-dispatch LATENCY. On a host-attached chip it matches the
      pipelined number to ~us; over this image's tunneled chip it adds
      the full ~20 ms RTT to every stage (the r4 numbers), which is a
      property of the tunnel, not of the kernels.
    """
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    t0 = time.perf_counter()
    for _ in range(pipe_reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t_pipe = (time.perf_counter() - t0) / pipe_reps
    stats = {
        "pipelined_ms": round(t_pipe * 1e3, 2),
        "synced_median_ms": round(float(np.median(ts)) * 1e3, 2),
        "synced_min_ms": round(float(ts.min()) * 1e3, 2),
        "cv": round(float(ts.std() / max(ts.mean(), 1e-12)), 3),
    }
    return t_pipe, out, stats


def _measure_rtt(dev):
    """Median dispatch+sync round-trip of a no-op-sized program: the
    per-dispatch latency floor (tunnel RTT on this image)."""
    x = jax.device_put(np.zeros(8, np.float32), dev)
    f = jax.jit(lambda v: v + 1.0)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _cost_analysis(fn, *args):
    """XLA's own per-program cost model: (flops, bytes accessed). ``fn``
    must already be jitted — the lowered executable is cached, so this
    costs no extra compile."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _roofline(name, t_s, flops, bytes_acc):
    """Achieved fractions of v5e peak + a bound classification."""
    if t_s <= 0 or (flops == 0 and bytes_acc == 0):
        return {}
    fl = flops / t_s
    bw = bytes_acc / t_s
    frac_mxu = fl / PEAK_FLOPS_F32
    frac_hbm = bw / (PEAK_HBM_GBS * 1e9)
    bound = ("compute" if frac_mxu > 0.33
             else "bandwidth" if frac_hbm > 0.33 else "latency")
    return {
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_acc / 1e9, 3),
        "achieved_tflops": round(fl / 1e12, 2),
        "achieved_gbs": round(bw / 1e9, 1),
        "pct_peak_mxu_f32": round(100 * frac_mxu, 1),
        "pct_peak_hbm": round(100 * frac_hbm, 1),
        "bound": bound,
    }


def _live_pipeline_fps(duration=60.0, frame_rate=10.0, warmup_frames=20,
                       max_wall_s=420.0):
    """Drive the REAL Pipeline (front-end + estimator, all host bookkeeping)
    over rendered sprite frames; report the steady-state add_image rate.
    Note: on a tunneled chip every device dispatch pays the tunnel RTT, so
    this is a LOWER bound on host-attached throughput."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from ic_gvins_tpu.common import rotation as rot
    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.engine.config import CameraConfig, EngineConfig
    from ic_gvins_tpu.engine.pipeline import Pipeline

    res = (IMG_W, IMG_H)
    intr = (240.0, 240.0, IMG_W / 2.0, IMG_H / 2.0)
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )
    cfg = EngineConfig(
        optimize_num_iterations=ITERS,
        max_nodes=16,
        max_landmarks=64,
        optimize_windows_size=6,
        track_max_features=128,
        track_min_parallax=12.0,
        antlever=(0.0, 0.0, 0.0),
        cam=CameraConfig(
            intrinsic=intr, distortion=(0.0, 0.0, 0.0, 0.0), resolution=res,
            q_b_c=tuple(np.asarray(ext_q)), t_b_c=(0.0, 0.0, 0.0),
        ),
    )
    params = sim.default_params(with_earth=True, lat_deg=cfg.track_ref_lat_deg)
    traj = sim.car_trajectory(speed=5.0)
    key = jax.random.PRNGKey(0)
    kl, ki, kg = jax.random.split(key, 3)
    lms = sim.scatter_landmarks(traj, params, kl, 140, 0.0, duration + 4.0,
                                lateral=24.0, depth_range=(7.0, 40.0))
    imu = sim.simulate_imu(traj, params, 0.0, duration, 200.0)
    imu = sim.corrupt_imu(imu, params, ki, jnp.array([2e-4, -1e-4, 3e-4]),
                          jnp.array([5e-3, -8e-3, 2e-3]))
    gnss = sim.simulate_gnss(traj, params, jnp.zeros(3), 0.0, duration, 1.0,
                             std=0.05, key=kg)

    # pre-render all frames on host so rendering never counts
    frame_dt = 1.0 / frame_rate
    ftimes = np.arange(0.4, duration, frame_dt)
    truth_fn = jax.jit(jax.vmap(lambda t: sim.truth_state(traj, params, t)),
                       backend="cpu")
    st = truth_fn(jnp.asarray(ftimes))
    q_wcs = np.asarray(jax.jit(jax.vmap(
        lambda q: rot.quat_mul(q, ext_q)), backend="cpu")(st.q))
    ps = np.asarray(st.p)
    lms_np = np.asarray(lms)
    frames = [
        sim.render_sprite_frame_np(intr, res, lms_np, ps[i], q_wcs[i])
        for i in range(len(ftimes))
    ]

    pipe = Pipeline(cfg, use_clahe=False)
    gi = fi = 0
    gt = np.asarray(gnss.time)
    n_timed = 0
    wall = 0.0
    kf_walls, plain_walls = [], []
    t_leg0 = _t.perf_counter()
    for k in range(imu.n):
        if _t.perf_counter() - t_leg0 > max_wall_s and n_timed >= 15:
            break  # bounded bench wall time; rate already established
        dt = float(imu.dt[k])
        if dt == 0.0:
            continue
        t = float(imu.time[k])
        pipe.add_imu(t, dt, np.asarray(imu.dtheta[k]), np.asarray(imu.dvel[k]))
        while gi < len(gt) and gt[gi] <= t:
            pipe.add_gnss(float(gt[gi]), np.asarray(gnss.p[gi]),
                          np.asarray(gnss.std[gi]))
            gi += 1
        while fi < len(ftimes) and ftimes[fi] <= t:
            n_kf0 = len(pipe.est.track_log)
            t0 = _t.perf_counter()
            pipe.add_image(float(ftimes[fi]), frames[fi])
            dt_f = _t.perf_counter() - t0
            if fi >= warmup_frames:
                wall += dt_f
                n_timed += 1
                (kf_walls if len(pipe.est.track_log) > n_kf0
                 else plain_walls).append(dt_f)
            fi += 1
    if n_timed == 0:
        return {}
    # the number is only citable when the VISUAL path actually engaged
    # (VERDICT r4 weak #2: an 8 s window once ran keyframe-less and the
    # reported fps measured a GINS-only pipeline)
    total_kf = max(int(pipe.est.n_keyframes), len(pipe.est.track_log))
    assert total_kf > 0, (
        "live bench ran without a single visual keyframe - not citable")
    return {
        "live_pipeline_fps": round(n_timed / wall, 2),
        "live_pipeline_frames": n_timed,
        "live_pipeline_sim_s": round(duration, 1),
        "live_pipeline_keyframes": total_kf,
        "live_frame_ms_keyframe": (
            round(float(np.mean(kf_walls)) * 1e3, 1) if kf_walls else None),
        "live_frame_ms_plain": (
            round(float(np.mean(plain_walls)) * 1e3, 1)
            if plain_walls else None),
        "live_pipeline_note": (
            "real Pipeline.add_image steady-state rate incl. host "
            "bookkeeping; tunneled-chip dispatch RTT included (lower bound)"
        ),
    }


def main():
    from __graft_entry__ import _tiny_problem
    from ic_gvins_tpu.parallel.multi_seq import (
        optimize_batch,
        stack_priors,
        stack_windows,
    )
    from ic_gvins_tpu.vision import klt_pallas, pyramid

    dtype = jnp.float32

    # --- stage 1: tracking ---
    # textured image (band-limited noise): white noise has gradient energy
    # only at the pixel scale, which makes LK convergence unrepresentative
    # of camera frames
    rng = np.random.RandomState(0)
    img0 = (rng.rand(IMG_H, IMG_W) * 255).astype(np.float32)
    try:
        from scipy.ndimage import gaussian_filter

        img0 = gaussian_filter(img0, 2.0) * 4.0
    except ImportError:
        pass
    img1 = np.roll(img0, (2, 3), axis=(0, 1))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pts = jnp.asarray(
        rng.rand(N_FEATURES, 2) * np.array([IMG_W - 40, IMG_H - 40]) + 20,
        jnp.float32,
    )
    valid = jnp.ones(N_FEATURES, bool)

    # --- the window problem (one instance, tiled across the batch) ---
    # Build on the host CPU backend: eager setup over the TPU tunnel pays
    # ~15-20 ms RTT per op (~2 min of setup); one device_put ships it all.
    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        cpu0 = None
    import contextlib

    setup_ctx = (jax.default_device(cpu0) if cpu0 is not None
                 else contextlib.nullcontext())
    with setup_ctx:
        w, p, cfg, params = _tiny_problem(
            n_nodes=N_NODES, n_landmarks=N_LANDMARKS, dtype=dtype, seed=0
        )
    dev = jax.devices()[0]
    w, p, cfg, params = jax.device_put((w, p, cfg, params), dev)
    tile = lambda x: jnp.broadcast_to(x[None], (BATCH,) + x.shape)
    bw = jax.tree.map(tile, w)
    bp = jax.tree.map(tile, p)

    # --- fused rounds: per-sequence bidirectional KLT + batched
    # optimization (+ detection/preint/triangulation/marginalization in the
    # full round), one jitted program (as a production pipeline step) ---
    # per-sequence feature sets (independent sequences -> batched tracking:
    # one kernel launch over BATCH x N_FEATURES features, like the
    # batched window optimization below)
    bpts = jnp.stack([pts + 0.1 * b for b in range(BATCH)])

    from ic_gvins_tpu.data import simulator as sim
    from ic_gvins_tpu.factors.marginalization import marginalize_and_slide
    from ic_gvins_tpu.vision.detector import corner_subpix, detect_features
    from ic_gvins_tpu.vision.triangulation import triangulate_checked

    # one inter-keyframe IMU interval (128 samples), tiled over the batch
    with setup_ctx:
        imu1 = sim.simulate_imu(
            sim.car_trajectory(), sim.default_params(dtype=dtype), 5.0, 0.64,
            200.0,
        )
        imu1 = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype != bool else x, imu1
        )
    imu1 = jax.device_put(imu1, dev)
    bimu = jax.tree.map(tile, imu1)
    bstate = jax.tree.map(tile, w.nodes.index(0))

    # triangulation geometry: first/last window poses + the landmark obs
    from ic_gvins_tpu.common import rotation as rot

    def tri_inputs(win):
        q0, q1 = win.nodes.q[0], win.nodes.q[-1]
        p0, p1 = win.nodes.p[0], win.nodes.p[-1]
        r0 = rot.quat_to_matrix(rot.quat_mul(q0, win.ext_q))
        r1 = rot.quat_to_matrix(rot.quat_mul(q1, win.ext_q))
        t0 = p0 + rot.quat_rotate(q0, win.ext_p)
        t1 = p1 + rot.quat_rotate(q1, win.ext_p)
        L = win.n_landmarks
        return (jnp.broadcast_to(r0, (L, 3, 3)), jnp.broadcast_to(t0, (L, 3)),
                jnp.broadcast_to(r1, (L, 3, 3)), jnp.broadcast_to(t1, (L, 3)),
                win.obs_uv[:, 0], win.obs_uv[:, -1])

    from ic_gvins_tpu.ins.preintegration import preintegrate

    # --- per-stage jitted programs, each timed with the dispatch-level
    # repetition harness. Fusing EVERYTHING into one XLA program (round-1
    # style) makes the TPU compile explode past 10 minutes once
    # detection/preintegration/marginalization join the graph; separate
    # stage programs compile in seconds, and the production pipeline runs
    # them back-to-back anyway. The full-round time is the stage sum (on a
    # host-attached chip inter-program dispatch is microseconds; the
    # tunnel RTT here is excluded by timing many reps). ---

    @jax.jit
    def stage_track(bpts):
        out, ok, _ = jax.vmap(
            lambda p0: klt_pallas.lk_track_bidirectional_pallas(
                pyr0, pyr1, p0, p0, valid
            )
        )(bpts)
        return jnp.nan_to_num(out)

    @jax.jit
    def stage_detect(bpts):
        def one(pts1):
            pnew, _, oknew = detect_features(pyr1[0], pts1, valid,
                                             max_new=N_FEATURES)
            return corner_subpix(pyr1[0], pnew, oknew)
        return jax.vmap(one)(bpts)

    @jax.jit
    def stage_preint(bstate, bimu):
        return jax.vmap(lambda s, i: preintegrate(params, s, i))(bstate, bimu)

    @jax.jit
    def stage_triangulate(bw):
        def one(win):
            _, invd, okt = triangulate_checked(*tri_inputs(win))
            return win._replace(
                lm_invdepth=jnp.where(okt & win.lm_valid, invd,
                                      win.lm_invdepth))
        return jax.vmap(one)(bw)

    @jax.jit
    def stage_optimize(bw, bp):
        return optimize_batch.__wrapped__(bw, bp, cfg, params, iters=ITERS)

    @jax.jit
    def stage_marginalize(bw, bp):
        return jax.vmap(
            lambda wn, pn: marginalize_and_slide(wn, pn, cfg, params)
        )(bw, bp)

    import sys as _sys
    import time as _t

    stage_stats = {}
    roofline = {}
    rtt_s = _measure_rtt(dev)
    print(f"# dispatch RTT (no-op program, median): {rtt_s*1e3:.1f} ms",
          file=_sys.stderr, flush=True)

    def _stage(name, fn, *args):
        t0 = _t.perf_counter()
        t, out, stats = _time(fn, *args)
        stage_stats[name] = stats
        fl, by = _cost_analysis(fn, *args)
        rf = _roofline(name, t, fl, by)
        if rf:
            roofline[name] = rf
        print(f"# stage {name}: {t*1e3:.1f} ms pipelined "
              f"(synced median {stats['synced_median_ms']} "
              f"min {stats['synced_min_ms']} cv {stats['cv']}) {rf} "
              f"(compile+reps {_t.perf_counter()-t0:.1f} s)",
              file=_sys.stderr, flush=True)
        return t, out

    t_track, pts_out = _stage("track", stage_track, bpts)
    t_detect, _ = _stage("detect", stage_detect, bpts)
    t_preint, pre = _stage("preint", stage_preint, bstate, bimu)
    t_tri, bw2 = _stage("triangulate", stage_triangulate, bw)
    t_opt, (out, (c0, c1, _, it_run, it_acc)) = _stage(
        "optimize", stage_optimize, bw, bp)
    t_marg, (win_slid, prior_new) = _stage("marginalize", stage_marginalize,
                                           out, bp)

    t_kernel = t_track + t_opt
    t_full = t_track + t_detect + t_preint + t_tri + t_opt + t_marg

    # numerics guard: only a real, bounded solve counts
    c0v, c1v = np.asarray(c0), np.asarray(c1)
    assert np.all(np.isfinite(c0v)) and np.all(np.isfinite(c1v)), (c0v, c1v)
    assert np.all(np.isfinite(np.asarray(out.nodes.p)))
    assert np.all(c1v < 1e4), c1v
    assert np.all(np.isfinite(np.asarray(win_slid.nodes.p)))
    assert np.all(np.isfinite(np.asarray(prior_new.H)))
    assert np.all(np.isfinite(np.asarray(pts_out)))
    assert np.all(np.isfinite(np.asarray(pre.dp)))

    import sys

    print(
        f"# stage ms (batch {BATCH}): track {t_track*1e3:.1f} "
        f"detect+subpix {t_detect*1e3:.1f} preint {t_preint*1e3:.1f} "
        f"triangulate {t_tri*1e3:.1f} optimize {t_opt*1e3:.1f} "
        f"marginalize {t_marg*1e3:.1f} | kernel {t_kernel*1e3:.1f} "
        f"FULL {t_full*1e3:.1f}",
        file=sys.stderr,
    )
    # --- live pipeline: the REAL Pipeline.add_image loop (host bookkeeping,
    # keyframe decisions, estimator rounds included) on rendered frames —
    # the honest end-to-end number VERDICT r2 asked for. Steady-state rate:
    # the first frames pay compile and are excluded. ---
    live = {}
    if not _os.environ.get("BENCH_STAGES_ONLY"):
        try:
            live = _live_pipeline_fps()
        except Exception as e:  # keep the headline bench alive
            print(f"# live pipeline bench failed: {e!r}", file=_sys.stderr)

    frames_per_s = BATCH / t_full
    kernel_fps = BATCH / t_kernel
    # BA iterations/second (driver metric #3, BASELINE.json): LM iterations
    # actually executed (early-exit aware) across the batch / optimize wall
    ba_iters_per_s = float(np.sum(np.asarray(it_run))) / t_opt
    print(
        json.dumps(
            {
                "metric": (
                    f"frames/s/chip, FULL GVINS keyframe round: "
                    f"bidirectional {N_FEATURES}-feature Pallas KLT + grid "
                    f"detect/subpix + 128-sample preintegration + "
                    f"triangulation + {ITERS}-iter LM window round "
                    f"({N_NODES} nodes x {N_LANDMARKS} landmarks) + Schur "
                    f"marginalization/slide, batch {BATCH} sequences"
                ),
                "value": round(frames_per_s, 3),
                "unit": "frames/s",
                # NOTE: multiple of the KAIST 10 fps camera rate (the
                # reference's real-time budget) — NOT a measured reference
                # throughput; no ROS/Ceres exists in this image to run the
                # reference (BASELINE.md "to measure" table)
                "vs_baseline": round(frames_per_s / REFERENCE_FPS, 3),
                "vs_baseline_kind": "camera-rate multiple (10 fps)",
                "kernel_round_fps": round(kernel_fps, 3),
                "kernel_round_ms": round(t_kernel * 1e3, 2),
                "full_round_ms": round(t_full * 1e3, 2),
                "ba_iters_per_s": round(ba_iters_per_s, 1),
                "ba_iters_run": int(np.sum(np.asarray(it_run))),
                "ba_iters_accepted": int(np.sum(np.asarray(it_acc))),
                "stage_ms": {
                    "track": round(t_track * 1e3, 2),
                    "detect_subpix": round(t_detect * 1e3, 2),
                    "preint": round(t_preint * 1e3, 2),
                    "triangulate": round(t_tri * 1e3, 2),
                    "optimize": round(t_opt * 1e3, 2),
                    "marginalize": round(t_marg * 1e3, 2),
                },
                "aggregation": (
                    "stage times are PIPELINED device throughput (10 async "
                    "dispatches, one sync, /10 — the production back-to-"
                    "back cost); per-stage individually-synced latency "
                    "(median/min/cv, includes the full per-dispatch RTT "
                    "below) in stage_stats"),
                "dispatch_rtt_ms": round(rtt_s * 1e3, 2),
                "stage_stats": stage_stats,
                # XLA cost-analysis roofline vs v5e peaks (197 TF bf16 /
                # ~98.5 TF f32 MXU, 819 GB/s HBM): what fraction of the
                # chip each stage actually uses, and what binds it
                "roofline": roofline,
                **live,
            }
        )
    )


if __name__ == "__main__":
    main()
