"""Shared test fixtures: build synthetic GINS/GVINS windows."""

import jax
import jax.numpy as jnp

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.data.types import ImuSeq
from ic_gvins_tpu.ins import preintegration as pi
from ic_gvins_tpu.solver.window import (
    SolverConfig,
    empty_prior,
    empty_window,
    make_init_prior,
)

D2R = jnp.pi / 180.0


def default_cfg(antlever=None):
    return SolverConfig(
        antlever=jnp.zeros(3) if antlever is None else antlever,
        reproj_std=jnp.asarray(1.5 / 780.0),
        bias_prior_bg_std=jnp.asarray(7200.0 * D2R / 3600.0),
        bias_prior_ba_std=jnp.asarray(0.2),
        estimate_extrinsic=jnp.asarray(False),
        estimate_td=jnp.asarray(False),
        estimate_sodo=jnp.asarray(False),
        sodo_prior_std=jnp.asarray(0.02),
    )


def build_gins_window(
    n_nodes=8,
    n_landmarks=4,
    node_dt=1.0,
    rate=200.0,
    gnss_std=0.05,
    with_earth=True,
    bias=True,
    seed=0,
    n_extra_slots=0,
):
    """Synthetic GNSS+IMU window: truth nodes every node_dt seconds, noisy
    GNSS at each node, noisy+biased IMU preintegrated between nodes."""
    key = jax.random.PRNGKey(seed)
    params = sim.default_params(with_earth=with_earth)
    traj = sim.car_trajectory()
    t0 = 5.0

    bg = jnp.array([2e-4, -1e-4, 3e-4]) if bias else jnp.zeros(3)
    ba = jnp.array([5e-3, -8e-3, 2e-3]) if bias else jnp.zeros(3)

    N = n_nodes + n_extra_slots
    win = empty_window(N, n_landmarks)

    node_times = t0 + jnp.arange(n_nodes) * node_dt
    truth = jax.vmap(lambda t: sim.truth_state(traj, params, t))(node_times)
    truth = truth._replace(
        bg=jnp.tile(bg, (n_nodes, 1)), ba=jnp.tile(ba, (n_nodes, 1))
    )

    # per-interval IMU with noise + bias
    m = int(round(node_dt * rate))
    keys = jax.random.split(key, n_nodes + 2)

    def interval(i):
        imu = sim.simulate_imu(traj, params, t0 + i * node_dt, node_dt, rate)
        return sim.corrupt_imu(imu, params, keys[i], bg, ba)

    imus = [interval(i) for i in range(n_nodes - 1)]

    # preintegrate each interval from the truth state at its start (the
    # engine would use the mechanized estimate; truth is fine for tests)
    preints = [
        pi.preintegrate(params, truth.index(i), imus[i]) for i in range(n_nodes - 1)
    ]
    pre_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *preints)

    gnss_noise = gnss_std * jax.random.normal(keys[-1], (n_nodes, 3))
    gnss_p = truth.p + gnss_noise

    nodes = win.nodes
    for f in ["time", "p", "q", "v", "bg", "ba"]:
        nodes = nodes._replace(
            **{f: getattr(nodes, f).at[:n_nodes].set(getattr(truth, f))}
        )

    preint = jax.tree.map(
        lambda full, st: full.at[: n_nodes - 1].set(st), win.preint, pre_stack
    )

    win = win._replace(
        nodes=nodes,
        node_valid=win.node_valid.at[:n_nodes].set(True),
        node_is_kf=win.node_is_kf.at[:n_nodes].set(True),
        preint=preint,
        preint_valid=win.preint_valid.at[: n_nodes - 1].set(True),
        gnss_p=win.gnss_p.at[:n_nodes].set(gnss_p),
        gnss_std=win.gnss_std.at[:n_nodes].set(gnss_std),
        gnss_std_base=win.gnss_std_base.at[:n_nodes].set(gnss_std),
        gnss_valid=win.gnss_valid.at[:n_nodes].set(True),
    )
    return win, truth, params, traj


def build_gvins_window(
    n_nodes=8,
    n_landmarks=48,
    node_dt=0.4,
    rate=200.0,
    gnss_std=0.05,
    gnss_every=3,  # GNSS only at every k-th node (vision must bridge)
    px_noise=0.5,  # pixels of observation noise
    focal=780.0,
    with_earth=True,
    seed=0,
):
    """GNSS + IMU + camera window with simulated feature tracks."""
    win, truth, params, traj = build_gins_window(
        n_nodes=n_nodes,
        n_landmarks=n_landmarks,
        node_dt=node_dt,
        rate=rate,
        gnss_std=gnss_std,
        with_earth=with_earth,
        seed=seed,
    )
    key = jax.random.PRNGKey(seed + 100)
    k1, k2, k3 = jax.random.split(key, 3)

    # sparse GNSS
    gnss_valid = win.gnss_valid & (jnp.arange(win.n_nodes) % gnss_every == 0)
    win = win._replace(gnss_valid=gnss_valid)

    # camera extrinsic: camera looking forward (z = body x), like the
    # reference's q_b_c ~ [0.5,0.5,0.5,0.5]
    ext_q = rot.matrix_to_quat(
        jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    )
    ext_p = jnp.array([0.1, 0.0, -0.05])

    t0 = float(truth.time[0])
    t1 = float(truth.time[-1])
    lms = sim.scatter_landmarks(traj, params, k1, n_landmarks, t0, t1 + 1.0)
    uv, vis = sim.project_landmarks(
        traj, params, lms, truth.time, ext_p, ext_q,
        noise_std=px_noise / focal, key=k2,
    )

    # anchor each landmark at its first visible node; needs >= 2 views
    first = jnp.argmax(vis, axis=1).astype(jnp.int32)
    nviews = jnp.sum(vis, axis=1)
    lm_valid = nviews >= 2

    # truth inverse depth in the anchor frame
    def ref_invdepth(l):
        t = truth.time[first[l]]
        s = sim.truth_state(traj, params, t)
        t_wc = s.p + rot.quat_rotate(s.q, ext_p)
        q_wc = rot.quat_mul(s.q, ext_q)
        pc = rot.quat_rotate(rot.quat_inv(q_wc), lms[l] - t_wc)
        return 1.0 / jnp.maximum(pc[2], 0.1)

    invd_truth = jax.vmap(ref_invdepth)(jnp.arange(n_landmarks))

    N = win.n_nodes
    obs_uv = jnp.zeros((n_landmarks, N, 2))
    obs_uv = obs_uv.at[:, :n_nodes].set(uv)
    obs_valid = jnp.zeros((n_landmarks, N), bool)
    obs_valid = obs_valid.at[:, :n_nodes].set(vis)

    # Initialize inverse depths by triangulation like the engine does at
    # landmark creation (the reference triangulates at keyframe insertion,
    # tracking.cc:690-811; a DEFAULT_DEPTH init would be culled by the
    # phase-1 chi2 gate for far landmarks).
    invd_init = invd_truth * (1.0 + 0.05 * jax.random.normal(k3, (n_landmarks,)))

    win = win._replace(
        ext_p=ext_p,
        ext_q=ext_q,
        lm_ref=first,
        lm_valid=lm_valid,
        lm_invdepth=invd_init,
        obs_uv=obs_uv,
        obs_valid=obs_valid,
    )
    return win, truth, params, traj, lms, invd_truth


def perturb_window(win, n_nodes, key, dp=0.3, dth=0.01, dv=0.1):
    k1, k2, k3 = jax.random.split(key, 3)
    nodes = win.nodes
    p = nodes.p.at[:n_nodes].add(dp * jax.random.normal(k1, (n_nodes, 3)))
    dq = rot.rotvec_to_quat(dth * jax.random.normal(k2, (n_nodes, 3)))
    q = nodes.q.at[:n_nodes].set(
        rot.quat_normalize(rot.quat_mul(nodes.q[:n_nodes], dq))
    )
    v = nodes.v.at[:n_nodes].add(dv * jax.random.normal(k3, (n_nodes, 3)))
    # zero bias initial guess (the estimator must recover them)
    bg = nodes.bg.at[:n_nodes].set(0.0)
    ba = nodes.ba.at[:n_nodes].set(0.0)
    return win._replace(nodes=nodes._replace(p=p, q=q, v=v, bg=bg, ba=ba))
