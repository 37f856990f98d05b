"""Keyframe-block-sharded long-window BA (parallel/ba_nodes.py).

The 8-way node-sharded solve is EXACT domain decomposition (one level of
nested dissection): with identical problems it must produce the same
iterates as the single-chunk solve up to floating-point reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.ins import preintegration as pi
from ic_gvins_tpu.parallel.ba_nodes import build_nodes_ba, ba_nodes_solve

N = 32
CHUNKS = 8
C = N // CHUNKS
NODE_DT = 0.5
RATE = 100.0


def _build_problem(seed=0, perturb=0.4):
    key = jax.random.PRNGKey(seed)
    params = sim.default_params(with_earth=True)
    traj = sim.car_trajectory()
    t0 = 5.0
    bg = jnp.array([2e-4, -1e-4, 3e-4])
    ba_bias = jnp.array([5e-3, -8e-3, 2e-3])

    node_times = t0 + jnp.arange(N) * NODE_DT
    truth = jax.vmap(lambda t: sim.truth_state(traj, params, t))(node_times)
    truth = truth._replace(bg=jnp.tile(bg, (N, 1)), ba=jnp.tile(ba_bias, (N, 1)))

    keys = jax.random.split(key, N + 4)
    preints = []
    for i in range(N - 1):
        imu = sim.simulate_imu(traj, params, t0 + i * NODE_DT, NODE_DT, RATE)
        imu = sim.corrupt_imu(imu, params, keys[i], bg, ba_bias)
        preints.append(pi.preintegrate(params, truth.index(i), imu))
    pre = jax.tree.map(lambda *xs: jnp.stack(xs), *preints)

    gnss_std = 0.05
    gnss_p = truth.p + gnss_std * jax.random.normal(keys[-1], (N, 3))
    gnss_stds = np.full((N, 3), gnss_std)
    gnss_valid = np.ones(N, bool)

    # landmarks: 3 per chunk anchored at the chunk's first node, observed
    # from the next 3 nodes (all within chunk + separator => zero drops)
    anchors = np.repeat(np.arange(0, N, C), 3)
    L = len(anchors)
    rng = np.random.RandomState(seed + 1)
    obs_uv = np.zeros((L, N, 2))
    obs_valid = np.zeros((L, N), bool)
    lm_invd = np.zeros(L)
    p_np = np.asarray(truth.p)
    q_np = np.asarray(truth.q)

    def body_pc(k, pw):
        # camera == body (identity extrinsic): pc = R^T (pw - p)
        q = q_np[k]
        r = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
        return r.T @ (pw - p_np[k])

    for l, a in enumerate(anchors):
        # world point with positive body-z depth from the anchor
        depth = rng.uniform(6.0, 25.0)
        dir_c = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), 1.0])
        r = np.asarray(rot.quat_to_matrix(jnp.asarray(q_np[a])))
        pw = p_np[a] + r @ (dir_c * depth)
        pc_a = body_pc(a, pw)
        lm_invd[l] = 1.0 / pc_a[2]
        obs_uv[l, a] = pc_a[:2] / pc_a[2]
        obs_valid[l, a] = True
        for k in range(a + 1, min(a + C, N)):
            pc = body_pc(k, pw)
            if pc[2] < 1.0:
                continue
            obs_uv[l, k] = pc[:2] / pc[2] + rng.normal(0, 5e-4, 2)
            obs_valid[l, k] = True

    # perturb the node estimates: BA must pull them back
    nodes0 = truth._replace(
        p=truth.p + perturb * jax.random.normal(keys[-2], (N, 3)),
        v=truth.v + 0.1 * jax.random.normal(keys[-3], (N, 3)),
    )
    return dict(
        nodes=nodes0, truth=truth, preint=pre, gnss_p=np.asarray(gnss_p),
        gnss_std=gnss_stds, gnss_valid=gnss_valid, lm_invd=lm_invd,
        lm_ref=anchors, obs_uv=obs_uv, obs_valid=obs_valid, params=params,
    )


def _solve(prob, n_chunks, devices):
    from jax.sharding import Mesh

    ba, dropped = build_nodes_ba(
        prob["nodes"], prob["preint"], prob["gnss_p"], prob["gnss_std"],
        prob["gnss_valid"], prob["lm_invd"], prob["lm_ref"],
        prob["obs_uv"], prob["obs_valid"],
        ext_p=jnp.zeros(3), ext_q=jnp.array([1.0, 0, 0, 0]),
        reproj_std=1.5 / 500.0, n_chunks=n_chunks, stencil=C,
    )
    assert dropped == 0
    mesh = Mesh(np.array(devices), ("nodes",))
    out, stats = ba_nodes_solve(ba, prob["params"], mesh, iters=10)
    return out, stats


@pytest.fixture(scope="module")
def problem():
    return _build_problem()


def test_sharded_ba_converges(problem):
    out, (cost0, cost1, nacc, it) = _solve(
        problem, CHUNKS, jax.devices()[:CHUNKS])
    assert float(cost1) < 0.2 * float(cost0)
    assert int(nacc) >= 3
    p_t = np.asarray(problem["truth"].p)
    err0 = np.linalg.norm(np.asarray(problem["nodes"].p) - p_t, axis=1)
    err1 = np.linalg.norm(np.asarray(out.nodes.p) - p_t, axis=1)
    assert np.sqrt((err1**2).mean()) < 0.4 * np.sqrt((err0**2).mean())
    assert np.sqrt((err1**2).mean()) < 0.08  # ~GNSS noise floor


def test_sharded_matches_single_chunk(problem):
    """8-way nested dissection == single-chunk solve (exact algebra)."""
    out8, _ = _solve(problem, CHUNKS, jax.devices()[:CHUNKS])
    out1, _ = _solve(problem, 1, jax.devices()[:1])
    dp = np.abs(np.asarray(out8.nodes.p) - np.asarray(out1.nodes.p))
    dv = np.abs(np.asarray(out8.nodes.v) - np.asarray(out1.nodes.v))
    assert dp.max() < 1e-5, dp.max()
    assert dv.max() < 1e-5, dv.max()
    inv8 = np.sort(np.asarray(out8.lm_invdepth).ravel())
    inv1 = np.sort(np.asarray(out1.lm_invdepth).ravel())
    # landmark slots are bucketed differently; compare as sorted multisets
    # over the valid entries
    v8 = np.sort(np.asarray(out8.lm_invdepth)[np.asarray(out8.lm_valid)])
    v1 = np.sort(np.asarray(out1.lm_invdepth)[np.asarray(out1.lm_valid)])
    assert np.abs(v8 - v1).max() < 1e-6


# ---------------------------------------------------------------------------
# Separator-band exactness at scale: landmarks CROSSING the cuts
# (VERDICT r4 #7: no observation may be dropped for implementation
# convenience — the band makes cross-cut landmark cliques exactly
# representable, so the masked-obs count is zero)
# ---------------------------------------------------------------------------

N_BIG = 256
CHUNKS_BIG = 8
C_BIG = N_BIG // CHUNKS_BIG  # 32
BAND = 8  # separator band width >= max forward observation span


def _build_problem_big(seed=7, perturb=0.3, span=BAND):
    """N=256 problem whose landmarks deliberately straddle every chunk
    cut: anchors sit ``span//2`` nodes before each cut and are observed
    ``span`` nodes forward (half the observations live in the next
    chunk's interior). Built vectorized — one IMU simulation for the
    whole run, per-interval slices preintegrated under one vmap."""
    key = jax.random.PRNGKey(seed)
    params = sim.default_params(with_earth=True)
    traj = sim.car_trajectory()
    t0 = 5.0
    bg = jnp.array([2e-4, -1e-4, 3e-4])
    ba_bias = jnp.array([5e-3, -8e-3, 2e-3])
    spi = int(round(NODE_DT * RATE))  # samples per interval

    node_times = t0 + jnp.arange(N_BIG) * NODE_DT
    truth = jax.vmap(lambda t: sim.truth_state(traj, params, t))(node_times)
    truth = truth._replace(bg=jnp.tile(bg, (N_BIG, 1)),
                           ba=jnp.tile(ba_bias, (N_BIG, 1)))

    keys = jax.random.split(key, 6)
    imu = sim.simulate_imu(traj, params, t0, (N_BIG - 1) * NODE_DT, RATE)
    imu = sim.corrupt_imu(imu, params, keys[0], bg, ba_bias)

    # interval i = samples [i*spi .. (i+1)*spi] with entry 0 as the zero
    # seed (the per-interval generation convention: the seed only provides
    # the coning predecessor, which a fresh preintegration buffer lacks)
    idx = np.arange(N_BIG - 1)[:, None] * spi + np.arange(spi + 1)[None]

    def slice_interval(a):
        a = jnp.asarray(a)
        out = a[idx]
        z = jnp.zeros_like(out[:, :1])
        return jnp.concatenate([z, out[:, 1:]], axis=1)

    imu_sl = sim.ImuSeq(
        time=jnp.asarray(imu.time)[idx],  # times stay real for dt checks
        dt=slice_interval(imu.dt),
        dtheta=slice_interval(imu.dtheta),
        dvel=slice_interval(imu.dvel),
    )
    pre = jax.vmap(lambda s, i: pi.preintegrate(params, s, i))(
        jax.tree.map(lambda x: x[:-1], truth), imu_sl)

    gnss_std = 0.05
    gnss_p = truth.p + gnss_std * jax.random.normal(keys[1], (N_BIG, 3))
    gnss_stds = np.full((N_BIG, 3), gnss_std)
    gnss_valid = np.ones(N_BIG, bool)

    # anchors: span//2 nodes BEFORE every cut (crossing landmarks) plus
    # one mid-chunk anchor per chunk (interior landmarks)
    cuts = np.arange(C_BIG, N_BIG, C_BIG)
    anchors = np.concatenate([
        np.repeat(cuts - span // 2, 2),  # 2 landmarks per cut, cross it
        np.arange(C_BIG // 2, N_BIG, C_BIG),  # interior controls
    ])
    L = len(anchors)
    rng = np.random.RandomState(seed + 1)
    obs_uv = np.zeros((L, N_BIG, 2))
    obs_valid = np.zeros((L, N_BIG), bool)
    lm_invd = np.zeros(L)
    p_np = np.asarray(truth.p)
    q_np = np.asarray(truth.q)

    def body_pc(k, pw):
        q = q_np[k]
        r = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
        return r.T @ (pw - p_np[k])

    for l, a in enumerate(anchors):
        depth = rng.uniform(8.0, 30.0)
        dir_c = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 1.0])
        r = np.asarray(rot.quat_to_matrix(jnp.asarray(q_np[a])))
        pw = p_np[a] + r @ (dir_c * depth)
        pc_a = body_pc(a, pw)
        lm_invd[l] = 1.0 / pc_a[2]
        obs_uv[l, a] = pc_a[:2] / pc_a[2]
        obs_valid[l, a] = True
        for k in range(a + 1, min(a + span + 1, N_BIG)):
            pc = body_pc(k, pw)
            if pc[2] < 1.0:
                continue
            obs_uv[l, k] = pc[:2] / pc[2] + rng.normal(0, 5e-4, 2)
            obs_valid[l, k] = True

    nodes0 = truth._replace(
        p=truth.p + perturb * jax.random.normal(keys[2], (N_BIG, 3)),
        v=truth.v + 0.1 * jax.random.normal(keys[3], (N_BIG, 3)),
    )
    return dict(
        nodes=nodes0, truth=truth, preint=pre, gnss_p=np.asarray(gnss_p),
        gnss_std=gnss_stds, gnss_valid=gnss_valid, lm_invd=lm_invd,
        lm_ref=anchors, obs_uv=obs_uv, obs_valid=obs_valid, params=params,
    )


def _solve_band(prob, n_chunks, devices, sep_width, iters=6):
    from jax.sharding import Mesh

    ba, dropped = build_nodes_ba(
        prob["nodes"], prob["preint"], prob["gnss_p"], prob["gnss_std"],
        prob["gnss_valid"], prob["lm_invd"], prob["lm_ref"],
        prob["obs_uv"], prob["obs_valid"],
        ext_p=jnp.zeros(3), ext_q=jnp.array([1.0, 0, 0, 0]),
        reproj_std=1.5 / 500.0, n_chunks=n_chunks, stencil=BAND + 2,
        sep_width=sep_width,
    )
    mesh = Mesh(np.array(devices), ("nodes",))
    out, stats = ba_nodes_solve(ba, prob["params"], mesh, iters=iters,
                                sep_width=sep_width)
    return out, stats, dropped


@pytest.fixture(scope="module")
def problem_big():
    return _build_problem_big()


def test_band_keeps_all_crosscut_obs(problem_big):
    """sep_width >= span => ZERO dropped observations; the old
    single-node separator (sep_width=1) provably dropped them."""
    from jax.sharding import Mesh  # noqa: F401

    ba, dropped_band = build_nodes_ba(
        problem_big["nodes"], problem_big["preint"], problem_big["gnss_p"],
        problem_big["gnss_std"], problem_big["gnss_valid"],
        problem_big["lm_invd"], problem_big["lm_ref"],
        problem_big["obs_uv"], problem_big["obs_valid"],
        ext_p=jnp.zeros(3), ext_q=jnp.array([1.0, 0, 0, 0]),
        reproj_std=1.5 / 500.0, n_chunks=CHUNKS_BIG, stencil=BAND + 2,
        sep_width=BAND,
    )
    assert dropped_band == 0
    _, dropped_old = build_nodes_ba(
        problem_big["nodes"], problem_big["preint"], problem_big["gnss_p"],
        problem_big["gnss_std"], problem_big["gnss_valid"],
        problem_big["lm_invd"], problem_big["lm_ref"],
        problem_big["obs_uv"], problem_big["obs_valid"],
        ext_p=jnp.zeros(3), ext_q=jnp.array([1.0, 0, 0, 0]),
        reproj_std=1.5 / 500.0, n_chunks=CHUNKS_BIG, stencil=BAND + 2,
        sep_width=1,
    )
    assert dropped_old > 0  # the r4 gap this band closes


def test_band_sharded_matches_replicated(problem_big):
    """8-way band nested dissection == replicated single-chunk solve at
    N=256 with landmarks straddling every cut (exact algebra, f64)."""
    out8, stats8, drop8 = _solve_band(
        problem_big, CHUNKS_BIG, jax.devices()[:CHUNKS_BIG], BAND)
    assert drop8 == 0
    out1, stats1, drop1 = _solve_band(problem_big, 1, jax.devices()[:1], 1)
    assert drop1 == 0  # single chunk sees everything by construction
    dp = np.abs(np.asarray(out8.nodes.p) - np.asarray(out1.nodes.p))
    dv = np.abs(np.asarray(out8.nodes.v) - np.asarray(out1.nodes.v))
    assert dp.max() < 1e-5, dp.max()
    assert dv.max() < 1e-5, dv.max()
    v8 = np.sort(np.asarray(out8.lm_invdepth)[np.asarray(out8.lm_valid)])
    v1 = np.sort(np.asarray(out1.lm_invdepth)[np.asarray(out1.lm_valid)])
    assert np.abs(v8 - v1).max() < 1e-6

    # and it actually converges toward truth
    cost0, cost1, nacc, _ = stats8
    assert float(cost1) < 0.3 * float(cost0)
    p_t = np.asarray(problem_big["truth"].p)
    err0 = np.linalg.norm(np.asarray(problem_big["nodes"].p) - p_t, axis=1)
    err1 = np.linalg.norm(np.asarray(out8.nodes.p) - p_t, axis=1)
    assert np.sqrt((err1**2).mean()) < 0.5 * np.sqrt((err0**2).mean())
