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
