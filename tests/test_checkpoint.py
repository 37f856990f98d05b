"""Checkpoint/resume: a resumed estimator must continue identically."""

import os
import tempfile

import numpy as np

from test_estimator import ate, run_sequence, small_cfg

from ic_gvins_tpu.engine.estimator import Estimator


def test_checkpoint_resume_continues(tmp_path):
    cfg = small_cfg()
    # run the first half
    est, traj, params = run_sequence(cfg, duration=8.0, with_vision=False)
    ckpt = os.path.join(tmp_path, "ckpt.pkl")
    est.save_checkpoint(ckpt)

    # resume into a fresh estimator and feed more data
    est2 = Estimator(cfg)
    est2.load_checkpoint(ckpt)
    assert est2.n_nodes == est.n_nodes
    np.testing.assert_allclose(
        np.asarray(est2.window.nodes.p), np.asarray(est.window.nodes.p)
    )

    import jax
    import jax.numpy as jnp

    from ic_gvins_tpu.data import simulator as sim

    key = jax.random.PRNGKey(0)
    imu = sim.simulate_imu(traj, params, 8.0, 4.0, 200.0)
    imu = sim.corrupt_imu(
        imu, params, jax.random.PRNGKey(99),
        jnp.array([2e-4, -1e-4, 3e-4]), jnp.array([5e-3, -8e-3, 2e-3]),
    )
    gnss = sim.simulate_gnss(
        traj, params, jnp.asarray(cfg.antlever), 9.0, 3.0, 1.0,
        std=0.05, key=jax.random.PRNGKey(98),
    )
    gi = 0
    gt = np.asarray(gnss.time)
    for k in range(imu.n):
        dt = float(imu.dt[k])
        if dt == 0.0:
            continue
        t = float(imu.time[k])
        est2.add_imu(t, dt, np.asarray(imu.dtheta[k]), np.asarray(imu.dvel[k]))
        while gi < len(gt) and gt[gi] <= t:
            est2.add_gnss(float(gt[gi]), np.asarray(gnss.p[gi]), np.asarray(gnss.std[gi]))
            gi += 1

    # the resumed run keeps estimating accurately
    rmse, mx = ate(est2, traj, params, t_min=8.5)
    assert rmse < 0.15, (rmse, mx)
