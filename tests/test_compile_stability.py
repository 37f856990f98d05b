"""Long-run XLA compile stability (VERDICT r2 #10): after warm-up, a
continuous estimator run must trigger ZERO new XLA compilations — the
round-2 churn class of bug (eager scans re-tracing per call; unbucketed
shapes) ended with XLA:CPU dying of "LLVM compilation error: Cannot
allocate memory" after ~10 min of soak.

Counts compilations via the jax_log_compiles logging channel.
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_estimator import small_cfg

from ic_gvins_tpu.data import simulator as sim
from ic_gvins_tpu.engine.estimator import Estimator


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        msg = record.getMessage()
        if "ompil" in msg:  # "Compiling ..." / "Finished ... compiling"
            self.records.append(msg)


@pytest.mark.slow
def test_no_new_compilations_after_warmup():
    cfg = small_cfg()
    params = sim.default_params(with_earth=cfg.iswithearth,
                                lat_deg=cfg.track_ref_lat_deg)
    traj = sim.car_trajectory()
    duration, warmup = 45.0, 25.0
    key = jax.random.PRNGKey(4)
    imu = sim.simulate_imu(traj, params, 0.0, duration, 200.0)
    imu = sim.corrupt_imu(imu, params, key, jnp.array([2e-4, -1e-4, 3e-4]),
                          jnp.array([5e-3, -8e-3, 2e-3]))
    gnss = sim.simulate_gnss(traj, params, jnp.asarray(cfg.antlever), 0.0,
                             duration, 1.0, std=0.05,
                             key=jax.random.fold_in(key, 1))

    counter = _CompileCounter()
    logger = logging.getLogger("jax")
    old_level = logger.level
    jax.config.update("jax_log_compiles", True)
    logger.addHandler(counter)
    logger.setLevel(logging.DEBUG)
    try:
        est = Estimator(cfg)
        gi = 0
        gt = np.asarray(gnss.time)
        gp = np.asarray(gnss.p)
        gs = np.asarray(gnss.std)
        n_at_warmup = None
        for k in range(imu.n):
            dt = float(imu.dt[k])
            if dt == 0.0:
                continue
            t = float(imu.time[k])
            est.add_imu(t, dt, np.asarray(imu.dtheta[k]),
                        np.asarray(imu.dvel[k]))
            while gi < len(gt) and gt[gi] <= t:
                est.add_gnss(float(gt[gi]), gp[gi], gs[gi])
                gi += 1
            if n_at_warmup is None and t >= warmup:
                n_at_warmup = len(counter.records)
        n_final = len(counter.records)
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.removeHandler(counter)
        logger.setLevel(old_level)

    assert n_at_warmup is not None and n_at_warmup > 0, "nothing compiled?"
    new = counter.records[n_at_warmup:]
    assert n_final == n_at_warmup, (
        f"{n_final - n_at_warmup} NEW compilations after {warmup:.0f} s "
        f"warm-up (churn regression):\n" + "\n".join(new[:10])
    )
