"""Online camera-IMU extrinsic + time-delay estimation
(parity with optimize_estimate_extrinsic / optimize_estimate_td,
``ic_gvins.cc:1804-1820``)."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import build_gvins_window, default_cfg, perturb_window

from ic_gvins_tpu.common import rotation as rot
from ic_gvins_tpu.solver import lm
from ic_gvins_tpu.solver.window import make_init_prior


def std_priors():
    pose_std = jnp.array([0.1] * 3 + [0.5 * jnp.pi / 180] * 2 + [1.5 * jnp.pi / 180])
    mix_std = jnp.array([0.1] * 3 + [2 * jnp.pi / 180] * 3 + [0.2] * 3)
    return pose_std, mix_std


def test_extrinsic_recovered():
    n = 8
    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=n, n_landmarks=64, seed=51, px_noise=0.3
    )
    cfg = default_cfg()._replace(estimate_extrinsic=jnp.asarray(True))
    pose_std, mix_std = std_priors()

    # perturb the extrinsic guess: 2 cm translation, ~0.6 deg rotation
    true_p, true_q = win.ext_p, win.ext_q
    dq = rot.rotvec_to_quat(jnp.array([0.006, -0.008, 0.01]))
    win_bad = win._replace(
        ext_p=win.ext_p + jnp.array([0.02, -0.015, 0.01]),
        ext_q=rot.quat_normalize(rot.quat_mul(win.ext_q, dq)),
    )
    # extrinsic anchored around the (perturbed) calibration: translation is
    # nearly unobservable at this scene scale, rotation is well observable
    ext_std = jnp.array([0.05] * 3 + [2 * jnp.pi / 180] * 3 + [0.05])
    prior = make_init_prior(win_bad, pose_std, mix_std, ext_std7=ext_std)

    win_opt, (s1, s2, _) = lm.optimize(win_bad, prior, cfg, params, iters=25)

    # the 0.0142 rad initial rotation error must at least halve (full
    # recovery is limited by the anchor prior + observability), and the
    # translation must stay bounded near calibration
    dq_err = rot.quat_mul(rot.quat_inv(win_opt.ext_q), true_q)
    assert float(jnp.linalg.norm(rot.quat_to_rotvec(dq_err))) < 0.008
    assert float(jnp.linalg.norm(win_opt.ext_p - true_p)) < 0.05, win_opt.ext_p


def test_td_recovered():
    n = 8
    win, truth, params, traj, lms, invd_truth = build_gvins_window(
        n_nodes=n, n_landmarks=64, seed=52, px_noise=0.2
    )
    cfg = default_cfg()._replace(estimate_td=jnp.asarray(True))
    pose_std, mix_std = std_priors()
    prior = make_init_prior(win, pose_std, mix_std)

    # synthesize a time delay: shift observations by td * velocity
    td_true = 0.02
    key = jax.random.PRNGKey(0)
    vel = 0.3 * jax.random.normal(key, win.obs_vel.shape)  # normalized-plane vel
    win_td = win._replace(
        obs_uv=win.obs_uv - td_true * vel,
        obs_vel=vel,
        td=jnp.asarray(0.0),
    )
    win_opt, _ = lm.optimize(win_td, prior, cfg, params, iters=25)
    # the factor models uv_obs - (td - td0)*vel; recovering td=-0.02 ...
    # check: residual model pts = uv - (td - frame_td) * vel matches the
    # synthesized shift when td = -td_true
    assert abs(float(win_opt.td) + td_true) < 0.005, float(win_opt.td)