"""ic_gvins_tpu: a TPU-native GNSS-Visual-Inertial navigation engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of IC-GVINS
(i2Nav group, Wuhan University): INS-centric fusion of IMU, monocular
camera, and GNSS in a sliding-window factor graph with Earth-rotation
compensation, INS-aided feature tracking, and robust outlier culling.

Design: the sliding window is a fixed-shape SoA pytree; factor residuals
and Jacobians are vmapped pure functions; the nonlinear solve is a jitted
Levenberg-Marquardt loop with Schur elimination of landmark inverse depths;
marginalization is dense XLA linear algebra; vision kernels are batched
XLA/Pallas programs. Multi-chip scaling shards landmark blocks over a
``jax.sharding.Mesh`` and reduces the camera system with psum.
"""

__version__ = "0.1.0"

# On TPU, jnp matmuls/einsums default to bf16 inputs (one MXU pass).
# The estimator's normal-equation assembly, Schur elimination and
# preintegration compositions are f32 CONDITIONING-critical: with bf16
# inputs the urban endurance replay diverges inside the first minute
# (measured r5: 35 m error / 9 emergency recenters by t=60 s on chip,
# while the same f32 code on CPU — full f32 matmuls — holds 0.1 m).
# HIGHEST runs f32 matmuls in 6 MXU passes; measured cost at batch 32:
# ~20% of full-round throughput (143.8 -> 115.6 frames/s/chip, optimize
# 90.6 -> 141.7 ms — the solver stages are the matmul-heavy ones), the
# price of a correct f32 solver on this hardware. Exportable knob:
# IC_GVINS_MATMUL_PRECISION=default restores the raw-speed behavior for
# kernels known to tolerate it (benchmarking, preprocessing experiments).
import os as _os

import jax as _jax

_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("IC_GVINS_MATMUL_PRECISION", "highest"),
)
