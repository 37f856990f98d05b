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
