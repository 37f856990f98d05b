"""Physics-consistent synthetic GNSS/IMU/camera data generator.

There is no public dataset baked into this image, so validation and
benchmarks run on simulated sequences: an analytic trajectory in the local
NED n-frame, from which IMU increments are derived by *autodiff of the
ground-truth kinematics* (velocity/acceleration/body rates are exact
derivatives via ``jax.jacfwd``, not finite differences), including the
Earth-rotation terms of the mechanization model
(reference ``misc.cc:204-223``):

    gyro rate   w_ib^b = w_nb^b + R(q)^T w_ie^n
    accel rate  f^b    = R(q)^T (a_n - g_n + 2 w_ie^n x v_n)

so that mechanizing the clean increments reproduces the trajectory to the
integrator's order. Increments use Gauss-Legendre quadrature of the rates
over each IMU interval. GNSS fixes apply the antenna lever arm exactly as
the reference models it (``gnss_factor.h:60``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import rotation as rot
from ..data.types import Gnss, ImuSeq, IntegrationParams, NavState

# 4-point Gauss-Legendre nodes/weights on [0, 1].
_GL_NODES = jnp.array(
    [0.069431844202974, 0.330009478207572, 0.669990521792428, 0.930568155797026]
)
_GL_WEIGHTS = jnp.array(
    [0.173927422568727, 0.326072577431273, 0.326072577431273, 0.173927422568727]
)


class Trajectory(NamedTuple):
    """Analytic trajectory: position and Euler attitude as functions of t."""

    pos: Callable[[jax.Array], jax.Array]  # t -> (3,) NED position
    euler: Callable[[jax.Array], jax.Array]  # t -> (3,) roll/pitch/yaw


def car_trajectory(
    speed: float = 8.0,
    turn_period: float = 60.0,
    turn_amp: float = 0.6,
    bump_amp: float = 0.05,
    roll_amp: float = 0.005,
    pitch_amp: float = 0.004,
) -> Trajectory:
    """A smooth car-like run: forward at ~speed with serpentine heading and
    small roll/pitch perturbations — shaped after the KAIST urban drives
    (car platform, ~10 m/s)."""

    def yaw(t):
        return turn_amp * jnp.sin(2 * jnp.pi * t / turn_period)

    def pos(t):
        # Integrate heading analytically-ish: use a closed-form serpentine.
        w = 2 * jnp.pi / turn_period
        # x = ∫ cos(yaw), y = ∫ sin(yaw); for small-ish amp use series-free
        # closed form via Bessel would be overkill — instead parameterize the
        # path directly and let yaw follow the path tangent.
        x = speed * t
        y = (speed * turn_amp / w) * (1.0 - jnp.cos(w * t))
        z = bump_amp * jnp.sin(2 * jnp.pi * t / 7.3)
        return jnp.stack([x, y, z])

    def euler(t):
        # Yaw follows the path tangent; roll/pitch small oscillations
        # (car-realistic: a few tenths of a degree).
        w = 2 * jnp.pi / turn_period
        yw = jnp.arctan2(turn_amp * jnp.sin(w * t), 1.0)
        r = roll_amp * jnp.sin(2 * jnp.pi * t / 11.0)
        p = pitch_amp * jnp.sin(2 * jnp.pi * t / 5.0)
        return jnp.stack([r, p, yw])

    return Trajectory(pos=pos, euler=euler)


class UrbanRoute(NamedTuple):
    """Piecewise closed-form urban drive (KAIST urban38-equivalent scale).

    Segments are straights with cosine speed ramps, constant-speed arcs
    (intersection turns / U-turns), and dwells (traffic stops). Position,
    heading and cumulative distance have closed forms per segment, so the
    simulator's autodiff-of-kinematics IMU derivation applies unchanged.
    Velocity is continuous across junctions by construction; acceleration
    steps at junctions (centripetal onset) like a real car's jerk, which
    the Gauss-Legendre increment quadrature absorbs as sub-sample error.
    """

    t0: jnp.ndarray  # [S] segment start times
    kind: jnp.ndarray  # [S] 0 = straight (ramp), 1 = arc
    p0: jnp.ndarray  # [S,2] start xy (NED north/east)
    yaw0: jnp.ndarray  # [S] start heading (continuous, unwrapped)
    v0: jnp.ndarray  # [S] entry speed
    v1: jnp.ndarray  # [S] exit speed (straights; == v0 for arcs)
    omega: jnp.ndarray  # [S] yaw rate (arcs; dummy 1.0 for straights)
    dur: jnp.ndarray  # [S] duration
    d0: jnp.ndarray  # [S] cumulative distance at segment start
    total_time: float
    total_dist: float


def urban_route(
    seed: int = 0,
    duration: float = 2154.0,
    cruise_range: tuple[float, float] = (6.0, 11.0),
    turn_speed: float = 4.5,
    block_range: tuple[float, float] = (150.0, 450.0),
    radius_range: tuple[float, float] = (10.0, 22.0),
    stop_prob: float = 0.30,
    dwell_range: tuple[float, float] = (8.0, 20.0),
    uturn_prob: float = 0.08,
    initial_dwell: float = 8.0,
) -> UrbanRoute:
    """Plan a deterministic urban drive until ``duration`` is covered.

    Defaults target the KAIST urban38 envelope (2154 s / 11.2 km,
    reference ``README.md:131``): city blocks with 90-deg corners,
    occasional U-turns, and traffic-light stops.
    """
    rng = np.random.RandomState(seed)
    segs = []  # (kind, v0, v1, omega, dur)
    t = 0.0
    v_cur = 0.0

    def add(kind, v0, v1, omega, dur):
        nonlocal t
        if dur <= 1e-6:
            return
        segs.append((kind, v0, v1, omega, dur))
        t += dur

    # static start (leveling/bias initialization window, like the
    # reference's datasets), then pull away from rest
    if initial_dwell > 0:
        add(0, 0.0, 0.0, 1.0, initial_dwell)
    add(0, 0.0, turn_speed, 1.0, 6.0)
    v_cur = turn_speed
    while t < duration:
        v_cruise = rng.uniform(*cruise_range)
        block = rng.uniform(*block_range)
        # straight: ramp v_cur -> v_cruise over the block, then back down
        # to the next junction speed. Split 40/60 so both ramps are gentle.
        l1, l2 = 0.4 * block, 0.6 * block
        add(0, v_cur, v_cruise, 1.0, 2 * l1 / (v_cur + v_cruise))
        if rng.uniform() < stop_prob:
            # traffic stop mid-block: decel to 0, dwell, accel
            l_stop = min(0.5 * l2, 40.0)
            add(0, v_cruise, 0.0, 1.0, 2 * l_stop / v_cruise)
            add(0, 0.0, 0.0, 1.0, rng.uniform(*dwell_range))
            add(0, 0.0, v_cruise, 1.0, 2 * l_stop / v_cruise)
            l2 = max(l2 - 2 * l_stop, 20.0)
        add(0, v_cruise, turn_speed, 1.0, 2 * l2 / (v_cruise + turn_speed))
        # junction: +-90 deg corner, or occasionally a U-turn
        ang = np.pi if rng.uniform() < uturn_prob else np.pi / 2
        sgn = 1.0 if rng.uniform() < 0.5 else -1.0
        radius = rng.uniform(*radius_range)
        omega = sgn * turn_speed / radius
        add(1, turn_speed, turn_speed, omega, ang / abs(omega))
        v_cur = turn_speed

    # integrate junction states in f64 on host
    n = len(segs)
    kind = np.array([s[0] for s in segs], np.int32)
    v0 = np.array([s[1] for s in segs])
    v1 = np.array([s[2] for s in segs])
    omega = np.array([s[3] for s in segs])
    dur = np.array([s[4] for s in segs])
    t0 = np.concatenate([[0.0], np.cumsum(dur)[:-1]])
    p0 = np.zeros((n + 1, 2))
    yaw0 = np.zeros(n + 1)
    d0 = np.zeros(n + 1)
    for i in range(n):
        if kind[i] == 0:
            d = 0.5 * (v0[i] + v1[i]) * dur[i]
            p0[i + 1] = p0[i] + d * np.array(
                [np.cos(yaw0[i]), np.sin(yaw0[i])]
            )
            yaw0[i + 1] = yaw0[i]
        else:
            y1 = yaw0[i] + omega[i] * dur[i]
            r = v0[i] / omega[i]
            p0[i + 1] = p0[i] + r * np.array(
                [np.sin(y1) - np.sin(yaw0[i]), np.cos(yaw0[i]) - np.cos(y1)]
            )
            yaw0[i + 1] = y1
            d = v0[i] * dur[i]
        d0[i + 1] = d0[i] + d
    return UrbanRoute(
        t0=jnp.asarray(t0), kind=jnp.asarray(kind), p0=jnp.asarray(p0[:-1]),
        yaw0=jnp.asarray(yaw0[:-1]), v0=jnp.asarray(v0), v1=jnp.asarray(v1),
        omega=jnp.asarray(omega), dur=jnp.asarray(dur), d0=jnp.asarray(d0[:-1]),
        total_time=float(t0[-1] + dur[-1]), total_dist=float(d0[-1]),
    )


def _route_eval(route: UrbanRoute, t):
    """(xy, yaw, dist) at time t — closed form, autodiff-safe."""
    i = jnp.clip(
        jnp.searchsorted(route.t0, t, side="right") - 1, 0, route.t0.shape[0] - 1
    )
    tau = jnp.clip(t - route.t0[i], 0.0, route.dur[i])
    v0, v1, T = route.v0[i], route.v1[i], route.dur[i]
    # straight: cosine speed ramp v0 -> v1; closed-form distance
    d_str = v0 * tau + 0.5 * (v1 - v0) * (
        tau - (T / jnp.pi) * jnp.sin(jnp.pi * tau / T)
    )
    yaw_str = route.yaw0[i]
    xy_str = route.p0[i] + d_str * jnp.stack(
        [jnp.cos(yaw_str), jnp.sin(yaw_str)]
    )
    # arc: constant speed, constant yaw rate (omega is dummy 1.0 for
    # straights so this branch never divides by zero under jnp.where)
    w = route.omega[i]
    yaw_arc = route.yaw0[i] + w * tau
    r = v0 / w
    xy_arc = route.p0[i] + r * jnp.stack(
        [
            jnp.sin(yaw_arc) - jnp.sin(route.yaw0[i]),
            jnp.cos(route.yaw0[i]) - jnp.cos(yaw_arc),
        ]
    )
    d_arc = v0 * tau
    is_arc = route.kind[i] == 1
    xy = jnp.where(is_arc, xy_arc, xy_str)
    yaw = jnp.where(is_arc, yaw_arc, yaw_str)
    dist = route.d0[i] + jnp.where(is_arc, d_arc, d_str)
    return xy, yaw, dist


def urban_trajectory(
    route: UrbanRoute,
    bump_amp: float = 0.04,
    roll_amp: float = 0.006,
    pitch_amp: float = 0.005,
) -> Trajectory:
    """Trajectory over an UrbanRoute. Vertical bumps and roll/pitch
    oscillations are functions of *distance travelled*, so they freeze at
    stops — the ZUPT detector sees genuine zero motion at traffic lights,
    matching how the reference initializes from standstill
    (``ic_gvins.cc:644-660``)."""

    def pos(t):
        xy, _, dist = _route_eval(route, t)
        z = bump_amp * jnp.sin(2 * jnp.pi * dist / 23.0)
        return jnp.concatenate([xy, z[None] if z.ndim == 0 else z])

    def euler(t):
        _, yaw, dist = _route_eval(route, t)
        r = roll_amp * jnp.sin(2 * jnp.pi * dist / 31.0)
        p = pitch_amp * jnp.sin(2 * jnp.pi * dist / 17.0)
        return jnp.stack([r, p, yaw])

    return Trajectory(pos=pos, euler=euler)


def static_trajectory() -> Trajectory:
    """Stationary platform (for ZUPT / initialization tests)."""
    return Trajectory(
        pos=lambda t: jnp.zeros(3) * t,
        euler=lambda t: jnp.zeros(3) * t,
    )


def truth_state(traj: Trajectory, params: IntegrationParams, t: jax.Array) -> NavState:
    """Ground-truth NavState at time t (zero biases)."""
    p = traj.pos(t)
    v = jax.jacfwd(traj.pos)(t)
    q = rot.euler_to_quat(traj.euler(t))
    z = jnp.zeros(3, p.dtype)
    return NavState(time=t, p=p, q=q, v=v, bg=z, ba=z)


def _rates(traj: Trajectory, params: IntegrationParams, t: jax.Array):
    """Exact body-frame gyro and specific-force rates at time t."""
    vel_fn = jax.jacfwd(traj.pos)
    acc_fn = jax.jacfwd(vel_fn)
    quat_fn = lambda tt: rot.euler_to_quat(traj.euler(tt))
    qdot_fn = jax.jacfwd(quat_fn)

    q = quat_fn(t)
    qdot = qdot_fn(t)
    # qdot = 0.5 * q ⊗ [0, w_nb^b]  =>  w_nb^b = 2 * vec(q^-1 ⊗ qdot)
    w_nb_b = 2.0 * rot.quat_mul(rot.quat_inv(q), qdot)[1:]

    v = vel_fn(t)
    a = acc_fn(t)
    rT = rot.quat_to_matrix(q).T
    gyro = w_nb_b + rT @ params.iewn
    accel = rT @ (a - params.gravity + 2.0 * jnp.cross(params.iewn, v))
    return gyro, accel


def simulate_imu(
    traj: Trajectory,
    params: IntegrationParams,
    t0: float,
    duration: float,
    rate: float,
) -> ImuSeq:
    """Clean IMU increments by Gauss-Legendre quadrature of the exact rates
    over each interval. Sample i covers (t0+(i-1)*dt, t0+i*dt]; sample 0 is
    a zero seed at t0 (matching the convention that the first buffer entry
    only provides the coning predecessor)."""
    dt = 1.0 / rate
    n = int(round(duration * rate))
    times = t0 + jnp.arange(1, n + 1) * dt

    def increments(t_end):
        ts = t_end - dt + _GL_NODES * dt
        gyros, accels = jax.vmap(lambda tt: _rates(traj, params, tt))(ts)
        dtheta = jnp.einsum("k,ki->i", _GL_WEIGHTS, gyros) * dt
        dvel = jnp.einsum("k,ki->i", _GL_WEIGHTS, accels) * dt
        return dtheta, dvel

    dthetas, dvels = jax.lax.map(increments, times)
    # Prepend the zero seed sample at t0.
    time = jnp.concatenate([jnp.array([t0]), times])
    dts = jnp.concatenate([jnp.array([0.0]), jnp.full(n, dt)])
    dthetas = jnp.concatenate([jnp.zeros((1, 3)), dthetas])
    dvels = jnp.concatenate([jnp.zeros((1, 3)), dvels])
    return ImuSeq(time=time, dt=dts, dtheta=dthetas, dvel=dvels)


def corrupt_imu(
    imu: ImuSeq,
    params: IntegrationParams,
    key: jax.Array,
    bg: jax.Array,
    ba: jax.Array,
) -> ImuSeq:
    """Add constant biases + white noise per the IMU noise model
    (ARW/VRW as increment noise: sigma*sqrt(dt))."""
    kg, ka = jax.random.split(key)
    sdt = jnp.sqrt(jnp.maximum(imu.dt, 0.0))[:, None]
    noise_g = params.gyr_arw * sdt * jax.random.normal(kg, imu.dtheta.shape)
    noise_a = params.acc_vrw * sdt * jax.random.normal(ka, imu.dvel.shape)
    return imu._replace(
        dtheta=imu.dtheta + imu.dt[:, None] * bg + noise_g,
        dvel=imu.dvel + imu.dt[:, None] * ba + noise_a,
    )


def simulate_gnss(
    traj: Trajectory,
    params: IntegrationParams,
    antlever: jax.Array,
    t0: float,
    duration: float,
    rate: float = 1.0,
    std: float = 0.05,
    key: jax.Array | None = None,
) -> Gnss:
    """GNSS fixes at the antenna phase center: p + R(q) @ antlever + noise."""
    n = int(round(duration * rate)) + 1
    times = t0 + jnp.arange(n) / rate

    def fix(t):
        s = truth_state(traj, params, t)
        return s.p + rot.quat_rotate(s.q, antlever)

    ps = jax.lax.map(fix, times)
    if key is not None:
        ps = ps + std * jax.random.normal(key, ps.shape)
    return Gnss(time=times, p=ps, std=jnp.full((n, 3), std))


def simulate_odometer(
    traj: Trajectory,
    params: IntegrationParams,
    t0: float,
    duration: float,
    rate: float = 100.0,
    sodo_true: float = 0.0,
    noise_std: float = 0.0,
    key: jax.Array | None = None,
):
    """Wheel-odometer forward-velocity samples (times, vel).

    Measurement model matches the reference's scale convention
    (``preintegration_odo.cc:212-215``: true displacement =
    measured * (1 + sodo)), so ``vel = v_body_x / (1 + sodo_true)``.
    """
    n = int(round(duration * rate)) + 1
    times = t0 + jnp.arange(n) / rate
    vel_fn = jax.jacfwd(traj.pos)

    def speed(t):
        v = vel_fn(t)
        q = rot.euler_to_quat(traj.euler(t))
        return (rot.quat_to_matrix(q).T @ v)[0]

    v = jax.lax.map(speed, times) / (1.0 + sodo_true)
    if key is not None and noise_std > 0:
        v = v + noise_std * jax.random.normal(key, v.shape)
    return times, v


def scatter_landmarks(
    traj: Trajectory,
    params: IntegrationParams,
    key: jax.Array,
    n: int,
    t0: float,
    t1: float,
    lateral: float = 30.0,
    depth_range: tuple[float, float] = (8.0, 60.0),
) -> jax.Array:
    """Scatter world landmarks around the trajectory segment [t0, t1]: each
    is placed at a random distance in front of the camera at a random time,
    so features are visible from nearby frames."""
    kt, kd, ko = jax.random.split(key, 3)
    ts = jax.random.uniform(kt, (n,), minval=t0, maxval=t1)
    depths = jax.random.uniform(
        kd, (n,), minval=depth_range[0], maxval=depth_range[1]
    )
    offsets = jax.random.uniform(ko, (n, 2), minval=-lateral, maxval=lateral)

    def place(t, d, off):
        s = truth_state(traj, params, t)
        fwd = rot.quat_rotate(s.q, jnp.array([1.0, 0.0, 0.0]))
        right = rot.quat_rotate(s.q, jnp.array([0.0, 1.0, 0.0]))
        down = rot.quat_rotate(s.q, jnp.array([0.0, 0.0, 1.0]))
        return s.p + fwd * d + right * off[0] + down * (off[1] * 0.15 - 1.0)

    return jax.vmap(place)(ts, depths, offsets)


def project_landmarks(
    traj: Trajectory,
    params: IntegrationParams,
    landmarks: jax.Array,  # [L,3] world points
    times: jax.Array,  # [K] frame times
    ext_p: jax.Array,
    ext_q: jax.Array,
    fov_tan: float = 0.8,
    min_depth: float = 2.0,
    max_depth: float = 120.0,
    noise_std: float = 0.0,
    key: jax.Array | None = None,
):
    """Ideal feature tracks: normalized-plane observations of each landmark
    from each frame, with visibility mask. Returns (uv [L,K,2], vis [L,K])."""

    def per_frame(t):
        s = truth_state(traj, params, t)
        t_wc = s.p + rot.quat_rotate(s.q, ext_p)
        q_wc = rot.quat_mul(s.q, ext_q)
        pc = jax.vmap(
            lambda pw: rot.quat_rotate(rot.quat_inv(q_wc), pw - t_wc)
        )(landmarks)
        z = pc[:, 2]
        uv = pc[:, :2] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)[:, None]
        vis = (
            (z > min_depth)
            & (z < max_depth)
            & (jnp.abs(uv[:, 0]) < fov_tan)
            & (jnp.abs(uv[:, 1]) < fov_tan)
        )
        return uv, vis

    uv, vis = jax.lax.map(per_frame, times)  # [K,L,2], [K,L]
    uv = jnp.swapaxes(uv, 0, 1)
    vis = jnp.swapaxes(vis, 0, 1)
    if key is not None and noise_std > 0:
        uv = uv + noise_std * jax.random.normal(key, uv.shape)
    return uv, vis


def render_sprite_frame(
    cam_intrinsic: tuple,
    resolution: tuple,
    landmarks: jax.Array,  # [L,3] world points
    t_wc: jax.Array,
    q_wc: jax.Array,
    sprite_sigma: float = 1.6,
    base_level: float = 24.0,
):
    """Render a synthetic camera image of a 3D point-sprite field: each
    landmark becomes a Gaussian blob whose brightness falls with depth.
    Gives the KLT front-end realistic, perspective-consistent imagery
    without needing real data (zero-egress environment)."""
    import jax.numpy as jnp

    fx, fy, cx, cy = cam_intrinsic[:4]
    w, h = resolution
    pc = jax.vmap(lambda pw: rot.quat_rotate(rot.quat_inv(q_wc), pw - t_wc))(
        landmarks
    )
    z = pc[:, 2]
    vis = z > 1.0
    u = fx * pc[:, 0] / jnp.where(vis, z, 1.0) + cx
    v = fy * pc[:, 1] / jnp.where(vis, z, 1.0) + cy
    amp = jnp.where(vis, 200.0 / jnp.sqrt(jnp.maximum(z, 1.0)), 0.0)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def add_blob(img, i):
        d2 = (ys - v[i]) ** 2 + (xs - u[i]) ** 2
        blob = amp[i] * jnp.exp(-d2 / (2 * sprite_sigma**2))
        return img + blob.astype(jnp.float32), None

    img, _ = jax.lax.scan(add_blob, jnp.full((h, w), base_level, jnp.float32),
                          jnp.arange(landmarks.shape[0]))
    return jnp.clip(img, 0.0, 255.0)


def render_sprite_frame_np(
    cam_intrinsic: tuple,
    resolution: tuple,
    landmarks: np.ndarray,  # [L,3] world points (numpy, f64)
    t_wc: np.ndarray,
    q_wc: np.ndarray,
    sprite_sigma: float = 1.6,
    base_level: float = 24.0,
) -> np.ndarray:
    """Fast host-side sprite renderer: identical image model to
    ``render_sprite_frame`` but accumulates each blob as a local
    (6 sigma)^2 patch with numpy instead of scanning full-frame blobs on
    device — ~100x cheaper per frame, which is what makes the
    urban-scale (20k+ frame) endurance replay tractable on this host."""
    fx, fy, cx, cy = cam_intrinsic[:4]
    w, h = resolution
    q = np.asarray(q_wc, np.float64)
    # world -> camera: R(q)^T (pw - t)
    qw, xyz = q[0], q[1:]
    d = np.asarray(landmarks, np.float64) - np.asarray(t_wc, np.float64)
    t2 = 2.0 * np.cross(xyz, d)
    pc = d - qw * t2 + np.cross(xyz, t2)  # inverse rotation
    z = pc[:, 2]
    vis = z > 1.0
    u = fx * pc[:, 0] / np.where(vis, z, 1.0) + cx
    v = fy * pc[:, 1] / np.where(vis, z, 1.0) + cy
    amp = np.where(vis, 200.0 / np.sqrt(np.maximum(z, 1.0)), 0.0)
    half = int(np.ceil(3.0 * sprite_sigma))
    vis &= (u > -half) & (u < w + half) & (v > -half) & (v < h + half)

    img = np.full((h, w), base_level, np.float32)
    inv2s2 = 1.0 / (2.0 * sprite_sigma**2)
    for ui, vi, ai in zip(u[vis], v[vis], amp[vis]):
        x0 = max(int(np.floor(ui)) - half, 0)
        x1 = min(int(np.floor(ui)) + half + 2, w)
        y0 = max(int(np.floor(vi)) - half, 0)
        y1 = min(int(np.floor(vi)) + half + 2, h)
        if x1 <= x0 or y1 <= y0:
            continue
        ys = (np.arange(y0, y1, dtype=np.float32) - vi)[:, None] ** 2
        xs = (np.arange(x0, x1, dtype=np.float32) - ui)[None, :] ** 2
        img[y0:y1, x0:x1] += ai * np.exp(-(ys + xs) * inv2s2)
    return np.clip(img, 0.0, 255.0)


def default_params(
    with_earth: bool = True,
    lat_deg: float = 30.5,
    dtype=jnp.float64,
) -> IntegrationParams:
    """IMU noise parameters mirroring the reference config
    (``gvins.yaml:26-31``: ARW 0.1 deg/sqrt(hr), VRW 0.1 m/s/sqrt(hr),
    bias std 50 deg/hr / 50 mGal, corr time 1 hr), with the n-frame gravity
    magnitude fixed to the reference's NORMAL_GRAVITY = 9.80."""
    d2r = np.pi / 180.0
    arw = 0.1 * d2r / 60.0  # deg/sqrt(hr) -> rad/sqrt(s)
    vrw = 0.1 / 60.0  # m/s/sqrt(hr) -> m/s/sqrt(s)
    gb = 50.0 * d2r / 3600.0  # deg/hr -> rad/s
    ab = 50.0 * 1e-5  # mGal -> m/s^2
    wie = 7.2921151467e-5
    lat = lat_deg * d2r
    iewn = (
        jnp.array([wie * np.cos(lat), 0.0, -wie * np.sin(lat)], dtype)
        if with_earth
        else jnp.zeros(3, dtype)
    )
    return IntegrationParams(
        gyr_arw=jnp.asarray(arw, dtype),
        acc_vrw=jnp.asarray(vrw, dtype),
        gyr_bias_std=jnp.asarray(gb, dtype),
        acc_bias_std=jnp.asarray(ab, dtype),
        corr_time=jnp.asarray(3600.0, dtype),
        gravity=jnp.array([0.0, 0.0, 9.80], dtype),
        iewn=iewn,
    )
