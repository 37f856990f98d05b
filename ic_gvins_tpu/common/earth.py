"""WGS84 Earth model: gravity, curvature radii, frame transforms, Earth rate.

Capability parity with the reference Earth utilities
(``ic_gvins/common/earth.h:34-248``): Somigliana normal gravity, meridian and
prime-vertical radii, n-frame DCM/quaternion from geodetic coordinates,
blh <-> ECEF, local-n-frame <-> global-geodetic conversions for points and
poses, and the Earth rotation rate in the n-frame.

All functions are pure jnp over trailing axes (vmappable / jittable).  The
n-frame is North-East-Down anchored at a station origin; "blh" is geodetic
[latitude(rad), longitude(rad), ellipsoidal height(m)].

The one deliberate deviation from the reference: ``ecef_to_blh`` uses a
fixed-iteration loop (5 rounds) instead of a data-dependent ``while`` so it
compiles to a static XLA program; 5 rounds converge far below 0.1 mm for
|h| < 100 km.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rotation as rot

WGS84_WIE = 7.2921151467e-5  # Earth rotation rate (rad/s)
WGS84_F = 0.0033528106647474805  # flattening
WGS84_RA = 6378137.0  # semi-major axis (m)
WGS84_RB = 6356752.3142451793  # semi-minor axis (m)
WGS84_GM0 = 398600441800000.0  # gravitational constant
WGS84_E1 = 0.0066943799901413156  # first eccentricity squared
WGS84_E2 = 0.0067394967422764341  # second eccentricity squared


def gravity(blh: jax.Array) -> jax.Array:
    """Somigliana normal gravity with height correction, (...,3) -> (...,)."""
    s2 = jnp.sin(blh[..., 0]) ** 2
    h = blh[..., 2]
    return (
        9.7803267715 * (1 + 0.0052790414 * s2 + 0.0000232718 * s2 * s2)
        + h * (0.0000000043977311 * s2 - 0.0000030876910891)
        + 0.0000000000007211 * h * h
    )


def gravity_ned(blh: jax.Array) -> jax.Array:
    """Gravity vector in the NED n-frame: [0, 0, g]."""
    g = gravity(blh)
    zeros = jnp.zeros_like(g)
    return jnp.stack([zeros, zeros, g], axis=-1)


def meridian_prime_vertical_radius(lat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(R_meridian, R_prime_vertical) at geodetic latitude."""
    t = 1.0 - WGS84_E1 * jnp.sin(lat) ** 2
    sq = jnp.sqrt(t)
    rm = WGS84_RA * (1.0 - WGS84_E1) / (sq * t)
    rn = WGS84_RA / sq
    return rm, rn


def rn(lat: jax.Array) -> jax.Array:
    """Prime vertical radius of curvature."""
    return WGS84_RA / jnp.sqrt(1.0 - WGS84_E1 * jnp.sin(lat) ** 2)


def cne(blh: jax.Array) -> jax.Array:
    """DCM from n-frame (NED at blh) to ECEF: C_e^n columns... returns C_ne
    such that v_e = C_ne @ v_n (matches reference ``earth.h:71-93``)."""
    sinlat, coslat = jnp.sin(blh[..., 0]), jnp.cos(blh[..., 0])
    sinlon, coslon = jnp.sin(blh[..., 1]), jnp.cos(blh[..., 1])
    row0 = jnp.stack([-sinlat * coslon, -sinlon, -coslat * coslon], axis=-1)
    row1 = jnp.stack([-sinlat * sinlon, coslon, -coslat * sinlon], axis=-1)
    row2 = jnp.stack([coslat, jnp.zeros_like(coslat), -sinlat], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def qne(blh: jax.Array) -> jax.Array:
    """Quaternion equivalent of cne (scalar-first)."""
    coslon = jnp.cos(blh[..., 1] * 0.5)
    sinlon = jnp.sin(blh[..., 1] * 0.5)
    coslat = jnp.cos(-jnp.pi * 0.25 - blh[..., 0] * 0.5)
    sinlat = jnp.sin(-jnp.pi * 0.25 - blh[..., 0] * 0.5)
    return jnp.stack(
        [coslat * coslon, -sinlat * sinlon, sinlat * coslon, coslat * sinlon], axis=-1
    )


def blh_from_qne(q: jax.Array, height: jax.Array) -> jax.Array:
    """Recover [lat, lon, h] from the n->e quaternion plus height."""
    lat = -2.0 * jnp.arctan(q[..., 2] / q[..., 0]) - jnp.pi * 0.5
    lon = 2.0 * jnp.arctan2(q[..., 3], q[..., 0])
    return jnp.stack([lat, lon, height], axis=-1)


def blh_to_ecef(blh: jax.Array) -> jax.Array:
    coslat, sinlat = jnp.cos(blh[..., 0]), jnp.sin(blh[..., 0])
    coslon, sinlon = jnp.cos(blh[..., 1]), jnp.sin(blh[..., 1])
    r = rn(blh[..., 0])
    rh = r + blh[..., 2]
    return jnp.stack(
        [rh * coslat * coslon, rh * coslat * sinlon, (rh - r * WGS84_E1) * sinlat],
        axis=-1,
    )


def ecef_to_blh(ecef: jax.Array) -> jax.Array:
    """ECEF -> geodetic, fixed-point iteration with static trip count."""
    p = jnp.sqrt(ecef[..., 0] ** 2 + ecef[..., 1] ** 2)
    lon = 2.0 * jnp.arctan2(ecef[..., 1], ecef[..., 0] + p)
    lat = jnp.arctan(ecef[..., 2] / (p * (1.0 - WGS84_E1)))
    h = jnp.zeros_like(lat)

    def body(_, carry):
        lat, h = carry
        r = rn(lat)
        h = p / jnp.cos(lat) - r
        lat = jnp.arctan(ecef[..., 2] / (p * (1.0 - WGS84_E1 * r / (r + h))))
        return lat, h

    lat, h = jax.lax.fori_loop(0, 5, body, (lat, h))
    return jnp.stack([lat, lon, h], axis=-1)


def dri(blh: jax.Array) -> jax.Array:
    """diag inverse: d(blh)/d(NED position) (reference ``earth.h:152-161``)."""
    rm, rnv = meridian_prime_vertical_radius(blh[..., 0])
    h = blh[..., 2]
    d0 = 1.0 / (rm + h)
    d1 = 1.0 / ((rnv + h) * jnp.cos(blh[..., 0]))
    d2 = -jnp.ones_like(d0)
    return jnp.zeros(blh.shape[:-1] + (3, 3), blh.dtype).at[..., 0, 0].set(d0).at[..., 1, 1].set(d1).at[..., 2, 2].set(d2)


def dr(blh: jax.Array) -> jax.Array:
    """diag: d(NED position)/d(blh)."""
    rm, rnv = meridian_prime_vertical_radius(blh[..., 0])
    h = blh[..., 2]
    d0 = rm + h
    d1 = (rnv + h) * jnp.cos(blh[..., 0])
    d2 = -jnp.ones_like(d0)
    return jnp.zeros(blh.shape[:-1] + (3, 3), blh.dtype).at[..., 0, 0].set(d0).at[..., 1, 1].set(d1).at[..., 2, 2].set(d2)


def local_to_global(origin_blh: jax.Array, local_ned: jax.Array) -> jax.Array:
    """Point in station NED frame -> geodetic blh."""
    ecef0 = blh_to_ecef(origin_blh)
    c = cne(origin_blh)
    ecef1 = ecef0 + jnp.einsum("...ij,...j->...i", c, local_ned)
    return ecef_to_blh(ecef1)


def global_to_local(origin_blh: jax.Array, global_blh: jax.Array) -> jax.Array:
    """Geodetic blh -> point in station NED frame."""
    ecef0 = blh_to_ecef(origin_blh)
    c = cne(origin_blh)
    ecef1 = blh_to_ecef(global_blh)
    return jnp.einsum("...ji,...j->...i", c, ecef1 - ecef0)


def pose_local_to_global(origin_blh: jax.Array, r_local: jax.Array, t_local: jax.Array):
    """(R, t) in station NED -> (R_global, blh). R_global is body->local-NED
    at the new position (reference ``earth.h:194-208``)."""
    ecef0 = blh_to_ecef(origin_blh)
    c0 = cne(origin_blh)
    ecef1 = ecef0 + jnp.einsum("...ij,...j->...i", c0, t_local)
    blh1 = ecef_to_blh(ecef1)
    c1 = cne(blh1)
    r_global = jnp.einsum("...ji,...jk,...kl->...il", c1, c0, r_local)
    return r_global, blh1


def pose_global_to_local(origin_blh: jax.Array, r_global: jax.Array, blh1: jax.Array):
    """Inverse of pose_local_to_global."""
    ecef0 = blh_to_ecef(origin_blh)
    c0 = cne(origin_blh)
    ecef1 = blh_to_ecef(blh1)
    c1 = cne(blh1)
    t_local = jnp.einsum("...ji,...j->...i", c0, ecef1 - ecef0)
    r_local = jnp.einsum("...ji,...jk,...kl->...il", c0, c1, r_global)
    return r_local, t_local


def iewe() -> jax.Array:
    return jnp.array([0.0, 0.0, WGS84_WIE])


def iewn(lat: jax.Array) -> jax.Array:
    """Earth rotation rate expressed in the NED n-frame at latitude."""
    return jnp.stack(
        [WGS84_WIE * jnp.cos(lat), jnp.zeros_like(lat), -WGS84_WIE * jnp.sin(lat)],
        axis=-1,
    )


def iewn_at(origin_blh: jax.Array, local_ned: jax.Array) -> jax.Array:
    """Earth rate in n-frame at a local NED position w.r.t. the station."""
    g = local_to_global(origin_blh, local_ned)
    return iewn(g[..., 0])


def enwn(rmn: tuple[jax.Array, jax.Array], blh: jax.Array, vel_ned: jax.Array) -> jax.Array:
    """Transport rate (kept for parity; unused in the main fusion path,
    like the reference which drops the enwn term)."""
    rm, rnv = rmn
    h = blh[..., 2]
    return jnp.stack(
        [
            vel_ned[..., 1] / (rnv + h),
            -vel_ned[..., 0] / (rm + h),
            -vel_ned[..., 1] * jnp.tan(blh[..., 0]) / (rnv + h),
        ],
        axis=-1,
    )
