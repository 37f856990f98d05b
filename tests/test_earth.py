import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.common import earth
from ic_gvins_tpu.common.angle import D2R

WUHAN = jnp.array([30.5 * D2R, 114.3 * D2R, 40.0])


def test_gravity_reasonable():
    g = earth.gravity(WUHAN)
    assert 9.78 < float(g) < 9.81
    # equator vs pole
    g_eq = earth.gravity(jnp.array([0.0, 0.0, 0.0]))
    g_po = earth.gravity(jnp.array([jnp.pi / 2, 0.0, 0.0]))
    assert float(g_po) - float(g_eq) > 0.05


def test_blh_ecef_roundtrip():
    blh = jnp.stack(
        [
            WUHAN,
            jnp.array([-45.0 * D2R, -170.0 * D2R, 1234.0]),
            jnp.array([89.0 * D2R, 10.0 * D2R, -30.0]),
        ]
    )
    ecef = earth.blh_to_ecef(blh)
    blh2 = earth.ecef_to_blh(ecef)
    np.testing.assert_allclose(blh[:, :2], blh2[:, :2], atol=1e-12)
    np.testing.assert_allclose(blh[:, 2], blh2[:, 2], atol=1e-4)


def test_cne_orthonormal_and_qne_consistent():
    c = earth.cne(WUHAN)
    np.testing.assert_allclose(c @ c.T, jnp.eye(3), atol=1e-12)
    from ic_gvins_tpu.common import rotation as rot

    q = earth.qne(WUHAN)
    np.testing.assert_allclose(rot.quat_to_matrix(q), c, atol=1e-12)
    blh2 = earth.blh_from_qne(q, WUHAN[2])
    np.testing.assert_allclose(blh2, WUHAN, atol=1e-12)


def test_local_global_roundtrip():
    local = jnp.array([[100.0, -250.0, 3.0], [5000.0, 8000.0, -100.0]])
    g = earth.local_to_global(WUHAN, local)
    l2 = earth.global_to_local(WUHAN, g)
    np.testing.assert_allclose(local, l2, atol=1e-4)


def test_pose_local_global_roundtrip():
    from ic_gvins_tpu.common import rotation as rot

    r = rot.euler_to_matrix(jnp.array([0.02, -0.05, 1.2]))
    t = jnp.array([2000.0, -3000.0, 15.0])
    rg, blh = earth.pose_local_to_global(WUHAN, r, t)
    r2, t2 = earth.pose_global_to_local(WUHAN, rg, blh)
    np.testing.assert_allclose(r, r2, atol=1e-9)
    np.testing.assert_allclose(t, t2, atol=1e-4)


def test_iewn():
    w = earth.iewn(jnp.array(30.5 * D2R))
    assert abs(float(jnp.linalg.norm(w)) - earth.WGS84_WIE) < 1e-18
    assert float(w[1]) == 0.0
    # local displacement barely changes the rate direction
    w2 = earth.iewn_at(WUHAN, jnp.array([10000.0, 0.0, 0.0]))
    # 10 km north ≈ 1.57 mrad of latitude ≈ 1.1e-7 rad/s change in rate
    assert float(jnp.linalg.norm(w2 - w)) < 1e-6


def test_small_displacement_linearity():
    # 1 m north ~ 1/RM rad of latitude
    local = jnp.array([1.0, 0.0, 0.0])
    g = earth.local_to_global(WUHAN, local)
    rm, _ = earth.meridian_prime_vertical_radius(WUHAN[0])
    dlat = float(g[0] - WUHAN[0])
    np.testing.assert_allclose(dlat, 1.0 / float(rm + WUHAN[2]), rtol=1e-6)
