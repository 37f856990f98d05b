import jax.numpy as jnp
import numpy as np

from test_vision import random_texture

from ic_gvins_tpu.vision import preprocess


def test_clahe_improves_local_contrast():
    # low-contrast image: tiny dynamic range around 100
    img = random_texture(256, 256, seed=3) * 0.1 + 100.0
    out = np.asarray(preprocess.clahe(jnp.asarray(img)))
    assert out.shape == img.shape
    assert np.all(np.isfinite(out))
    # contrast (std) must increase substantially
    assert out.std() > 3.0 * img.std(), (img.std(), out.std())
    # output range stays in [0, 255]
    assert out.min() >= -1e-3 and out.max() <= 255.001


def test_clahe_preserves_structure():
    img = random_texture(256, 256, seed=4)
    out = np.asarray(preprocess.clahe(jnp.asarray(img)))
    # monotone mapping locally: correlation with the input stays high
    c = np.corrcoef(img.ravel(), out.ravel())[0, 1]
    assert c > 0.9, c


def test_histogram_gate_detects_glitch():
    img0 = random_texture(128, 160, seed=5)
    img1 = img0 + 2.0  # mild change
    glitch = np.clip(img0 * 3.0 + 80, 0, 255)  # harsh illumination jump
    c_ok = float(preprocess.histogram_correlation(jnp.asarray(img0), jnp.asarray(img1)))
    c_bad = float(
        preprocess.histogram_correlation(jnp.asarray(img0), jnp.asarray(glitch))
    )
    assert c_ok > 0.9
    assert c_bad < c_ok - 0.2
