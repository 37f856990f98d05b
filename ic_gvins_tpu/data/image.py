"""Image loading + Bayer demosaic for dataset replay.

The reference receives images over ROS transport already decoded
(``fusion_ros.cc:215-249``, cv_bridge mono8); the KAIST urban dataset
publishes raw Bayer-pattern PNGs (stereo_left, ``bayer_rggb8``). This
module is the offline ingest equivalent: PNG/JPEG decode (cv2 when
present, PIL fallback) plus Bayer-to-gray conversion.

All host-side IO — the decoded grayscale array feeds the jitted KLT
front-end unchanged.
"""

from __future__ import annotations

import numpy as np

_BAYER_CV2 = {
    "rggb": "COLOR_BayerRG2GRAY",
    "bggr": "COLOR_BayerBG2GRAY",
    "grbg": "COLOR_BayerGR2GRAY",
    "gbrg": "COLOR_BayerGB2GRAY",
}


def _imread_raw(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(f"cv2 failed to read {path}")
        return img
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path))


def bayer_to_gray(raw: np.ndarray, pattern: str = "rggb") -> np.ndarray:
    """Demosaic a single-channel Bayer mosaic to grayscale.

    Uses cv2's edge-aware demosaic when available; the fallback averages
    each 2x2 cell (R + 2G + B)/4 at full resolution via a box blur —
    adequate for feature tracking (the KLT window spans 21 px).
    """
    try:
        import cv2

        return cv2.cvtColor(raw, getattr(cv2, _BAYER_CV2[pattern]))
    except ImportError:
        pass
    # pure-numpy fallback: 2x2 box average, upsampled back
    f = raw.astype(np.float32)
    h2, w2 = (raw.shape[0] // 2) * 2, (raw.shape[1] // 2) * 2
    f = f[:h2, :w2]
    quad = 0.25 * (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2])
    up = np.repeat(np.repeat(quad, 2, axis=0), 2, axis=1)
    out = np.zeros(raw.shape, np.float32)
    out[:h2, :w2] = up
    if h2 < raw.shape[0]:
        out[h2:, :] = out[h2 - 1 : h2, :]
    if w2 < raw.shape[1]:
        out[:, w2:] = out[:, w2 - 1 : w2]
    return np.clip(out, 0, 255).astype(raw.dtype)


def load_gray(path: str, bayer: str | None = None) -> np.ndarray:
    """Load an image file as a 2-D grayscale uint8/uint16 array.

    ``bayer``: None = already gray/color; "rggb"/"bggr"/"grbg"/"gbrg" =
    single-channel Bayer mosaic to demosaic.
    """
    raw = _imread_raw(path)
    if bayer is not None and raw.ndim == 2:
        return bayer_to_gray(raw, bayer)
    if raw.ndim == 3:
        # cv2 loads BGR; PIL loads RGB — both fine for luma purposes
        return raw.mean(axis=2).astype(raw.dtype)
    return raw
