from . import camera, detector, klt, pyramid, triangulation  # noqa: F401
