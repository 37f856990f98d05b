from . import angle, earth, gpstime, rotation  # noqa: F401
