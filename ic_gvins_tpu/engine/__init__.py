from . import config, estimator  # noqa: F401
