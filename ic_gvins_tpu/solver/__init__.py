from . import assembly, lm, window  # noqa: F401
