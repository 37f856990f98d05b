from . import multi_seq, schur  # noqa: F401
