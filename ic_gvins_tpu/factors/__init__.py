from . import manifold, residuals  # noqa: F401
