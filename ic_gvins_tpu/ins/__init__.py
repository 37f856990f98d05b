from . import mechanization, preintegration  # noqa: F401
