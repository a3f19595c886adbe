from . import fastio  # noqa: F401
