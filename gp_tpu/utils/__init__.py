from . import io, stats  # noqa: F401
