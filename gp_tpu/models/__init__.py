from .exact import GP  # noqa: F401
