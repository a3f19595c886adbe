from . import chol, kernels, sdist  # noqa: F401
