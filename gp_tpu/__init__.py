"""gp_tpu — TPU-native Gaussian-process regression framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
the reference C++ library Brightorange90/GP (see SURVEY.md): exact GP
regression with SE-ARD / SE-iso kernels and a constant mean, MLE
hyperparameter fitting with box bounds and global multi-start, FITC and VFE
sparse approximations, and predictions with gradients w.r.t. test inputs.
"""

from . import config  # noqa: F401  (must import first: enables x64)
from .config import INF, default_dtype, x64_enabled  # noqa: F401
from .ops.kernels import KERNELS, SE_ARD, SE_ISO, get_kernel  # noqa: F401
from .ops.kernels_extra import (MATERN32, MATERN52, RQ)  # noqa: F401
from .models.exact import GP  # noqa: F401
from .models.bucketed import BucketedGP  # noqa: F401

try:  # sparse models land after the exact slice; keep import robust mid-build
    from .models.fitc import FITC  # noqa: F401
    from .models.vfe import VFE  # noqa: F401
except ImportError:  # pragma: no cover
    pass

__version__ = "0.1.0"
