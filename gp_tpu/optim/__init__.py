from .lbfgsb import LBFGSBResult, lbfgsb, lbfgsb_impl  # noqa: F401
from .multistart import multistart_lbfgsb, random_search, sample_box  # noqa: F401
