"""Text matrix I/O matching the reference file contract.

The reference reads whitespace-separated text matrices (util.cpp:29-62,
`read_matrix`) and the demo drivers write a two-column ``pred`` file of
posterior mean / stddev (mygp.cpp:31-36).  A native C++ fast parser is used
when available (gp_tpu/native), with a NumPy fallback.
"""

from __future__ import annotations

import os

import numpy as np

from ..native import fastio


def read_matrix(path: str) -> np.ndarray:
    """Read a whitespace-separated text matrix as (rows, cols) float64.

    Mirrors util.cpp:29-62: every row must have the same number of columns;
    an empty or unreadable file is an error.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    arr = fastio.read_matrix(path)
    if arr is None:  # native loader unavailable; NumPy fallback
        arr = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if arr.size == 0:
        raise ValueError(f"Empty matrix in file {path}")
    return arr


def write_matrix(path: str, m: np.ndarray, fmt: str = "%.18g") -> None:
    m = np.asarray(m)
    # native fast path (single-syscall buffered writer); numpy fallback
    if fmt.startswith("%.") and fmt.endswith("g"):
        digits = min(int(fmt[2:-1]), 17)
        if fastio.write_matrix(path, m, digits):
            return
    np.savetxt(path, m, fmt=fmt)


def write_pred(path: str, mean: np.ndarray, stddev: np.ndarray) -> None:
    """Write the two-column prediction file the reference drivers emit
    (mygp.cpp:31-36: column 0 = posterior mean, column 1 = posterior stddev).
    """
    rec = np.stack([np.asarray(mean).ravel(), np.asarray(stddev).ravel()], axis=1)
    write_matrix(path, rec)
