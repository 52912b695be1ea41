"""npy IO that round-trips bfloat16.

``np.save`` writes ml_dtypes.bfloat16 arrays with a raw void ('|V2') descr,
and ``np.load`` cannot cast the void dtype back — so bf16 shards are stored
as uint16 bit views and re-viewed on load (auto-detected: V2 is only ever
produced by bf16 here, so old files heal too).
"""

from __future__ import annotations

import ml_dtypes
import numpy as np


def np_save(path: str, arr) -> None:
    arr = np.asarray(arr)
    if arr.dtype == ml_dtypes.bfloat16:
        arr = arr.view(np.uint16)
    np.save(path, arr)


def np_load(path: str, dtype=None) -> np.ndarray:
    a = np.load(path)
    if a.dtype.kind == "V" and a.dtype.itemsize == 2:
        a = a.view(ml_dtypes.bfloat16)
    if dtype is not None and np.dtype(dtype) == np.dtype(ml_dtypes.bfloat16) \
            and a.dtype == np.uint16:
        a = a.view(ml_dtypes.bfloat16)
    return a
