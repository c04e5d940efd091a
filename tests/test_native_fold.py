"""Native fold_window_index == NumPy broadcast fold, bit for bit, across
dims and out-of-range anchors (clipping + validity)."""

import numpy as np
import pytest

from dealii_slod_tpu.grid import clipped_window_index
from dealii_slod_tpu.utils import native


@pytest.mark.skipif(native.load() is None, reason="native lib unavailable")
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_native_fold_matches_numpy(dim):
    rng = np.random.default_rng(dim)
    dims = np.array([17, 9, 13][:dim])
    extent = np.array([5, 3, 4][:dim])
    anchor = rng.integers(-3, dims + 2, size=(700, dim))
    i_native, v_native = clipped_window_index(anchor, extent, dims)

    orig = native.fold_window_index
    native.fold_window_index = lambda *a, **k: None   # force NumPy fold
    try:
        i_np, v_np = clipped_window_index(anchor, extent, dims)
    finally:
        native.fold_window_index = orig
    assert np.array_equal(i_native, i_np)
    assert np.array_equal(v_native, v_np)
    assert i_native.dtype == np.int32
