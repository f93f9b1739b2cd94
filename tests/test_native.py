"""Native SA-IS builder tests."""

import numpy as np
import pytest

from megapath_tpu.native.build import load_saais, suffix_array_native
from megapath_tpu.index.suffix import _suffix_array_doubling, suffix_array


@pytest.mark.skipif(load_saais() is None, reason="native build unavailable")
@pytest.mark.parametrize("n", [1, 2, 3, 17, 256, 4097, 100_000])
def test_saais_matches_doubling(n):
    codes = np.random.default_rng(n).integers(0, 4, n).astype(np.uint8)
    sa = suffix_array_native(codes)
    np.testing.assert_array_equal(sa, _suffix_array_doubling(codes))


@pytest.mark.skipif(load_saais() is None, reason="native build unavailable")
def test_saais_repetitive_text():
    # highly repetitive inputs exercise the recursion path
    codes = np.tile(np.array([0, 1, 0, 1, 2], np.uint8), 2000)
    sa = suffix_array_native(codes)
    np.testing.assert_array_equal(sa, _suffix_array_doubling(codes))


def test_suffix_array_dispatches_native():
    codes = np.random.default_rng(0).integers(0, 4, 5000).astype(np.uint8)
    np.testing.assert_array_equal(
        suffix_array(codes, native=True), suffix_array(codes, native=False)
    )
