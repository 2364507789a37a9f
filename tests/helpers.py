"""Test helpers.

Always convert to numpy before np.testing comparisons: numpy's testing
machinery dispatches dozens of tiny ufuncs when handed a jax Array, each of
which becomes a separate XLA compile — pathologically slow here.
"""

import numpy as np


def to_np(x):
    return np.asarray(x)


def assert_allclose(a, b, **kw):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **kw)


def assert_array_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
