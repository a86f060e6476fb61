"""Haar DWT parity vs a numpy re-derivation of the reference's banded-matrix
construction (WPL/iwp.py:20-26,58-103) on square even inputs.

The oracle replicates the reference's off-by-one: the high-pass matrix row
loop runs ``range(L1 - L - 1)`` (iwp.py:79), so its last row is all-zero —
LH's last column, HL's last row and both of HH vanish. (The original oracle
here missed that; tests/test_reference_parity_flagship.py now pins it
against the reference's own DWT_2D.)
"""

import numpy as np
import jax.numpy as jnp

from kmunet_tpu.ops import haar_dwt2d

S2 = 1.0 / np.sqrt(2.0)


def reference_matrices(n):
    """Banded low/high analysis matrices the reference builds for size n."""
    low = np.zeros((n // 2, n))
    high = np.zeros((n // 2, n))
    for i in range(n // 2):
        low[i, 2 * i : 2 * i + 2] = [S2, S2]
    for i in range(n // 2 - 1):  # last row left zero (iwp.py:79)
        high[i, 2 * i : 2 * i + 2] = [S2, -S2]
    return low, high


def test_haar_matches_matrix_formulation(rng):
    B, H, W, C = 2, 16, 16, 3
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    LL, LH, HL, HH = haar_dwt2d(jnp.asarray(x))

    low0, high0 = reference_matrices(H)
    low1, high1 = reference_matrices(W)
    for b in range(B):
        for c in range(C):
            img = x[b, :, :, c].astype(np.float64)
            L = low0 @ img
            Hh = high0 @ img
            np.testing.assert_allclose(np.asarray(LL)[b, :, :, c], L @ low1.T, atol=1e-4)
            np.testing.assert_allclose(np.asarray(LH)[b, :, :, c], L @ high1.T, atol=1e-4)
            np.testing.assert_allclose(np.asarray(HL)[b, :, :, c], Hh @ low1.T, atol=1e-4)
            np.testing.assert_allclose(np.asarray(HH)[b, :, :, c], Hh @ high1.T, atol=1e-4)


def test_haar_energy_preserved_clean_bank(rng):
    """The clean (quirk-free) bank is orthonormal; the reference-quirk
    default drops the last high band so it is NOT energy preserving."""
    x = rng.normal(size=(1, 32, 32, 2)).astype(np.float32)
    subs = haar_dwt2d(jnp.asarray(x), quirk_edge_zero=False)
    energy = sum(float(jnp.sum(s**2)) for s in subs)
    np.testing.assert_allclose(energy, float(np.sum(x**2)), rtol=1e-5)
