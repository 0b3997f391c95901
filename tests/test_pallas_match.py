"""Fused Pallas matching kernel vs the XLA reference implementation.

Runs in Pallas interpret mode on CPU (hermetic); the compiled TPU path is
exercised by bench/production runs (measured 1.8x the XLA matcher on
v5e at SLAM shapes).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from hfnet_slam_tpu.ops import matching as M
from hfnet_slam_tpu.ops import pallas_match as PM


def _problem(seed=0, NA=256, NB=512, D=128, dup=100, noise=0.02):
    rng = np.random.default_rng(seed)
    dA = rng.standard_normal((NA, D)).astype(np.float32)
    dA /= np.linalg.norm(dA, axis=1, keepdims=True)
    dB = rng.standard_normal((NB, D)).astype(np.float32)
    dB[:dup] = dA[:dup] + noise * rng.standard_normal((dup, D))
    dB /= np.linalg.norm(dB, axis=1, keepdims=True)
    maskA = np.ones(NA, bool)
    maskA[-16:] = False
    maskB = np.ones(NB, bool)
    maskB[10:20] = False
    return dA, maskA, dB, maskB


def test_row_top2_matches_dense():
    dA, maskA, dB, maskB = _problem()
    best, second, idx = PM.row_top2(
        jnp.asarray(dA), jnp.asarray(dB), jnp.asarray(maskB), interpret=True
    )
    S = dA @ dB.T
    S[:, ~maskB] = -1e9
    np.testing.assert_allclose(np.asarray(best), S.max(1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), S.argmax(1))
    S2 = S.copy()
    S2[np.arange(len(S)), S.argmax(1)] = -1e9
    np.testing.assert_allclose(np.asarray(second), S2.max(1), atol=1e-5)


def test_fused_matches_xla_path():
    dA, maskA, dB, maskB = _problem()
    iX, dX = M.match_descriptors(
        jnp.asarray(dA), jnp.asarray(maskA), jnp.asarray(dB), jnp.asarray(maskB),
        max_dist=0.6, ratio=0.9, mutual=True,
    )
    iP, dP = PM.match_descriptors_fused(
        jnp.asarray(dA), jnp.asarray(maskA), jnp.asarray(dB), jnp.asarray(maskB),
        max_dist=0.6, ratio=0.9, interpret=True,
    )
    iX, iP = np.asarray(iX), np.asarray(iP)
    assert (iX >= 0).sum() > 50  # the duplicated rows must match
    np.testing.assert_array_equal(iX, iP)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(dP), atol=1e-5)


def test_all_masked_B_yields_no_matches():
    dA, maskA, dB, maskB = _problem()
    iP, _ = PM.match_descriptors_fused(
        jnp.asarray(dA), jnp.asarray(maskA), jnp.asarray(dB),
        jnp.zeros(len(dB), bool), interpret=True,
    )
    assert (np.asarray(iP) == -1).all()
