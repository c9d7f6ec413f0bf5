"""Unit tests for the eigenspace stabilization primitives, including the
non-finite-input guards.

Context for the guards: XLA's self-adjoint eigensolver on TPU FAULTS THE
DEVICE on NaN/Inf input (JaxRuntimeError UNAVAILABLE, process-fatal) instead
of returning NaNs like the CPU path.  Every runtime-data-dependent eigh goes
through ``_eigh_safe``; these tests pin the contract: garbage in -> NaN
outputs (so the fit's rollback fires), never an exception, and the actual
factorization always sees a finite matrix (checked behaviorally: on CPU the
unguarded eigh would return NaN eigvecs; the guarded one factors an
identity stand-in and poisons outputs explicitly).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_processes_tpu.ops.stabilize import (
    _eigh_safe, compute_eigenspace, subspace_eigenspace,
    logdet_with_fallback, masked_logdet_eigh, masked_logdet_chol)


def _spd(n, rank=None, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    k = rank or n
    W = rng.standard_normal((n, k)).astype(dtype)
    return jnp.asarray(W @ W.T + 0.1 * np.eye(n, dtype=dtype))


def test_eigh_safe_finite_matches_plain():
    A = _spd(32)
    w, v, finite = jax.jit(_eigh_safe)(A)
    w_ref, v_ref = np.linalg.eigh(np.asarray(A))
    assert bool(finite)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-10)


def test_eigh_safe_nan_input_no_fault():
    A = jnp.full((32, 32), jnp.nan)
    w, v, finite = jax.jit(_eigh_safe)(A)
    assert not bool(finite)
    # the factorization itself ran on a finite stand-in
    assert bool(jnp.all(jnp.isfinite(w)))


def test_compute_eigenspace_nan_poisons_outputs():
    es = jax.jit(compute_eigenspace)(jnp.full((16, 16), jnp.nan))
    assert bool(jnp.all(jnp.isnan(es.B)))
    assert bool(jnp.all(jnp.isnan(es.k_tilde_b_diag)))
    assert not bool(jnp.any(es.keep))


def test_subspace_tracks_full_eigh():
    """Warm basis = exact eigenvectors: the subspace solver must reproduce
    the top-r eigenpairs to tight tolerance and report ok=True."""
    A = _spd(96)
    r = 32
    es_full = compute_eigenspace(A, rank=r)
    es_sub, ok = jax.jit(subspace_eigenspace)(A, es_full.B)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(es_sub.eigvals),
                               np.asarray(es_full.eigvals), rtol=1e-8)
    # same subspace: projector parity
    P_full = np.asarray(es_full.B) @ np.asarray(es_full.B).T
    P_sub = np.asarray(es_sub.B) @ np.asarray(es_sub.B).T
    np.testing.assert_allclose(P_sub, P_full, atol=1e-6)


def test_subspace_rank_deficient_no_exception():
    """A warm basis wider than the matrix rank degenerates the CholQR; the
    call must come back (ok possibly False) rather than raise/fault, and a
    False ok must ship zeroed B."""
    A = _spd(96, rank=8)
    es_full = compute_eigenspace(A, rank=48)
    es_sub, ok = jax.jit(subspace_eigenspace)(A, es_full.B)
    if not bool(ok):
        assert bool(jnp.all(es_sub.B == 0))
    else:
        assert bool(jnp.all(jnp.isfinite(es_sub.B)))


def test_subspace_nan_matrix_ok_false():
    B0 = jnp.asarray(np.linalg.qr(
        np.random.default_rng(0).standard_normal((64, 16)))[0])
    es_sub, ok = jax.jit(subspace_eigenspace)(jnp.full((64, 64), jnp.nan), B0)
    assert not bool(ok)


def test_logdet_fallback_nan_returns_nan():
    keep = jnp.ones(16, bool)
    ld = jax.jit(logdet_with_fallback)(jnp.full((16, 16), jnp.nan), keep)
    assert bool(jnp.isnan(ld))


def test_logdet_fallback_indefinite_uses_eigh_route():
    """Finite but indefinite matrix: Cholesky fails (NaN), the eigh route
    returns the reference's truncated log-determinant
    (utils.py:1282-1301)."""
    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.standard_normal((16, 16)))[0]
    vals = np.concatenate([np.linspace(1.0, 4.0, 14), [-0.5, 3e-7]])
    M = jnp.asarray(Q @ np.diag(vals) @ Q.T)
    keep = jnp.ones(16, bool)
    ld_chol = masked_logdet_chol(M, keep)
    assert bool(jnp.isnan(ld_chol))
    ld = jax.jit(logdet_with_fallback)(M, keep)
    big = vals[vals > max(vals.max() * 1e-6, 1e-6)]
    np.testing.assert_allclose(float(ld), np.sum(np.log(big)), rtol=1e-8)
