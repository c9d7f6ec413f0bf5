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


def test_masked_inverse_warm_matches_exact():
    """Warm-seeded Newton-Schulz inverse == exact masked inverse for a
    near-diagonal matrix.  A far-from-seed matrix (non-converged iteration)
    must (a) in "exact" fallback mode come back as the exact inverse via the
    in-graph cond, and (b) in "poison" mode come back NaN-poisoned — the
    branchless guard that turns the enclosing objective value into +inf so
    the line search backtracks (never a silently wrong inverse)."""
    from gaussian_processes_tpu.ops.stabilize import (masked_inverse,
                                                      masked_inverse_warm)
    n = 60
    rng = np.random.default_rng(3)
    lam = jnp.asarray(np.sort(rng.uniform(0.5, 5.0, n)))
    keep = jnp.asarray(np.arange(n) >= 10)
    keepf = keep.astype(lam.dtype)
    # near-diagonal SPD: diag(lam) + small symmetric perturbation
    E = rng.standard_normal((n, n)) * 0.02
    M = (jnp.diag(lam) + jnp.asarray(E + E.T)) * keepf[:, None] * keepf[None, :]
    seed = keepf / lam
    exact = masked_inverse(M, keep)
    warm = masked_inverse_warm(M, keep, seed)
    np.testing.assert_allclose(np.asarray(warm), np.asarray(exact),
                               rtol=1e-9, atol=1e-11)
    # far seed, "exact" fallback (default): cond routes to the exact inverse
    far_exact = masked_inverse_warm(M, keep, seed * 1e-6)
    np.testing.assert_allclose(np.asarray(far_exact), np.asarray(exact),
                               rtol=1e-9, atol=1e-11)
    # far seed, "poison": iteration cannot converge -> NaN (trial rejection)
    far = masked_inverse_warm(M, keep, seed * 1e-6, fallback="poison")
    assert not bool(jnp.all(jnp.isfinite(far)))
    # ... and the poisoned point's gradient is benign (zero), matching the
    # "+inf value, finite gradient" bounds-violation contract
    g = jax.grad(lambda m: jnp.sum(masked_inverse_warm(
        m, keep, seed * 1e-6, fallback="poison")))(M)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_masked_inverse_warm_gradient_matches_exact():
    """The custom VJP (treat output as the true inverse) must agree with
    autodiff through the exact inverse."""
    from gaussian_processes_tpu.ops.stabilize import (masked_inverse,
                                                      masked_inverse_warm)
    n = 24
    rng = np.random.default_rng(5)
    lam = jnp.asarray(np.sort(rng.uniform(0.5, 3.0, n)))
    keep = jnp.asarray(np.ones(n, bool))
    E = jnp.asarray(rng.standard_normal((n, n)) * 0.01)
    W = jnp.asarray(rng.standard_normal((n, n)))
    seed = 1.0 / lam

    def loss_warm(s):
        M = jnp.diag(lam) + s * (E + E.T)
        return jnp.sum(masked_inverse_warm(M, keep, seed) * W)

    def loss_exact(s):
        M = jnp.diag(lam) + s * (E + E.T)
        return jnp.sum(masked_inverse(M, keep) * W)

    g_warm = jax.grad(loss_warm)(jnp.asarray(1.0))
    g_exact = jax.grad(loss_exact)(jnp.asarray(1.0))
    np.testing.assert_allclose(float(g_warm), float(g_exact), rtol=1e-8)


def test_schulz_iterations_nonfinite_input_falls_through():
    """A NaN matrix must yield a non-converged residual (NaN), steering the
    guarded callers into their exact fallback, never a silent wrong result."""
    from gaussian_processes_tpu.ops.stabilize import schulz_iterations
    n = 8
    M = jnp.full((n, n), jnp.nan)
    X0 = jnp.eye(n)
    X, resid = schulz_iterations(M, X0, steps=4)
    assert not bool(jnp.isfinite(resid))


def test_masked_logdet_series_matches_chol():
    """Near-seed: the trace series must match the Cholesky logdet to its
    truncation bound; far-seed: the in-graph guard must route to the exact
    Cholesky (identical result)."""
    from gaussian_processes_tpu.ops.stabilize import (masked_logdet_chol,
                                                      masked_logdet_series)
    n = 60
    rng = np.random.default_rng(7)
    lam = jnp.asarray(np.sort(rng.uniform(0.5, 5.0, n)))
    keep = jnp.asarray(np.arange(n) >= 10)
    keepf = keep.astype(lam.dtype)
    E = rng.standard_normal((n, n)) * 0.01
    M = (jnp.diag(lam) + jnp.asarray(E + E.T)) * keepf[:, None] * keepf[None, :]
    seed = keepf / lam
    exact = masked_logdet_chol(M, keep)
    ser = masked_logdet_series(M, keep, seed)
    np.testing.assert_allclose(float(ser), float(exact), rtol=1e-10)
    # far from the seed: guard -> Cholesky branch, exact equality
    far = masked_logdet_series(M, keep, seed * 7.0)
    np.testing.assert_allclose(float(far), float(exact), rtol=1e-12)
    # gradient parity (autodiff through the series vs through cholesky)
    g_ser = jax.grad(lambda m: masked_logdet_series(m, keep, seed))(M)
    g_ch = jax.grad(lambda m: masked_logdet_chol(m, keep))(M)
    np.testing.assert_allclose(np.asarray(g_ser), np.asarray(g_ch),
                               rtol=1e-6, atol=1e-10)


def test_compute_eigenspace_iterative_matches_eigh():
    """Cold-start subspace iteration + Rayleigh-Ritz reproduces the full
    eigh's kept eigenpairs when the rank window has buffer below the keep
    threshold (the contract the rank-budget machinery maintains).  This is
    the small-EXECUTABLE eigensolver: XLA's TPU eigh at ntilde=2100 lowers
    to a ~120 MB executable; the programs embedding it use this instead."""
    from gaussian_processes_tpu.ops.stabilize import (
        compute_eigenspace_iterative)
    rng = np.random.default_rng(0)
    n, rank = 500, 96
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    # 4-orders-of-magnitude decay, crossing the relative keep threshold
    # (1e-4) well inside the rank window: kept ~74 of 96
    lam = 50.0 * np.exp(-np.arange(n) / 8.0) + 1e-7
    A = jnp.asarray(0.5 * ((Q * lam) @ Q.T + ((Q * lam) @ Q.T).T),
                    jnp.float32)
    es_ref = compute_eigenspace(A, rank=rank)
    es_it = compute_eigenspace_iterative(A, rank, n_power=12)
    assert int(es_it.keep.sum()) == int(es_ref.keep.sum())
    mask = np.asarray(es_ref.keep) & np.asarray(es_it.keep)
    kr = np.asarray(es_ref.k_tilde_b_diag)[mask]
    ki = np.asarray(es_it.k_tilde_b_diag)[mask]
    np.testing.assert_allclose(ki, kr, rtol=2e-3)
    # kept-subspace alignment (projector distance, f32-class tolerance)
    Br = np.asarray(es_ref.B)[:, mask]
    Bi = np.asarray(es_it.B)[:, mask]
    d = np.linalg.norm(Br @ Br.T - Bi @ Bi.T) / np.linalg.norm(Br @ Br.T)
    assert d < 2e-3

    # warm-seeded (the periodic-refresh path): at least as good
    es_w = compute_eigenspace_iterative(A, rank, n_power=8, seed_B=es_it.B)
    assert int(es_w.keep.sum()) == int(es_ref.keep.sum())
    kw = np.asarray(es_w.k_tilde_b_diag)[mask]
    np.testing.assert_allclose(kw, kr, rtol=2e-3)


def test_compute_eigenspace_iterative_nan_poisons():
    """Non-finite input must poison the outputs (rollback fires), never
    reach the device-faulting eigensolver."""
    from gaussian_processes_tpu.ops.stabilize import (
        compute_eigenspace_iterative)
    A = jnp.asarray(np.eye(64), jnp.float32).at[0, 0].set(jnp.nan)
    es = jax.jit(lambda a: compute_eigenspace_iterative(a, 16))(A)
    assert bool(jnp.all(jnp.isnan(es.eigvals)))
    assert bool(jnp.all(jnp.isnan(es.B)))
