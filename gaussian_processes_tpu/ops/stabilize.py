"""Static-shape eigenspace stabilization (the reference's "_b projection").

The reference stabilizes every solve involving K_tilde by projecting onto the
span of its large eigenvalues: ``eigh(K_tilde)``, keep eigvals >
``max(lam_max * EIGVAL_TOL, EIGVAL_TOL)``, and slice the eigenvector matrix to
``B = eigvecs[:, ikeep]`` (reference: Spatial_GP_repo/utils.py:1682-1694,
1808-1841; rationale in docs.md:1-37).  The slice has a *data-dependent
width* — poison for XLA.

Here the projection keeps its full (ntilde, ntilde) shape and encodes the rank
truncation as a boolean ``keep`` vector: dropped eigendirections have their B
column zeroed, so every downstream product carries exact zeros in the dropped
coordinates and the algebra is bit-identical to the variable-width version.
Determinants / inverses over the kept subspace use the +diag(1-keep) identity
padding trick.  Everything is jit-compatible with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..config import EIGVAL_TOL, MATMUL_PRECISION


class Eigenspace(NamedTuple):
    """Stabilizing eigenspace of K_tilde.

    B:               (ntilde, ntilde) eigenvectors; dropped columns zeroed.
    eigvals:         (ntilde,) raw eigenvalues (ascending).
    keep:            (ntilde,) bool; True where the eigenvalue is retained.
    k_tilde_b_diag:  (ntilde,) kept eigenvalues, 0 where dropped
                     (the reference's diagonal K_tilde_b).
    k_tilde_inv_diag:(ntilde,) 1/eigval where kept, 0 where dropped.
    """
    B: jnp.ndarray
    eigvals: jnp.ndarray
    keep: jnp.ndarray
    k_tilde_b_diag: jnp.ndarray
    k_tilde_inv_diag: jnp.ndarray

    @property
    def n_eigen(self) -> jnp.ndarray:
        return jnp.sum(self.keep)


def _eigh_safe(M: jnp.ndarray):
    """eigh with a non-finite-input guard.

    On TPU, XLA's self-adjoint eigensolver is iterative; a NaN/Inf input
    does not return NaNs (the CPU behavior) — it FAULTS THE DEVICE
    (JaxRuntimeError UNAVAILABLE, unrecoverable for the process).  Every
    eigh whose input depends on runtime data (theta after a bad step, a
    degenerate CholQR, a diverged V) must go through this guard: the
    factorization runs on an identity stand-in when the input is bad, and
    the returned ``finite`` flag lets the caller poison its outputs so the
    NaN-rollback machinery still sees the failure."""
    finite = jnp.all(jnp.isfinite(M))
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    M_safe = jnp.where(finite, M, eye)
    eigvals, eigvecs = jnp.linalg.eigh(M_safe)
    return eigvals, eigvecs, finite


def compute_eigenspace(K_tilde: jnp.ndarray,
                       eigval_tol: float = EIGVAL_TOL,
                       rank: int = None) -> Eigenspace:
    """eigh + static-rank truncation (reference: utils.py:1682-1694).

    ``rank`` (static) slices the basis to the top-``rank`` eigenpairs (the
    LAST columns of the ascending eigh) so every downstream product runs at
    (.., rank) instead of (.., ntilde).  Whenever rank >= the number of kept
    eigenvalues this is exactly the keep-masked full-shape algebra with the
    always-zero coordinates removed; if the spectrum needs more than
    ``rank`` directions the truncation is harder than the reference rule for
    this one call (the caller's rank budget grows on the next sync).

    A non-finite ``K_tilde`` (diverged theta) yields NaN-poisoned outputs
    rather than a device fault — the fit's rollback sees the NaN loss and
    reverts, matching the reference's try/except behavior."""
    eigvals, eigvecs, finite = _eigh_safe(K_tilde)
    poison = jnp.where(finite, 0.0, jnp.nan).astype(K_tilde.dtype)
    eigvals = eigvals + poison
    eigvecs = eigvecs + poison
    if rank is not None and rank < K_tilde.shape[-1]:
        eigvals = eigvals[..., -rank:]
        eigvecs = eigvecs[..., :, -rank:]
    thresh = jnp.maximum(eigvals[..., -1:] * eigval_tol, eigval_tol)
    keep = eigvals > thresh
    keepf = keep.astype(K_tilde.dtype)
    B = eigvecs * keepf[..., None, :]
    safe = jnp.where(keep, eigvals, jnp.ones_like(eigvals))
    return Eigenspace(
        B=B,
        eigvals=eigvals,
        keep=keep,
        # ``+ poison`` (not just ``* keepf``): XLA's simplifier rewrites
        # mul-by-0/1-mask into a select, which would silently scrub the NaN
        # poisoning off these outputs for non-finite inputs
        k_tilde_b_diag=jnp.where(keep, eigvals, 0.0) + poison,
        k_tilde_inv_diag=keepf / safe + poison,
    )


def compute_eigenspace_iterative(K_tilde: jnp.ndarray, rank: int,
                                 eigval_tol: float = EIGVAL_TOL,
                                 n_power: int = 12,
                                 seed_B: jnp.ndarray = None) -> Eigenspace:
    """Top-``rank`` eigenspace by subspace iteration + Rayleigh-Ritz — the
    small-EXECUTABLE replacement for ``compute_eigenspace`` at large ntilde.

    Numerically this computes the same object as ``compute_eigenspace(...,
    rank=rank)``: the top-``rank`` eigenpairs of K_tilde with the reference's
    relative keep threshold (utils.py:1682-1694).  The difference is the
    lowering: XLA's self-adjoint eigensolver at ntilde=2100 compiles to a
    ~120 MB TPU executable (~84 s to compile, ~10 s to LOAD per process
    through a remote-compile tunnel — measured round 3), while this routine
    is matmuls + CholQR + an eigh at ``rank`` (~9 MB total at rank 448).
    Each power step multiplies the error of Ritz pair i by
    ``lambda_{rank+1}/lambda_i``, so with the kernel spectra this framework
    sees (decay over ~4 orders of magnitude within a few hundred
    directions) a cold start converges in ~a dozen steps and a warm
    ``seed_B`` in fewer.  Callers pick ``rank`` comfortably above the kept
    rank (eigenvalues above threshold), exactly like the reduced-rank
    budget machinery does, so boundary Ritz pairs sit below the keep
    threshold where their (slower-converging) error cannot matter.

    ``seed_B`` (optional, (ntilde, rank)): warm subspace; dead (all-zero)
    columns are replaced by a deterministic random probe, as are all
    columns on a cold start.

    Non-finite input or a rank-deficient CholQR yields NaN-poisoned
    outputs (never a device-faulting eigh input), so the fit's rollback
    machinery sees the failure exactly as with ``compute_eigenspace``."""
    import jax as _j
    n = K_tilde.shape[-1]
    dtype = K_tilde.dtype
    finite = jnp.all(jnp.isfinite(K_tilde))
    K_safe = jnp.where(finite, K_tilde, jnp.eye(n, dtype=dtype))
    probe = _j.random.normal(_j.random.PRNGKey(0), (n, rank), dtype)
    if seed_B is not None:
        alive = jnp.sum(seed_B * seed_B, axis=0) > 0
        Y = jnp.where(alive[None, :], seed_B, probe)
    else:
        Y = probe

    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    def orth(Y):
        """Rank-revealing orthonormalization via the small Gram's eigh.

        Cold-start subspaces are the pathological case for CholQR: one
        multiply by a 4-orders-of-magnitude spectrum gives a Gram with
        condition ~1e8, beyond f32 Cholesky (NaN).  The eigh route clamps
        the collapsed directions (they re-enrich on the next power step)
        instead of failing, and the input guard keeps NaN away from the
        device-faulting eigensolver."""
        G = jnp.matmul(Y.T, Y, precision=lax.Precision.HIGHEST)
        w, U, _ = _eigh_safe(0.5 * (G + G.T))
        scale = lax.rsqrt(jnp.maximum(w, 10.0 * eps * w[-1]))
        return jnp.matmul(Y, U * scale[None, :],
                          precision=lax.Precision.HIGHEST)

    def body(_, Y):
        Y = jnp.matmul(K_safe, Y, precision=lax.Precision.HIGHEST)
        norm = jnp.sqrt(jnp.sum(Y * Y, axis=0))
        Y = Y / jnp.maximum(norm, jnp.finfo(dtype).tiny)[None, :]
        return orth(Y)

    # fori_loop, not an unrolled Python loop: ONE eigh(rank) instance in
    # the executable regardless of n_power (executable size is the whole
    # point of this routine)
    Y = lax.fori_loop(0, n_power, body, Y)
    # refinement pass: Y is near-orthonormal now, so its Gram is I + small
    # and CholQR is both stable and tighter than the clamped eigh route
    Y = _cholqr(Y, iters=1)
    M = jnp.matmul(Y.T, jnp.matmul(K_safe, Y,
                                   precision=lax.Precision.HIGHEST),
                   precision=lax.Precision.HIGHEST)
    M = 0.5 * (M + M.T)
    # CholQR on a degenerate subspace leaves NaNs in Y/M — the guard is
    # mandatory (a NaN eigh input faults the TPU device)
    eigvals, U, m_finite = _eigh_safe(M)
    B = jnp.matmul(Y, U, precision=lax.Precision.HIGHEST)
    ok = finite & m_finite & jnp.all(jnp.isfinite(B))
    poison = jnp.where(ok, 0.0, jnp.nan).astype(dtype)
    eigvals = eigvals + poison
    B = B + poison
    thresh = jnp.maximum(eigvals[..., -1:] * eigval_tol, eigval_tol)
    keep = eigvals > thresh
    keepf = keep.astype(dtype)
    B = B * keepf[None, :]
    safe = jnp.where(keep, eigvals, jnp.ones_like(eigvals))
    return Eigenspace(
        B=B,
        eigvals=eigvals,
        keep=keep,
        k_tilde_b_diag=jnp.where(keep, eigvals, 0.0) + poison,
        k_tilde_inv_diag=keepf / safe + poison,
    )


def _cholqr(Y: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Orthonormalize the columns of Y by (repeated) Cholesky-QR — two
    MXU-friendly matmuls + one small Cholesky per pass, instead of a
    Householder QR (which lowers to a long scalar-heavy loop on TPU).
    A rank-deficient Y yields NaN, which the caller's fallback catches."""
    from jax.scipy.linalg import solve_triangular
    for _ in range(iters):
        G = jnp.matmul(Y.T, Y, precision=MATMUL_PRECISION)
        L = jnp.linalg.cholesky(G)
        Y = solve_triangular(L, Y.T, lower=True).T
    return Y


def subspace_eigenspace(K_tilde: jnp.ndarray, B_warm: jnp.ndarray,
                        eigval_tol: float = EIGVAL_TOL,
                        n_power: int = 2):
    """Warm-started top-r eigenspace by subspace iteration + Rayleigh-Ritz.

    Between EM iterations theta moves little, so the previous basis
    ``B_warm`` (ntilde, r) is an excellent initial subspace for the new
    K_tilde: a couple of power steps (K_tilde @ Y, CholQR orthogonalization)
    re-converge it, and the r x r Rayleigh-Ritz problem delivers eigenpairs.
    O(ntilde^2 r) matmuls + eigh(r) instead of eigh(ntilde) — at the
    production shapes (ntilde=2100, r~384) this replaces a ~136 ms
    factorization with ~6 ms of MXU work.

    ``B_warm`` may contain all-zero columns (dropped directions are zeroed
    by the keep mask; rank growth pads with zeros) — they are replaced by
    deterministic canonical fillers that the power steps rotate into the
    escaped directions (the randomized-range-finder trick with a fixed
    probe).

    Returns ``(es, ok)`` where ``ok`` is False when the iteration failed
    numerically (rank-deficient CholQR); callers fall back to the full eigh.
    """
    n, r = B_warm.shape
    dtype = K_tilde.dtype
    # deterministic fillers for dead columns: spread canonical vectors
    rows = (jnp.arange(r) * max(n // r, 1)) % n
    filler = jnp.zeros((n, r), dtype).at[rows, jnp.arange(r)].set(1.0)
    alive = jnp.sum(B_warm * B_warm, axis=0) > 0
    Y = jnp.where(alive[None, :], B_warm, filler)
    for _ in range(n_power):
        Y = jnp.matmul(K_tilde, Y, precision=MATMUL_PRECISION)
        # normalize columns before CholQR so the Gram stays well-scaled
        # across the ~1e4 eigenvalue spread
        norm = jnp.sqrt(jnp.sum(Y * Y, axis=0))
        Y = Y / jnp.maximum(norm, jnp.finfo(dtype).tiny)[None, :]
        Y = _cholqr(Y, iters=1)
    M = jnp.matmul(Y.T, jnp.matmul(K_tilde, Y, precision=MATMUL_PRECISION),
                   precision=MATMUL_PRECISION)
    M = 0.5 * (M + M.T)
    # a degenerate CholQR (rank-deficient warm subspace) leaves NaNs in Y
    # and M — the guarded eigh is mandatory (NaN input faults the TPU)
    eigvals, U, finite = _eigh_safe(M)
    B = jnp.matmul(Y, U, precision=MATMUL_PRECISION)
    thresh = jnp.maximum(eigvals[-1] * eigval_tol, eigval_tol)
    keep = (eigvals > thresh) & finite
    keepf = keep.astype(dtype)
    B = B * keepf[None, :]
    safe = jnp.where(keep, eigvals, jnp.ones_like(eigvals))
    ok = finite & jnp.all(jnp.isfinite(B)) & jnp.all(jnp.isfinite(eigvals))
    es = Eigenspace(
        B=jnp.where(ok, B, jnp.zeros_like(B)),
        eigvals=eigvals,
        keep=keep,
        k_tilde_b_diag=eigvals * keepf,
        k_tilde_inv_diag=keepf / safe,
    )
    return es, ok


def project_gram(es: Eigenspace, K: jnp.ndarray, shared: bool) -> jnp.ndarray:
    """KKtilde_inv_b = K B diag(1/eig) — the 'a' matrix of the reference
    (utils.py:1693-1694).  When inducing points == training points this
    collapses to B itself."""
    if shared:
        return es.B
    K_b = jnp.matmul(K, es.B, precision=MATMUL_PRECISION)
    return K_b * es.k_tilde_inv_diag[None, :]


def reproject(es_new: Eigenspace, es_old: Eigenspace,
              m_b: jnp.ndarray, V_b: jnp.ndarray):
    """Carry the variational state across a change of eigenspace:
    ``V_b' = B_new^T (B_old V_b B_old^T) B_new``, ``m_b' = B_new^T B_old m_b``
    (reference: utils.py:1833-1841)."""
    R = jnp.matmul(es_new.B.T, es_old.B, precision=MATMUL_PRECISION)
    V_new = jnp.matmul(jnp.matmul(R, V_b, precision=MATMUL_PRECISION), R.T,
                       precision=MATMUL_PRECISION)
    m_new = jnp.matmul(R, m_b, precision=MATMUL_PRECISION)
    return m_new, V_new


def masked_logdet_chol(M: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """log|M| restricted to the kept subspace, via Cholesky of
    ``M + diag(1 - keep)`` (dropped rows/cols of M are exact zeros, so the
    padded matrix is block-diagonal [M_kept, I] and the identity block
    contributes log 1 = 0).  Returns NaN if the kept block is not posdef —
    the caller's rollback logic treats NaN as the reference treats a raised
    Cholesky error (utils.py:1271-1304)."""
    keepf = keep.astype(M.dtype)
    padded = M + jnp.diag(1.0 - keepf)
    L = jnp.linalg.cholesky(padded)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def masked_logdet_eigh(M: jnp.ndarray, keep: jnp.ndarray,
                       eigval_tol: float = EIGVAL_TOL) -> jnp.ndarray:
    """Fallback log-determinant: eigh and keep eigenvalues above the same
    relative threshold (reference's except-branch, utils.py:1282-1301)."""
    keepf = keep.astype(M.dtype)
    padded = M + jnp.diag(1.0 - keepf)
    eigvals, _, finite = _eigh_safe(padded)
    thresh = jnp.maximum(eigvals[-1] * eigval_tol, eigval_tol)
    big = eigvals > thresh
    safe = jnp.where(big, eigvals, jnp.ones_like(eigvals))
    # NaN (not a fabricated finite number) when M itself was non-finite,
    # so the caller's rollback still fires
    return jnp.where(finite, jnp.sum(jnp.log(safe)),
                     jnp.asarray(jnp.nan, M.dtype))


def logdet_with_fallback(M: jnp.ndarray, keep: jnp.ndarray,
                         eigval_tol: float = EIGVAL_TOL) -> jnp.ndarray:
    """Cholesky log-determinant with eigendecomposition fallback when the
    factorization fails (reference: utils.py:1271-1304).  Inside jit the
    'failure' signal is a NaN from the Cholesky; lax.cond switches to the
    eigh route."""
    ld = masked_logdet_chol(M, keep)
    return lax.cond(jnp.isfinite(ld),
                    lambda: ld,
                    lambda: masked_logdet_eigh(M, keep, eigval_tol))


def masked_logdet_series(M: jnp.ndarray, keep: jnp.ndarray,
                         inv_diag_warm: jnp.ndarray,
                         tol: float = 0.25) -> jnp.ndarray:
    """log-determinant of the kept block via an 8th-order trace series
    around the diagonal seed — three rank x rank MXU matmuls instead of a
    small-matrix Cholesky whose fixed latency (~2-3 ms at rank ~384, see
    docs/tpu_linalg.md) the M-step objective would otherwise pay per
    line-search evaluation.

    With ``D = diag(inv_diag_warm)`` (exact inverse of the kept block at
    the theta where the eigenspace was computed, so nearby trials give a
    small perturbation), ``A = D^(1/2) M D^(1/2) = I + E`` is symmetric and

        logdet(M_kept) = logdet(A) - sum(log inv_diag_warm)
        logdet(A) = tr(E) - tr(E^2)/2 + ... - tr(E^8)/8 + O(r |E|^9)

    where every trace through 8th order comes from E^2, E^3, E^4 (three
    matmuls) and elementwise sums (``tr(E^(a+b)) = sum(E^a * E^b)`` for
    symmetric E).  Truncation error <= rank * |E|_2^9 / 9; the in-graph
    guard falls back to the Cholesky log-determinant whenever
    ``|E|_F >= tol`` (0.25 -> error < 1e-3 absolute at rank 384, far below
    the objective's own f32/bf16 noise floor) or E is non-finite.  A
    non-PSD trial inside the series regime cannot occur (|E|_2 < 1 implies
    A's eigenvalues lie in (0, 2)); outside it the Cholesky fallback yields
    NaN -> inf loss -> rejected step, exactly as ``masked_logdet_chol``."""
    keepf = keep.astype(M.dtype)
    Mp = M + jnp.diag(1.0 - keepf)
    d = inv_diag_warm + (1.0 - keepf)
    s = jnp.sqrt(d)
    n = M.shape[-1]
    E = s[:, None] * Mp * s[None, :] - jnp.eye(n, dtype=M.dtype)
    fro2 = jnp.sum(E * E)

    def series():
        hp = lax.Precision.HIGHEST
        E2 = jnp.matmul(E, E, precision=hp)
        E3 = jnp.matmul(E2, E, precision=hp)
        E4 = jnp.matmul(E2, E2, precision=hp)
        ld_A = (jnp.trace(E) - jnp.sum(E * E) / 2 + jnp.sum(E2 * E) / 3
                - jnp.sum(E2 * E2) / 4 + jnp.sum(E3 * E2) / 5
                - jnp.sum(E3 * E3) / 6 + jnp.sum(E4 * E3) / 7
                - jnp.sum(E4 * E4) / 8)
        # logdet(A) = logdet(Mp) + sum(log d)  =>  logdet(Mp) = ld_A - ...
        return ld_A - jnp.sum(jnp.log(d))

    ok = jnp.isfinite(fro2) & (fro2 < tol * tol)
    return lax.cond(ok, series, lambda: masked_logdet_chol(M, keep))


def schulz_iterations(M: jnp.ndarray, X: jnp.ndarray, steps: int = 12,
                      guard_lag: int = 3, tol: float = 1e-3):
    """Newton-Schulz inverse iteration ``X <- X (2I - M X)`` from seed X.

    Quadratically convergent whenever ``||I - M X0|| < 1``; every step is two
    small matmuls on the MXU — no triangular solve / LU pivoting, whose
    fixed latency (~3-4 ms at rank ~384 on this backend, see
    docs/tpu_linalg.md) dominates the small-matrix factorization paths the
    hot loops would otherwise pay per evaluation.

    EARLY EXIT: the main ``lax.while_loop`` stops as soon as the measured
    residual ``max|M X - I|`` drops below ``tol`` (or after
    ``steps - guard_lag`` iterations), then exactly ``guard_lag + 1``
    further unrolled steps run.  The residual matrix squares each step
    (``I - M X_{k+1} = (I - M X_k)^2``), so acceptance (returned
    ``resid < tol``) implies the RETURNED X has residual
    ~``tol^(2^(guard_lag+1))`` — tol 1e-3 at lag 3 puts the final iterate
    at the machine/conditioning floor, never at a "barely passed" 1e-5
    that would silently perturb a trajectory (callers treat acceptance as
    exact).  A good warm seed typically passes in 2-5 iterations, less
    than half the fixed-unroll cost this replaces; a NaN residual compares
    False and exits immediately into the guaranteed-rejected fallback.
    Total step count never exceeds ``steps + 1``.  Matmuls run at HIGHEST
    precision regardless of any enclosing precision scope — the
    iteration's accuracy ceiling must not depend on the objective's speed
    setting."""
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    hp = lax.Precision.HIGHEST
    max_main = max(steps - guard_lag, 1)

    def body(c):
        i, X, _ = c
        P = jnp.matmul(M, X, precision=hp)
        r = jnp.max(jnp.abs(P - eye))
        X = jnp.matmul(X, 2.0 * eye - P, precision=hp)
        return i + 1, X, r

    def cond(c):
        i, _, r = c
        return (i < max_main) & (r >= tol)

    _, X, resid = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), X,
                     jnp.asarray(jnp.inf, M.dtype)))
    # the residual was measured one update behind the loop's X, so this
    # tail contributes guard_lag + 1 squarings past the measurement
    for _ in range(guard_lag):
        P = jnp.matmul(M, X, precision=hp)
        X = jnp.matmul(X, 2.0 * eye - P, precision=hp)
    return X, resid


import functools as _functools
import jax as _jax


@_functools.partial(_jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _padded_inverse_warm(padded: jnp.ndarray, x0_diag: jnp.ndarray,
                         steps: int, tol: float,
                         fallback: str) -> jnp.ndarray:
    """inv(padded) via warm-seeded Newton-Schulz with a guarded fallback.

    ``x0_diag`` seeds the iteration with ``diag(x0_diag)`` (the exact
    inverse when padded is diagonal — e.g. K_tilde_b at the theta where the
    eigenspace was computed).  When the residual check fails (seed too far:
    a wild line-search trial, a non-finite input):

    - ``fallback="exact"`` — a ``lax.cond`` computes ``jnp.linalg.inv``
      instead.  Outside vmap the cond executes ONE branch at runtime, so
      the LU latency is paid only on actual fallbacks and the result is
      bit-for-bit the exact path's trajectory (the accepted Newton-Schulz
      iterate sits at the machine floor — see ``schulz_iterations``'s
      lagged guard).  This is the single-cell default.
    - ``fallback="poison"`` — the output is NaN-poisoned BRANCHLESSLY, so
      the enclosing objective returns +inf and the line search rejects the
      trial and backtracks toward the seed point, where the iteration
      always converges.  This matters under vmap (population fits, batched
      line-search ladders): a cond with a batched predicate executes the
      exact-inverse branch for every lane as batched LU — the very latency
      this function removes.  The cost is that a far-but-valid trial is
      rejected rather than evaluated (a smaller step is taken), so the
      trajectory may differ slightly from the exact path's.

    The custom VJP treats the output as the true inverse
    (``dX = -X^T g X^T``) — identical to ``jnp.linalg.inv``'s autodiff rule
    and much cheaper than differentiating the unrolled iteration."""
    X0 = jnp.diag(x0_diag)
    X, resid = schulz_iterations(padded, X0, steps, tol=tol)
    if fallback == "exact":
        return lax.cond(resid < tol, lambda: X,
                        lambda: jnp.linalg.inv(padded))
    poison = jnp.where(resid < tol, 0.0, jnp.nan).astype(padded.dtype)
    return X + poison


def _padded_inverse_warm_fwd(padded, x0_diag, steps, tol, fallback):
    X = _padded_inverse_warm(padded, x0_diag, steps, tol, fallback)
    return X, (X, x0_diag)


def _padded_inverse_warm_bwd(steps, tol, fallback, res, g):
    X, x0_diag = res
    gp = -jnp.matmul(
        X.T, jnp.matmul(g, X.T, precision=lax.Precision.HIGHEST),
        precision=lax.Precision.HIGHEST)
    # A poisoned forward (non-converged trial) must yield a BENIGN gradient,
    # not NaN: the trial's loss is already +inf, and the line searches
    # expect the same "+inf value, finite gradient" shape as the
    # bounds-violation path (models/fit._mstep_objective).
    gp = jnp.where(jnp.isfinite(gp), gp, 0.0)
    return gp, jnp.zeros_like(x0_diag)


_padded_inverse_warm.defvjp(_padded_inverse_warm_fwd,
                            _padded_inverse_warm_bwd)


def masked_inverse_warm(M: jnp.ndarray, keep: jnp.ndarray,
                        inv_diag_warm: jnp.ndarray, steps: int = 12,
                        tol: float = 1e-3,
                        fallback: str = "exact") -> jnp.ndarray:
    """``masked_inverse`` computed by warm-seeded Newton-Schulz.

    ``inv_diag_warm`` is a diagonal approximate inverse of the kept block —
    on the M-step hot path, ``es.k_tilde_inv_diag``: exactly
    ``inv(K_tilde_b)`` at the theta where the fixed eigenspace was computed,
    and an excellent seed for nearby line-search trials.  With
    ``fallback="exact"`` (default) a non-converged iteration falls back to
    the exact inverse in-graph, making this a drop-in replacement for
    ``masked_inverse`` to the machine floor; ``fallback="poison"``
    NaN-poisons instead (branchless — for vmapped population fits, see
    ``_padded_inverse_warm``)."""
    keepf = keep.astype(M.dtype)
    padded = M + jnp.diag(1.0 - keepf)
    x0 = inv_diag_warm + (1.0 - keepf)
    inv = _padded_inverse_warm(padded, x0, steps, tol, fallback)
    return inv * keepf[:, None] * keepf[None, :]


def masked_inverse(M: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the kept block of M, zero-padded on dropped rows/cols
    (the reference solves the dense n_eigen system, utils.py:2067)."""
    keepf = keep.astype(M.dtype)
    padded = M + jnp.diag(1.0 - keepf)
    inv = jnp.linalg.inv(padded)
    return inv * keepf[:, None] * keepf[None, :]


def block_matrix_inverse(orig_inv: jnp.ndarray, new_column: jnp.ndarray) -> jnp.ndarray:
    """Sherman-Morrison block update for the inverse of an (N+1, N+1) matrix
    [[K, b], [b^T, d]] given inv(K) and new_column = [b; d]
    (reference: utils.py:1055-1070, present but unused there).  Offered as a
    rank-1 growth primitive; the active loop's refits instead warm-start the
    eigenspace (models/active.py), which subsumes the O(n^2) update."""
    b = new_column[:-1]
    d = new_column[-1]
    e = orig_inv @ b
    g = 1.0 / (d - b @ e)
    top = jnp.concatenate([orig_inv + g * jnp.outer(e, e), (-g * e)[:, None]], axis=1)
    bottom = jnp.concatenate([-g * e, g[None]], axis=0)[None, :]
    return jnp.concatenate([top, bottom], axis=0)
