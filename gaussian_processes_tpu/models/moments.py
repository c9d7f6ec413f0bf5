"""Posterior moments, firing-rate link, Poisson expected log-likelihood, KL.

Pure functions over jax pytrees; every formula is the one the reference
hand-derives (Spatial_GP_repo/utils.py:1072-1337), but autodiff-ready so
``jax.grad`` supplies the hyperparameter gradients that the reference encodes
manually (those hand formulas are kept in tests as golden cross-checks,
mirroring moments_gradients.ipynb).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..ops.precision import split_matmul
from ..ops.stabilize import Eigenspace, logdet_with_fallback

FParams = Dict[str, jnp.ndarray]


def lambda_moments(a: jnp.ndarray, K_b: jnp.ndarray, Kvec: jnp.ndarray,
                   m_b: jnp.ndarray, V_b: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Marginal posterior mean/variance of lambda at the training points.

    ``a = K K_tilde^-1`` (projected), K_b = K @ B, all in the stabilized
    basis.  lambda_m = a m ;  lambda_var = Kvec + sum(-K_b . a + a . (a V),
    axis=1)  (reference: utils.py:1072-1124).
    """
    lambda_m = jnp.matmul(a, m_b, precision=MATMUL_PRECISION)
    aV = split_matmul(a, V_b)
    lambda_var = Kvec + jnp.sum(-K_b * a + a * aV, axis=1)
    return lambda_m, lambda_var


def mean_f_given_lambda_moments(f_params: FParams, lambda_m: jnp.ndarray,
                                lambda_var: jnp.ndarray) -> jnp.ndarray:
    """<f> = exp(A lambda_m + 0.5 A^2 lambda_var + lambda0)
    (reference: utils.py:1126-1141)."""
    A = jnp.exp(f_params["logA"])
    return jnp.exp(A * lambda_m + 0.5 * A * A * lambda_var + f_params["lambda0"])


def lambda0_given_logA(logA: jnp.ndarray, r: jnp.ndarray,
                       lambda_m: jnp.ndarray, lambda_var: jnp.ndarray,
                       weight: jnp.ndarray = None) -> jnp.ndarray:
    """Closed-form optimal lambda0 = log sum(r) - log sum exp(A lam_m +
    0.5 A^2 lam_var) — the solution of dL/dlambda0 = 0
    (reference: utils.py:1215-1229).  Computed via logsumexp for overflow
    safety (the reference sums raw exponentials).  ``weight`` masks padded
    training points (pad-and-mask active-learning path)."""
    A = jnp.exp(logA)
    z = A * lambda_m + 0.5 * A * A * lambda_var
    if weight is not None:
        z = jnp.where(weight > 0, z, -jnp.inf)
        r = r * weight
    zmax = jnp.max(z)
    logsum = zmax + jnp.log(jnp.sum(jnp.exp(z - zmax)))
    return jnp.log(jnp.sum(r)) - logsum


def poisson_ell(r: jnp.ndarray, f_mean: jnp.ndarray, lambda_m: jnp.ndarray,
                f_params: FParams, weight: jnp.ndarray = None) -> jnp.ndarray:
    """Expected Poisson log-likelihood
    ``A r^T lambda_m + lambda0 sum(r) - sum(f)``
    (reference: utils.py:1231-1243; the log r! constant is dropped there
    too).  ``weight`` masks padded training points."""
    A = jnp.exp(f_params["logA"])
    if weight is not None:
        r = r * weight
        f_mean = f_mean * weight
    return (A * jnp.dot(r, lambda_m)
            + f_params["lambda0"] * jnp.sum(r)
            - jnp.sum(f_mean))


def ell_grad_f_params(r: jnp.ndarray, f_mean: jnp.ndarray,
                      lambda_m: jnp.ndarray, lambda_var: jnp.ndarray,
                      f_params: FParams) -> Dict[str, jnp.ndarray]:
    """Hand-derived ELL gradients wrt (logA, lambda0)
    (reference: utils.py:1248-1259) — kept as a golden check for jax.grad."""
    A = jnp.exp(f_params["logA"])
    rlm = jnp.dot(r, lambda_m)
    return {
        "logA": A * (rlm - jnp.dot(lambda_m + A * lambda_var, f_mean)),
        "lambda0": jnp.sum(r) - jnp.sum(f_mean),
    }


def kl_divergence(m_b: jnp.ndarray, V_b: jnp.ndarray, es: Eigenspace,
                  K_tilde_b: jnp.ndarray = None,
                  K_tilde_inv_b: jnp.ndarray = None,
                  skip_logdet_V: bool = False,
                  chol_only: bool = False,
                  logdet_K: jnp.ndarray = None,
                  logdet_V: jnp.ndarray = None) -> jnp.ndarray:
    """KL(q(lambda_tilde) || p) in the stabilized basis
    (reference: utils.py:1306-1337):

        KL = -1/2 log|V| + 1/2 log|K_tilde| + 1/2 m^T K_tilde^-1 m
             + 1/2 tr(V K_tilde^-1)

    With the E-step basis, K_tilde_b is diagonal (kept eigenvalues); during
    the M-step a dense re-projected ``K_tilde_b``/``K_tilde_inv_b`` pair is
    supplied instead.

    ``skip_logdet_V=True`` drops the -1/2 log|V| term — constant in theta, so
    the M-step objective omits it (one fewer O(n^3) factorization per
    line-search evaluation; the reported KL track always includes it).

    ``chol_only=True`` uses the branchless Cholesky log-determinant without
    the lax.cond eigh fallback: under vmap a cond executes BOTH branches per
    lane, so the fallback would add a full eigendecomposition to every
    line-search evaluation of every cell.  A failed factorization then
    yields NaN, which the M-step objective maps to an infinite loss (step
    rejected) — the same outcome as the reference's inf-at-bad-points
    handling.
    """
    keep = es.keep
    if K_tilde_inv_b is None:
        # Diagonal case: K_tilde_b = diag(kept eigvals).
        kinv = es.k_tilde_inv_diag
        quad = jnp.dot(m_b, kinv * m_b)
        tr = jnp.dot(jnp.diagonal(V_b), kinv)
        safe = jnp.where(keep, es.eigvals, jnp.ones_like(es.eigvals))
        logdet_K = jnp.sum(jnp.log(safe))
    else:
        b = jnp.matmul(K_tilde_inv_b, m_b, precision=MATMUL_PRECISION)
        quad = jnp.dot(m_b, b)
        tr = jnp.trace(split_matmul(V_b, K_tilde_inv_b))
        if logdet_K is not None:
            # caller supplied the log-determinant (e.g. the M-step
            # objective's warm-seeded trace series, ops/stabilize.py)
            pass
        elif chol_only:
            from ..ops.stabilize import masked_logdet_chol
            logdet_K = masked_logdet_chol(K_tilde_b, keep)
        else:
            logdet_K = logdet_with_fallback(K_tilde_b, keep)

    if skip_logdet_V:
        return 0.5 * logdet_K + 0.5 * quad + 0.5 * tr
    if logdet_V is None:
        logdet_V = logdet_with_fallback(V_b, keep)
    # (callers pass ``logdet_V`` when it has a closed form — e.g. the init's
    # exactly-diagonal V_b — keeping the eigh-fallback factorization out of
    # programs that never need it)
    return -0.5 * logdet_V + 0.5 * logdet_K + 0.5 * quad + 0.5 * tr


def lambda_moments_star(a_star: jnp.ndarray, K_star_b: jnp.ndarray,
                        Kvec_star: jnp.ndarray, m_b: jnp.ndarray,
                        V_b: jnp.ndarray, K_tilde_b_diag: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched test-point posterior moments (the reference loops over test
    images one at a time, utils.py:326-412, 1476-1500):

        mu* = a m ;  sigma*^2 = K*_diag + diag(a (V - K_tilde) a^T)
    """
    mu = jnp.matmul(a_star, m_b, precision=MATMUL_PRECISION)
    aV = jnp.matmul(a_star, V_b - jnp.diag(K_tilde_b_diag),
                    precision=MATMUL_PRECISION)
    var = Kvec_star + jnp.sum(aV * a_star, axis=1)
    return mu, var
