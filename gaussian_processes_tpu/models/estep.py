"""Closed-form Newton E-step on the variational parameters (m_b, V_b).

Reference: Spatial_GP_repo/utils.py:1402-1459 with alpha = 1 (the only path
the reference trusts, see docs.md:5-21): with

    g = A a^T (r - f),    G = A^2 a^T (a . f)

the update is ``V_new = (I + K_tilde G)^-1 K_tilde`` (guaranteed posdef — the
current V is not used) and ``m_new = V_new (G m + g)``.  In the stabilized
basis K_tilde_b is diagonal with dropped eigendirections exactly zero, so the
dropped rows of the linear system collapse to identity rows with zero RHS and
the update stays confined to the kept subspace.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from jax import lax

from ..config import MATMUL_PRECISION


def estep_update(r: jnp.ndarray, a: jnp.ndarray, m_b: jnp.ndarray,
                 f_mean: jnp.ndarray, k_tilde_b_diag: jnp.ndarray,
                 f_params: Dict[str, jnp.ndarray],
                 weight: jnp.ndarray = None,
                 Minv_warm: jnp.ndarray = None,
                 use_warm: jnp.ndarray = None,
                 schulz_steps: int = 12, schulz_tol: float = 1e-3,
                 return_minv: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Newton update of (m_b, V_b).  ``a`` is KKtilde_inv_b.
    ``weight`` masks padded training points out of the Newton sums.

    ``Minv_warm``/``use_warm``: optional warm start for the inner SPD
    inverse.  Successive Newton steps change ``f`` (and hence ``M = I +
    S G S``) less and less, so the previous step's inverse seeds a
    Newton-Schulz iteration (``ops/stabilize.schulz_iterations`` — pure MXU
    matmuls, no triangular-solve latency) with an in-graph exact-Cholesky
    fallback when the residual check fails.  ``use_warm`` is a traced bool
    (False on the first Newton step of an iteration, where no seed exists).
    With ``return_minv=True`` the updated inverse is returned for carrying."""
    A = jnp.exp(f_params["logA"])
    resid = r - f_mean
    fw = f_mean
    if weight is not None:
        resid = resid * weight
        fw = fw * weight
    g = A * jnp.matmul(a.T, resid, precision=MATMUL_PRECISION)
    G = A * A * jnp.matmul(a.T, a * fw[:, None],
                           precision=MATMUL_PRECISION)
    ntilde = k_tilde_b_diag.shape[0]
    # Symmetrized SPD solve: with K = S^2 (S = sqrt of the diagonal
    # K_tilde_b), the update (I + K G)^-1 K == S (I + S G S)^-1 S, and
    # I + S G S is symmetric positive definite -> Cholesky.  On TPU this
    # matters: XLA's LU path (jnp.linalg.solve) is sequential-pivoting
    # bound (measured 41.7 ms at rank 384, with pathological lowerings for
    # some shapes), while the blocked Cholesky solve is matmul work
    # (~4 ms).  Dropped eigendirections have S = 0, so their rows/cols of
    # M collapse to identity and V_new stays exactly zero there.
    s = jnp.sqrt(k_tilde_b_diag)
    M = jnp.eye(ntilde, dtype=a.dtype) + s[:, None] * G * s[None, :]

    def solve_exact():
        from jax.scipy.linalg import cho_solve
        L = jnp.linalg.cholesky(M)
        return cho_solve((L, True), jnp.eye(ntilde, dtype=a.dtype))

    if Minv_warm is None:
        Minv = solve_exact()
    else:
        from ..ops.stabilize import schulz_iterations

        def solve_warm():
            X, res = schulz_iterations(M, Minv_warm, schulz_steps,
                                       tol=schulz_tol)
            return lax.cond(res < schulz_tol, lambda: X, solve_exact)

        uw = use_warm if use_warm is not None else jnp.asarray(True)
        Minv = lax.cond(uw, solve_warm, solve_exact)
    V_new = Minv * s[:, None] * s[None, :]
    m_new = jnp.matmul(V_new, jnp.matmul(G, m_b, precision=MATMUL_PRECISION) + g,
                       precision=MATMUL_PRECISION)
    V_new = 0.5 * (V_new + V_new.T)
    if return_minv:
        return m_new, V_new, Minv
    return m_new, V_new


def estep_update_damped(r: jnp.ndarray, a: jnp.ndarray, m_b: jnp.ndarray,
                        V_b: jnp.ndarray, f_mean: jnp.ndarray,
                        k_tilde_b_diag: jnp.ndarray,
                        f_params: Dict[str, jnp.ndarray],
                        alpha: float = 0.5,
                        weight: jnp.ndarray = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Damped (alpha != 1) Newton E-step — API parity with the reference's
    unstable-but-present path (utils.py:1423-1436; flagged there as risking
    a non-posdef V_new, which is why alpha=1 is the trusted default):

        V_new = V ((1-alpha) K + alpha V + alpha K G V)^-1 K
        m_new = m - alpha (I + K G)^-1 (m - K g)

    Unlike the alpha=1 update this one reads the current V."""
    A = jnp.exp(f_params["logA"])
    resid = r - f_mean
    fw = f_mean
    if weight is not None:
        resid = resid * weight
        fw = fw * weight
    g = A * jnp.matmul(a.T, resid, precision=MATMUL_PRECISION)
    G = A * A * jnp.matmul(a.T, a * fw[:, None], precision=MATMUL_PRECISION)
    n = k_tilde_b_diag.shape[0]
    K = jnp.diag(k_tilde_b_diag)
    KG = k_tilde_b_diag[:, None] * G
    lhs_V = (1.0 - alpha) * K + alpha * V_b \
        + alpha * jnp.matmul(KG, V_b, precision=MATMUL_PRECISION)
    V_new = jnp.matmul(V_b, jnp.linalg.solve(lhs_V, K),
                       precision=MATMUL_PRECISION)
    lhs_m = jnp.eye(n, dtype=a.dtype) + KG
    m_new = m_b - alpha * jnp.linalg.solve(lhs_m,
                                           m_b - k_tilde_b_diag * g)
    V_new = 0.5 * (V_new + V_new.T)
    return m_new, V_new


def estep_update_V_inv(r: jnp.ndarray, a: jnp.ndarray, m_b: jnp.ndarray,
                       f_mean: jnp.ndarray, k_tilde_inv_diag: jnp.ndarray,
                       f_params: Dict[str, jnp.ndarray],
                       weight: jnp.ndarray = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``update_V_inv=True`` variant (reference: utils.py:1441-1457):
    invert V_inv = K^-1 + G directly (the reference warns this is less
    stable than the solve form and adds eps-scale diagonal artifacts,
    reproduced here for parity)."""
    A = jnp.exp(f_params["logA"])
    resid = r - f_mean
    fw = f_mean
    if weight is not None:
        resid = resid * weight
        fw = fw * weight
    g = A * jnp.matmul(a.T, resid, precision=MATMUL_PRECISION)
    G = A * A * jnp.matmul(a.T, a * fw[:, None], precision=MATMUL_PRECISION)
    n = k_tilde_inv_diag.shape[0]
    eps = jnp.finfo(a.dtype).eps * 1.0e-7
    V_inv = jnp.diag(k_tilde_inv_diag) + G
    V_inv = 0.5 * (V_inv + V_inv.T) + eps * jnp.eye(n, dtype=a.dtype)
    V_new = jnp.linalg.inv(V_inv)
    m_new = jnp.matmul(
        V_new, jnp.matmul(G, m_b, precision=MATMUL_PRECISION) + g,
        precision=MATMUL_PRECISION)
    V_new = 0.5 * (V_new + V_new.T) + eps * jnp.eye(n, dtype=a.dtype)
    return m_new, V_new


def update_f_params_newton(f_params, r, lambda_m, lambda_var,
                           nit: int = 1000, eta: float = 0.25,
                           tol: float = 1e-6):
    """Legacy joint Newton update of (A, lambda0) with the explicit 2x2
    Hessian (reference: utils.py:1339-1400 ``updateA``; superseded there and
    here by L-BFGS-on-logA + closed-form lambda0, kept for API parity).

    Operates on the raw (A, lambda0) parameterization.  Returns the updated
    {"logA", "lambda0"} dict, the final expected log-likelihood, and the
    final f_mean.  Runs as a fixed-iteration lax.while_loop with the same
    convergence test on ||R||_1 as the reference.
    """
    import jax
    from jax import lax
    from .moments import mean_f_given_lambda_moments, poisson_ell

    A0 = jnp.exp(f_params["logA"])
    lam00 = f_params["lambda0"]
    sum_r = jnp.sum(r)
    rlm = jnp.dot(r, lambda_m)

    def newton_state(A, lam0):
        f_mean = jnp.exp(A * lambda_m + 0.5 * A * A * lambda_var + lam0)
        d_exp = lambda_m + A * lambda_var
        f_star = d_exp * f_mean
        sum_f_star = jnp.sum(f_star)
        sum_f_mean = jnp.sum(f_mean)
        R = jnp.stack([rlm - sum_f_star, sum_r - sum_f_mean])
        H = -jnp.asarray(
            [[jnp.dot(lambda_var, f_mean) + jnp.dot(d_exp, f_star),
              sum_f_star],
             [sum_f_star, sum_f_mean]])
        return R, H

    def cond(state):
        A, lam0, count, done = state
        return (~done) & (count < nit)

    def body(state):
        A, lam0, count, _ = state
        R, H = newton_state(A, lam0)
        step = jnp.linalg.solve(H, R)
        A_new = A - eta * step[0]
        lam0_new = lam0 - eta * step[1]
        done = jnp.sum(jnp.abs(R)) < tol
        return A_new, lam0_new, count + 1, done

    A, lam0, count, done = lax.while_loop(
        cond, body, (A0, lam00, jnp.zeros((), jnp.int32),
                     jnp.asarray(False)))
    out = {"logA": jnp.log(jnp.maximum(A, jnp.finfo(A.dtype).tiny)),
           "lambda0": lam0}
    f_mean = mean_f_given_lambda_moments(out, lambda_m, lambda_var)
    ell = poisson_ell(r, f_mean, lambda_m, out)
    return out, ell, f_mean
