"""Test-point inference and reliability-corrected evaluation.

Replaces the reference's serial Python loop over test images
(Spatial_GP_repo/utils.py:326-412 calls ``lambda_moments_star`` once per
image) with a single batched, jit-compiled prediction over every test point,
and the 1000-iteration Python bootstrap of the explained-variance estimate
(utils.py:1502-1541) with one vmap.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION
from ..ops.kernels import gram_matrices
from ..ops.stabilize import compute_eigenspace
from .moments import lambda_moments_star


# ---------------------------------------------------------------------------
# Batched prediction
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_px_side", "alpha_threshold"))
def predict_rates(xstar: jnp.ndarray, xtilde: jnp.ndarray,
                  theta: Dict[str, jnp.ndarray],
                  f_params: Dict[str, jnp.ndarray],
                  m_b: jnp.ndarray, V_b: jnp.ndarray, B: jnp.ndarray,
                  k_tilde_b_diag: jnp.ndarray,
                  k_tilde_inv_diag: jnp.ndarray,
                  n_px_side: int = 108,
                  alpha_threshold: float = 1e-3
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Posterior predictive firing rate for a batch of stimuli.

    Returns (rates, mu_star, sigma_star2): ``rate = exp(A mu* + 0.5 A^2
    sigma*^2 + lambda0)`` (reference: utils.py:388-397).
    """
    _, K_star, Kvec_star = gram_matrices(theta, xstar, xtilde, n_px_side,
                                         shared=False,
                                         alpha_threshold=alpha_threshold)
    K_star_b = jnp.matmul(K_star, B, precision=MATMUL_PRECISION)
    a_star = K_star_b * k_tilde_inv_diag[None, :]
    mu, var = lambda_moments_star(a_star, K_star_b, Kvec_star, m_b, V_b,
                                  k_tilde_b_diag)
    A = jnp.exp(f_params["logA"])
    rates = jnp.exp(A * mu + 0.5 * A * A * var + f_params["lambda0"])
    return rates, mu, var


def predict(result, xstar: jnp.ndarray):
    """Convenience wrapper over a FitResult."""
    return predict_rates(
        jnp.asarray(xstar), result.xtilde, result.theta, result.f_params,
        result.m_b, result.V_b, result.B, result.k_tilde_b_diag,
        result.k_tilde_inv_diag, n_px_side=result.config.n_px_side,
        alpha_threshold=result.config.alpha_threshold)


def state_at_iteration(result, iteration: int):
    """Reconstruct the model state at a tracked iteration (the reference's
    ``test(..., at_iteration=k)`` path, utils.py:358-386).

    Two routes:

    * Basis tracked (``cfg.track_basis``): pair the stored per-iteration
      basis B with the tracked (m_b, V_b) — exact in every mode, including
      warm-started subspace-eigensolver runs whose Rayleigh-Ritz bases are
      not reproducible from theta alone.  ``k_tilde_b_diag`` is rebuilt as
      ``diag(B^T K_tilde B)`` (exactly the Ritz values the fit used).
    * Basis not tracked: rebuild with a fresh full eigh of K_tilde(theta_i),
      which reproduces the tracked basis only when the fit's per-iteration
      eigenspaces came from deterministic full eigh decompositions.  When
      the fit used the warm subspace eigensolver (``result.used_warm_basis``)
      this pairing would be silently approximate — raise instead.
    """
    from ..ops.stabilize import Eigenspace

    t = result.track
    theta = {k: v[iteration] for k, v in t.theta.items()}
    f_params = {"logA": t.logA[iteration], "lambda0": t.lambda0[iteration]}
    if t.m_b.shape[1] == 0:
        raise ValueError("track_variational was off; per-iteration state "
                         "was not recorded")
    m_b = t.m_b[iteration]
    V_b = t.V_b[iteration]
    K_tilde, _, _ = gram_matrices(theta, result.xtilde, result.xtilde,
                                  result.config.n_px_side, shared=True,
                                  alpha_threshold=result.config.alpha_threshold)
    if t.B.shape[2] > 0:
        B = t.B[iteration]
        keep = jnp.sum(B * B, axis=0) > 0.5        # zero cols = dropped/pad
        keepf = keep.astype(B.dtype)
        kb = jnp.sum(B * jnp.matmul(K_tilde, B,
                                    precision=MATMUL_PRECISION), axis=0)
        kb = kb * keepf
        safe = jnp.where(keep, kb, jnp.ones_like(kb))
        es = Eigenspace(B=B, eigvals=kb, keep=keep, k_tilde_b_diag=kb,
                        k_tilde_inv_diag=keepf / safe)
        return theta, f_params, m_b, V_b, es
    if getattr(result, "used_warm_basis", False):
        raise ValueError(
            "this fit used the warm-started subspace eigensolver: its "
            "per-iteration bases are Rayleigh-Ritz bases that a fresh eigh "
            "of K_tilde(theta_i) does NOT reproduce, so reconstructing "
            f"iteration {iteration} from theta alone would be silently "
            "approximate.  Refit with FitConfig(track_basis=True) (stores "
            "the basis per iteration), or evaluate the final state "
            "(at_iteration=None), or use eigensolver='eigh'.")
    es = compute_eigenspace(K_tilde, result.config.eigval_tol)
    return theta, f_params, m_b, V_b, es


# ---------------------------------------------------------------------------
# Reliability-corrected explained variance with bootstrap
# ---------------------------------------------------------------------------

def _corrcoef(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    uc = u - jnp.mean(u)
    vc = v - jnp.mean(v)
    return jnp.sum(uc * vc) / jnp.sqrt(jnp.sum(uc * uc) * jnp.sum(vc * vc))


@partial(jax.jit, static_argnames=("nbootstrap",))
def _explained_variance_jit(rtst: jnp.ndarray, f_pred: jnp.ndarray,
                            key: jnp.ndarray, nbootstrap: int):
    nrep = rtst.shape[0]

    # point estimate: even/odd repeats (reference: utils.py:1509-1517)
    reven = jnp.mean(rtst[0::2, :], axis=0)
    rodd = jnp.mean(rtst[1::2, :], axis=0)
    reliability = jnp.abs(_corrcoef(reven, rodd))
    r2_point = 0.5 * (_corrcoef(f_pred, rodd)
                      + _corrcoef(f_pred, reven)) / reliability

    # bootstrap over repeat permutations (reference: utils.py:1519-1539)
    def one(key):
        perm = jax.random.permutation(key, nrep)
        ieven = perm[0::2]
        iodd = perm[1::2]
        reven = jnp.mean(rtst[ieven, :], axis=0)
        rodd = jnp.mean(rtst[iodd, :], axis=0)
        rel = jnp.abs(_corrcoef(reven, rodd))
        return 0.5 * (_corrcoef(f_pred, rodd)
                      + _corrcoef(f_pred, reven)) / rel

    keys = jax.random.split(key, nbootstrap)
    r2s = jax.vmap(one)(keys)
    return r2_point, jnp.mean(r2s), jnp.std(r2s)


def explained_variance(rtst: jnp.ndarray, f_pred: jnp.ndarray,
                       sigma: bool = True, nbootstrap: int = 1000,
                       seed: int = 0):
    """Noise-corrected r^2 (reference: utils.py:1502-1541).

    rtst: (nrep, nimages) repeated responses; f_pred: (nimages,) predictions.
    With ``sigma=True`` returns the bootstrap (mean r2, std r2); otherwise
    the even/odd point estimate and None.
    """
    rtst = jnp.asarray(rtst)
    f_pred = jnp.asarray(f_pred)
    key = jax.random.PRNGKey(seed)
    r2_point, r2_mean, r2_std = _explained_variance_jit(rtst, f_pred, key,
                                                        nbootstrap)
    if sigma:
        return r2_mean, r2_std
    return r2_point, None


def evaluate(result, X_test: jnp.ndarray, R_test: jnp.ndarray,
             cellid: Optional[int] = None, at_iteration: Optional[int] = None,
             nbootstrap: int = 1000, seed: int = 0):
    """The reference's ``test()``: predict every test image and score against
    repeated responses (utils.py:326-412).

    X_test: (nimg, npx, npx[, 1]) or (nimg, nx); R_test: (nrep, nimg,
    ncells) or (nrep, nimg).  Returns (R_test_cell, R_pred, r2, sigma_r2).
    """
    X_test = jnp.asarray(X_test)
    if X_test.ndim > 2:
        X_test = X_test.reshape(X_test.shape[0], -1)
    R_test = jnp.asarray(R_test)
    if R_test.ndim == 3:
        cid = result.config.cellid if cellid is None else cellid
        R_test = R_test[:, :, cid]

    if at_iteration is not None:
        theta, f_params, m_b, V_b, es = state_at_iteration(result,
                                                           at_iteration)
        rates, _, _ = predict_rates(
            X_test, result.xtilde, theta, f_params, m_b, V_b, es.B,
            es.k_tilde_b_diag, es.k_tilde_inv_diag,
            n_px_side=result.config.n_px_side,
            alpha_threshold=result.config.alpha_threshold)
    else:
        rates, _, _ = predict(result, X_test)

    r2, sigma_r2 = explained_variance(R_test, rates, sigma=True,
                                      nbootstrap=nbootstrap, seed=seed)
    return R_test, rates, r2, sigma_r2
