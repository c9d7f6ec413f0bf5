"""Closed-loop active-learning acquisition: mutual-information utility.

The reference scores every unseen stimulus by U = H(r|x,D) - <H(r|f,x)> —
the mutual information between the response and the firing rate (PNAS eqs
27-34) — using a Laplace approximation of p(r|x,D) whose mode needs a
Lambert-W evaluation per (candidate, count) pair, routed through SciPy on the
CPU (Spatial_GP_repo/utils.py:416-525).  Here the whole scorer — posterior
moments for all candidates, Lambert-W, the truncated count sum, the argmax —
is one jit-compiled batched program on device.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..config import MATMUL_PRECISION
from ..ops.kernels import gram_matrices, gram_matrices_windowed
from ..ops.lambertw import lambertw
from .moments import lambda_moments


def nd_lambda_r_mean(r: jnp.ndarray, sigma2: jnp.ndarray, mu: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mode of the Laplace-approximated log p(r|x,D) for each count r and
    candidate (PNAS eq 32; reference: utils.py:436-469).  Overflowing
    ``z = sigma2 exp(r sigma2 + mu)`` entries are masked out of the count sum
    exactly as the reference does."""
    rsigma2 = jnp.outer(r, sigma2)
    z = jnp.exp(rsigma2 + mu[None, :]) * sigma2[None, :]
    sum_mask = jnp.isfinite(z)
    z = jnp.where(sum_mask, z, 0.0)
    rsigma2 = jnp.where(sum_mask, rsigma2, 0.0)
    lam = rsigma2 + mu[None, :] - lambertw(z)
    return lam, sum_mask


def nd_p_r_given_xD(r: jnp.ndarray, sigma2: jnp.ndarray, mu: jnp.ndarray):
    """Laplace approximation of p(r|x,D) (PNAS eq 31; reference:
    utils.py:471-498)."""
    lam, sum_mask = nd_lambda_r_mean(r, sigma2, mu)
    ex_lam = jnp.exp(lam)
    log_r_fact = gammaln(r + 1.0)
    r2d = jnp.where(sum_mask, r[:, None], 0.0)
    log_r_fact2d = jnp.where(sum_mask, log_r_fact[:, None], 0.0)
    log_p = (lam * r2d - ex_lam
             - (lam - mu[None, :]) ** 2 / (2.0 * sigma2[None, :])
             - 0.5 * jnp.log(ex_lam * sigma2[None, :] + 1.0)
             - log_r_fact2d)
    return jnp.exp(log_p), log_p, r2d, log_r_fact2d


def nd_mean_noise_entropy(p_response, log_r_fact2d, sigma2, mu):
    """<H(r|f,x)> (PNAS eq 33; reference: utils.py:416-434)."""
    p_times_logr = jnp.sum(p_response * log_r_fact2d, axis=0)
    return (-jnp.exp(mu + 0.5 * sigma2) * (mu + sigma2 - 1.0)
            + p_times_logr)


def nd_utility(sigma2: jnp.ndarray, mu: jnp.ndarray,
               r_cutoff: int = 100) -> jnp.ndarray:
    """Batched utility U = H(r|x,D) - <H(r|f,x)> (PNAS eq 27; reference:
    utils.py:500-525).  sigma2/mu are the variance/mean of log f for each
    candidate; returns (nstar,) utilities."""
    sigma2 = jnp.atleast_1d(sigma2)
    mu = jnp.atleast_1d(mu)
    r = jnp.arange(r_cutoff, dtype=sigma2.dtype)
    p, log_p, r2d, log_r_fact2d = nd_p_r_given_xD(r, sigma2, mu)
    H_r_xD = -jnp.sum(p * log_p, axis=0)
    E_H_r_f = nd_mean_noise_entropy(p, log_r_fact2d, sigma2, mu)
    return H_r_xD - E_H_r_f


def utility(sigma2, mu, r_cutoff: int = 100) -> jnp.ndarray:
    """Scalar-candidate wrapper (reference legacy path, utils.py:527-629)."""
    return nd_utility(jnp.atleast_1d(sigma2), jnp.atleast_1d(mu), r_cutoff)[0]


@partial(jax.jit, static_argnames=("n_px_side", "alpha_threshold",
                                   "r_cutoff", "win_w"))
def score_candidates(xstar: jnp.ndarray, xtilde: jnp.ndarray,
                     theta: Dict[str, jnp.ndarray],
                     f_params: Dict[str, jnp.ndarray],
                     m_b: jnp.ndarray, V_b: jnp.ndarray, B: jnp.ndarray,
                     k_tilde_inv_diag: jnp.ndarray,
                     n_px_side: int = 108, alpha_threshold: float = 1e-3,
                     r_cutoff: int = 100,
                     win_i0=None, win_j0=None, win_w: int = None):
    """Utility of every candidate stimulus in one compiled program
    (the reference's acquisition region,
    one_cell_active_training.ipynb:cell17): posterior lambda-moments for all
    candidates, then log f moments ``mu = A lam_m + lambda0``,
    ``sigma2 = A^2 lam_var``, then the batched utility.

    Returns (utilities, best_index).
    """
    if win_w is not None:
        _, K_star, Kvec_star = gram_matrices_windowed(
            theta, xstar, xtilde, n_px_side, False, win_i0, win_j0, win_w,
            alpha_threshold)
    else:
        _, K_star, Kvec_star = gram_matrices(theta, xstar, xtilde, n_px_side,
                                             shared=False,
                                             alpha_threshold=alpha_threshold)
    K_star_b = jnp.matmul(K_star, B, precision=MATMUL_PRECISION)
    a_star = K_star_b * k_tilde_inv_diag[None, :]
    lam_m, lam_var = lambda_moments(a_star, K_star_b, Kvec_star, m_b, V_b)
    A = jnp.exp(f_params["logA"])
    logf_mean = A * lam_m + f_params["lambda0"]
    logf_var = A * A * lam_var
    u = nd_utility(logf_var, logf_mean, r_cutoff)
    return u, jnp.argmax(u)
