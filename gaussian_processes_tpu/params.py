"""Hyperparameter encodings, conversions, bounds, and initialization.

The kernel hyperparameters theta are a flat dict pytree with the same six keys
as the reference (Spatial_GP_repo/utils.py:824):

    sigma_0     : arc-cosine kernel offset (>= 0)
    eps_0x/y    : RF center in [-1, 1] stimulus coordinates
    -2log2beta  : log-encoding of the RF envelope scale beta
    -log2rho2   : log-encoding of the smoothness scale rho
    Amp         : amplitude of the localized prior (>= 0)

Encodings follow Spatial_GP_repo/hyperparameters_conversion.txt and
utils.py:713-734: ``beta = exp(-0.5 * '-2log2beta') / 2`` and
``rho = exp(-0.5 * '-log2rho2') / sqrt(2)``; the kernel consumes
``exp('-2log2beta') = 1/(4 beta^2)`` and ``exp('-log2rho2') = 1/(2 rho^2)``
directly as Gaussian precisions.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp

THETA_KEYS = ("sigma_0", "eps_0x", "eps_0y", "-2log2beta", "-log2rho2", "Amp")

Theta = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Log-expression conversions (reference: utils.py:713-734)
# ---------------------------------------------------------------------------

def logbetaexpr_to_beta(logbetaexpr):
    """Learning-space encoding -> paper beta (reference: utils.py:713-717)."""
    return jnp.exp(-0.5 * logbetaexpr) * 0.5


def beta_to_logbetaexpr(beta):
    return -2.0 * jnp.log(2.0 * beta)


def logrhoexpr_to_rho(logrhoexpr):
    """Learning-space encoding -> paper rho (reference: utils.py:719-724)."""
    return jnp.exp(-0.5 * logrhoexpr) / jnp.sqrt(2.0)


def rho_to_logrhoexpr(rho):
    return -jnp.log(2.0 * rho * rho)


def fromlogbetasam_to_logbetaexpr(logbetasam):
    """NumPy-ancestor encoding -> this encoding (reference: utils.py:726-729)."""
    return logbetasam - math.log(2.0)


def fromlogrhosam_to_logrhoexpr(logrhosam):
    """NumPy-ancestor encoding -> this encoding (reference: utils.py:731-734)."""
    return logrhosam - math.log(2.0)


# ---------------------------------------------------------------------------
# STA initialization (reference: utils.py:736-753)
# ---------------------------------------------------------------------------

def get_sta(x: jnp.ndarray, r: jnp.ndarray, n_px_side: int):
    """Spike-triggered average and its peak pixel.

    x: (nt, nx) stimuli, r: (nt,) spike counts.
    Returns (sta, sta_variance, (row_idx, col_idx)).
    """
    nt = r.shape[0]
    img_mean = x.T @ jnp.ones_like(r) / nt
    sta = x.T @ r / nt - img_mean
    sta_matrix = sta.reshape(n_px_side, n_px_side)
    max_idx = jnp.argmax(jnp.abs(sta_matrix))
    row_idx = max_idx // n_px_side
    col_idx = max_idx % n_px_side
    sta_variance = jnp.asarray(10.0)  # manually chosen RF width, as in reference
    return sta, sta_variance, (row_idx, col_idx)


# ---------------------------------------------------------------------------
# Theta init + bounds (reference: utils.py:755-857)
# ---------------------------------------------------------------------------

def theta_bounds() -> Tuple[Dict[str, float], Dict[str, float]]:
    """Box constraints on theta (reference: utils.py:854-855)."""
    inf = float("inf")
    lower = {"sigma_0": 0.0, "eps_0x": -1.0, "eps_0y": -1.0,
             "-2log2beta": -inf, "-log2rho2": -inf, "Amp": 0.0}
    upper = {"sigma_0": inf, "eps_0x": 1.0, "eps_0y": 1.0,
             "-2log2beta": inf, "-log2rho2": inf, "Amp": inf}
    return lower, upper


def generate_theta(x: jnp.ndarray, r: jnp.ndarray, n_px_side: int,
                   **overrides) -> Tuple[Theta, Dict[str, float], Dict[str, float]]:
    """Initial theta + bounds.

    Follows the reference defaults (utils.py:755-857): sigma_0 = Amp = 1,
    RF center at the origin, beta from a hand-picked 10 px^2 RF width,
    rho = beta / 2.  ``overrides`` replace individual entries, mirroring the
    notebook's ``generate_theta(..., **theta)`` overloading.
    """
    dtype = jnp.asarray(x).dtype if hasattr(x, "dtype") else jnp.float32

    rf_width_pxl2 = 10.0
    rf_width_pxl = math.sqrt(rf_width_pxl2)
    beta = (rf_width_pxl / n_px_side) * 2.0   # to [-1, 1] coordinates
    rho = beta / 2.0

    theta = {
        "sigma_0": jnp.asarray(1.0, dtype),
        "eps_0x": jnp.asarray(0.0, dtype),
        "eps_0y": jnp.asarray(0.0, dtype),
        "-2log2beta": jnp.asarray(-2.0 * math.log(2.0 * beta), dtype),
        "-log2rho2": jnp.asarray(-math.log(2.0 * rho * rho), dtype),
        "Amp": jnp.asarray(1.0, dtype),
    }
    for key, value in overrides.items():
        if key in theta:
            theta[key] = jnp.asarray(value, dtype)

    lower, upper = theta_bounds()
    return theta, lower, upper


def theta_from_samuele(logsigma_b, logrho_sam, eps_0x, eps_0y, logbeta_sam,
                       Amp=1.0, dtype=jnp.float32) -> Theta:
    """Import hyperparameters expressed in the NumPy-ancestor ("Samuele")
    encoding into this framework's theta (the workflow of the reference's
    import_initialized_theta.ipynb; conversions documented in
    Spatial_GP_repo/hyperparameters_conversion.txt:40-85):

        sigma_0    = exp(logsigma_b)
        -2log2beta = logbeta_sam - log 2
        -log2rho2  = logrho_sam - log 2
    """
    return {
        "sigma_0": jnp.asarray(math.exp(float(logsigma_b)), dtype),
        "eps_0x": jnp.asarray(float(eps_0x), dtype),
        "eps_0y": jnp.asarray(float(eps_0y), dtype),
        "-2log2beta": jnp.asarray(float(logbeta_sam) - math.log(2.0), dtype),
        "-log2rho2": jnp.asarray(float(logrho_sam) - math.log(2.0), dtype),
        "Amp": jnp.asarray(float(Amp), dtype),
    }


def generate_xtilde(ntilde: int, x: jnp.ndarray, seed: int = 0) -> jnp.ndarray:
    """Random inducing subset of x with a tiny jitter so duplicated stimuli
    cannot make K_tilde exactly singular (reference: utils.py:705-711)."""
    import jax
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    idx = jax.random.permutation(k1, x.shape[0])[:ntilde]
    xt = x[idx]
    eps = jnp.finfo(x.dtype).eps * 10
    return xt + eps * jax.random.normal(k2, xt.shape, x.dtype)


def default_f_params(dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Firing-rate parameters {logA, lambda0}
    (reference: one_cell_fit.ipynb:cell6 — A=0.01, lambda0=1)."""
    return {"logA": jnp.asarray(math.log(0.01), dtype),
            "lambda0": jnp.asarray(1.0, dtype)}


def theta_in_bounds(theta: Theta, lower=None, upper=None) -> jnp.ndarray:
    """Scalar bool: every entry inside its box (reference: utils.py:2022-2028)."""
    if lower is None or upper is None:
        lower, upper = theta_bounds()
    ok = jnp.asarray(True)
    for key in THETA_KEYS:
        v = theta[key]
        ok = ok & (v >= lower[key]) & (v <= upper[key])
    return ok


def clip_theta(theta: Theta, lower=None, upper=None) -> Theta:
    """Project theta onto its box (used to keep gradients finite while the
    line search rejects out-of-bounds trial points with an inf loss)."""
    if lower is None or upper is None:
        lower, upper = theta_bounds()
    out = {}
    for key in THETA_KEYS:
        v = theta[key]
        out[key] = jnp.clip(v, lower[key], upper[key])
    return out
