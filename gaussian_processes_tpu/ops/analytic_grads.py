"""Hand-derived analytic gradients, kept as golden cross-checks for jax.grad.

The reference computes ALL hyperparameter gradients analytically
(Spatial_GP_repo/utils.py:900-910 for dC, 992-1045 for dK, 1105-1121 for the
lambda-moment derivatives, 1261-1267 for the ELL, 1328-1335 for the KL) and
verifies them in moments_gradients.ipynb.  This framework uses jax.grad as
the primary gradient path; these dense re-derivations exist so the test suite
can replicate that notebook's verification — analytic vs. autodiff — at small
problem sizes.  They materialize C and are NOT meant for the hot path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..config import ALPHA_THRESHOLD, COSDELTA_JITTER
from .kernels import pixel_coords

Theta = Dict[str, jnp.ndarray]

GRAD_KEYS = ("sigma_0", "eps_0x", "eps_0y", "-2log2beta", "-log2rho2", "Amp")


def localker_with_grads(theta: Theta, n_px_side: int,
                        alpha_threshold: float = ALPHA_THRESHOLD):
    """Dense C with masked rows/cols zeroed + dC/dtheta for the five C-hypers
    (reference: utils.py:861-914).  Masked pixels carry exactly zero C and dC,
    matching the reference's crop semantics."""
    dtype = theta["Amp"].dtype
    xcord, ycord = pixel_coords(n_px_side, dtype)
    gb = jnp.exp(theta["-2log2beta"])
    logalpha = -gb * ((xcord - theta["eps_0x"]) ** 2 +
                      (ycord - theta["eps_0y"]) ** 2)
    alpha = jnp.exp(logalpha)
    mask = alpha >= alpha_threshold
    maskf = mask.astype(dtype)
    alpha = alpha * maskf

    gr = jnp.exp(theta["-log2rho2"])
    logCsmooth = -gr * ((xcord[:, None] - xcord[None, :]) ** 2 +
                        (ycord[:, None] - ycord[None, :]) ** 2)
    C_smooth = jnp.exp(logCsmooth)
    C = theta["Amp"] * alpha[:, None] * C_smooth * alpha[None, :]
    C = 0.5 * (C + C.T)

    mm = maskf[:, None] * maskf[None, :]
    dC = {
        "Amp": C / theta["Amp"],
        "eps_0x": 2.0 * gb * C * (xcord[:, None] + xcord[None, :]
                                  - 2.0 * theta["eps_0x"]),
        "eps_0y": 2.0 * gb * C * (ycord[:, None] + ycord[None, :]
                                  - 2.0 * theta["eps_0y"]),
        "-2log2beta": C * (logalpha[:, None] + logalpha[None, :]) * mm,
        "-log2rho2": C * logCsmooth * mm,
    }
    return C, mask, dC


def acosker_with_grads(theta: Theta, x1: jnp.ndarray,
                       x2: Optional[jnp.ndarray], C: jnp.ndarray,
                       dC: Dict[str, jnp.ndarray], diag: bool = False):
    """Dense arc-cosine kernel + dK/dtheta (reference: utils.py:939-1050).

    Returns (K, dK) with dK covering sigma_0 and the five C-hypers.
    """
    sigma_0 = theta["sigma_0"]
    s02 = sigma_0 * sigma_0

    if diag:
        K = jnp.sum(x1 * (x1 @ C.T), axis=1) + s02
        dK = {"sigma_0": 2.0 * s02 * jnp.ones(x1.shape[0], C.dtype) / sigma_0}
        for key, dCk in dC.items():
            dK[key] = jnp.sum(x1 * (x1 @ dCk.T), axis=1)
        return K, dK

    same = x2 is None
    x2c = x1 if same else x2
    Cx1 = x1 @ C.T
    Cx2 = Cx1 if same else x2c @ C.T
    X1 = jnp.sqrt(jnp.sum(x1 * Cx1, axis=1) + s02)
    X2 = jnp.sqrt(jnp.sum(x2c * Cx2, axis=1) + s02)
    X1X2 = jnp.outer(X1, X2)
    x1x2 = x1 @ Cx2.T + s02
    cosdelta = jnp.clip(x1x2 / (X1X2 + COSDELTA_JITTER), -1.0, 1.0)
    delta = jnp.arccos(cosdelta)
    J = (jnp.sqrt(jnp.maximum(1.0 - cosdelta ** 2, 0.0))
         + jnp.pi * cosdelta - delta * cosdelta) / jnp.pi
    K = X1X2 * J

    dK = {}
    dX1X2_s = s02 * (X2[None, :] / X1[:, None] + X1[:, None] / X2[None, :])
    dcos_s = (2.0 * s02 - cosdelta * dX1X2_s) / X1X2
    dJ_s = -(delta - jnp.pi) * dcos_s / jnp.pi
    dK["sigma_0"] = (X1X2 * dJ_s + dX1X2_s * J) / sigma_0

    for key, dCk in dC.items():
        dX1 = 0.5 * jnp.sum(x1 * (x1 @ dCk.T), axis=1) / X1
        dX2 = 0.5 * jnp.sum(x2c * (x2c @ dCk.T), axis=1) / X2
        dX1X2 = jnp.outer(dX1, X2) + jnp.outer(X1, dX2)
        dcos = (x1 @ (x2c @ dCk.T).T - cosdelta * dX1X2) / X1X2
        dJ = -(delta - jnp.pi) * dcos / jnp.pi
        dK[key] = X1X2 * dJ + dX1X2 * J

    if x1.shape[0] == x2c.shape[0] and same:
        K = 0.5 * (K + K.T)
    return K, dK


def lambda_moment_grads(a: jnp.ndarray, K_b: jnp.ndarray, m_b: jnp.ndarray,
                        V_b: jnp.ndarray, dK_b: Dict[str, jnp.ndarray],
                        dK_tilde_b: Dict[str, jnp.ndarray],
                        dKvec: Dict[str, jnp.ndarray],
                        K_tilde_inv_b: jnp.ndarray
                        ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """d(lambda_m)/dtheta and d(lambda_var)/dtheta via
    ``da = (dK - a dK_tilde) K_tilde^-1`` (reference: utils.py:1105-1121)."""
    dlm, dlv = {}, {}
    Va = V_b @ a.T
    for key in dK_b:
        da = (dK_b[key] - a @ dK_tilde_b[key]) @ K_tilde_inv_b
        dlm[key] = da @ m_b
        dlv[key] = (dKvec[key]
                    + jnp.einsum("ij,ji->i", 2.0 * da, Va)
                    - jnp.einsum("ij,ij->i", dK_b[key], a)
                    - jnp.einsum("ij,ij->i", K_b, da))
    return dlm, dlv


def ell_grads_theta(r: jnp.ndarray, f_mean: jnp.ndarray, logA: jnp.ndarray,
                    dlambda_m: Dict[str, jnp.ndarray],
                    dlambda_var: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """dELL/dtheta (reference: utils.py:1261-1267)."""
    A = jnp.exp(logA)
    out = {}
    for key in dlambda_m:
        out[key] = (A * r @ dlambda_m[key]
                    - A * f_mean @ dlambda_m[key]
                    - 0.5 * A * A * f_mean @ dlambda_var[key])
    return out


def kl_grads_theta(m_b: jnp.ndarray, V_b: jnp.ndarray,
                   K_tilde_inv_b: jnp.ndarray,
                   dK_tilde_b: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """dKL/dtheta via ``Bk = dK_tilde K_tilde^-1``:
    0.5 tr(Bk) - 0.5 tr(V K^-1 Bk) - 0.5 (K^-1 m)^T Bk m
    (reference: utils.py:1328-1335)."""
    c = V_b @ K_tilde_inv_b
    b = K_tilde_inv_b @ m_b
    out = {}
    for key in dK_tilde_b:
        Bk = dK_tilde_b[key] @ K_tilde_inv_b
        out[key] = (0.5 * jnp.trace(Bk) - 0.5 * jnp.trace(c @ Bk)
                    - 0.5 * b @ (Bk @ m_b))
    return out
