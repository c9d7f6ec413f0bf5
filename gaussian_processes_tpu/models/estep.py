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

from ..config import MATMUL_PRECISION


def estep_update(r: jnp.ndarray, a: jnp.ndarray, m_b: jnp.ndarray,
                 f_mean: jnp.ndarray, k_tilde_b_diag: jnp.ndarray,
                 f_params: Dict[str, jnp.ndarray],
                 weight: jnp.ndarray = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Newton update of (m_b, V_b).  ``a`` is KKtilde_inv_b.
    ``weight`` masks padded training points out of the Newton sums."""
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
    lhs = jnp.eye(ntilde, dtype=a.dtype) + k_tilde_b_diag[:, None] * G
    rhs = jnp.diag(k_tilde_b_diag)
    V_new = jnp.linalg.solve(lhs, rhs)
    m_new = jnp.matmul(V_new, jnp.matmul(G, m_b, precision=MATMUL_PRECISION) + g,
                       precision=MATMUL_PRECISION)
    V_new = 0.5 * (V_new + V_new.T)
    return m_new, V_new
