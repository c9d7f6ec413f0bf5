"""Posterior parity at production shape: f32 pipeline vs the f64 reference
posture (BASELINE.json acceptance: "match reference posterior mean/variance
to 1e-5 rel tol").

The reference runs float64 end-to-end (Spatial_GP_repo/utils.py:31-33).  The
TPU framework runs f32 with HIGHEST-precision matmuls (6-pass bf16, f32-
accurate).  This script measures the thing the acceptance criterion names:
the relative error of the posterior mean/variance at held-out points between
the f32 pipeline and the f64 pipeline, at the production shape
(nt=3160, nx=108^2=11664, ntilde>=1000) and full contraction length.

Pipeline measured (identical code path in both precisions):
  gram_matrices -> eigenspace stabilization -> N Newton E-steps with
  closed-form lambda0 -> test-point posterior moments (mu*, sigma*^2).
The eigenvalue keep COUNT is matched across precisions (the f64 count is
used for both) so the number reports floating-point error, not a truncation-
boundary flip of one borderline eigendirection — posterior moments are
invariant to the basis of the kept subspace, so matching the count isolates
arithmetic error exactly.

Runs on CPU (true f32 arithmetic; the TPU HIGHEST path is f32-accurate by
construction).  Prints one JSON line with the max relative errors.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

NT = 3160
N_PX = 108
NTILDE = 1050
N_STAR = 64
N_NEWTON = 8


def posterior_pipeline(X, R, Xtilde, Xstar, theta, f_params, dtype,
                       n_keep=None):
    """kernels -> stabilized eigenspace -> Newton E-steps -> test posterior.

    Returns (mu_star, var_star, n_keep_used)."""
    from gaussian_processes_tpu.models.estep import estep_update
    from gaussian_processes_tpu.models.moments import (
        lambda0_given_logA, lambda_moments, lambda_moments_star,
        mean_f_given_lambda_moments)
    from gaussian_processes_tpu.ops.kernels import gram_matrices
    from gaussian_processes_tpu.ops.stabilize import Eigenspace
    from gaussian_processes_tpu.config import EIGVAL_TOL

    X = jnp.asarray(X, dtype)
    R = jnp.asarray(R, dtype)
    Xtilde = jnp.asarray(Xtilde, dtype)
    Xstar = jnp.asarray(Xstar, dtype)
    theta = {k: jnp.asarray(v, dtype) for k, v in theta.items()}
    f_params = {k: jnp.asarray(v, dtype) for k, v in f_params.items()}

    K_tilde, K, Kvec = gram_matrices(theta, X, Xtilde, N_PX, shared=False)
    eigvals, eigvecs = jnp.linalg.eigh(K_tilde)
    if n_keep is None:
        thresh = jnp.maximum(eigvals[-1] * EIGVAL_TOL, EIGVAL_TOL)
        n_keep = int(jnp.sum(eigvals > thresh))
    keep = jnp.arange(eigvals.shape[0]) >= eigvals.shape[0] - n_keep
    keepf = keep.astype(dtype)
    safe = jnp.where(keep, eigvals, jnp.ones_like(eigvals))
    es = Eigenspace(B=eigvecs * keepf[None, :], eigvals=eigvals, keep=keep,
                    k_tilde_b_diag=eigvals * keepf,
                    k_tilde_inv_diag=keepf / safe)
    K_b = K @ es.B
    a = K_b * es.k_tilde_inv_diag[None, :]

    m_b = jnp.zeros(NTILDE, dtype)
    V_b = jnp.diag(es.k_tilde_b_diag)
    lam_m, lam_var = lambda_moments(a, K_b, Kvec, m_b, V_b)
    for _ in range(N_NEWTON):
        lam0 = lambda0_given_logA(f_params["logA"], R, lam_m, lam_var)
        f_params = {"logA": f_params["logA"], "lambda0": lam0}
        f_mean = mean_f_given_lambda_moments(f_params, lam_m, lam_var)
        m_b, V_b = estep_update(R, a, m_b, f_mean, es.k_tilde_b_diag,
                                f_params)
        lam_m, lam_var = lambda_moments(a, K_b, Kvec, m_b, V_b)

    _, K_star, Kvec_star = gram_matrices(theta, Xstar, Xtilde, N_PX,
                                         shared=False)
    K_star_b = K_star @ es.B
    a_star = K_star_b * es.k_tilde_inv_diag[None, :]
    mu, var = lambda_moments_star(a_star, K_star_b, Kvec_star, m_b, V_b,
                                  es.k_tilde_b_diag)
    return np.asarray(mu), np.asarray(var), n_keep


def main():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((NT, N_PX * N_PX))
    Xstar = rng.standard_normal((N_STAR, N_PX * N_PX))
    lin = np.linspace(-1, 1, N_PX)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.1 ** 2)).ravel()
    w /= np.linalg.norm(w)
    R = rng.poisson(np.exp(0.8 * X @ w)).astype(np.float64)
    Xtilde = X[rng.permutation(NT)[:NTILDE]]

    theta = {"sigma_0": 1.0, "eps_0x": 0.1, "eps_0y": -0.2,
             "-2log2beta": -2 * np.log(2 * 0.1),
             "-log2rho2": -np.log(2 * 0.1 ** 2), "Amp": 1.0}
    f_params = {"logA": np.log(0.01), "lambda0": 1.0}

    mu64, var64, n_keep = posterior_pipeline(
        X, R, Xtilde, Xstar, theta, f_params, jnp.float64)
    mu32, var32, _ = posterior_pipeline(
        X, R, Xtilde, Xstar, theta, f_params, jnp.float32, n_keep=n_keep)

    scale_mu = np.max(np.abs(mu64))
    rel_mu = float(np.max(np.abs(mu32 - mu64)) / scale_mu)
    scale_var = np.max(np.abs(var64))
    rel_var = float(np.max(np.abs(var32 - var64)) / scale_var)
    worst = max(rel_mu, rel_var)
    print(json.dumps({
        "metric": "posterior_parity_f32_vs_f64",
        "value": worst,
        "unit": "max_rel_err",
        "vs_baseline": 1e-5 / worst if worst > 0 else float("inf"),
        "detail": {"nt": NT, "nx": N_PX * N_PX, "ntilde": NTILDE,
                   "n_keep": n_keep, "rel_mu": rel_mu, "rel_var": rel_var,
                   "target": 1e-5, "pass": bool(worst <= 1e-5)},
    }))


if __name__ == "__main__":
    main()
