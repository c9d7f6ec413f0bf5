"""Analytic vs autodiff gradient verification — the framework's port of the
reference's moments_gradients.ipynb harness.

The reference trusts only hand-derived hyperparameter gradients
(Spatial_GP_repo/utils.py:900-910, 992-1045, 1105-1121, 1261-1267,
1328-1335).  Here those same formulas (ops/analytic_grads.py) are the oracle
for jax.grad through the production M-step objective, plus finite-difference
checks as an independent referee."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import _mstep_objective
from gaussian_processes_tpu.models.moments import (
    lambda_moments, mean_f_given_lambda_moments, poisson_ell, ell_grad_f_params)
from gaussian_processes_tpu.ops.analytic_grads import (
    localker_with_grads, acosker_with_grads, lambda_moment_grads,
    ell_grads_theta, kl_grads_theta)
from gaussian_processes_tpu.ops.kernels import gram_matrices
from gaussian_processes_tpu.ops.stabilize import (
    compute_eigenspace, masked_inverse)
from gaussian_processes_tpu.params import THETA_KEYS, theta_bounds

N = 14
NT = 18
NTILDE = 10


def setup():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((NT, N * N)))
    xtilde = x[:NTILDE]
    r = jnp.asarray(rng.poisson(2.0, NT).astype(float))
    theta = {"sigma_0": jnp.float64(1.1), "eps_0x": jnp.float64(0.15),
             "eps_0y": jnp.float64(-0.1),
             "-2log2beta": jnp.float64(-2 * np.log(2 * 0.4)),
             "-log2rho2": jnp.float64(-np.log(2 * 0.18 ** 2)),
             "Amp": jnp.float64(0.9)}
    f_params = {"logA": jnp.float64(np.log(0.05)), "lambda0": jnp.float64(0.3)}
    return x, xtilde, r, theta, f_params


def analytic_mstep_grad(theta, x, xtilde, r, es, m_b, V_b, f_params):
    """Compose the reference's hand-derived gradient chain for the M-step
    objective -(ELL - KL) at fixed eigenspace."""
    C, mask, dC = localker_with_grads(theta, N)
    K_tilde, dK_tilde = acosker_with_grads(theta, xtilde, None, C, dC)
    K, dK = acosker_with_grads(theta, x, xtilde, C, dC)
    Kvec, dKvec = acosker_with_grads(theta, x, None, C, dC, diag=True)

    B = es.B
    K_tilde_b = B.T @ K_tilde @ B
    K_tilde_b = 0.5 * (K_tilde_b + K_tilde_b.T)
    K_b = K @ B
    K_tilde_inv_b = masked_inverse(K_tilde_b, es.keep)
    a = K_b @ K_tilde_inv_b
    dK_tilde_b = {k: B.T @ v @ B for k, v in dK_tilde.items()}
    dK_b = {k: v @ B for k, v in dK.items()}

    lam_m, lam_var = lambda_moments(a, K_b, Kvec, m_b, V_b)
    f_mean = mean_f_given_lambda_moments(f_params, lam_m, lam_var)
    dlm, dlv = lambda_moment_grads(a, K_b, m_b, V_b, dK_b, dK_tilde_b,
                                   dKvec, K_tilde_inv_b)
    dell = ell_grads_theta(r, f_mean, f_params["logA"], dlm, dlv)
    dkl = kl_grads_theta(m_b, V_b, K_tilde_inv_b, dK_tilde_b)
    return {k: -(dell[k] - dkl[k]) for k in dell}


@pytest.mark.slow
def test_mstep_autodiff_matches_analytic():
    x, xtilde, r, theta, f_params = setup()
    cfg = FitConfig(ntilde=NTILDE, n_px_side=N)
    K_tilde, K, Kvec = gram_matrices(theta, x, xtilde, N, shared=False)
    es = compute_eigenspace(K_tilde)
    rng = np.random.default_rng(3)
    # a generic (symmetric, kept-subspace) variational state
    keep = np.asarray(es.keep)
    W = rng.standard_normal((NTILDE, NTILDE)) * 0.05
    V_b = jnp.asarray((W @ W.T + np.eye(NTILDE))
                      * np.outer(keep, keep))
    m_b = jnp.asarray(rng.standard_normal(NTILDE) * keep)

    lower, upper = theta_bounds()
    obj = lambda th: _mstep_objective(th, x, xtilde, r, es, m_b, V_b,
                                      f_params, False, cfg, lower, upper)
    g_auto = jax.grad(obj)(theta)
    g_analytic = analytic_mstep_grad(theta, x, xtilde, r, es, m_b, V_b,
                                     f_params)
    for k in THETA_KEYS:
        np.testing.assert_allclose(float(g_auto[k]), float(g_analytic[k]),
                                   rtol=2e-6, atol=1e-9, err_msg=k)


@pytest.mark.slow
def test_mstep_autodiff_matches_finite_differences():
    x, xtilde, r, theta, f_params = setup()
    cfg = FitConfig(ntilde=NTILDE, n_px_side=N)
    K_tilde, _, _ = gram_matrices(theta, x, xtilde, N, shared=False)
    es = compute_eigenspace(K_tilde)
    keep = np.asarray(es.keep)
    m_b = jnp.asarray(np.linspace(-0.5, 0.5, NTILDE) * keep)
    V_b = jnp.diag(es.k_tilde_b_diag) * 0.9

    lower, upper = theta_bounds()
    obj = lambda th: _mstep_objective(th, x, xtilde, r, es, m_b, V_b,
                                      f_params, False, cfg, lower, upper)
    g = jax.grad(obj)(theta)
    eps = 1e-6
    for k in THETA_KEYS:
        tp = dict(theta); tp[k] = theta[k] + eps
        tm = dict(theta); tm[k] = theta[k] - eps
        fd = (float(obj(tp)) - float(obj(tm))) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), fd, rtol=5e-5, atol=1e-6,
                                   err_msg=k)


def test_fparam_grads_analytic_vs_autodiff():
    x, xtilde, r, theta, f_params = setup()
    K_tilde, K, Kvec = gram_matrices(theta, x, xtilde, N, shared=False)
    es = compute_eigenspace(K_tilde)
    K_b = K @ es.B
    a = K_b * es.k_tilde_inv_diag[None, :]
    m_b = jnp.zeros(NTILDE)
    V_b = jnp.diag(es.k_tilde_b_diag)
    lam_m, lam_var = lambda_moments(a, K_b, Kvec, m_b, V_b)

    def nll(fp):
        f_mean = mean_f_given_lambda_moments(fp, lam_m, lam_var)
        return -poisson_ell(r, f_mean, lam_m, fp)

    g_auto = jax.grad(nll)(f_params)
    f_mean = mean_f_given_lambda_moments(f_params, lam_m, lam_var)
    g_analytic = ell_grad_f_params(r, f_mean, lam_m, lam_var, f_params)
    np.testing.assert_allclose(float(g_auto["logA"]),
                               -float(g_analytic["logA"]), rtol=1e-10)
    np.testing.assert_allclose(float(g_auto["lambda0"]),
                               -float(g_analytic["lambda0"]), rtol=1e-10)


def test_legacy_newton_update_reaches_stationarity():
    """The legacy joint (A, lambda0) Newton update (reference updateA,
    utils.py:1339-1400) drives the ELL gradient toward zero."""
    from gaussian_processes_tpu.models.estep import update_f_params_newton
    rng = np.random.default_rng(0)
    lam_m = jnp.asarray(rng.standard_normal(60) * 0.8)
    lam_v = jnp.asarray(rng.uniform(0.05, 0.2, 60))
    # responses actually driven by lambda so the optimal gain is interior
    r = jnp.asarray(rng.poisson(np.exp(0.9 * np.asarray(lam_m) + 0.4))
                    .astype(float))
    fp0 = {"logA": jnp.float64(np.log(0.5)), "lambda0": jnp.float64(0.2)}
    out, ell, fm = update_f_params_newton(fp0, r, lam_m, lam_v, nit=2000,
                                          eta=0.25)
    g = ell_grad_f_params(r, fm, lam_m, lam_v, out)
    assert abs(float(g["logA"])) < 1e-3
    assert abs(float(g["lambda0"])) < 1e-3
    # and it improved the likelihood over the start
    fm0 = mean_f_given_lambda_moments(fp0, lam_m, lam_v)
    ell0 = poisson_ell(r, fm0, lam_m, fp0)
    assert float(ell) > float(ell0)
