"""Direct numerical parity against the reference PyTorch implementation.

These tests import the upstream code (read-only mount at /root/reference) and
compare it against this framework on identical f64 inputs.

Tolerance note: the reference overrides ``torch.pi`` with a float32-rounded
value (utils.py:25, ``torch.acos(torch.zeros(1)).item() * 2`` evaluated before
the f64 default is set), so every arc-cosine J factor it produces carries an
~8.7e-8 relative bias.  This framework uses the exact pi; kernel-level parity
is therefore asserted at rtol=5e-7 rather than f64 roundoff.  They are the
framework's equivalent of the reference's own cross-implementation
verification notebooks (moments_gradients.ipynb, matlab_correspondence.ipynb)
and are skipped when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

REF_PATH = "/root/reference/Spatial_GP_repo"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH),
                                reason="reference checkout not available")

N = 16          # pixel grid side; nx = 256
NT = 14         # training points
NTILDE = 9      # inducing points


@pytest.fixture(scope="module")
def ref_utils():
    sys.path.insert(0, REF_PATH)
    import utils as ref  # noqa
    yield ref
    sys.path.remove(REF_PATH)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(42)
    x = rng.standard_normal((NT, N * N))
    xtilde = x[:NTILDE].copy()
    r = rng.poisson(2.0, NT).astype(np.float64)
    theta_np = {
        "sigma_0": 1.0, "eps_0x": 0.12, "eps_0y": -0.08,
        "-2log2beta": -2 * np.log(2 * 0.45), "-log2rho2": -np.log(2 * 0.2 ** 2),
        "Amp": 1.1,
    }
    return x, xtilde, r, theta_np


def torch_theta(theta_np):
    import torch
    return {k: torch.tensor(v, dtype=torch.float64) for k, v in theta_np.items()}


def jax_theta(theta_np):
    import jax.numpy as jnp
    return {k: jnp.float64(v) for k, v in theta_np.items()}


def test_localker_parity(ref_utils, problem):
    from gaussian_processes_tpu.ops.kernels import materialize_C
    _, _, _, theta_np = problem
    lower = {"sigma_0": 0., "eps_0x": -1., "eps_0y": -1.,
             "-2log2beta": -np.inf, "-log2rho2": -np.inf, "Amp": 0.}
    upper = {"sigma_0": np.inf, "eps_0x": 1., "eps_0y": 1.,
             "-2log2beta": np.inf, "-log2rho2": np.inf, "Amp": np.inf}
    C_ref, mask_ref = ref_utils.localker(torch_theta(theta_np), upper, lower, N,
                                         grad=False)
    C_ours, mask_ours = materialize_C(jax_theta(theta_np), N)
    mask_np = mask_ref.cpu().numpy()
    np.testing.assert_array_equal(np.asarray(mask_ours), mask_np)
    # reference C is on the cropped pixel set; ours is full-size with zeros
    C_ours_np = np.asarray(C_ours)
    np.testing.assert_allclose(C_ours_np[np.ix_(mask_np, mask_np)],
                               C_ref.cpu().numpy(), rtol=1e-12, atol=1e-15)
    off = C_ours_np.copy()
    off[np.ix_(mask_np, mask_np)] = 0.0
    assert np.all(off == 0.0)


def test_acosker_parity(ref_utils, problem):
    import torch
    from gaussian_processes_tpu.ops.kernels import acosker, gram_matrices
    x, xtilde, _, theta_np = problem
    tth = torch_theta(theta_np)
    lower = {"sigma_0": 0., "eps_0x": -1., "eps_0y": -1.,
             "-2log2beta": -np.inf, "-log2rho2": -np.inf, "Amp": 0.}
    upper = {"sigma_0": np.inf, "eps_0x": 1., "eps_0y": 1.,
             "-2log2beta": np.inf, "-log2rho2": np.inf, "Amp": np.inf}
    C_ref, mask = ref_utils.localker(tth, upper, lower, N, grad=False)
    xm = torch.tensor(x)[:, mask]
    xtm = torch.tensor(xtilde)[:, mask]
    K_tilde_ref = ref_utils.acosker(tth, xtm, xtm, C=C_ref, diag=False)
    K_ref = ref_utils.acosker(tth, xm, xtm, C=C_ref, diag=False)
    Kvec_ref = ref_utils.acosker(tth, xm, x2=None, C=C_ref, diag=True)

    import jax.numpy as jnp
    jth = jax_theta(theta_np)
    K_tilde, K, Kvec = gram_matrices(jth, jnp.asarray(x), jnp.asarray(xtilde),
                                     N, shared=False)
    np.testing.assert_allclose(np.asarray(K_tilde), K_tilde_ref.cpu().numpy(),
                               rtol=5e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(K), K_ref.cpu().numpy(),
                               rtol=5e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Kvec), Kvec_ref.cpu().numpy(),
                               rtol=5e-7, atol=1e-9)
    # single-call API too
    K2 = acosker(jth, jnp.asarray(x), jnp.asarray(xtilde), n_px_side=N)
    np.testing.assert_allclose(np.asarray(K2), K_ref.cpu().numpy(),
                               rtol=5e-7, atol=1e-9)


@pytest.mark.slow
def test_acosker_gradient_parity(ref_utils, problem):
    """Reference analytic dK/dtheta vs our analytic_grads module AND
    jax.grad of our kernel — three-way agreement."""
    import torch
    import jax
    import jax.numpy as jnp
    from gaussian_processes_tpu.ops.analytic_grads import (
        localker_with_grads, acosker_with_grads)
    from gaussian_processes_tpu.ops.kernels import acosker

    x, xtilde, _, theta_np = problem
    tth = torch_theta(theta_np)
    lower = {"sigma_0": 0., "eps_0x": -1., "eps_0y": -1.,
             "-2log2beta": -np.inf, "-log2rho2": -np.inf, "Amp": 0.}
    upper = {"sigma_0": np.inf, "eps_0x": 1., "eps_0y": 1.,
             "-2log2beta": np.inf, "-log2rho2": np.inf, "Amp": np.inf}
    C_ref, mask, dC_ref = ref_utils.localker(tth, upper, lower, N, grad=True)
    xm = torch.tensor(x)[:, mask]
    xtm = torch.tensor(xtilde)[:, mask]
    K_ref, dK_ref = ref_utils.acosker(tth, xm, xtm, C=C_ref, dC=dC_ref,
                                      diag=False)

    jth = jax_theta(theta_np)
    C, m2, dC = localker_with_grads(jth, N)
    K, dK = acosker_with_grads(jth, jnp.asarray(x), jnp.asarray(xtilde), C, dC)
    for key in dK_ref:
        np.testing.assert_allclose(np.asarray(dK[key]),
                                   dK_ref[key].cpu().numpy(),
                                   rtol=2e-5, atol=5e-7, err_msg=key)

    # jax.grad through the Kronecker path: d sum(K)/dtheta
    def ksum(th):
        return jnp.sum(acosker(th, jnp.asarray(x), jnp.asarray(xtilde),
                               n_px_side=N))
    g = jax.grad(ksum)(jth)
    for key in dK_ref:
        np.testing.assert_allclose(float(g[key]),
                                   float(dK_ref[key].sum()),
                                   rtol=2e-5, err_msg=key)


def test_moments_estep_kl_parity(ref_utils, problem):
    """Eigenspace projection, lambda moments, f link, ELL, KL, and one
    E-step — full-chain parity on identical state."""
    import torch
    import jax.numpy as jnp
    from gaussian_processes_tpu.ops.kernels import gram_matrices
    from gaussian_processes_tpu.ops.stabilize import (
        compute_eigenspace, project_gram)
    from gaussian_processes_tpu.models.moments import (
        lambda_moments, mean_f_given_lambda_moments, lambda0_given_logA,
        poisson_ell, kl_divergence)
    from gaussian_processes_tpu.models.estep import estep_update

    x, xtilde, r, theta_np = problem
    tth = torch_theta(theta_np)
    lower = {"sigma_0": 0., "eps_0x": -1., "eps_0y": -1.,
             "-2log2beta": -np.inf, "-log2rho2": -np.inf, "Amp": 0.}
    upper = {"sigma_0": np.inf, "eps_0x": 1., "eps_0y": 1.,
             "-2log2beta": np.inf, "-log2rho2": np.inf, "Amp": np.inf}
    C_ref, mask = ref_utils.localker(tth, upper, lower, N, grad=False)
    xm = torch.tensor(x)[:, mask]
    xtm = torch.tensor(xtilde)[:, mask]
    K_tilde_t = ref_utils.acosker(tth, xtm, xtm, C=C_ref, diag=False)
    K_t = ref_utils.acosker(tth, xm, xtm, C=C_ref, diag=False)
    Kvec_t = ref_utils.acosker(tth, xm, x2=None, C=C_ref, diag=True)

    # reference projection (utils.py:1682-1694)
    eigvals, eigvecs = torch.linalg.eigh(K_tilde_t)
    ikeep = eigvals > max(eigvals.max().item() * 1e-4, 1e-4)
    B_t = eigvecs[:, ikeep]
    K_tilde_b_t = torch.diag(eigvals[ikeep])
    K_tilde_inv_b_t = torch.diag_embed(1 / eigvals[ikeep])
    K_b_t = K_t @ B_t
    a_t = K_b_t @ K_tilde_inv_b_t
    m_t = torch.zeros(int(ikeep.sum()), dtype=torch.float64)
    V_t = K_tilde_b_t.clone()

    lam_m_t, lam_var_t = ref_utils.lambda_moments(
        xm, K_tilde_b_t, a_t, Kvec_t, K_b_t, C_ref, m_t, V_t, tth,
        kernfun=ref_utils.acosker)
    f_params_t = {"logA": torch.log(torch.tensor(0.01, dtype=torch.float64)),
                  "lambda0": torch.tensor(1.0, dtype=torch.float64)}
    f_mean_t = ref_utils.mean_f_given_lambda_moments(f_params_t, lam_m_t,
                                                     lam_var_t)
    ell_t, _, _ = ref_utils.compute_loglikelihood(
        torch.tensor(r), f_mean_t, lam_m_t, lam_var_t, f_params_t)
    kl_t = ref_utils.compute_KL_div(m_t, V_t, K_tilde_b_t, K_tilde_inv_b_t)
    lam0_t = ref_utils.lambda0_given_logA(f_params_t["logA"], torch.tensor(r),
                                          lam_m_t, lam_var_t)
    m_new_t, V_new_t = ref_utils.Estep(
        r=torch.tensor(r), KKtilde_inv=a_t, m=m_t, f_params=f_params_t,
        f_mean=f_mean_t, K_tilde=K_tilde_b_t, K_tilde_inv=K_tilde_inv_b_t)

    # ---- ours, full-size masked basis ----
    jth = jax_theta(theta_np)
    K_tilde, K, Kvec = gram_matrices(jth, jnp.asarray(x), jnp.asarray(xtilde),
                                     N, shared=False)
    es = compute_eigenspace(K_tilde)
    keep = np.asarray(es.keep)
    assert keep.sum() == int(ikeep.sum())
    a = project_gram(es, K, shared=False)
    m_b = jnp.zeros(NTILDE, dtype=jnp.float64)
    V_b = jnp.diag(es.k_tilde_b_diag)
    K_b = jnp.matmul(K, es.B)

    lam_m, lam_var = lambda_moments(a, K_b, Kvec, m_b, V_b)
    np.testing.assert_allclose(np.asarray(lam_m), lam_m_t.cpu().numpy(),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lam_var), lam_var_t.cpu().numpy(),
                               rtol=1e-5, atol=1e-9)

    f_params = {"logA": jnp.float64(np.log(0.01)), "lambda0": jnp.float64(1.0)}
    f_mean = mean_f_given_lambda_moments(f_params, lam_m, lam_var)
    np.testing.assert_allclose(np.asarray(f_mean), f_mean_t.cpu().numpy(),
                               rtol=1e-6)

    ell = poisson_ell(jnp.asarray(r), f_mean, lam_m, f_params)
    np.testing.assert_allclose(float(ell), float(ell_t), rtol=1e-6)

    kl = kl_divergence(m_b, V_b, es)
    np.testing.assert_allclose(float(kl), float(kl_t), rtol=1e-6, atol=1e-8)

    lam0 = lambda0_given_logA(f_params["logA"], jnp.asarray(r), lam_m, lam_var)
    np.testing.assert_allclose(float(lam0), float(lam0_t), rtol=1e-6)

    m_new, V_new = estep_update(jnp.asarray(r), a, m_b, f_mean,
                                es.k_tilde_b_diag, f_params)
    # Eigenvectors are defined only up to sign (torch and jax eigh may
    # disagree), so compare in the original, basis-independent coordinates:
    # m_orig = B m_b, V_orig = B V_b B^T.
    B_np = np.asarray(es.B)
    m_orig = B_np @ np.asarray(m_new)
    V_orig = B_np @ np.asarray(V_new) @ B_np.T
    B_ref = B_t.cpu().numpy()
    m_orig_ref = B_ref @ m_new_t.cpu().numpy()
    V_orig_ref = B_ref @ V_new_t.cpu().numpy() @ B_ref.T
    np.testing.assert_allclose(m_orig, m_orig_ref, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(V_orig, V_orig_ref, rtol=1e-5, atol=1e-8)
    # dropped dims exactly zero
    assert np.all(np.asarray(m_new)[~keep] == 0)


def test_estep_variant_parity(ref_utils, problem):
    """Damped (alpha != 1) and update_V_inv E-step variants vs the
    reference's own paths (utils.py:1423-1457) on identical state."""
    import torch
    import jax.numpy as jnp
    from gaussian_processes_tpu.ops.kernels import gram_matrices
    from gaussian_processes_tpu.ops.stabilize import (compute_eigenspace,
                                                      project_gram)
    from gaussian_processes_tpu.models.moments import (
        lambda_moments, mean_f_given_lambda_moments)
    from gaussian_processes_tpu.models.estep import (estep_update_damped,
                                                     estep_update_V_inv)

    x, xtilde, r, theta_np = problem
    tth = torch_theta(theta_np)
    lower = {"sigma_0": 0., "eps_0x": -1., "eps_0y": -1.,
             "-2log2beta": -np.inf, "-log2rho2": -np.inf, "Amp": 0.}
    upper = {"sigma_0": np.inf, "eps_0x": 1., "eps_0y": 1.,
             "-2log2beta": np.inf, "-log2rho2": np.inf, "Amp": np.inf}
    C_ref, mask = ref_utils.localker(tth, upper, lower, N, grad=False)
    xm = torch.tensor(x)[:, mask]
    xtm = torch.tensor(xtilde)[:, mask]
    K_tilde_t = ref_utils.acosker(tth, xtm, xtm, C=C_ref, diag=False)
    K_t = ref_utils.acosker(tth, xm, xtm, C=C_ref, diag=False)
    Kvec_t = ref_utils.acosker(tth, xm, x2=None, C=C_ref, diag=True)

    eigvals, eigvecs = torch.linalg.eigh(K_tilde_t)
    ikeep = eigvals > max(eigvals.max().item() * 1e-4, 1e-4)
    B_t = eigvecs[:, ikeep]
    K_tilde_b_t = torch.diag(eigvals[ikeep])
    K_tilde_inv_b_t = torch.diag_embed(1 / eigvals[ikeep])
    K_b_t = K_t @ B_t
    a_t = K_b_t @ K_tilde_inv_b_t
    m_t = torch.zeros(int(ikeep.sum()), dtype=torch.float64)
    V_t = K_tilde_b_t.clone()
    lam_m_t, lam_var_t = ref_utils.lambda_moments(
        xm, K_tilde_b_t, a_t, Kvec_t, K_b_t, C_ref, m_t, V_t, tth,
        kernfun=ref_utils.acosker)
    f_params_t = {"logA": torch.log(torch.tensor(0.01, dtype=torch.float64)),
                  "lambda0": torch.tensor(1.0, dtype=torch.float64)}
    f_mean_t = ref_utils.mean_f_given_lambda_moments(f_params_t, lam_m_t,
                                                     lam_var_t)

    # ours, sliced to the kept coordinates (the reference's dynamic shapes)
    jth = jax_theta(theta_np)
    K_tilde, K, Kvec = gram_matrices(jth, jnp.asarray(x),
                                     jnp.asarray(xtilde), N, shared=False)
    es = compute_eigenspace(K_tilde)
    keep = np.asarray(es.keep)
    a = np.asarray(project_gram(es, K, shared=False))[:, keep]
    kdiag = np.asarray(es.k_tilde_b_diag)[keep]
    kinv = np.asarray(es.k_tilde_inv_diag)[keep]
    m_b = jnp.zeros(int(keep.sum()), jnp.float64)
    V_b = jnp.diag(jnp.asarray(kdiag))
    K_b = np.asarray(jnp.matmul(K, es.B))[:, keep]
    lam_m, lam_var = lambda_moments(jnp.asarray(a), jnp.asarray(K_b),
                                    Kvec, m_b, V_b)
    f_params = {"logA": jnp.float64(np.log(0.01)),
                "lambda0": jnp.float64(1.0)}
    f_mean = mean_f_given_lambda_moments(f_params, lam_m, lam_var)

    B_np = np.asarray(es.B)[:, keep]
    B_ref = B_t.cpu().numpy()

    # ---- damped alpha=0.5 path ----
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        m_d_t, V_d_t = ref_utils.Estep(
            r=torch.tensor(r), KKtilde_inv=a_t, m=m_t, f_params=f_params_t,
            f_mean=f_mean_t, K_tilde=K_tilde_b_t, V=V_t, alpha=0.5)
    m_d, V_d = estep_update_damped(jnp.asarray(r), jnp.asarray(a), m_b, V_b,
                                   f_mean, jnp.asarray(kdiag), f_params,
                                   alpha=0.5)
    np.testing.assert_allclose(B_np @ np.asarray(m_d),
                               B_ref @ m_d_t.cpu().numpy(),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(B_np @ np.asarray(V_d) @ B_np.T,
                               B_ref @ V_d_t.cpu().numpy() @ B_ref.T,
                               rtol=1e-5, atol=1e-8)

    # ---- update_V_inv path ----
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        m_i_t, V_i_t = ref_utils.Estep(
            r=torch.tensor(r), KKtilde_inv=a_t, m=m_t, f_params=f_params_t,
            f_mean=f_mean_t, K_tilde_inv=K_tilde_inv_b_t, update_V_inv=True)
    m_i, V_i = estep_update_V_inv(jnp.asarray(r), jnp.asarray(a), m_b,
                                  f_mean, jnp.asarray(kinv), f_params)
    np.testing.assert_allclose(B_np @ np.asarray(m_i),
                               B_ref @ m_i_t.cpu().numpy(),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(B_np @ np.asarray(V_i) @ B_np.T,
                               B_ref @ V_i_t.cpu().numpy() @ B_ref.T,
                               rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_posterior_parity_f32_vs_f64():
    """BASELINE.json acceptance: posterior mean/variance of the f32 pipeline
    match the f64 (reference-posture) pipeline to 1e-5 rel tol at FULL
    contraction length (nx = 108^2 = 11664 — where f32 accumulation error
    lives).  The full production shape (nt=3160, ntilde=1050) is measured by
    benchmarks/parity_production.py (recorded in docs/numerics.md: 8.6e-6);
    this test runs the same pipeline at nt=1024, ntilde=512 to keep the
    suite fast while exercising the identical error mechanism."""
    import sys as _sys
    import jax.numpy as jnp
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                     "benchmarks"))
    import parity_production as pp

    nt, ntilde, nstar = 1024, 512, 32
    rng = np.random.default_rng(0)
    n_px = pp.N_PX
    X = rng.standard_normal((nt, n_px * n_px))
    Xstar = rng.standard_normal((nstar, n_px * n_px))
    lin = np.linspace(-1, 1, n_px)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.1 ** 2)).ravel()
    w /= np.linalg.norm(w)
    R = rng.poisson(np.exp(0.8 * X @ w)).astype(np.float64)
    Xtilde = X[rng.permutation(nt)[:ntilde]]
    theta = {"sigma_0": 1.0, "eps_0x": 0.1, "eps_0y": -0.2,
             "-2log2beta": -2 * np.log(2 * 0.1),
             "-log2rho2": -np.log(2 * 0.1 ** 2), "Amp": 1.0}
    f_params = {"logA": np.log(0.01), "lambda0": 1.0}

    old_nt, old_ntilde = pp.NT, pp.NTILDE
    pp.NT, pp.NTILDE = nt, ntilde
    try:
        mu64, var64, n_keep = pp.posterior_pipeline(
            X, R, Xtilde, Xstar, theta, f_params, jnp.float64)
        mu32, var32, _ = pp.posterior_pipeline(
            X, R, Xtilde, Xstar, theta, f_params, jnp.float32,
            n_keep=n_keep)
    finally:
        pp.NT, pp.NTILDE = old_nt, old_ntilde

    rel_mu = np.max(np.abs(mu32 - mu64)) / np.max(np.abs(mu64))
    rel_var = np.max(np.abs(var32 - var64)) / np.max(np.abs(var64))
    assert rel_mu < 1e-5, f"posterior mean rel err {rel_mu:.2e} > 1e-5"
    assert rel_var < 1e-5, f"posterior var rel err {rel_var:.2e} > 1e-5"
