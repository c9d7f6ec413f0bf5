"""Batched prediction and reliability-corrected evaluation."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import fit
from gaussian_processes_tpu.models.inference import (
    predict, explained_variance, evaluate, state_at_iteration)

REF_PATH = "/root/reference/Spatial_GP_repo"
N = 16


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(5)
    nt = 40
    x = rng.standard_normal((nt, N * N))
    lin = np.linspace(-1, 1, N)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.3 ** 2)).ravel()
    w = w / np.linalg.norm(w)
    lam = np.exp(0.7 * x @ w)
    r = rng.poisson(lam).astype(float)
    cfg = FitConfig(ntilde=nt, maxiter=4, n_estep=4, n_mstep=3,
                    n_fparamstep=5, n_px_side=N)
    theta = {"sigma_0": 1.0, "eps_0x": 0.0, "eps_0y": 0.0,
             "-2log2beta": -2 * np.log(2 * 0.3),
             "-log2rho2": -np.log(2 * 0.15 ** 2), "Amp": 1.0}
    res = fit(jnp.asarray(x), jnp.asarray(r), cfg, xtilde=jnp.asarray(x),
              theta={k: jnp.float64(v) for k, v in theta.items()},
              f_params={"logA": jnp.float64(np.log(0.01)),
                        "lambda0": jnp.float64(1.0)})
    # held-out repeated test set from the same ground truth
    nimg, nrep = 12, 20
    xt = rng.standard_normal((nimg, N * N))
    lam_t = np.exp(0.7 * xt @ w)
    R_test = rng.poisson(lam_t[None, :].repeat(nrep, 0)).astype(float)
    return res, xt, R_test, lam_t, w


def test_predict_batched_finite(fitted):
    res, xt, R_test, lam_t, w = fitted
    rates, mu, var = predict(res, jnp.asarray(xt))
    assert rates.shape == (xt.shape[0],)
    assert np.all(np.isfinite(np.asarray(rates)))
    assert np.all(np.asarray(var) > 0)
    assert np.all(np.asarray(rates) > 0)


def test_predictions_correlate_with_truth(fitted):
    res, xt, R_test, lam_t, _ = fitted
    rates, _, _ = predict(res, jnp.asarray(xt))
    c = np.corrcoef(np.asarray(rates), lam_t)[0, 1]
    assert c > 0.5


def test_explained_variance_perfect_prediction():
    """A prediction equal to the underlying rate must score r2 ~ 1."""
    rng = np.random.default_rng(0)
    nimg, nrep = 30, 30
    lam = np.exp(rng.standard_normal(nimg))
    rtst = rng.poisson(lam[None, :].repeat(nrep, 0)).astype(float)
    r2, s = explained_variance(jnp.asarray(rtst), jnp.asarray(lam),
                               nbootstrap=200)
    assert 0.8 < float(r2) < 1.3
    assert float(s) < 0.3


def test_explained_variance_random_prediction():
    rng = np.random.default_rng(0)
    nimg, nrep = 30, 30
    lam = np.exp(rng.standard_normal(nimg))
    rtst = rng.poisson(lam[None, :].repeat(nrep, 0)).astype(float)
    junk = rng.standard_normal(nimg)
    r2, s = explained_variance(jnp.asarray(rtst), jnp.asarray(junk),
                               nbootstrap=200)
    assert abs(float(r2)) < 0.5


@pytest.mark.skipif(not os.path.isdir(REF_PATH),
                    reason="reference checkout not available")
def test_explained_variance_point_estimate_parity(fitted):
    """Even/odd point estimate must match the reference exactly (the
    bootstrap differs only through RNG)."""
    import torch
    sys.path.insert(0, REF_PATH)
    try:
        import utils as ref
    finally:
        sys.path.remove(REF_PATH)
    res, xt, R_test, lam_t, _ = fitted
    rates, _, _ = predict(res, jnp.asarray(xt))
    r2_ref, _ = ref.explained_variance(torch.tensor(np.asarray(R_test)),
                                       torch.tensor(np.asarray(rates)),
                                       sigma=False)
    r2_ours, _ = explained_variance(R_test, rates, sigma=False)
    np.testing.assert_allclose(float(r2_ours), float(r2_ref), rtol=1e-10)


def test_evaluate_full(fitted):
    res, xt, R_test, lam_t, _ = fitted
    R_cell, rates, r2, s = evaluate(res, xt, R_test, nbootstrap=100)
    assert R_cell.shape == R_test.shape
    assert np.isfinite(float(r2))
    assert float(r2) > 0.2


@pytest.mark.slow
def test_evaluate_at_iteration(fitted):
    res, xt, R_test, lam_t, _ = fitted
    _, rates0, r2_0, _ = evaluate(res, xt, R_test, at_iteration=0,
                                  nbootstrap=50)
    _, rates_last, r2_last, _ = evaluate(res, xt, R_test,
                                         at_iteration=res.config.maxiter - 1,
                                         nbootstrap=50)
    assert not np.allclose(np.asarray(rates0), np.asarray(rates_last))
    # the final iteration state must equal the result state
    rates_res, _, _ = predict(res, jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(rates_last), np.asarray(rates_res),
                               rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_PATH),
                    reason="reference checkout not available")
def test_prediction_parity_with_reference(fitted):
    """lambda_moments_star parity: our batched prediction vs the reference's
    per-image loop on the same fitted state."""
    import torch
    sys.path.insert(0, REF_PATH)
    try:
        import utils as ref
    finally:
        sys.path.remove(REF_PATH)
    res, xt, R_test, lam_t, _ = fitted

    keep = np.asarray(res.keep)
    mask = np.asarray(res.mask)
    theta_t = {k: torch.tensor(float(v), dtype=torch.float64)
               for k, v in res.theta.items()}
    # reference works on the kept-subspace (cropped) matrices
    B_t = torch.tensor(np.asarray(res.B)[:, keep])
    K_tilde_b_t = torch.diag(torch.tensor(
        np.asarray(res.k_tilde_b_diag)[keep]))
    K_tilde_inv_b_t = torch.diag(torch.tensor(
        np.asarray(res.k_tilde_inv_diag)[keep]))
    m_t = torch.tensor(np.asarray(res.m_b)[keep])
    V_t = torch.tensor(np.asarray(res.V_b)[np.ix_(keep, keep)])
    import gaussian_processes_tpu.ops.kernels as kk
    from gaussian_processes_tpu.ops.kernels import materialize_C
    C_full, _ = materialize_C(res.theta, N)
    C_t = torch.tensor(np.asarray(C_full)[np.ix_(mask, mask)])

    xtilde_t = torch.tensor(np.asarray(res.xtilde))[:, mask]
    mus, vars_ = [], []
    for i in range(xt.shape[0]):
        xstar = torch.tensor(xt[i][None, :])[:, mask]
        mu, s2 = ref.lambda_moments_star(
            xstar, xtilde_t, C_t, theta_t, K_tilde_b_t, K_tilde_inv_b_t,
            m_t, V_t, B_t, "acosker")
        mus.append(float(mu)); vars_.append(float(s2))

    rates, mu_ours, var_ours = predict(res, jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(mu_ours), np.array(mus),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_ours), np.array(vars_),
                               rtol=1e-5, atol=1e-8)


# ---------------------------------------------------------------------------
# state_at_iteration under warm-basis (reduced-rank subspace) runs
# ---------------------------------------------------------------------------

def _warm_basis_fit(track_basis: bool, maxiter: int):
    """A per-iteration reduced-rank fit whose rank budget forces the
    warm-started subspace eigensolver (the headline bench configuration,
    shrunk to CPU scale)."""
    import dataclasses
    rng = np.random.default_rng(11)
    nt = 160
    x = rng.standard_normal((nt, N * N))
    lin = np.linspace(-1, 1, N)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.25 ** 2)).ravel()
    w = w / np.linalg.norm(w)
    r = rng.poisson(np.exp(0.7 * x @ w)).astype(float)
    cfg = FitConfig(ntilde=nt, maxiter=maxiter, n_estep=3, n_mstep=3,
                    n_fparamstep=4, n_px_side=N, jit_whole_fit=False,
                    reduced_rank=True, eigensolver="subspace",
                    rank_bucket=8, rank_pad=2, rank_slack=1.2,
                    track_basis=track_basis)
    theta = {"sigma_0": 1.0, "eps_0x": 0.0, "eps_0y": 0.0,
             "-2log2beta": -2 * np.log(2 * 0.12),
             "-log2rho2": -np.log(2 * 0.4 ** 2), "Amp": 1.0}
    res = fit(jnp.asarray(x), jnp.asarray(r), cfg, xtilde=jnp.asarray(x),
              theta={k: jnp.float64(v) for k, v in theta.items()},
              f_params={"logA": jnp.float64(np.log(0.01)),
                        "lambda0": jnp.float64(1.0)})
    xt = rng.standard_normal((10, N * N))
    return res, xt


@pytest.mark.slow
def test_state_at_iteration_warm_basis_exact():
    """With track_basis=True, state_at_iteration is exact in warm-basis
    runs: predictions from the reconstructed iteration-k state must match a
    fresh fit stopped at k (whose final state IS iteration k's tracked
    state: tracking happens before the M-step and the last iteration skips
    it)."""
    from gaussian_processes_tpu.models.inference import predict_rates

    k = 3
    res_long, xt = _warm_basis_fit(track_basis=True, maxiter=6)
    assert res_long.used_warm_basis, (
        "config did not trigger the warm subspace eigensolver; "
        "the test setup no longer exercises the intended mode")
    res_short, _ = _warm_basis_fit(track_basis=True, maxiter=k + 1)

    theta_k, fp_k, m_k, V_k, es = state_at_iteration(res_long, k)
    rates_k, _, _ = predict_rates(
        jnp.asarray(xt), res_long.xtilde, theta_k, fp_k, m_k, V_k, es.B,
        es.k_tilde_b_diag, es.k_tilde_inv_diag,
        n_px_side=res_long.config.n_px_side)
    rates_s, _, _ = predict(res_short, jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(rates_k), np.asarray(rates_s),
                               rtol=1e-6)


@pytest.mark.slow
def test_state_at_iteration_warm_basis_fence():
    """Without the tracked basis, reconstructing a warm-basis iteration
    from theta alone would be silently approximate: it must raise."""
    res, _ = _warm_basis_fit(track_basis=False, maxiter=4)
    assert res.used_warm_basis
    with pytest.raises(ValueError, match="subspace eigensolver"):
        state_at_iteration(res, 2)
