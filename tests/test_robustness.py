"""Regression tests for the reference's documented failure regimes.

The reference's bug ledger (Spatial_GP_repo/ToDo.md:14-29) records four
real-data failure modes its authors hit:

* unsorted / duplicated xtilde indices -> NaN in the f-param update
  ("I will just resort to sorting the indexes every time");
* very low ntilde -> vanishing hyperparameter gradients;
* reinitialized V/m -> NaN r2 on the test set;
* RF drifting out of the allowed limits -> M-step instability (their fix is
  the inf-loss-at-bounds trick, utils.py:2020-2028).

This framework must not inherit any of these: static keep-mask
stabilization is permutation-robust, duplicated inducing rows are handled
by the eigenvalue truncation (a duplicate only collapses one eigendirection),
bounds are enforced by the same inf-loss rule, and a genuinely diverged fit
must end in the rollback path (``failed=True`` + last good state), never an
exception or a silent NaN.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import fit
from gaussian_processes_tpu.models.inference import evaluate

N = 16


def _data(seed=3, nt=120, gain=0.7, center=(0.1, -0.2), width=0.3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((nt, N * N))
    lin = np.linspace(-1, 1, N)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - center[0]) ** 2 + (yy - center[1]) ** 2)
               / (2 * width ** 2)).ravel()
    w = w / np.linalg.norm(w)
    r = rng.poisson(np.exp(gain * x @ w)).astype(float)
    return x, r, w, rng


def _theta(beta=0.3, rho=0.15, eps=(0.0, 0.0)):
    return {"sigma_0": jnp.float64(1.0),
            "eps_0x": jnp.float64(eps[0]), "eps_0y": jnp.float64(eps[1]),
            "-2log2beta": jnp.float64(-2 * np.log(2 * beta)),
            "-log2rho2": jnp.float64(-np.log(2 * rho ** 2)),
            "Amp": jnp.float64(1.0)}


def _assert_clean(res):
    """A fit is 'clean' when it either completed with a finite trajectory or
    failed THROUGH the rollback path (failed=True, finite last-good state up
    to failed_at) — silent NaNs in the returned state are the bug."""
    loss = np.asarray(res.track.logmarginal)
    if res.failed:
        assert res.failed_at >= 0
        good = loss[:max(res.failed_at, 1)]
        assert np.all(np.isfinite(good)), (
            "rollback returned a non-finite 'last good' trajectory")
    else:
        assert np.all(np.isfinite(loss)), "clean fit tracked NaN loss"
    for k, v in res.theta.items():
        assert np.isfinite(float(v)), f"returned theta[{k}] is non-finite"
    assert np.all(np.isfinite(np.asarray(res.m_b)))
    assert np.all(np.isfinite(np.asarray(res.V_b)))


def _cfg(**kw):
    base = dict(maxiter=5, n_estep=4, n_mstep=3, n_fparamstep=4,
                n_px_side=N)
    base.update(kw)
    return FitConfig(**base)


@pytest.mark.slow
def test_unsorted_xtilde_indices_stable():
    """ToDo.md:14 — unsorted xtilde indices NaN'd the reference's f-param
    update at full ntilde.  Here the fit must be stable AND match the sorted
    run exactly up to inducing-point relabeling (the posterior is
    permutation-equivariant; our keep-mask stabilization has no
    order-dependent mask-shape effect, unlike the reference's dynamic
    crop)."""
    x, r, w, rng = _data()
    nt = x.shape[0]
    perm = rng.permutation(nt)[:64]                  # deliberately unsorted
    assert not np.all(np.diff(perm) > 0)
    res_unsorted = fit(jnp.asarray(x), jnp.asarray(r),
                       _cfg(ntilde=64), xtilde=jnp.asarray(x[perm]),
                       theta=_theta(),
                       f_params={"logA": jnp.float64(np.log(0.01)),
                                 "lambda0": jnp.float64(1.0)})
    _assert_clean(res_unsorted)
    assert not res_unsorted.failed

    res_sorted = fit(jnp.asarray(x), jnp.asarray(r),
                     _cfg(ntilde=64), xtilde=jnp.asarray(x[np.sort(perm)]),
                     theta=_theta(),
                     f_params={"logA": jnp.float64(np.log(0.01)),
                               "lambda0": jnp.float64(1.0)})
    # identical inducing SET -> identical loss trajectory (the reference saw
    # r2 shifts of ~0.01 from its order-dependent mask; we must not)
    np.testing.assert_allclose(np.asarray(res_unsorted.track.logmarginal),
                               np.asarray(res_sorted.track.logmarginal),
                               rtol=1e-8)


@pytest.mark.slow
def test_duplicated_xtilde_rows_stable():
    """Duplicated inducing rows make K_tilde exactly singular; the
    eigenvalue truncation must absorb the collapsed directions (the
    reference's generate_xtilde adds 1e-15 jitter to dodge this,
    utils.py:705-711)."""
    x, r, w, rng = _data()
    idx = np.concatenate([np.arange(48), np.arange(16)])   # 16 duplicates
    res = fit(jnp.asarray(x), jnp.asarray(r), _cfg(ntilde=64),
              xtilde=jnp.asarray(x[idx]), theta=_theta(),
              f_params={"logA": jnp.float64(np.log(0.01)),
                        "lambda0": jnp.float64(1.0)})
    _assert_clean(res)
    assert not res.failed
    # the duplicated directions must have been dropped, not inverted
    assert int(np.asarray(res.track.n_eigen)[-1]) <= 48


@pytest.mark.slow
def test_weak_rf_cell_no_nan_r2():
    """ToDo.md:20 — the reference hit NaN r2 on weakly-driven cells.  A cell
    whose spikes are pure noise (near-zero STA) must fit cleanly and produce
    a finite (near-zero) r2, never NaN."""
    rng = np.random.default_rng(7)
    nt = 120
    x = rng.standard_normal((nt, N * N))
    r = rng.poisson(1.0, nt).astype(float)          # stimulus-independent
    res = fit(jnp.asarray(x), jnp.asarray(r), _cfg(ntilde=nt),
              xtilde=jnp.asarray(x))                # theta from STA init
    _assert_clean(res)
    xt = rng.standard_normal((12, N * N))
    R_test = rng.poisson(1.0, (20, 12)).astype(float)
    _, rates, r2, s2 = evaluate(res, jnp.asarray(xt), jnp.asarray(R_test),
                                nbootstrap=100)
    assert np.all(np.isfinite(np.asarray(rates)))
    assert np.isfinite(float(r2)) and np.isfinite(float(s2))


@pytest.mark.slow
def test_rf_at_border_bounds_enforced():
    """ToDo.md:29 — an RF drifting to the image border destabilized the
    reference M-step until the inf-loss-at-bounds trick.  Starting eps at
    the corner of its [-1, 1] box, the fit must stay in bounds and finite
    (the planted RF is AT the border, pulling theta outward)."""
    x, r, w, rng = _data(center=(0.95, 0.95), width=0.25, gain=0.8)
    res = fit(jnp.asarray(x), jnp.asarray(r), _cfg(ntilde=x.shape[0]),
              xtilde=jnp.asarray(x), theta=_theta(eps=(0.93, 0.93)),
              f_params={"logA": jnp.float64(np.log(0.01)),
                        "lambda0": jnp.float64(1.0)})
    _assert_clean(res)
    assert not res.failed
    for k in ("eps_0x", "eps_0y"):
        v = float(res.theta[k])
        assert res.theta_lower[k] <= v <= res.theta_upper[k], (
            f"{k}={v} escaped its bounds")
    # every tracked iterate stayed in bounds too (the inf-loss rule rejects
    # out-of-bounds trials, it does not just clip the final value)
    for k in ("eps_0x", "eps_0y"):
        tr = np.asarray(res.track.theta[k])
        assert np.all(tr >= res.theta_lower[k] - 1e-12)
        assert np.all(tr <= res.theta_upper[k] + 1e-12)
