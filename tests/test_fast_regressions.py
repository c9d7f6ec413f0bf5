"""Fast-gate representatives of the heavy regression classes.

The <3 min core gate (``pytest -m "not slow"``) must exercise every
regression CLASS the slow suite covers — the reference's documented
failure regimes (ToDo.md:14-29), gradient parity, and checkpoint
roundtrips — at shapes small enough to stay cheap (round-3 ADVICE: keep a
cheap representative of each class instead of demoting them wholesale).
The full-size versions stay in the slow suite.

All fits here share ONE config and ONE set of shapes so the whole module
compiles a single EM program.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import fit, _mstep_objective
from gaussian_processes_tpu.ops.kernels import gram_matrices
from gaussian_processes_tpu.ops.stabilize import compute_eigenspace
from gaussian_processes_tpu.params import THETA_KEYS, theta_bounds

N = 10           # tiny frame: these tests are about regimes, not scale
NT = 40
NTILDE = 32


def _theta(beta=0.3, rho=0.15, eps=(0.0, 0.0)):
    return {"sigma_0": jnp.float64(1.0),
            "eps_0x": jnp.float64(eps[0]), "eps_0y": jnp.float64(eps[1]),
            "-2log2beta": jnp.float64(-2 * np.log(2 * beta)),
            "-log2rho2": jnp.float64(-np.log(2 * rho ** 2)),
            "Amp": jnp.float64(1.0)}


def _data(seed=3, gain=0.7, center=(0.1, -0.2), width=0.3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((NT, N * N))
    lin = np.linspace(-1, 1, N)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - center[0]) ** 2 + (yy - center[1]) ** 2)
               / (2 * width ** 2)).ravel()
    w = w / np.linalg.norm(w)
    r = rng.poisson(np.exp(gain * x @ w)).astype(float)
    return x, r


# ONE config for every fit in this module -> one compiled program
# (xtilde always has NTILDE rows and is never the x object, so the
# shared=False program is reused across tests).
CFG = FitConfig(ntilde=NTILDE, maxiter=3, n_estep=2, n_mstep=3,
                n_fparamstep=2, n_px_side=N)
FP0 = {"logA": jnp.float64(np.log(0.01)), "lambda0": jnp.float64(1.0)}


def _fit(x, r, xtilde, theta):
    return fit(jnp.asarray(x), jnp.asarray(r), CFG,
               xtilde=jnp.asarray(xtilde), theta=theta, f_params=FP0)


def _assert_clean(res):
    loss = np.asarray(res.track.logmarginal)
    assert np.all(np.isfinite(loss)), "fit tracked NaN loss"
    for k, v in res.theta.items():
        assert np.isfinite(float(v)), f"returned theta[{k}] is non-finite"
    assert np.all(np.isfinite(np.asarray(res.m_b)))
    assert np.all(np.isfinite(np.asarray(res.V_b)))


# ---------------------------------------------------------------------------
# ToDo.md regimes (fast variants of tests/test_robustness.py)
# ---------------------------------------------------------------------------

def test_duplicated_xtilde_rows_stable_fast():
    """Singular K_tilde from duplicated inducing rows: the eigenvalue
    truncation must absorb the collapsed directions (ToDo.md:14 class;
    reference dodges with 1e-15 jitter, utils.py:705-711)."""
    x, r = _data()
    idx = np.concatenate([np.arange(24), np.arange(8)])    # 8 duplicates
    res = _fit(x, r, x[idx], _theta())
    _assert_clean(res)
    assert not res.failed
    assert int(np.asarray(res.track.n_eigen)[-1]) <= 24


def test_rf_at_border_bounds_enforced_fast(tmp_path):
    """RF at the image border: every tracked iterate must stay inside the
    eps box (the reference's inf-loss-at-bounds rule, utils.py:2020-2028;
    ToDo.md:29 class).  The fitted model then referees the checkpoint
    roundtrip class (save_model/load_model) with no extra fit."""
    x, r = _data(center=(0.9, 0.9), width=0.3, gain=0.8)
    res = _fit(x, r, x[:NTILDE], _theta(eps=(0.9, 0.9)))
    _assert_clean(res)
    assert not res.failed
    for k in ("eps_0x", "eps_0y"):
        tr = np.asarray(res.track.theta[k])
        assert np.all(tr >= res.theta_lower[k] - 1e-12)
        assert np.all(tr <= res.theta_upper[k] + 1e-12)

    # checkpoint roundtrip on the same fitted model
    from gaussian_processes_tpu.utils.io import save_model, load_model
    d = str(tmp_path / "model_dir")
    save_model(res, d, additional_description="fast roundtrip")
    loaded = load_model(d)
    np.testing.assert_allclose(np.asarray(loaded.m_b), np.asarray(res.m_b))
    for k in THETA_KEYS:
        assert float(loaded.theta[k]) == pytest.approx(float(res.theta[k]))


# ---------------------------------------------------------------------------
# Gradient parity (fast variant of tests/test_gradients.py): central finite
# differences referee the production M-step objective's jax.grad, both
# evaluated EAGERLY at tiny shapes (no XLA compile; still catches formula
# regressions anywhere in the objective chain).
# ---------------------------------------------------------------------------

def test_mstep_objective_finite_difference_fast():
    rng = np.random.default_rng(7)
    nt, ntilde, n = 10, 6, 8
    x = jnp.asarray(rng.standard_normal((nt, n * n)))
    xtilde = x[:ntilde]
    r = jnp.asarray(rng.poisson(2.0, nt).astype(float))
    theta = {"sigma_0": jnp.float64(1.1), "eps_0x": jnp.float64(0.15),
             "eps_0y": jnp.float64(-0.1),
             "-2log2beta": jnp.float64(-2 * np.log(2 * 0.4)),
             "-log2rho2": jnp.float64(-np.log(2 * 0.18 ** 2)),
             "Amp": jnp.float64(0.9)}
    f_params = {"logA": jnp.float64(np.log(0.05)),
                "lambda0": jnp.float64(0.3)}
    cfg = FitConfig(ntilde=ntilde, n_px_side=n)
    K_tilde, _, _ = gram_matrices(theta, x, xtilde, n, shared=False)
    es = compute_eigenspace(K_tilde)
    keep = np.asarray(es.keep)
    m_b = jnp.asarray(np.linspace(-0.5, 0.5, ntilde) * keep)
    V_b = jnp.diag(es.k_tilde_b_diag) * 0.9
    lower, upper = theta_bounds()

    import jax

    # jit both programs once: the 12 finite-difference evaluations and the
    # grad dominate this test's runtime when dispatched eagerly (measured
    # 16.5 s eager vs ~6 s jitted at these shapes on one CPU core)
    @jax.jit
    def obj(th):
        return _mstep_objective(th, x, xtilde, r, es, m_b, V_b,
                                f_params, False, cfg, lower, upper)

    g = jax.jit(jax.grad(obj))(theta)
    eps_fd = 1e-6
    for k in THETA_KEYS:
        tp = dict(theta); tp[k] = theta[k] + eps_fd
        tm = dict(theta); tm[k] = theta[k] - eps_fd
        fd = (float(obj(tp)) - float(obj(tm))) / (2 * eps_fd)
        np.testing.assert_allclose(float(g[k]), fd, rtol=5e-5, atol=1e-7,
                                   err_msg=k)
