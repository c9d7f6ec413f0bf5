"""Pad-and-mask fit equivalence and the closed-loop active-learning driver."""

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import fit
from gaussian_processes_tpu.models.active import active_loop

N = 14


def make_pool(npool=60, seed=2):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((npool, N * N))
    lin = np.linspace(-1, 1, N)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.3 ** 2)).ravel()
    w = w / np.linalg.norm(w)
    lam = np.exp(0.8 * X @ w)
    R = rng.poisson(lam).astype(float)
    return X, R, lam, w


THETA0 = {"sigma_0": 1.0, "eps_0x": 0.0, "eps_0y": 0.0,
          "-2log2beta": -2 * np.log(2 * 0.3),
          "-log2rho2": -np.log(2 * 0.15 ** 2), "Amp": 1.0}
FP0 = {"logA": np.log(0.01), "lambda0": 1.0}


@pytest.mark.slow
def test_padded_fit_matches_unpadded():
    """A fit on n active points inside a capacity-C padded buffer must give
    the same physics as the fit on the n points alone: identical loss
    trajectory (basis-independent) to fp tolerance."""
    X, R, _, _ = make_pool()
    n, cap = 25, 40
    xa = X[:n]; ra = R[:n]
    theta = {k: jnp.float64(v) for k, v in THETA0.items()}
    fp = {k: jnp.float64(v) for k, v in FP0.items()}

    cfg_a = FitConfig(ntilde=n, maxiter=4, n_estep=3, n_mstep=3,
                      n_fparamstep=4, n_px_side=N)
    res_a = fit(jnp.asarray(xa), jnp.asarray(ra), cfg_a,
                xtilde=jnp.asarray(xa), theta=theta, f_params=fp)

    x_buf = np.zeros((cap, N * N)); x_buf[:n] = xa
    r_buf = np.zeros(cap); r_buf[:n] = ra
    mask = (np.arange(cap) < n).astype(float)
    cfg_b = FitConfig(ntilde=cap, maxiter=4, n_estep=3, n_mstep=3,
                      n_fparamstep=4, n_px_side=N)
    res_b = fit(jnp.asarray(x_buf), jnp.asarray(r_buf), cfg_b,
                xtilde=jnp.asarray(x_buf), theta=theta, f_params=fp,
                sample_weight=jnp.asarray(mask))

    assert not res_a.failed and not res_b.failed
    # same kept-rank
    assert int(np.asarray(res_a.keep).sum()) == int(np.asarray(res_b.keep).sum())
    np.testing.assert_allclose(np.asarray(res_b.track.logmarginal),
                               np.asarray(res_a.track.logmarginal),
                               rtol=1e-6)
    for k in THETA0:
        np.testing.assert_allclose(float(res_b.theta[k]),
                                   float(res_a.theta[k]), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_active_loop_runs_and_improves():
    X, R, lam, w = make_pool(npool=80)
    rng = np.random.default_rng(9)
    # repeated test set
    nimg, nrep = 10, 15
    Xt = rng.standard_normal((nimg, N * N))
    lam_t = np.exp(0.8 * Xt @ w)
    Rt = rng.poisson(lam_t[None, :].repeat(nrep, 0)).astype(float)

    cfg = FitConfig(maxiter=3, n_estep=3, n_mstep=2, n_fparamstep=3,
                    n_px_side=N, track_variational=False)
    out = active_loop(X, R, start_idx=np.arange(12), n_add=5, cfg=cfg,
                      theta={k: jnp.float64(v) for k, v in THETA0.items()},
                      f_params={k: jnp.float64(v) for k, v in FP0.items()},
                      X_test=Xt, R_test=Rt, nbootstrap=50, seed=0)
    assert len(out.selected_idx) == 5
    assert len(set(out.selected_idx)) == 5          # no repeats
    assert not any(i < 12 for i in out.selected_idx)  # never re-picks used
    assert len(out.r2_history) == 6
    assert not out.final_fit.failed
    assert np.all(np.isfinite(out.r2_history))


@pytest.mark.slow
def test_active_loop_random_baseline():
    X, R, _, _ = make_pool(npool=50)
    cfg = FitConfig(maxiter=2, n_estep=2, n_mstep=0, n_fparamstep=3,
                    n_px_side=N, track_variational=False)
    out = active_loop(X, R, start_idx=np.arange(10), n_add=3, cfg=cfg,
                      theta={k: jnp.float64(v) for k, v in THETA0.items()},
                      f_params={k: jnp.float64(v) for k, v in FP0.items()},
                      select="random", seed=1)
    assert len(out.selected_idx) == 3
    assert all(np.isnan(u) for u in out.utilities)
    assert not out.final_fit.failed


def test_block_matrix_inverse_rank1_growth():
    """Sherman-Morrison block update for the grown K_tilde inverse
    (reference: utils.py:1055-1070)."""
    from gaussian_processes_tpu.ops.stabilize import block_matrix_inverse
    rng = np.random.default_rng(0)
    A = rng.standard_normal((7, 7))
    M = A @ A.T + 7 * np.eye(7)
    col = np.concatenate([M[:6, 6], [M[6, 6]]])
    inv6 = np.linalg.inv(M[:6, :6])
    grown = block_matrix_inverse(jnp.asarray(inv6), jnp.asarray(col))
    np.testing.assert_allclose(np.asarray(grown), np.linalg.inv(M),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_ab_experiment():
    from gaussian_processes_tpu.models.active import ab_experiment
    X, R, _, _ = make_pool(npool=40)
    cfg = FitConfig(maxiter=2, n_estep=2, n_mstep=0, n_fparamstep=2,
                    n_px_side=N, track_variational=False)
    out = ab_experiment(X, R, n_start=8, n_add=2, seeds=[0, 1], cfg=cfg,
                        theta={k: jnp.float64(v) for k, v in THETA0.items()},
                        f_params={k: jnp.float64(v) for k, v in FP0.items()})
    assert len(out["active"]) == 2 and len(out["random"]) == 2
    # both arms share the starting set per seed
    a0 = set(out["active"][0].in_use_idx[:8])
    r0 = set(out["random"][0].in_use_idx[:8])
    assert a0 == r0


@pytest.mark.slow
def test_pipelined_loop_matches_host_loop():
    """active_loop_pipelined keeps selection, buffer growth, and the
    warm-start update ON DEVICE; it must reproduce the host loop's
    selections and final model (same scorer, same growth semantics —
    the only change is where the argmax happens)."""
    from gaussian_processes_tpu.models.active import active_loop_pipelined
    import dataclasses
    X, R, _, _ = make_pool(npool=60)
    cfg = FitConfig(maxiter=3, n_estep=3, n_mstep=2, n_fparamstep=3,
                    n_px_side=N, track_variational=False,
                    crop_window=False)
    kw = dict(start_idx=np.arange(12), n_add=4, cfg=cfg,
              theta={k: jnp.float64(v) for k, v in THETA0.items()},
              f_params={k: jnp.float64(v) for k, v in FP0.items()},
              seed=0)
    host = active_loop(X, R, **kw)
    pipe = active_loop_pipelined(X, R, **kw)
    assert pipe.selected_idx == host.selected_idx
    for k in host.final_fit.theta:
        np.testing.assert_allclose(float(pipe.final_fit.theta[k]),
                                   float(host.final_fit.theta[k]),
                                   rtol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(pipe.utilities),
                               np.asarray(host.utilities), rtol=1e-6)


@pytest.mark.slow
def test_pipelined_loop_random_arm():
    from gaussian_processes_tpu.models.active import active_loop_pipelined
    X, R, _, _ = make_pool(npool=50)
    cfg = FitConfig(maxiter=2, n_estep=2, n_mstep=0, n_fparamstep=3,
                    n_px_side=N, track_variational=False)
    out = active_loop_pipelined(X, R, start_idx=np.arange(10), n_add=3,
                                cfg=cfg,
                                theta={k: jnp.float64(v)
                                       for k, v in THETA0.items()},
                                f_params={k: jnp.float64(v)
                                          for k, v in FP0.items()},
                                select="random", seed=1)
    assert len(out.selected_idx) == 3
    assert len(set(out.selected_idx)) == 3
    assert not any(i < 10 for i in out.selected_idx)
    assert not out.final_fit.failed


def test_select_and_grow_unit():
    """Device-side selection+growth math (fast gate): masked argmax, row
    write at n, unit prior variance, mean-of-first-n warm mean — the
    reference's cell17 update block."""
    from gaussian_processes_tpu.models.active import _select_and_grow
    rng = np.random.default_rng(0)
    npool, cap, nx, rank = 12, 6, 9, 4
    u = jnp.asarray(np.linspace(0.0, 1.0, npool))
    used = jnp.asarray(np.zeros(npool, bool)).at[11].set(True)  # best is used
    X_pool = jnp.asarray(rng.standard_normal((npool, nx)))
    R_pool = jnp.asarray(rng.poisson(2.0, npool).astype(float))
    x_buf = jnp.zeros((cap, nx))
    r_buf = jnp.zeros(cap)
    B = jnp.asarray(rng.standard_normal((cap, rank)))
    m_b = jnp.asarray(rng.standard_normal(rank))
    V_b = jnp.asarray(np.eye(rank))
    n = jnp.asarray(3, jnp.int32)
    xb, rb, us, m_o, V_o, best, ubest = _select_and_grow(
        u, X_pool, R_pool, x_buf, r_buf, used, B, m_b, V_b, n)
    assert int(best) == 10                       # 11 is masked out
    assert float(ubest) == pytest.approx(10 / 11)
    assert bool(us[10])
    np.testing.assert_allclose(np.asarray(xb[3]), np.asarray(X_pool[10]))
    assert float(rb[3]) == float(R_pool[10])
    m_ref = np.asarray(B) @ np.asarray(m_b)
    np.testing.assert_allclose(np.asarray(m_o[3]), m_ref[:3].mean(),
                               rtol=1e-12)
    V_ref = np.asarray(B) @ np.asarray(V_b) @ np.asarray(B).T
    V_ref = 0.5 * (V_ref + V_ref.T)
    assert float(V_o[3, 3]) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(V_o[:3, :3]), V_ref[:3, :3],
                               rtol=1e-12)
