"""Population fits on a virtual 8-device CPU mesh: vmap-over-cells plus
cells x data sharding, and agreement with single-cell fits."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import fit
from gaussian_processes_tpu.parallel import (
    make_mesh, fit_population)
from gaussian_processes_tpu.parallel.population import population_results

N = 12


def make_population(ncells=4, nt=32, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((nt, N * N))
    lin = np.linspace(-1, 1, N)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    R = np.zeros((ncells, nt))
    for c in range(ncells):
        cx, cy = rng.uniform(-0.4, 0.4, 2)
        w = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 0.3 ** 2)).ravel()
        w /= np.linalg.norm(w)
        R[c] = rng.poisson(np.exp(0.8 * X @ w))
    return X, R


THETA0 = {"sigma_0": 1.0, "eps_0x": 0.0, "eps_0y": 0.0,
          "-2log2beta": -2 * np.log(2 * 0.3),
          "-log2rho2": -np.log(2 * 0.15 ** 2), "Amp": 1.0}
FP0 = {"logA": np.log(0.01), "lambda0": 1.0}
# max_linesearch_steps matches the population auto-cap so the
# population-vs-single comparison runs the same optimizer
CFG = dict(maxiter=3, n_estep=3, n_mstep=2, n_fparamstep=3, n_px_side=N,
           track_variational=False, max_linesearch_steps=5)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_population_matches_single_cell_fits():
    X, R = make_population()
    cfg = FitConfig(ntilde=X.shape[0], **CFG)
    carry, (lo, hi) = fit_population(
        jnp.asarray(X), jnp.asarray(R), cfg, xtilde=jnp.asarray(X),
        thetas={k: jnp.float64(v) for k, v in THETA0.items()},
        f_params={k: jnp.float64(v) for k, v in FP0.items()})
    results = population_results(carry, cfg, jnp.asarray(X), lo, hi)
    assert len(results) == R.shape[0]
    # compare against single-cell fits at the population path's RESOLVED
    # config (fit_population switches to the vmap-linear armijo line search
    # and gram rematerialization; both must give the same numbers per lane)
    import dataclasses
    cfg_single = dataclasses.replace(cfg, linesearch="armijo",
                                     max_linesearch_steps=5, remat_gram=True)
    for c, res in enumerate(results):
        single = fit(jnp.asarray(X), jnp.asarray(R[c]), cfg_single,
                     xtilde=jnp.asarray(X),
                     theta={k: jnp.float64(v) for k, v in THETA0.items()},
                     f_params={k: jnp.float64(v) for k, v in FP0.items()})
        assert not res.failed and not single.failed
        np.testing.assert_allclose(np.asarray(res.track.logmarginal),
                                   np.asarray(single.track.logmarginal),
                                   rtol=1e-7, err_msg=f"cell {c}")


@pytest.mark.slow
def test_population_sharded_over_mesh():
    """cells x data mesh: same numbers as the unsharded program."""
    X, R = make_population(ncells=4, nt=32)
    cfg = FitConfig(ntilde=X.shape[0], **CFG)
    kw = dict(
        xtilde=jnp.asarray(X),
        thetas={k: jnp.float64(v) for k, v in THETA0.items()},
        f_params={k: jnp.float64(v) for k, v in FP0.items()})
    mesh = make_mesh(n_cells_axis=4, n_data_axis=2)
    carry_sh, _ = fit_population(jnp.asarray(X), jnp.asarray(R), cfg,
                                 mesh=mesh, **kw)
    carry, _ = fit_population(jnp.asarray(X), jnp.asarray(R), cfg, **kw)
    np.testing.assert_allclose(np.asarray(carry_sh.track.logmarginal),
                               np.asarray(carry.track.logmarginal),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(carry_sh.m_b),
                               np.asarray(carry.m_b), rtol=1e-6, atol=1e-9)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh(n_data_axis=4)
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh(n_cells_axis=3, n_data_axis=3)


def test_distributed_cholesky():
    """Fan-out block Cholesky over the data axis matches LAPACK, including
    non-divisible sizes (identity padding)."""
    from gaussian_processes_tpu.parallel.sharded_linalg import (
        distributed_cholesky, distributed_cholesky_solve)
    mesh = make_mesh(n_cells_axis=1, n_data_axis=8)
    rng = np.random.default_rng(0)
    for n in (256, 213):
        W = rng.standard_normal((n, n))
        A = jnp.asarray(W @ W.T + n * np.eye(n))
        L = distributed_cholesky(A, mesh, axis="data")
        np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(A),
                                   atol=1e-10)
        b = jnp.asarray(rng.standard_normal(n))
        x = distributed_cholesky_solve(L, b)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b),
                                   atol=1e-9)


def test_sharded_gram_matches_unsharded():
    from gaussian_processes_tpu.parallel.sharded_linalg import sharded_gram
    from gaussian_processes_tpu.ops.kernels import gram_matrices
    mesh = make_mesh(n_cells_axis=1, n_data_axis=8)
    rng = np.random.default_rng(1)
    theta = {k: jnp.float64(v) for k, v in THETA0.items()}
    x = jnp.asarray(rng.standard_normal((64, N * N)))
    xt = jnp.asarray(rng.standard_normal((16, N * N)))
    Kt, K, Kv = sharded_gram(theta, x, xt, N, mesh)
    Kt2, K2, Kv2 = gram_matrices(theta, x, xt, N, shared=False)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Kt), np.asarray(Kt2), atol=1e-12)
    assert "data" in str(K.sharding.spec)


@pytest.mark.slow
def test_sequential_population_helper():
    from gaussian_processes_tpu.parallel import fit_cells_sequential
    X, R = make_population(ncells=2, nt=24)
    cfg = FitConfig(ntilde=24, **CFG)
    results = fit_cells_sequential(
        jnp.asarray(X), jnp.asarray(R), cfg, xtilde=jnp.asarray(X),
        thetas={k: jnp.float64(v) for k, v in THETA0.items()},
        f_params={k: jnp.float64(v) for k, v in FP0.items()})
    assert len(results) == 2
    assert not any(r.failed for r in results)


@pytest.mark.slow
def test_large_path_small_scale():
    """The >=50k large-ntilde path (large_gram -> large_cholesky ->
    posterior mean), exercised at test scale: exact vs dense LAPACK on the
    8-device virtual mesh AND on the single-device in-place route.
    benchmarks/bench_large_ntilde.py runs the same code path at n>=50k on
    the real chip."""
    from gaussian_processes_tpu.parallel.large import (
        large_cholesky, large_gram, large_posterior_mean)
    from gaussian_processes_tpu.ops.kernels import gram_matrices
    mesh = make_mesh(n_cells_axis=1, n_data_axis=8)
    rng = np.random.default_rng(2)
    theta = {k: jnp.float64(v) for k, v in THETA0.items()}
    xt = jnp.asarray(rng.standard_normal((96, N * N)))
    xs = jnp.asarray(rng.standard_normal((8, N * N)))
    y = jnp.asarray(rng.standard_normal(96))

    K_ref, _, _ = gram_matrices(theta, xt, xt, N, shared=True)
    K_sh = large_gram(theta, xt, N, mesh=mesh)
    np.testing.assert_allclose(np.asarray(K_sh), np.asarray(K_ref),
                               atol=1e-12)
    assert "data" in str(K_sh.sharding.spec)

    A = np.asarray(K_ref) + 0.5 * np.eye(96)
    L_ref = np.linalg.cholesky(A)
    # distributed route
    L_d = large_cholesky(jnp.asarray(K_ref), mesh=mesh, jitter=0.5)
    np.testing.assert_allclose(np.asarray(L_d), L_ref, atol=1e-10)
    # single-device divide-and-conquer route (nb < n forces recursion)
    L_s = large_cholesky(jnp.asarray(K_ref).copy(), mesh=None, jitter=0.5,
                         nb=16)
    np.testing.assert_allclose(np.asarray(L_s), L_ref, atol=1e-10)

    # end-to-end posterior mean vs dense solve
    mu, alpha = large_posterior_mean(theta, xt, y, xs, N, mesh=mesh,
                                     noise_var=0.5, nb=16)
    alpha_ref = np.linalg.solve(A, np.asarray(y))
    _, K_star, _ = gram_matrices(theta, xs, xt, N, shared=False)
    np.testing.assert_allclose(np.asarray(alpha), alpha_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(mu),
                               np.asarray(K_star) @ alpha_ref, atol=1e-9)


@pytest.mark.slow
def test_single_cell_fit_data_sharded():
    """fit(mesh=) shards the training-point axis over the mesh's "data"
    axis (the big-nt scale-out of one cell); numerics must match the
    unsharded fit exactly."""
    mesh = make_mesh(n_cells_axis=1, n_data_axis=8)
    X, R = make_population(ncells=1, nt=48)
    theta = {k: jnp.float64(v) for k, v in THETA0.items()}
    fp = {k: jnp.float64(v) for k, v in FP0.items()}
    cfg = FitConfig(ntilde=16, **CFG)
    xt = jnp.asarray(X[:16]).copy()
    r0 = fit(jnp.asarray(X), jnp.asarray(R[0]), cfg, xtilde=xt, theta=theta,
             f_params=fp)
    r1 = fit(jnp.asarray(X), jnp.asarray(R[0]), cfg, xtilde=xt, theta=theta,
             f_params=fp, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r1.track.logmarginal),
                               np.asarray(r0.track.logmarginal), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r1.m_b), np.asarray(r0.m_b),
                               rtol=1e-10, atol=1e-12)


def test_population_forces_vmap_linear_knobs():
    """The vmapped program must rewrite vmap-hostile knobs: under vmap the
    convergence gates and warm-solver lax.conds lower to execute-both-
    branches selects (pure overhead per lane)."""
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.parallel.population import _vmap_safe_config

    cfg = FitConfig(ntilde=16, maxiter=2, n_estep=2, n_mstep=2,
                    n_fparamstep=2, n_px_side=8,
                    mstep_ftol=1.0, mstep_ftol_rel=1e-4, estep_tol=1e-3,
                    estep_solver="schulz", mstep_logdet="series",
                    mstep_inverse="schulz", schulz_fallback="exact",
                    linesearch="zoom", crop_window=False)
    used = _vmap_safe_config(cfg)
    assert used.mstep_ftol == 0.0
    assert used.mstep_ftol_rel == 0.0
    assert used.mstep_gtol == 0.0
    assert used.estep_tol == 0.0
    assert used.estep_solver == "chol"
    assert used.mstep_logdet == "chol"
    assert used.schulz_fallback == "poison"
    # a vmap-safe config passes through unchanged
    assert _vmap_safe_config(used) == used
