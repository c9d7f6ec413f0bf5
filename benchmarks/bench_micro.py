"""Microbenchmarks of the fit's hot primitives at production shapes on the
real chip: eigh / cholesky / LU-inv / solve at ntilde=2100, the Gram builds
at bench shapes, and one M-step objective value+grad evaluation.

Usage: python benchmarks/bench_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=5, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    n = 2100
    nt = 3160
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    K = A @ A.T / n + 0.1 * jnp.eye(n)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    print(f"eigh({n}):      {timeit(jax.jit(jnp.linalg.eigh), K)*1e3:9.2f} ms")
    print(f"cholesky({n}):  {timeit(jax.jit(jnp.linalg.cholesky), K)*1e3:9.2f} ms")
    print(f"inv({n}):       {timeit(jax.jit(jnp.linalg.inv), K)*1e3:9.2f} ms")
    print(f"solve({n}):     {timeit(jax.jit(jnp.linalg.solve), K, K)*1e3:9.2f} ms")
    cho = jax.jit(lambda K, B: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(K), True), B))
    print(f"chol+solve:     {timeit(cho, K, K)*1e3:9.2f} ms")

    mm = jax.jit(lambda a, b: jnp.matmul(a, b,
                                         precision=jax.lax.Precision.HIGHEST))
    mmh = jax.jit(lambda a, b: jnp.matmul(a, b,
                                          precision=jax.lax.Precision.HIGH))
    mmd = jax.jit(lambda a, b: jnp.matmul(a, b,
                                          precision=jax.lax.Precision.DEFAULT))
    X = jnp.asarray(rng.standard_normal((nt, 2048)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((2048, n)).astype(np.float32))
    t = timeit(mm, X, Y)
    fl = 2 * nt * 2048 * n
    print(f"matmul {nt}x2048x{n} HIGHEST: {t*1e3:8.2f} ms "
          f"({fl/t/1e12:.2f} useful TFLOP/s)")
    t = timeit(mmh, X, Y)
    print(f"matmul {nt}x2048x{n} HIGH:    {t*1e3:8.2f} ms "
          f"({fl/t/1e12:.2f} useful TFLOP/s)")
    t = timeit(mmd, X, Y)
    print(f"matmul {nt}x2048x{n} DEFAULT: {t*1e3:8.2f} ms "
          f"({fl/t/1e12:.2f} useful TFLOP/s)")

    # one M-step objective value+grad at bench shapes with crop window
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models import fit as F
    from gaussian_processes_tpu.ops.kernels import crop_window_for_theta
    from gaussian_processes_tpu.ops.stabilize import compute_eigenspace
    from gaussian_processes_tpu import params as P

    NPX = 108
    X = jnp.asarray(rng.standard_normal((nt, NPX * NPX)).astype(np.float32))
    R = jnp.asarray(rng.poisson(2.0, nt).astype(np.float32))
    xtilde = X[:n]
    theta = {"sigma_0": 1.0, "eps_0x": 0.0001, "eps_0y": 0.0001,
             "-2log2beta": -2 * np.log(2 * 0.1),
             "-log2rho2": -np.log(2 * 0.1 ** 2), "Amp": 1.0}
    theta = {k: jnp.float32(v) for k, v in theta.items()}
    cfg = FitConfig(ntilde=n, n_px_side=NPX, track_variational=False)
    lower, upper = P.theta_bounds()
    bounds = (tuple(sorted(lower.items())), tuple(sorted(upper.items())))
    i0, j0, w = crop_window_for_theta(theta, NPX, cfg.alpha_threshold,
                                      cfg.crop_margin, cfg.crop_bucket)
    print(f"crop window: w={w}")
    win = (jnp.asarray(i0, jnp.int32), jnp.asarray(j0, jnp.int32), w)

    K_tilde, Km, Kvec = F._masked_grams(theta, X, xtilde, False, cfg,
                                        win=win)
    es = compute_eigenspace(K_tilde)
    m_b = jnp.zeros(n, jnp.float32)
    V_b = jnp.diag(es.k_tilde_b_diag)
    f_params = {"logA": jnp.float32(np.log(0.01)), "lambda0": jnp.float32(1.0)}

    gram = jax.jit(lambda th: F._masked_grams(th, X, xtilde, False, cfg,
                                              win=win))
    print(f"gram build (fwd):    {timeit(gram, theta)*1e3:9.2f} ms")
    eig_of_gram = jax.jit(lambda th: compute_eigenspace(
        F._masked_grams(th, X, xtilde, False, cfg, win=win)[0]).eigvals)
    print(f"gram+eigh:           {timeit(eig_of_gram, theta)*1e3:9.2f} ms")

    def obj(th):
        return F._mstep_objective(th, X, xtilde, R, es, m_b, V_b, f_params,
                                  False, cfg, dict(lower), dict(upper),
                                  win=win)
    vg = jax.jit(jax.value_and_grad(obj))
    print(f"mstep value+grad:    {timeit(vg, theta)*1e3:9.2f} ms")
    v = jax.jit(obj)
    print(f"mstep value only:    {timeit(v, theta)*1e3:9.2f} ms")

    # E-step single Newton update at shape
    from gaussian_processes_tpu.models.estep import estep_update
    from gaussian_processes_tpu.models.moments import (
        lambda_moments, mean_f_given_lambda_moments)
    K_b = jnp.matmul(Km, es.B, precision=jax.lax.Precision.HIGHEST)
    a = K_b * es.k_tilde_inv_diag[None, :]

    def estep_once(m_b, V_b):
        lam_m, lam_v = lambda_moments(a, K_b, Kvec, m_b, V_b)
        f_mean = mean_f_given_lambda_moments(f_params, lam_m, lam_v)
        return estep_update(R, a, m_b, f_mean, es.k_tilde_b_diag, f_params)
    je = jax.jit(estep_once)
    print(f"estep newton update: {timeit(je, m_b, V_b)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
