"""Profiled single-cell fit at bench shapes: per-iteration wall-clock,
rank/window schedule, and phase hints.  Usage:
    python benchmarks/bench_fit_profile.py [maxiter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")
os.environ.setdefault("GPTPU_LOG_WINDOW", "")

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models.fit import fit

    maxiter = int(sys.argv[1]) if len(sys.argv) > 1 else bench.MAXITER
    X, R = bench.make_data()
    X = jnp.asarray(X); R = jnp.asarray(R)
    key = jax.random.PRNGKey(0)
    idx = jax.random.permutation(key, bench.NT)[:bench.NTILDE]
    xtilde = X[idx]
    theta = {"sigma_0": 1.0, "eps_0x": 0.0001, "eps_0y": 0.0001,
             "-2log2beta": -2 * np.log(2 * 0.1),
             "-log2rho2": -np.log(2 * 0.1 ** 2), "Amp": 1.0}
    theta = {k: jnp.float32(v) for k, v in theta.items()}
    f_params = {"logA": jnp.float32(np.log(0.01)),
                "lambda0": jnp.float32(1.0)}
    # bench.make_config is the single source of truth so the two share
    # .jax_cache programs (compiles through the tunnel are minutes each)
    cfg = bench.make_config(FitConfig, maxiter=maxiter)

    for run in range(2):
        t0 = time.perf_counter()
        res = fit(X, R, cfg, xtilde=xtilde, theta=theta, f_params=f_params,
                  profile=True)
        el = time.perf_counter() - t0
        tm = res.timing
        per = np.asarray(tm["per_iteration"])
        print(f"run {run}: total={el:.2f}s init={tm['init']:.2f}s "
              f"iters: median={np.median(per)*1e3:.0f}ms "
              f"min={per.min()*1e3:.0f}ms max={per.max()*1e3:.0f}ms")
        print("  per-iter ms:", " ".join(f"{v*1e3:.0f}" for v in per))
        print("  n_eigen:", np.asarray(res.track.n_eigen))
        print("  final loss:", float(res.track.logmarginal[-1]),
              "failed:", res.failed)


if __name__ == "__main__":
    main()
