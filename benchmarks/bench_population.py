"""Population-throughput benchmark: N cells fitted as one vmapped program on
one chip vs sequential single-cell fits.

The reference fits one cell per notebook run; the lab has 41 cells sharing
each stimulus set.  vmap batches every kernel build, eigh, solve, and L-BFGS
across cells, filling the MXU far better than one cell can — this per-chip
multiplier, times the cells-axis sharding over a pod slice (v5e-8), is the
framework's population-scale story.

Prints one JSON line: per-cell wall-clock in the vmapped fit, with
vs_baseline = sequential-single-cell time / vmapped-per-cell time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")

# Sized for a single v5e chip (16 GB HBM): 8 cells x ntilde=1024 vmapped
# crashed the worker; 4 x 512 is comfortable.  A pod slice scales the cell
# axis across chips instead.
NCELLS = 4
NT = 3160
NTILDE = 512
N_PX = 108
MAXITER, NE, NM, NF = 6, 10, 10, 10


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models.fit import fit
    from gaussian_processes_tpu.parallel import fit_population

    rng = np.random.default_rng(0)
    X = rng.standard_normal((NT, N_PX * N_PX)).astype(np.float32)
    lin = np.linspace(-1, 1, N_PX)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    R = np.zeros((NCELLS, NT), np.float32)
    for c in range(NCELLS):
        cx, cy = rng.uniform(-0.3, 0.3, 2)
        w = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 0.1 ** 2)).ravel()
        w /= np.linalg.norm(w)
        R[c] = rng.poisson(np.exp(0.8 * X @ w))

    Xd = jnp.asarray(X)
    key = jax.random.PRNGKey(0)
    xtilde = Xd[jax.random.permutation(key, NT)[:NTILDE]]
    theta = {k: jnp.float32(v) for k, v in [
        ("sigma_0", 1.0), ("eps_0x", 1e-4), ("eps_0y", 1e-4),
        ("-2log2beta", -2 * np.log(0.2)), ("-log2rho2", -np.log(0.02)),
        ("Amp", 1.0)]}
    fp = {"logA": jnp.float32(np.log(0.01)), "lambda0": jnp.float32(1.0)}
    cfg = FitConfig(ntilde=NTILDE, maxiter=MAXITER, n_estep=NE, n_mstep=NM,
                    n_fparamstep=NF, n_px_side=N_PX, track_variational=False)

    # --- vmapped population fit ---
    def run_pop():
        carry, _ = fit_population(Xd, jnp.asarray(R), cfg, xtilde=xtilde,
                                  thetas=theta, f_params=fp)
        np.asarray(carry.m_b)
        return carry

    carry = run_pop()           # compile
    t0 = time.perf_counter()
    carry = run_pop()
    t_pop = time.perf_counter() - t0

    # --- one sequential single-cell fit (same program class) for scale ---
    cfg1 = FitConfig(ntilde=NTILDE, maxiter=MAXITER, n_estep=NE, n_mstep=NM,
                     n_fparamstep=NF, n_px_side=N_PX,
                     track_variational=False, jit_whole_fit=False)
    res = fit(Xd, jnp.asarray(R[0]), cfg1, xtilde=xtilde, theta=theta,
              f_params=fp)
    np.asarray(res.m_b)
    t0 = time.perf_counter()
    res = fit(Xd, jnp.asarray(R[0]), cfg1, xtilde=xtilde, theta=theta,
              f_params=fp)
    np.asarray(res.m_b)
    t_single = time.perf_counter() - t0

    ok = bool(np.all(np.isfinite(np.asarray(carry.track.logmarginal))))
    per_cell = t_pop / NCELLS
    print(f"[population] {NCELLS} cells vmapped: {t_pop:.2f}s total, "
          f"{per_cell:.2f}s/cell; single-cell: {t_single:.2f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"population_fit_per_cell_{NCELLS}cells",
        "value": round(per_cell, 3),
        "unit": "s",
        "vs_baseline": round(t_single / per_cell, 2) if ok else 0.0,
    }))


if __name__ == "__main__":
    main()
