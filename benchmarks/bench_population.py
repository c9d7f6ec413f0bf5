"""Population-throughput benchmark: the lab's multi-cell workload on one chip.

The reference fits one cell per notebook run at 85.2 s; the lab's actual job
is 41 cells sharing each stimulus set (one_cell_fit.ipynb:cell4).  Two
single-chip routes exist here:

* **sequential** — per-cell fits through the cached per-iteration program
  (speculative-Armijo L-BFGS), full per-cell efficiency;
* **vmapped** — fit_population batches every kernel build, eigenspace
  solve, E-step, and L-BFGS across a cell axis (branch-free armijo line
  search), trading per-lane efficiency for batching; the same program
  shards the cell axis across a pod slice.

This bench measures both at the largest vmapped lane count that fits HBM
(tries NCELLS from GPTPU_POP_CELLS downward on OOM, recording the limit)
and reports s/cell for each.  vs_baseline compares the vmapped s/cell to
the sequential s/cell: >= 0.5 means the vmapped path is within the 2x
"worth sharding" band (the round-2 target; round-1 recorded ~10x worse).

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")

NT = 3160
NTILDE = int(os.environ.get("GPTPU_POP_NTILDE", "512"))
N_PX = 108
MAXITER, NE, NM, NF = 6, 10, 10, 10
NCELLS_TRY = [int(c) for c in
              os.environ.get("GPTPU_POP_CELLS", "16,8,4").split(",")]
NSEQ = int(os.environ.get("GPTPU_POP_SEQ", "2"))


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
    # enough cells for both the vmapped lanes and the sequential loop
    # (GPTPU_POP_SEQ=41 measures the lab's actual 41-cell workload)
    ncells_max = max(max(NCELLS_TRY), NSEQ)
    R = np.zeros((ncells_max, NT), np.float32)
    for c in range(ncells_max):
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

    # --- vmapped population fit at the largest lane count that fits ---
    t_pop = ncells = None
    oom_at = []
    for nc in NCELLS_TRY:
        Rd = jnp.asarray(R[:nc])

        def run_pop():
            carry, _ = fit_population(Xd, Rd, cfg, xtilde=xtilde,
                                      thetas=theta, f_params=fp)
            np.asarray(carry.m_b)
            return carry

        try:
            carry = run_pop()           # compile
            t0 = time.perf_counter()
            carry = run_pop()
            t_pop = time.perf_counter() - t0
            ncells = nc
            break
        except Exception as e:     # XlaRuntimeError RESOURCE_EXHAUSTED etc.
            oom_at.append(nc)
            print(f"[population] {nc} lanes failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
    if t_pop is None:
        print(json.dumps({"metric": "population_fit_per_cell",
                          "value": float("inf"), "unit": "s",
                          "vs_baseline": 0.0}))
        return

    # --- sequential per-cell fits through the cached program ---
    # gated zoom (the headline-bench optimum) is the recommended
    # sequential route; GPTPU_POP_SEQ_LS=speculative reproduces the
    # earlier round-3 record (1.01 s/cell)
    cfg1 = FitConfig(ntilde=NTILDE, maxiter=MAXITER, n_estep=NE, n_mstep=NM,
                     n_fparamstep=NF, n_px_side=N_PX,
                     track_variational=False, jit_whole_fit=False,
                     linesearch=os.environ.get("GPTPU_POP_SEQ_LS", "zoom"),
                     mstep_ftol=float(os.environ.get("GPTPU_POP_MSTEP_FTOL",
                                                     "1.0")),
                     estep_tol=float(os.environ.get("GPTPU_POP_ESTEP_TOL",
                                                    "1e-3")),
                     max_linesearch_steps=int(os.environ.get(
                         "GPTPU_POP_MAX_LS", "4")))
    fit(Xd, jnp.asarray(R[0]), cfg1, xtilde=xtilde, theta=theta,
        f_params=fp)                # compile
    t0 = time.perf_counter()
    for c in range(NSEQ):
        res = fit(Xd, jnp.asarray(R[c]), cfg1, xtilde=xtilde, theta=theta,
                  f_params=fp)
        np.asarray(res.m_b)
    t_seq = (time.perf_counter() - t0) / NSEQ

    ok = bool(np.all(np.isfinite(np.asarray(carry.track.logmarginal))))
    per_cell = t_pop / ncells
    print(f"[population] {ncells} cells vmapped: {t_pop:.2f}s total, "
          f"{per_cell:.2f}s/cell; sequential: {t_seq:.2f}s/cell; "
          f"41-cell projection: vmapped {41 * per_cell:.0f}s, "
          f"sequential {41 * t_seq:.0f}s"
          + (f"; OOM at lanes {oom_at}" if oom_at else ""),
          file=sys.stderr)
    print(json.dumps({
        "metric": f"population_fit_per_cell_{ncells}cells_ntilde{NTILDE}",
        "value": round(per_cell, 3),
        "unit": "s",
        "vs_baseline": round(t_seq / per_cell, 2) if ok else 0.0,
    }))


if __name__ == "__main__":
    main()
