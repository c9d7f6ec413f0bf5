"""Active-loop refit benchmark.

Reference baseline: ~1.0-1.3 s per warm-started refit at ntilde=50..300,
maxiter=10 (one_cell_active_training.ipynb:cell9/cell17), with every round
recompiling nothing but re-running eager torch at a new shape.  Here one
compiled fixed-capacity program serves every round.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_SECONDS = 1.15       # midpoint of the reference's 1.0-1.3 s
CAPACITY = 300
N_ACTIVE = 250
N_PX = 108


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models.fit import fit

    rng = np.random.default_rng(0)
    x_buf = rng.standard_normal((CAPACITY, N_PX * N_PX)).astype(np.float32)
    lin = np.linspace(-1, 1, N_PX)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-(xx ** 2 + yy ** 2) / (2 * 0.1 ** 2)).ravel()
    w /= np.linalg.norm(w)
    r_buf = rng.poisson(np.exp(0.8 * x_buf @ w)).astype(np.float32)
    mask = (np.arange(CAPACITY) < N_ACTIVE).astype(np.float32)

    theta = {k: jnp.float32(v) for k, v in [
        ("sigma_0", 1.0), ("eps_0x", 1e-4), ("eps_0y", 1e-4),
        ("-2log2beta", -2 * np.log(0.2)), ("-log2rho2", -np.log(0.02)),
        ("Amp", 1.0)]}
    fp = {"logA": jnp.float32(np.log(0.01)), "lambda0": jnp.float32(1.0)}
    # whole-fit compilation: at this scale the program is small, and the
    # active loop reuses it for hundreds of refits — one dispatch per refit
    # instead of one per EM iteration (the tunnel round-trip dominates
    # small-problem per-iteration mode)
    cfg = FitConfig(ntilde=CAPACITY, maxiter=10, n_estep=5, n_mstep=5,
                    n_fparamstep=5, n_px_side=N_PX, track_variational=False,
                    jit_whole_fit=True,
                    # convergence gates (0 = off): the refit loss scale is
                    # ~1e2-1e3, so ftol=0.3 is ~1e-3 relative — same class
                    # of gate as the headline bench's ftol=1.0 at loss ~4e3
                    mstep_ftol=float(os.environ.get("GPTPU_REFIT_MSTEP_FTOL",
                                                    "0")),
                    estep_tol=float(os.environ.get("GPTPU_REFIT_ESTEP_TOL",
                                                   "0")))

    # Device-resident buffers: in a real active session the pad-and-mask
    # buffers live on device and are updated in place (models/active.py) —
    # re-uploading 42 MB through the dev tunnel per refit is not part of
    # the per-round cost (measured: +0.5 s/refit if left inside the loop).
    x_dev = jnp.asarray(x_buf)
    r_dev = jnp.asarray(r_buf)
    mask_dev = jnp.asarray(mask)

    def run():
        res = fit(x_dev, r_dev, cfg, xtilde=x_dev, theta=theta, f_params=fp,
                  sample_weight=mask_dev)
        np.asarray(res.m_b)   # force materialization through the tunnel
        return res

    # Steady state: the first couple of post-compile dispatches through the
    # dev tunnel carry multi-hundred-ms transients (measured: run 1-2 at
    # ~1-2.2 s, runs 3+ stable at ~0.37 s); an active session dispatches
    # this program hundreds of times, so the median IS the per-round cost.
    res = run()                # compile
    run()                      # absorb post-compile transient
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        res = run()
        times.append(time.perf_counter() - t0)
    elapsed = float(np.median(times))

    # Reduced-rank refit: what the active loop actually dispatches after
    # round 0 (models/active.py:109-134) — the whole-fit program at a static
    # rank budget bucketed from the previous round's kept rank.  Measured
    # separately because it is the steady-state per-round cost of an active
    # session (the full-rank program runs once).
    import dataclasses
    from gaussian_processes_tpu.models.fit import _rank_bucket
    n_eig = int(np.asarray(res.track.n_eigen)[-1])
    budget = _rank_bucket(n_eig + 1, cfg, CAPACITY)
    red_elapsed = None
    if budget < CAPACITY:
        cfg_r = dataclasses.replace(cfg, whole_fit_rank=budget)

        def run_r():
            rr = fit(x_dev, r_dev, cfg_r, xtilde=x_dev, theta=theta,
                     f_params=fp, sample_weight=mask_dev)
            np.asarray(rr.m_b)
            return rr

        run_r()                # compile
        run_r()                # absorb post-compile transient
        times_r = []
        for _ in range(6):
            t0 = time.perf_counter()
            run_r()
            times_r.append(time.perf_counter() - t0)
        red_elapsed = float(np.median(times_r))

    ok = not res.failed
    rec = {
        "metric": "active_loop_refit_ntilde300",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 2) if ok else 0.0,
    }
    if red_elapsed is not None:
        rec["reduced_rank_s"] = round(red_elapsed, 3)
        rec["reduced_rank_budget"] = budget
        rec["reduced_vs_baseline"] = round(BASELINE_SECONDS / red_elapsed, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
