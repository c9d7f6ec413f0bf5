"""Active-vs-random A/B on the HARD validation regime (round 5).

The reference's stored scientific capstone is a learning-curve comparison:
active (information-maximizing) stimulus selection beats random selection
from identical starting models, 8 seeds, r2 rising 0.27 -> 0.54 as images
accrue (one_cell_active_training.ipynb:cell19/cell23; selection utility
utils.py:416-525).  This repo has the full capability (models/active.py)
but round 4 only smoke-tested it at toy shapes.  This script runs the A/B
on ``data.synthetic_retina_hard`` — the regime whose r2 can actually rank
fits (easy planted-RF r2 saturates at ~1.0) — and records the learning
curves.

Protocol: per seed, draw a random 50-image starting set from the 3,160
hard-regime stimuli; run both arms from it (active_loop select="utility"
vs "random"), adding GPTPU_AB_NADD images with a refit each round
(maxiter=10 whole-fit program, the active-session configuration of
bench_active_refit.py), tracking held-out r2 (30 images x 30 repeats,
nbootstrap=100) after every refit.

Prints one JSON line per (seed, arm) with the r2 trajectory, then one
summary line with per-checkpoint active-minus-random gaps averaged over
seeds.

Usage:
    python benchmarks/ab_active_vs_random_hard.py          # seeds 0,1,2
    GPTPU_AB_SEEDS=0 GPTPU_AB_NADD=100 python ...          # one seed
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")

import numpy as np

N_START = int(os.environ.get("GPTPU_AB_NSTART", "50"))
N_ADD = int(os.environ.get("GPTPU_AB_NADD", "150"))


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.data import synthetic_retina_hard
    from gaussian_processes_tpu.models.active import active_loop

    seeds = [int(s) for s in
             os.environ.get("GPTPU_AB_SEEDS", "0,1,2").split(",")]

    # The active-session fit configuration (bench_active_refit.py): one
    # whole-fit compiled program reused for every round of every arm/seed.
    cfg = FitConfig(
        maxiter=10, n_estep=5, n_mstep=5, n_fparamstep=5, n_px_side=108,
        track_variational=False, jit_whole_fit=True,
        mstep_ftol_rel=1e-4, estep_tol=1e-3)

    curves = {"active": [], "random": []}
    for seed in seeds:
        ds = synthetic_retina_hard(n_cells=1, seed=seed)
        X, R = ds.full_train()
        X_pool = jnp.asarray(X.astype(np.float32))
        R_pool = R[:, 0].astype(np.float32)
        X_test = jnp.asarray(
            ds.images_test.reshape(ds.images_test.shape[0], -1)
            .astype(np.float32))
        R_test = jnp.asarray(ds.responses_test[:, :, 0].astype(np.float32))

        rng = np.random.default_rng(seed)
        start_idx = rng.permutation(X.shape[0])[:N_START]

        for arm, select in (("active", "utility"), ("random", "random")):
            t0 = time.perf_counter()
            res = active_loop(
                X_pool, R_pool, start_idx=start_idx, n_add=N_ADD, cfg=cfg,
                select=select, X_test=X_test, R_test=R_test,
                nbootstrap=100, seed=seed)
            wall = time.perf_counter() - t0
            curves[arm].append(res.r2_history)
            rec = {"seed": seed, "arm": arm, "n_start": N_START,
                   "n_add": N_ADD, "wallclock_s": round(wall, 1),
                   "r2_start": round(res.r2_history[0], 4),
                   "r2_final": round(res.r2_history[-1], 4),
                   "r2_history": [round(v, 4) for v in res.r2_history],
                   "r2_sigma_history": [round(v, 4)
                                        for v in res.r2_sigma_history]}
            print(json.dumps(rec), flush=True)

    # summary: active-minus-random r2 gap at checkpoints, averaged over seeds
    act = np.asarray(curves["active"])      # (nseed, nround+1)
    rnd = np.asarray(curves["random"])
    gap = act - rnd
    checkpoints = [c for c in (25, 50, 75, 100, 150) if c <= N_ADD]
    summary = {
        "metric": "active_vs_random_hard",
        "seeds": seeds,
        "r2_gap_mean_at_round": {str(c): round(float(gap[:, c].mean()), 4)
                                 for c in checkpoints},
        "r2_gap_sem_at_round": {
            str(c): round(float(gap[:, c].std(ddof=1)
                                / np.sqrt(max(len(seeds) - 1, 1))), 4)
            for c in checkpoints},
        "active_final_mean": round(float(act[:, -1].mean()), 4),
        "random_final_mean": round(float(rnd[:, -1].mean()), 4),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
