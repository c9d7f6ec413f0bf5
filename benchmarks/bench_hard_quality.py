"""Gate re-qualification on the HARD validation regime (round 4).

The headline bench's convergence gates (mstep_ftol / estep_tol / zoom
budget) were originally validated on the easy planted-RF synthetic data,
where the noise-corrected r^2 saturates at ~1.0 — a metric at its ceiling
cannot rank fits.  The reference's entire quality story lives at
r^2 = 0.72 +/- 0.04 on real retinal data (one_cell_fit.ipynb:cell8 output;
utils.py:1502-1541).  This script runs the full gate ladder on
``data.synthetic_retina_hard`` — model-mismatched (DoG RF + energy
component), correlated stimuli, low SNR — where r^2 CAN drop, and prints
one JSON line per configuration:

    {"name": ..., "mstep_ftol": ..., "estep_tol": ..., "max_ls": ...,
     "wallclock_s": ..., "final_loss": ..., "r2": ..., "r2_sigma": ...}

Shapes and all non-gate knobs are shared with bench.py (same compiled
programs -> .jax_cache hits).  Usage:

    python benchmarks/bench_hard_quality.py [ladder|exact|gated|mid ...]

Default runs the full ladder: exact, ftol-only, gated (bench default),
mid, tight-zoom variants.
"""

import json
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")

import numpy as np

# The gate ladder (VERDICT round-3 item 1): exact semantics vs the shipped
# bench preset vs intermediate points.  max_ls=15 is the FitConfig default
# zoom budget; 4 is the bench preset's.
LADDER = {
    "exact":      dict(mstep_ftol=0.0, estep_tol=0.0,  max_linesearch_steps=15),
    "ftol_only":  dict(mstep_ftol=1.0, estep_tol=0.0,  max_linesearch_steps=15),
    "mid":        dict(mstep_ftol=0.3, estep_tol=1e-3, max_linesearch_steps=8),
    "gated":      dict(mstep_ftol=1.0, estep_tol=1e-3, max_linesearch_steps=4),
    "gated_ls8":  dict(mstep_ftol=1.0, estep_tol=1e-3, max_linesearch_steps=8),
    # Relative-gate candidates (round 4): |f - f_prev| < ftol_rel * |f|
    # transfers across loss scales where the absolute ftol=1.0 did not.
    # Run with the dynamic schedule (the bench pins are tuned to the easy
    # workload; on hard data the static check re-runs dynamically anyway,
    # polluting wallclock with a doubled fit).
    "exact_dyn":  dict(mstep_ftol=0.0, estep_tol=0.0, max_linesearch_steps=15,
                       static_schedule=False),
    "ls4_only":   dict(mstep_ftol=0.0, estep_tol=0.0, max_linesearch_steps=4,
                       static_schedule=False),
    # round 5: seed 1 measures ls4 at r2 0.588 vs exact 0.730 (-24 sigma) —
    # the zoom-budget-4 under-convergence is seed-dependent; ls8 is the
    # candidate repair rung
    "ls8_only":   dict(mstep_ftol=0.0, estep_tol=0.0, max_linesearch_steps=8,
                       static_schedule=False),
    "rel_only":   dict(mstep_ftol=0.0, mstep_ftol_rel=1e-4, estep_tol=0.0,
                       max_linesearch_steps=4, static_schedule=False),
    "estep_only": dict(mstep_ftol=0.0, estep_tol=1e-3,
                       max_linesearch_steps=15, static_schedule=False),
    "rel_1e-4":   dict(mstep_ftol=0.0, mstep_ftol_rel=1e-4, estep_tol=1e-3,
                       max_linesearch_steps=4, static_schedule=False),
    "rel_3e-4":   dict(mstep_ftol=0.0, mstep_ftol_rel=3e-4, estep_tol=1e-3,
                       max_linesearch_steps=4, static_schedule=False),
    "rel_1e-3":   dict(mstep_ftol=0.0, mstep_ftol_rel=1e-3, estep_tol=1e-3,
                       max_linesearch_steps=4, static_schedule=False),
}


def make_hard_problem(seed=0):
    """One hard cell at the bench shapes (3,160 train images of 108x108,
    30x30 test repeats)."""
    from gaussian_processes_tpu.data import synthetic_retina_hard
    ds = synthetic_retina_hard(n_cells=1, seed=seed)
    X, R = ds.full_train()
    Xte, _ = ds.test()
    Rte = ds.responses_test[:, :, 0]      # (nrep, nimg)
    return (X.astype(np.float32), R[:, 0].astype(np.float32),
            Xte.reshape(Xte.shape[0], -1).astype(np.float32),
            Rte.astype(np.float32), ds)


def run_one(name, overrides, X, R, Xte, Rte,
            warm=bool(int(os.environ.get("GPTPU_HARD_WARM", "1")))):
    import jax
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models.fit import fit
    from gaussian_processes_tpu.models.inference import evaluate
    from gaussian_processes_tpu.params import (default_f_params,
                                               generate_theta, get_sta)
    import bench

    cfg = dataclasses.replace(bench.make_config(FitConfig), **overrides)

    Xd = jnp.asarray(X)
    Rd = jnp.asarray(R)
    key = jax.random.PRNGKey(0)
    idx = jax.random.permutation(key, X.shape[0])[:cfg.ntilde]
    xtilde = Xd[idx]

    # STA init, as the reference's generate_theta does (utils.py:736-857):
    # peak pixel -> RF center in [-1, 1] coordinates
    sta, _, (row, col) = get_sta(Xd, Rd, cfg.n_px_side)
    lin = np.linspace(-1, 1, cfg.n_px_side)
    theta, _, _ = generate_theta(
        Xd, Rd, cfg.n_px_side,
        eps_0x=float(lin[int(col)]), eps_0y=float(lin[int(row)]))
    f_params = default_f_params()

    def go():
        res = fit(Xd, Rd, cfg, xtilde=xtilde, theta=theta, f_params=f_params)
        jax.block_until_ready(res.m_b)
        return res

    if warm:
        go()
    t0 = time.perf_counter()
    res = go()
    elapsed = time.perf_counter() - t0

    loss = np.asarray(res.track.logmarginal)
    _, _, r2, s2 = evaluate(res, jnp.asarray(Xte), jnp.asarray(Rte),
                            nbootstrap=200)
    rec = {"name": name, **overrides,
           "wallclock_s": round(elapsed, 3),
           "final_loss": round(float(-loss[-1]), 2),
           "init_loss": round(float(-loss[0]), 2),
           "r2": round(float(r2), 4), "r2_sigma": round(float(s2), 4),
           "failed": bool(res.failed)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.dirname(os.path.abspath(__file__))),
                              ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    names = sys.argv[1:] or ["ladder"]
    if names == ["ladder"]:
        names = list(LADDER)
    seed = int(os.environ.get("GPTPU_HARD_SEED", "0"))
    X, R, Xte, Rte, ds = make_hard_problem(seed)
    lam = ds.ground_truth_rates_test[:, 0]
    print(f"[hard] mean train rate {R.mean():.2f} spk/img; "
          f"test rate mean {lam.mean():.2f}", file=sys.stderr)
    if int(os.environ.get("GPTPU_HARD_ORACLE", "1")):
        # oracle: true rate as predictor — the noise-correction sanity
        # check (bench.py's gate sets GPTPU_HARD_ORACLE=0: the oracle is
        # seed-determined and already recorded; skipping saves its eval
        # inside the bench budget)
        from gaussian_processes_tpu.models.inference import explained_variance
        r2o, s2o = explained_variance(Rte, lam, nbootstrap=200)
        print(f"[hard] oracle (true-rate) r2 = {float(r2o):.3f} "
              f"+/- {float(s2o):.3f}", file=sys.stderr)
    for name in names:
        run_one(name, LADDER[name], X, R, Xte, Rte)


if __name__ == "__main__":
    main()
