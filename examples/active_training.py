"""Closed-loop active training — the ``one_cell_active_training.ipynb``
workflow as a script, including the active-vs-random A/B control
(reference cell19/cell23).

Usage:
    python examples/active_training.py [--n-start 50] [--n-add 50]
        [--ab-control] [--seeds 3]
"""

import argparse

import numpy as np


def run_one(select, X, R, start_idx, args, theta0, fp0, Xt, Rt, cfg, seed):
    import jax.numpy as jnp
    from gaussian_processes_tpu.models.active import active_loop
    return active_loop(
        X, R, start_idx=start_idx, n_add=args.n_add, cfg=cfg,
        theta={k: jnp.asarray(v) for k, v in theta0.items()},
        f_params={k: jnp.asarray(v) for k, v in fp0.items()},
        select=select, X_test=Xt, R_test=Rt, nbootstrap=200,
        seed=seed, verbose=args.verbose)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cellid", type=int, default=0)
    ap.add_argument("--n-start", type=int, default=50)
    ap.add_argument("--n-add", type=int, default=25)
    ap.add_argument("--n-px", type=int, default=54)
    ap.add_argument("--npool", type=int, default=600)
    ap.add_argument("--maxiter", type=int, default=6)
    ap.add_argument("--ab-control", action="store_true",
                    help="also run random-selection baseline")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.data import synthetic_retina

    ds = synthetic_retina(n_px_side=args.n_px, n_train=args.npool,
                          n_val=10, n_test=20, n_repeats=20,
                          n_cells=3, seed=0)
    X, R_all = ds.full_train()
    R = R_all[:, args.cellid]
    Xt = np.asarray(ds.images_test).reshape(ds.images_test.shape[0], -1)
    Rt = ds.responses_test[:, :, args.cellid]

    theta0 = {"sigma_0": 1.0, "eps_0x": 0.0001, "eps_0y": 0.0001,
              "-2log2beta": -2 * np.log(2 * 0.1),
              "-log2rho2": -np.log(2 * 0.05 ** 2), "Amp": 1.0}
    fp0 = {"logA": np.log(0.01), "lambda0": 1.0}
    cfg = FitConfig(maxiter=args.maxiter, n_estep=5, n_mstep=3,
                    n_fparamstep=5, n_px_side=args.n_px,
                    track_variational=False, jit_whole_fit=True)

    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        start_idx = rng.permutation(X.shape[0])[:args.n_start]

        out = run_one("utility", X, R, start_idx, args, theta0, fp0,
                      Xt, Rt, cfg, seed)
        print(f"[seed {seed}] ACTIVE  r2: "
              f"{out.r2_history[0]:.3f} -> {out.r2_history[-1]:.3f} "
              f"({len(out.selected_idx)} images added)")

        if args.ab_control:
            out_r = run_one("random", X, R, start_idx, args, theta0, fp0,
                            Xt, Rt, cfg, seed)
            print(f"[seed {seed}] RANDOM  r2: "
                  f"{out_r.r2_history[0]:.3f} -> {out_r.r2_history[-1]:.3f}")


if __name__ == "__main__":
    main()
