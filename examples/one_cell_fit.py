"""Single-cell spatial-GP fit — the ``one_cell_fit.ipynb`` workflow as a
script.

Loads (or synthesizes) a dataset, fits one retinal ganglion cell with the EM
trainer, evaluates reliability-corrected r^2 on the repeated test set, and
saves the model + training dashboard.

Usage:
    python examples/one_cell_fit.py [--cellid 0] [--ntilde 200]
        [--maxiter 10] [--data path/to/dataset.pkl] [--out models/cell0]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cellid", type=int, default=0)
    ap.add_argument("--ntilde", type=int, default=200)
    ap.add_argument("--maxiter", type=int, default=10)
    ap.add_argument("--n-estep", type=int, default=10)
    ap.add_argument("--n-mstep", type=int, default=10)
    ap.add_argument("--n-fparamstep", type=int, default=10)
    ap.add_argument("--data", type=str, default=None,
                    help="Dataset pickle; synthetic retina if omitted")
    ap.add_argument("--n-px", type=int, default=108)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from gaussian_processes_tpu.config import FitConfig, default_dtype
    from gaussian_processes_tpu.data import Dataset, synthetic_retina
    from gaussian_processes_tpu.models.fit import fit
    from gaussian_processes_tpu.models.inference import evaluate
    from gaussian_processes_tpu.utils.guards import print_hyp

    dtype = default_dtype()
    if args.data:
        ds = Dataset.load(args.data)
    else:
        print("No --data given; generating a synthetic retina "
              "(matching the reference dataset's shapes)")
        ds = synthetic_retina(n_px_side=args.n_px, n_train=1000, n_val=100,
                              n_test=30, n_repeats=30, seed=args.seed)

    X, R = ds.full_train()
    r = R[:, args.cellid]
    X = jnp.asarray(X, dtype)
    r = jnp.asarray(r, dtype)

    cfg = FitConfig(ntilde=min(args.ntilde, X.shape[0]),
                    maxiter=args.maxiter, n_estep=args.n_estep,
                    n_mstep=args.n_mstep, n_fparamstep=args.n_fparamstep,
                    n_px_side=ds.px_x, cellid=args.cellid,
                    jit_whole_fit=False)

    t0 = time.perf_counter()
    res = fit(X, r, cfg, seed=args.seed)
    elapsed = time.perf_counter() - t0
    print(f"\nFit finished in {elapsed:.2f}s "
          f"(failed={res.failed} at {res.failed_at})")
    loss = -np.asarray(res.track.logmarginal)
    print(f"Loss: {loss[0]:.2f} -> {loss[-1]:.2f}")
    print_hyp(res.theta)

    X_test, _ = ds.test(averages=False)
    R_test = ds.responses_test
    _, rates, r2, s = evaluate(res, X_test, R_test, cellid=args.cellid)
    print(f"\nr2 = {float(r2):.2f} +/- {float(s):.2f} "
          f"(cell {args.cellid}, maxiter={cfg.maxiter}, "
          f"nEstep={cfg.n_estep}, nMstep={cfg.n_mstep})")

    if args.out:
        from gaussian_processes_tpu.utils.io import save_model
        save_model(res, args.out,
                   additional_description=f"r2 = {float(r2):.2f}")
        print(f"Saved model to {args.out}")


if __name__ == "__main__":
    main()
