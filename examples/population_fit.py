"""Population fit: every cell in the dataset, one compiled program, one
device mesh.

The reference fits cells one notebook run at a time; here the whole
population runs as a single vmapped + sharded EM program
(parallel/population.py).

Usage:
    python examples/population_fit.py [--ncells 8] [--mesh-cells 4 --mesh-data 2]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncells", type=int, default=8)
    ap.add_argument("--n-px", type=int, default=54)
    ap.add_argument("--nt", type=int, default=400)
    ap.add_argument("--ntilde", type=int, default=200)
    ap.add_argument("--maxiter", type=int, default=5)
    ap.add_argument("--mesh-cells", type=int, default=None)
    ap.add_argument("--mesh-data", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.data import synthetic_retina
    from gaussian_processes_tpu.parallel import make_mesh, fit_population

    ds = synthetic_retina(n_px_side=args.n_px, n_train=args.nt, n_val=10,
                          n_test=10, n_repeats=10, n_cells=args.ncells,
                          seed=0)
    X, R = ds.full_train()
    X = jnp.asarray(X)
    R = jnp.asarray(R.T)          # (ncells, nt)

    cfg = FitConfig(ntilde=min(args.ntilde, X.shape[0]),
                    maxiter=args.maxiter, n_estep=5, n_mstep=3,
                    n_fparamstep=5, n_px_side=args.n_px,
                    track_variational=False)

    mesh = None
    if args.mesh_cells or args.mesh_data or len(jax.devices()) > 1:
        mesh = make_mesh(n_cells_axis=args.mesh_cells,
                         n_data_axis=args.mesh_data)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    t0 = time.perf_counter()
    carry, _ = fit_population(X, R, cfg, mesh=mesh)
    jax.block_until_ready(carry.m_b)
    elapsed = time.perf_counter() - t0

    loss = -np.asarray(carry.track.logmarginal)
    print(f"{args.ncells} cells fit in {elapsed:.2f}s "
          f"({elapsed / args.ncells:.2f}s/cell)")
    for c in range(args.ncells):
        print(f"  cell {c}: loss {loss[c, 0]:.1f} -> {loss[c, -1]:.1f}  "
              f"failed={bool(carry.failed[c])}")


if __name__ == "__main__":
    main()
