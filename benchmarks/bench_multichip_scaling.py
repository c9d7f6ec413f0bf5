"""Multi-chip population scale-out measurement (round 4, VERDICT item 5).

The dryrun gate (__graft_entry__.dryrun_multichip) proves the sharded
population program compiles, executes, and matches the unsharded run at
rtol 1e-6 — a boolean.  This script measures WHAT the sharding actually
buys, on the virtual 8-device CPU mesh:

* **per-device FLOPs** from XLA's compiled cost analysis — the direct
  evidence that the Gram/E-step work is split across the mesh (a sharding
  annotation that silently replicates shows ~1x per-device flops, not
  ~1/N);
* **collective ops** counted in the optimized per-device HLO (all-reduce /
  all-gather / reduce-scatter / collective-permute) — the communication
  the split costs;
* wall-clock per config, reported with the caveat that N virtual CPU
  devices share the same physical cores (flops division, not wall-clock,
  is the scaling evidence this host can produce; real-ICI scaling needs a
  pod).

Self-bootstraps the CPU mesh in a subprocess like the dryrun gate.
Prints one JSON line with a row per mesh config.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

N_DEV = int(os.environ.get("GPTPU_SCALING_DEVICES", "8"))


def bootstrap():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    xla = env.get("XLA_FLAGS", "")
    xla = " ".join(f for f in xla.split()
                   if not f.startswith("--xla_force_host_platform_device_count"))
    env["XLA_FLAGS"] = (
        xla + f" --xla_force_host_platform_device_count={N_DEV}").strip()
    env["GPTPU_SCALING_INNER"] = "1"
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   cwd=ROOT, check=True)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.parallel import make_mesh, fit_population

    # CPU-feasible population shapes with a real Gram contraction
    n_px, nt, ntilde, ncells = 32, 1024, 128, 8
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((nt, n_px * n_px)), jnp.float32)
    lin = np.linspace(-1, 1, n_px)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.2) ** 2 + (yy + 0.1) ** 2) / (2 * 0.15 ** 2)).ravel()
    w = w / np.linalg.norm(w)
    lam = np.exp(0.6 * np.asarray(X, np.float64) @ w)
    R = jnp.asarray(rng.poisson(lam[None, :].repeat(ncells, 0)), jnp.float32)
    key = jax.random.PRNGKey(0)
    xtilde = X[jax.random.permutation(key, nt)[:ntilde]]
    cfg = FitConfig(ntilde=ntilde, maxiter=3, n_estep=3, n_mstep=3,
                    n_fparamstep=3, n_px_side=n_px, track_variational=False)

    meshes = {
        "unsharded_1dev": None,
        "cells8": make_mesh(n_cells_axis=8, n_data_axis=1),
        "cells4_data2": make_mesh(n_cells_axis=4, n_data_axis=2),
        "cells2_data4": make_mesh(n_cells_axis=2, n_data_axis=4),
        "data8": make_mesh(n_cells_axis=1, n_data_axis=8),
    }

    import re
    rows = {}
    base_flops = None
    for name, mesh in meshes.items():
        (jitted, args), _ = fit_population(X, R, cfg, xtilde=xtilde,
                                           mesh=mesh, lower_only=True)
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        txt = compiled.as_text()
        colls = {op: len(re.findall(rf"\b{op}\b", txt))
                 for op in ("all-reduce", "all-gather", "reduce-scatter",
                            "collective-permute")}
        # warm run + timed run (virtual devices share cores: wall-clock is
        # indicative only)
        out = jitted(*args)
        jax.block_until_ready(out.m_b)
        t0 = time.perf_counter()
        out = jitted(*args)
        jax.block_until_ready(out.m_b)
        wall = time.perf_counter() - t0
        assert np.all(np.isfinite(np.asarray(out.track.logmarginal)))
        if name == "unsharded_1dev":
            base_flops = flops
        rows[name] = {
            "per_device_flops": flops,
            "flops_fraction_of_unsharded": (round(flops / base_flops, 4)
                                            if base_flops else None),
            "collectives": {k: v for k, v in colls.items() if v},
            "wall_s_virtual": round(wall, 3),
        }
        print(f"[scaling] {name}: per-device flops {flops:.3e} "
              f"({rows[name]['flops_fraction_of_unsharded']}x of unsharded), "
              f"collectives {rows[name]['collectives']}, "
              f"wall {wall:.2f}s", file=sys.stderr)

    # the headline scaling number: per-device flops fraction at the full
    # 2-D mesh vs the ideal 1/8
    frac = rows["cells4_data2"]["flops_fraction_of_unsharded"]
    print(json.dumps({
        "metric": "population_sharding_flops_fraction_cells4_data2",
        "value": frac,
        "unit": "x_of_unsharded(ideal=0.125)",
        "vs_baseline": round(0.125 / frac, 3) if frac else 0.0,
        "rows": rows,
    }))


if __name__ == "__main__":
    if os.environ.get("GPTPU_SCALING_INNER"):
        main()
    else:
        bootstrap()
