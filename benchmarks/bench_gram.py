"""Gram-construction throughput benchmark (the BASELINE.json TFLOP/s
metric): K_tilde + K + Kvec at the reference's working shapes, XLA path vs
the fused Pallas kernel.

Prints one JSON line (XLA path; the Pallas comparison goes to stderr).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT, NTILDE, N_PX = 3160, 2100, 108


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    from functools import partial
    from gaussian_processes_tpu.ops.kernels import gram_matrices

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((NT, N_PX * N_PX)), jnp.float32)
    xtilde = X[:NTILDE]
    theta = {k: jnp.float32(v) for k, v in [
        ("sigma_0", 1.0), ("eps_0x", 1e-4), ("eps_0y", 1e-4),
        ("-2log2beta", -2 * np.log(0.2)), ("-log2rho2", -np.log(0.02)),
        ("Amp", 1.0)]}

    nx = N_PX * N_PX
    # useful FLOPs: cross products + smoothing passes
    flops = (2 * NT * NTILDE * nx + 2 * NTILDE * NTILDE * nx
             + 2 * (NT + NTILDE) * 2 * N_PX ** 3)

    results = {}
    for backend in ("xla", "pallas"):
        fn = jax.jit(partial(gram_matrices, n_px_side=N_PX, shared=False,
                             backend=backend))
        def force(o):
            return sum(float(jnp.sum(t)) for t in o)
        try:
            out = fn(theta, X, xtilde)
            force(out)
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                out = fn(theta, X, xtilde)
                force(out)
            dt = (time.perf_counter() - t0) / n
            results[backend] = (dt, flops / dt / 1e12)
            print(f"{backend}: {dt*1000:.1f} ms  {flops/dt/1e12:.1f} TFLOP/s",
                  file=sys.stderr)
        except Exception as e:  # pallas may be unavailable off-TPU
            print(f"{backend}: failed ({type(e).__name__})", file=sys.stderr)

    best = min(results.values()) if results else (float("inf"), 0.0)
    print(json.dumps({
        "metric": "gram_construction_3160x2100x11664",
        "value": round(best[1], 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(best[1], 2),   # reference publishes no number
    }))


if __name__ == "__main__":
    main()
