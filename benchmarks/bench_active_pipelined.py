"""End-to-end pipelined active-loop benchmark (round 4, VERDICT item 6).

The question: what does ACQUISITION add to a closed-loop round in practice?
The reference pays ~0.02 s per scoring pass on the lab GPU
(one_cell_active_training.ipynb:cell13); round 3 measured our synchronous
scorer call at ~52 ms through the dev tunnel (2.2 ms of device time +
~50 ms of per-dispatch round trip).  ``active_loop_pipelined`` keeps
selection/growth/warm-start ON DEVICE so the host never reads the
utilities; the tunnel round trip disappears from the round's critical path.

Method: run the SAME pipelined loop with select="utility" and
select="random" (identical refit/growth structure; the random arm has no
scorer), same seeds and start set, and compare total wall-clock per round.
The delta IS the end-to-end acquisition cost.  Also runs the host
(active_loop) utility arm for the before/after comparison.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")

N_PX = 108
NPOOL = 2400
N_START = 250
N_ADD = int(os.environ.get("GPTPU_PIPE_NADD", "24"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models.active import (active_loop,
                                                      active_loop_pipelined)

    rng = np.random.default_rng(0)
    X = rng.standard_normal((NPOOL, N_PX * N_PX)).astype(np.float32)
    lin = np.linspace(-1, 1, N_PX)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-(xx ** 2 + yy ** 2) / (2 * 0.1 ** 2)).ravel()
    w /= np.linalg.norm(w)
    R = rng.poisson(np.exp(0.8 * X @ w)).astype(np.float32)

    theta = {k: jnp.float32(v) for k, v in [
        ("sigma_0", 1.0), ("eps_0x", 1e-4), ("eps_0y", 1e-4),
        ("-2log2beta", -2 * np.log(0.2)), ("-log2rho2", -np.log(0.02)),
        ("Amp", 1.0)]}
    fp = {"logA": jnp.float32(np.log(0.01)), "lambda0": jnp.float32(1.0)}
    cfg = FitConfig(maxiter=10, n_estep=5, n_mstep=5, n_fparamstep=5,
                    n_px_side=N_PX, track_variational=False,
                    jit_whole_fit=True,
                    mstep_ftol=float(os.environ.get("GPTPU_REFIT_MSTEP_FTOL",
                                                    "0.3")),
                    estep_tol=float(os.environ.get("GPTPU_REFIT_ESTEP_TOL",
                                                   "1e-3")))
    start = np.arange(N_START)
    kw = dict(start_idx=start, n_add=N_ADD, cfg=cfg, theta=dict(theta),
              f_params=dict(fp), seed=0)

    def run(fn, select, **extra):
        # warm-up pass compiles every program (fit full-rank + reduced-rank,
        # scorer, grow) at these shapes
        fn(np.asarray(X), R, select=select, **kw, **extra)
        t0 = time.perf_counter()
        out = fn(np.asarray(X), R, select=select, **kw, **extra)
        return out, (time.perf_counter() - t0) / (N_ADD + 1)

    _, s_rand = run(active_loop_pipelined, "random")
    out_u, s_util = run(active_loop_pipelined, "utility")
    _, s_host = run(active_loop, "utility")

    acq_ms = (s_util - s_rand) * 1000.0
    ok = not out_u.final_fit.failed and np.all(np.isfinite(out_u.utilities))
    print(f"[pipelined] per-round: utility {s_util*1000:.1f} ms, "
          f"random {s_rand*1000:.1f} ms, host-loop utility "
          f"{s_host*1000:.1f} ms -> acquisition adds {acq_ms:.1f} ms "
          f"(host loop adds {(s_host - s_rand)*1000:.1f} ms)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "pipelined_acquisition_cost_per_round",
        "value": round(acq_ms, 2),
        "unit": "ms",
        # reference: 20 ms scorer pass per round on the lab GPU
        "vs_baseline": round(20.0 / acq_ms, 2) if ok and acq_ms > 0 else 0.0,
        "round_s_utility": round(s_util, 4),
        "round_s_random": round(s_rand, 4),
        "round_s_host_loop": round(s_host, 4),
    }))


if __name__ == "__main__":
    main()
