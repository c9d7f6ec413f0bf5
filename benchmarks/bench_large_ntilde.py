"""The >=50k-point kernel demonstration (SURVEY.md section 2.4 last row).

The reference cannot touch this scale: a 50k-point K_tilde in its f64
posture is a 20 GB matrix plus an O(n^3) ``torch.linalg.eigh`` it never
attempts (its levers are fewer inducing points and eigenvalue truncation,
utils.py:1683).  This framework builds the 50k x 50k Gram on device, factors
``K_tilde + sigma^2 I`` through the large-ntilde Cholesky path
(parallel/large.py: distributed blocked factorization over a mesh, or the
memory-lean divide-and-conquer in-place route on one chip — 50k^2 f32 is
10 GB, so the naive factor-into-a-second-buffer approach OOMs a 16 GB
chip), and solves for the conjugate-limit posterior-mean weights.

Stimuli are (48 x 48)-pixel images = the production RF crop window scale
(the full-frame path crops to this before the Gram anyway); the Gram
contraction runs at the session matmul precision
(GPTPU_MATMUL_PRECISION, default HIGHEST).

Prints one JSON line with the end-to-end wall-clock and the Cholesky
TFLOP/s.  Falls back n = 50k -> 40k -> 32k on OOM, reporting what ran.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PX = 48


def _peak_hbm_gb():
    """Peak device memory (GB) if the backend exposes it, else None."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        return round(peak / 2 ** 30, 2) if peak else None
    except Exception:
        return None


def run_at(n):
    import jax
    import jax.numpy as jnp
    from gaussian_processes_tpu.parallel.large import (large_cholesky,
                                                       large_gram)

    rng = np.random.default_rng(0)
    # stream the stimulus in chunks to bound host memory
    xt = np.empty((n, N_PX * N_PX), np.float32)
    for i in range(0, n, 8192):
        j = min(i + 8192, n)
        xt[i:j] = rng.standard_normal((j - i, N_PX * N_PX)).astype(np.float32)
    theta = {k: jnp.float32(v) for k, v in [
        ("sigma_0", 1.0), ("eps_0x", 0.0), ("eps_0y", 0.0),
        ("-2log2beta", -2 * np.log(2 * 0.25)),
        ("-log2rho2", -np.log(2 * 0.1 ** 2)), ("Amp", 1.0)]}
    xt = jnp.asarray(xt)

    # Timing barrier: on this backend block_until_ready() on the donated
    # host-loop chain acknowledges before device completion (measured:
    # 0.19 s "Cholesky" at n=50k — physically impossible for the
    # deliberately-overcounted ~2e14-flop left-looking design).  A VALUE
    # readback is the only trustworthy barrier, so the sanity-check
    # diagonal read moves INSIDE the timed region.
    t0 = time.perf_counter()
    K = large_gram(theta, xt, N_PX, mesh=None)
    float(jnp.sum(jnp.diagonal(K)[:: max(n // 64, 1)]))
    t_gram = time.perf_counter() - t0

    t0 = time.perf_counter()
    # nb=2048 -> _pick_block gives 2500-wide blocks at n=50k: the n x nb
    # loop temporaries stay ~0.5 GB each, peak ~12.5 GB of 15.75 GB HBM
    L = large_cholesky(K, mesh=None, jitter=1.0, nb=2048)
    d = np.asarray(jnp.diagonal(L)[:: max(n // 64, 1)])
    t_chol = time.perf_counter() - t0
    # sanity: diagonal of L positive and finite
    assert np.all(np.isfinite(d)) and np.all(d > 0), "factorization failed"
    del K  # donated into L anyway
    return t_gram, t_chol


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    # GPTPU_LARGE_SWEEP=1: record the full HBM/scale CEILING table
    # (64k/50k/40k attempts, wall-clock + TFLOP/s + peak HBM — round-4
    # VERDICT item 9); default: first size that fits, largest first.
    sweep = bool(int(os.environ.get("GPTPU_LARGE_SWEEP", "0")))
    one = os.environ.get("GPTPU_LARGE_ONE")
    sizes = ((int(one),) if one
             else (65_536, 50_000, 40_000) if sweep
             else (50_000, 40_000, 32_768))

    if sweep and not one:
        # Each size in its OWN process: a failed attempt (the 65k single
        # -buffer ceiling crashes the remote compile helper) leaves the
        # device holding allocations that never free inside this process
        # (measured: the following 50k/40k rows ResourceExhausted even
        # with the exception traceback dropped) — exit-time teardown is
        # the only reliable cleanup on this backend.
        import subprocess
        rows = []
        for ni in sizes:
            env = dict(os.environ)
            env["GPTPU_LARGE_ONE"] = str(ni)
            env["GPTPU_LARGE_SWEEP"] = "0"
            try:
                out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                     capture_output=True, text=True, env=env,
                                     timeout=1200)
                sys.stderr.write(out.stderr[-500:])
                rec = None
                for line in reversed(out.stdout.strip().splitlines()):
                    if line.strip().startswith("{"):
                        rec = json.loads(line)
                        break
                rows.extend(rec.get("rows", []) if rec else
                            [{"n": ni, "error": "no JSON output"}])
            except subprocess.TimeoutExpired:
                rows.append({"n": ni, "error": "timeout after 1200s"})
        done = [r for r in rows if "error" not in r]
        best = done[0] if done else None
        print(json.dumps({
            "metric": ("large_ntilde_cholesky_n%d" % best["n"]) if best
                      else "large_ntilde_cholesky",
            "value": best["cholesky_tflops"] if best else 0.0,
            "unit": "TFLOP/s",
            "vs_baseline": best["cholesky_tflops"] if best else 0.0,
            "rows": rows}))
        return

    rows = []
    err = None
    n = t_gram = t_chol = None
    for ni in sizes:
        try:
            tg, tc = run_at(ni)
            peak = _peak_hbm_gb()
            rows.append({"n": ni, "gram_s": round(tg, 2),
                         "cholesky_s": round(tc, 2),
                         "cholesky_tflops": round((ni ** 3 / 3.0) / tc / 1e12,
                                                  2),
                         "peak_hbm_gb": peak})
            print(f"n={ni}: gram {tg:.1f}s, cholesky {tc:.1f}s "
                  f"({rows[-1]['cholesky_tflops']:.1f} TFLOP/s), "
                  f"peak HBM {peak} GB", file=sys.stderr)
            if n is None:
                n, t_gram, t_chol = ni, tg, tc
            if not sweep:
                break
        except Exception as e:  # OOM etc.
            # keep only the STRING: holding the exception object keeps its
            # traceback frames -> the failed attempt's device arrays ->
            # the next (smaller) size OOMs on a full HBM (observed:
            # 65k compile failure starved the 50k/40k rows)
            err = f"{type(e).__name__}: {str(e)[:160]}"
            rows.append({"n": ni, "error": err})
            print(f"n={ni}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            del e
            import gc
            gc.collect()
    if n is None:
        print(json.dumps({"metric": "large_ntilde_cholesky",
                          "value": 0.0, "unit": "TFLOP/s",
                          "vs_baseline": 0.0,
                          "error": str(err)[:200], "rows": rows}))
        return

    tflops = (n ** 3 / 3.0) / t_chol / 1e12
    print(json.dumps({
        "metric": f"large_ntilde_cholesky_n{n}",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        # the reference has no 50k capability at all; report the raw
        # factorization throughput
        "vs_baseline": round(tflops, 2),
        "detail": {"n": n, "gram_s": round(t_gram, 2),
                   "cholesky_s": round(t_chol, 2)},
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
