"""A/B measurement for GPTPU_GRAD_PRECISION (VERDICT round-2 item 10).

bench.py defaults the M-step *gradient* matmuls to single-pass bf16
(GPTPU_GRAD_PRECISION=default) on the argument that the gradient only
steers the line search.  This script measures that claim at the headline
configuration: it runs the bench fit once with gradient matmuls at
"highest" (bit-identical to full-precision autodiff) and once at "default",
in separate subprocesses (the knob binds at import), and reports

* the max relative deviation of the tracked loss trajectory,
* the relative deviation of the final loss,
* the wall-clock of each run,

appending the numbers to stdout for transfer into docs/numerics.md.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join({root!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import bench
from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import fit

X, R = bench.make_data()
X = jnp.asarray(X); R = jnp.asarray(R)
key = jax.random.PRNGKey(0)
xtilde = X[jax.random.permutation(key, bench.NT)[:bench.NTILDE]]
theta = {{"sigma_0": 1.0, "eps_0x": 0.0001, "eps_0y": 0.0001,
         "-2log2beta": -2 * np.log(2 * 0.1),
         "-log2rho2": -np.log(2 * 0.1 ** 2), "Amp": 1.0}}
theta = {{k: jnp.float32(v) for k, v in theta.items()}}
fp = {{"logA": jnp.float32(np.log(0.01)), "lambda0": jnp.float32(1.0)}}
# bench.make_config mirrors bench.py's exact config so the "default" arm
# reuses the headline run's cached programs (the "highest" arm necessarily
# compiles its own: the precision is baked into the dot_general lowering)
cfg = bench.make_config(FitConfig)
res = fit(X, R, cfg, xtilde=xtilde, theta=theta, f_params=fp)
jax.block_until_ready(res.m_b)
t0 = time.perf_counter()
res = fit(X, R, cfg, xtilde=xtilde, theta=theta, f_params=fp)
jax.block_until_ready(res.m_b)
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{
    "loss": np.asarray(res.track.logmarginal).tolist(),
    "seconds": dt}}))
"""


def run(mode: str):
    env = dict(os.environ)
    env["GPTPU_GRAD_PRECISION"] = mode
    out = subprocess.run([sys.executable, "-c", CHILD.format(root=ROOT)],
                         env=env, capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    raise RuntimeError(f"child run ({mode}) produced no RESULT line")


def main():
    import numpy as np
    hi = run("highest")
    lo = run("default")
    l_hi = np.asarray(hi["loss"])
    l_lo = np.asarray(lo["loss"])
    rel = np.abs(l_lo - l_hi) / np.maximum(np.abs(l_hi), 1e-12)
    print(json.dumps({
        "metric": "grad_precision_ab_max_rel_loss_dev",
        "value": float(rel.max()),
        "final_rel_dev": float(rel[-1]),
        "unit": "relative",
        "seconds_highest": round(hi["seconds"], 2),
        "seconds_default": round(lo["seconds"], 2),
    }))


if __name__ == "__main__":
    main()
