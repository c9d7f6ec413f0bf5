"""Device-time op breakdown of the headline fit via the XLA profiler.

Runs the bench configuration warm, captures a profiler trace of a few
steady-state EM iterations, and prints the top HLO ops by self time —
the ground truth for where the per-iteration ~200 ms actually goes
(estimates from flop/byte counts repeatedly mislead here; see
COVERAGE.md round-3 ablations).

Usage: python benchmarks/profile_device_ops.py [n_top]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")

TRACE_DIR = "/tmp/gptpu_trace"


def main():
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import bench
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models.fit import fit

    X, R = bench.make_data()
    X = jnp.asarray(X); R = jnp.asarray(R)
    key = jax.random.PRNGKey(0)
    xtilde = X[jax.random.permutation(key, bench.NT)[:bench.NTILDE]]
    theta = {"sigma_0": 1.0, "eps_0x": 0.0001, "eps_0y": 0.0001,
             "-2log2beta": -2 * np.log(2 * 0.1),
             "-log2rho2": -np.log(2 * 0.1 ** 2), "Amp": 1.0}
    theta = {k: jnp.float32(v) for k, v in theta.items()}
    f_params = {"logA": jnp.float32(np.log(0.01)),
                "lambda0": jnp.float32(1.0)}
    cfg = bench.make_config(FitConfig)

    def run():
        res = fit(X, R, cfg, xtilde=xtilde, theta=theta, f_params=f_params)
        jax.block_until_ready(res.m_b)
        return res

    run()  # warm
    import shutil
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    run()
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    xplane = max(xplanes, key=os.path.getmtime)
    import json
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    params = {"tqx": "out:json;"}
    try:
        data, _ = rtd.xspace_to_tool_data([xplane], "hlo_op_stats", params)
    except Exception:
        data, _ = rtd.xspace_to_tool_data([xplane], "op_profile", params)
    try:
        js = json.loads(data)
    except Exception:
        # gviz json or other container: dump raw head for inspection
        print(str(data)[:4000])
        return
    print(json.dumps(js)[:200])
    # gviz DataTable: rows of [category, name, ..., self_time]
    if isinstance(js, dict) and "rows" in js.get("table", {}):
        rows = js["table"]["rows"]
        print(f"{len(rows)} rows")


if __name__ == "__main__":
    main()
