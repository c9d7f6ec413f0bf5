"""Device-time op breakdown of the headline fit via the XLA profiler.

Runs the bench configuration warm, captures a profiler trace of the full
compiled fit, and prints the leaf-HLO device time grouped three ways —
by HLO category, by source line, and the custom-call family by op stack —
the ground truth for where the per-iteration device time actually goes
(estimates from flop/byte counts repeatedly mislead here; see
docs/tpu_linalg.md rule 7 and the COVERAGE.md round-3 ablations).

The trace is parsed directly from the captured ``.xplane.pb`` with the
TSL protobuf schema: the ``tensorboard_plugin_profile`` gviz conversion
layer in this image is bit-rotted against its tensorflow build (missing
``xspace_to_tools_data`` pywrap symbol), while the raw XSpace parse needs
nothing beyond protobuf.  Leaf events on the "XLA Ops" line carry
``hlo_category``, ``source``, ``flops`` and ``shape_with_layout`` stats;
parent control-flow events (while/conditional) and async DMA starts are
excluded so times sum to real core-serial execution.

Usage: python benchmarks/profile_device_ops.py [n_top]
"""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")
# tensorflow's bundled proto stubs predate the installed protobuf; the
# pure-python fallback parses the XSpace fine (slower, but the trace is
# tens of MB at most).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

TRACE_DIR = "/tmp/gptpu_trace"

# Parent / overlapped event categories: their intervals contain the leaf
# ops below them (control flow) or span asynchronous DMA waits that
# overlap real compute; counting them would double-count the core time.
_NON_LEAF = ("while", "conditional", "call", "async-start", "copy-start")


def _stat_value(st, stat_metadata):
    if st.str_value:
        return st.str_value
    if st.ref_value:
        return stat_metadata[st.ref_value].name
    return st.int64_value or st.uint64_value or st.double_value


def summarize_xplane(path, n_top=25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        print("no TPU device plane in trace", file=sys.stderr)
        return
    p = planes[0]
    sm = p.stat_metadata
    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_op = collections.Counter()
    op_cnt = collections.Counter()
    op_flops = collections.Counter()
    op_stack = {}
    module_total = 0
    for line in p.lines:
        if line.name == "XLA Modules":
            module_total += sum(ev.duration_ps for ev in line.events)
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            meta = p.event_metadata[ev.metadata_id]
            stats = {}
            for st in list(ev.stats) + list(meta.stats):
                stats[sm[st.metadata_id].name] = _stat_value(st, sm)
            cat = str(stats.get("hlo_category", "?"))
            if cat in _NON_LEAF:
                continue
            dur = ev.duration_ps
            by_cat[cat] += dur
            src = str(stats.get("source", ""))
            by_src[src] += dur
            name = meta.display_name or meta.name
            key = (cat, name.split(".")[0], src)
            by_op[key] += dur
            op_cnt[key] += 1
            op_flops[key] += float(stats.get("flops", 0) or 0)
            if cat == "custom-call" and key not in op_stack:
                # the op stack names the originating jax primitive
                # (eigh / cholesky / lu / qr) that `source` lacks
                op_stack[key] = str(stats.get("tf_op", ""))[:120]

    total = sum(by_cat.values())
    print(f"leaf device total {total / 1e9:.0f} ms   "
          f"(module-line total {module_total / 1e9:.0f} ms)")
    print("== by HLO category ==")
    for cat, dur in by_cat.most_common(n_top):
        print(f"  {dur / 1e9:9.1f} ms {100 * dur / total:5.1f}%  {cat}")
    print("== by source line ==")
    for src, dur in by_src.most_common(n_top):
        print(f"  {dur / 1e9:9.1f} ms {100 * dur / total:5.1f}%  "
              f"{src[:100] or '(unattributed: linalg custom calls etc.)'}")
    print("== top (category, op, source) ==")
    for key, dur in by_op.most_common(n_top):
        tf_s = op_flops[key] / (dur / 1e12) / 1e12 if dur else 0.0
        stack = op_stack.get(key, "")
        print(f"  {dur / 1e9:9.1f} ms x{op_cnt[key]:6d} {tf_s:7.2f}TF/s "
              f"[{key[0]}] {key[1][:30]:30s} {key[2][:70]} {stack}")


def main():
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    if len(sys.argv) > 2 and sys.argv[2] == "--parse-only":
        xplanes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                            recursive=True)
        summarize_xplane(max(xplanes, key=os.path.getmtime), n_top)
        return
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
    summarize_xplane(max(xplanes, key=os.path.getmtime), n_top)


if __name__ == "__main__":
    main()
