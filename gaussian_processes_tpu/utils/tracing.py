"""Tracing / profiling: phase timers and fit-time breakdowns.

The reference instruments varGP with manual ``time.time()`` accumulators per
phase (E-step / f-params / M-step / kernels / loss) printed at the end
(Spatial_GP_repo/utils.py:1760-1766, 2252-2261).  Compiled programs cannot be
timed from inside, so this framework provides:

* ``PhaseTimer`` — accumulate host-side wall-clock per named phase (with
  ``jax.block_until_ready`` so async dispatch does not lie);
* ``fit(..., profile=True)`` (per-iteration mode) — per-iteration timings in
  ``FitResult.timing``;
* ``profile_fit_phases`` — phase decomposition by controlled ablation
  (E-steps-only vs full run), the compiled-world equivalent of the
  reference's in-loop accumulators;
* ``trace_annotation`` — forwards to ``jax.profiler.TraceAnnotation`` so
  phases show up in XLA profiler traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating wall-clock timer keyed by phase name."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"  {name:<24} {total:8.3f}s  "
                         f"({n} calls, {total / n * 1000:8.2f} ms/call)")
        return "\n".join(lines)

    def print_summary(self, header: str = "Phase timing:"):
        print(header)
        print(self.summary())


def trace_annotation(name: str):
    """Context manager that labels a region in XLA profiler traces."""
    return jax.profiler.TraceAnnotation(name)


@dataclasses.dataclass
class FitPhaseBreakdown:
    """The reference's end-of-fit timing printout
    (utils.py:2252-2261), reconstructed by ablation."""
    total: float
    estep_total: float          # E-steps incl. f-param updates
    mstep_total: float          # M-step L-BFGS incl. kernel+grad evals
    kernels_total: float        # kernel rebuild + eigh per iteration
    init: float

    def print(self):
        print(f"Time spent for E-steps:       {self.estep_total:.3f}s")
        print(f"Time spent for M-steps:       {self.mstep_total:.3f}s")
        print(f"Time spent computing kernels: {self.kernels_total:.3f}s")
        print(f"Time for initialization:      {self.init:.3f}s")
        print(f"Time total:                   {self.total:.3f}s")


def profile_fit_phases(x, r, cfg, fit_kwargs: Optional[dict] = None,
                       warmup: bool = True) -> FitPhaseBreakdown:
    """Decompose fit wall-clock into phases by controlled ablation: a full
    run, an E-steps-only run (no M-step, so no kernel rebuild), and a
    no-E-no-M run (init + tracking only).  Requires per-iteration mode."""
    import jax.numpy as jnp
    from ..models.fit import fit

    fit_kwargs = fit_kwargs or {}
    cfg = dataclasses.replace(cfg, jit_whole_fit=False)
    cfg_noM = dataclasses.replace(cfg, n_mstep=0)
    cfg_none = dataclasses.replace(cfg, n_mstep=0, n_estep=0)

    def timed(c):
        if warmup:
            fit(x, r, c, **fit_kwargs)
        t0 = time.perf_counter()
        res = fit(x, r, c, **fit_kwargs)
        jax.block_until_ready(res.m_b)
        return time.perf_counter() - t0

    t_full = timed(cfg)
    t_noM = timed(cfg_noM)
    t_none = timed(cfg_none)

    return FitPhaseBreakdown(
        total=t_full,
        estep_total=max(t_noM - t_none, 0.0),
        mstep_total=max(t_full - t_noM, 0.0),
        kernels_total=float("nan"),   # folded into mstep (per-iteration
                                      # rebuild happens only when M-steps run)
        init=t_none,
    )
