"""Headline benchmark: single-cell spatial-GP fit wall-clock on TPU,
with REAL quality gates and driver-visible secondary metrics (round 4).

Reference baseline (BASELINE.md): the stored one_cell_fit.ipynb:cell8 run —
maxiter=30, nEstep=10, nMstep=10, 3,160 training images of 108x108 pixels,
ntilde=2100 inducing points (cell2 config), float64 on the lab GPU — took
85.2 s.  This benchmark runs the same fit configuration (synthetic data at
identical shapes, f32 + HIGHEST-precision matmuls) as per-iteration
jit-compiled programs on a single TPU chip and reports the wall-clock of the
compiled fit (compile excluded; it is amortized across cells/sessions in
practice).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": speedup,
   "quality": {...}, "secondary": {...}}

**Quality gates that can fail** (round-3 VERDICT items 1-3): ``ok`` (and
hence a nonzero vs_baseline) now requires
  * the timed run's final training loss within GOLDEN["easy_loss_budget"]
    of the measured UNGATED golden loss at this exact config (the
    convergence gates must not buy speed with unconverged fits), and
  * a fit on the HARD validation regime (model-mismatched, low-SNR
    synthetic retina — data.synthetic_retina_hard) reaching
    r2 >= GOLDEN["hard_r2_min"].  The easy planted-RF r2 saturates at ~1.0
    and cannot rank fits; the hard regime sits at r2 ~= 0.6 like the
    reference's real cells (0.57-0.72, one_cell_fit.ipynb:cell8/15), where
    a regressed preset measurably drops (measured: mstep_ftol=1.0 ->
    r2 0.60 -> 0.44; see COVERAGE.md round-4 gate table).

**Secondary metrics** (round-3 VERDICT item 2): the population s/cell,
active-refit s, acquisition ms, pipelined-acquisition ms, and >=50k
TFLOP/s benches run as subprocesses (each with its own timeout; failures
recorded, never fatal) and land machine-parsed under "secondary".
Disable with GPTPU_BENCH_SECONDARY=0.

Robustness: a watchdog thread ALWAYS emits the JSON line before
GPTPU_BENCH_BUDGET seconds elapse (default 1500) with whatever has been
measured by then.
"""

import json
import os
import subprocess
import sys
import threading
import time

# Gradient matmuls at single-pass bf16: the M-step line search only needs
# the descent direction; measured A/B on the headline config leaves the loss
# trajectory within the line-search tolerance (see docs/numerics.md).  Must
# be set before package import.
os.environ.setdefault("GPTPU_GRAD_PRECISION", "default")

import numpy as np

BASELINE_SECONDS = 85.2

# Reference stored-run configuration (one_cell_fit.ipynb:cell2/cell8)
NT = 3160
N_PX = 108
NTILDE = 2100
MAXITER = 30
N_ESTEP = 10
N_MSTEP = 10
N_FPARAMSTEP = 10

# Golden values measured round 4 (see COVERAGE.md "Round-4 gate
# requalification" for the full ladder and protocol).  The easy golden is
# the UNGATED (mstep_ftol=0, estep_tol=0, max_ls=15) final loss at the
# bench config/seed; the hard floor is the exact-semantics hard-regime r2
# minus 3 bootstrap sigmas.
#
# REFRESHING THE EASY GOLDEN (round-4 VERDICT weak #6): any legitimate
# exact-semantics change (new eigensolver default, precision change, ...)
# shifts this constant.  Re-derive it — never hand-edit — with exactly:
#
#   GPTPU_BENCH_MEASURE_GOLDEN=1 GPTPU_BENCH_SECONDARY=0 \
#   GPTPU_BENCH_HARD_GATE=0 python bench.py
#
# which runs the bench data/seed (make_data(seed=0), PRNGKey(0) xtilde,
# notebook theta/f_params init) with all gates off, max_ls=15, static
# schedule, GPTPU_GRAD_PRECISION=default, and prints the measured ungated
# final loss + wallclock in the JSON line under "golden_remeasured".
GOLDEN = {
    # ungated final training loss, easy bench data (seed 0): measured
    # round 4 at the current exact semantics (static schedule, ls=15,
    # all gates off): timed 8.352 s, final loss 1604.0 (producing command
    # above; GPTPU_BENCH_MEASURE_GOLDEN reproduces it)
    "easy_ungated_loss": 1604.0,
    # the timed run may converge this much higher than the ungated golden.
    # Since round 5 the headline IS the ungated config (gap ~= 0, f32
    # line-search noise ~1); the 25-point budget stays as the regression
    # guard — far below the 80-106 point gaps of the rejected gate combos,
    # and it keeps pricing any future preset change (the retracted ls4
    # measured +13.7)
    "easy_loss_budget": 25.0,
    # exact-semantics hard-regime fit: r2 = 0.603 +/- 0.009 (seed 0);
    # floor at -4 sigma.  The regressed absolute-ftol preset measured
    # 0.444 — far below this floor.
    "hard_r2_min": 0.565,
}

_state = {"elapsed": None, "warm_elapsed": None, "ok": False, "done": False,
          "phase": "startup", "quality": {}, "secondary": {}}
_emit_lock = threading.Lock()
_emitted = False


def _emit(value, ok, provisional=False, extra=None):
    """Print the one JSON result line exactly once.  EVERY path (normal
    completion and watchdog) attaches the current phase, the partial
    quality/secondary state, and — when ok is False — a note saying WHY,
    so the artifact distinguishes "gates failed" from "gates never ran"
    (round-4 VERDICT weak #1)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
        rec = {
            "metric": "one_cell_fit_wallclock",
            "value": round(value, 3) if np.isfinite(value) else float("inf"),
            "unit": "s",
            "vs_baseline": (round(BASELINE_SECONDS / value, 2)
                            if ok and np.isfinite(value) and value > 0
                            else 0.0),
            "phase": _state["phase"],
        }
        if provisional:
            rec["provisional"] = True
        if _state["quality"]:
            rec["quality"] = _state["quality"]
        if _state["secondary"]:
            rec["secondary"] = _state["secondary"]
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)


def _watchdog(budget_s: float):
    deadline = time.monotonic() + budget_s
    while time.monotonic() < deadline:
        if _state["done"]:
            return
        time.sleep(1.0)
    if _state["done"]:
        return
    # Budget exhausted: emit the best number we have and hard-exit (the
    # main thread may be stuck inside a native compile and uninterruptible).
    note = (f"watchdog: GPTPU_BENCH_BUDGET={budget_s:.0f}s exhausted during "
            f"phase={_state['phase']}; results after that phase never ran")
    if _state["elapsed"] is not None:
        _emit(_state["elapsed"], _state["ok"], extra={"note": note})
    elif _state["warm_elapsed"] is not None:
        _emit(_state["warm_elapsed"], True, provisional=True,
              extra={"note": "warm-up (compile-inclusive) time; timed run "
                             "did not finish within GPTPU_BENCH_BUDGET. "
                     + note})
    else:
        _emit(float("inf"), False, provisional=True, extra={"note": note})
    sys.stdout.flush()
    os._exit(3)


def make_config(FitConfig, maxiter=None):
    """The headline fit configuration, env-overridable knob by knob.  The
    SINGLE source of truth shared by bench.py and the profiling/A-B
    scripts under benchmarks/ — sharing it keeps every run on the same
    compiled programs (.jax_cache hits; compiles through the tunnel cost
    minutes each).

    Per-iteration compilation: three compact programs instead of one
    maxiter-unrolled HLO (the tunnel'd remote compiler rejects the giant
    single program; numerics are identical — see test_fit_modes).  Pins =
    the measured steady-state schedule of this exact workload (w=80 all 30
    iterations; kept rank peaks at 283, bucket 320).

    Convergence gates and trial budgets (requalified rounds 4-5 on the
    hard validation regime — COVERAGE.md gate tables): the round-3
    absolute gate mstep_ftol=1.0 was RETRACTED round 4 (hard r2
    0.603 -> 0.424), and the round-4 zoom-budget-4 headline was RETRACTED
    round 5 when the multi-seed protocol measured its cost as
    seed-dependent and non-monotonic (seed 1: exact 0.730, ls4 0.588,
    ls8 0.513).  The shipped headline is therefore EXACT semantics:
    gates off, full zoom budget 15, static schedule (measured
    8.33-8.35 s = the ungated golden config).  ls4 (6.38 s) stays an
    opt-in knob priced in COVERAGE.md; mstep_ftol_rel + estep_tol=1e-3
    remain the tpu_fast() production preset (seed-0 hard regime: 7.5 s
    vs 9.5 s exact at -1.9 sigma)."""
    pin_rank = int(os.environ.get("GPTPU_BENCH_PIN_RANK", "320")) or None
    pin_w = int(os.environ.get("GPTPU_BENCH_PIN_W", "80")) or None
    return FitConfig(
        ntilde=NTILDE, maxiter=MAXITER if maxiter is None else maxiter,
        # step-count overrides are for ABLATION runs only (phase
        # decomposition); the headline numbers always use the reference's
        # nEstep=10 / nMstep=10 / nFparamstep=10
        n_estep=int(os.environ.get("GPTPU_BENCH_N_ESTEP", N_ESTEP)),
        n_mstep=int(os.environ.get("GPTPU_BENCH_N_MSTEP", N_MSTEP)),
        n_fparamstep=int(os.environ.get("GPTPU_BENCH_N_FPARAMSTEP",
                                        N_FPARAMSTEP)),
        n_px_side=N_PX, track_variational=False,
        jit_whole_fit=bool(int(os.environ.get("GPTPU_BENCH_WHOLE_FIT",
                                              "0"))),
        whole_fit_rank=(int(os.environ.get("GPTPU_BENCH_PIN_RANK", "320"))
                        if int(os.environ.get("GPTPU_BENCH_WHOLE_FIT", "0"))
                        else None),
        crop_margin=float(os.environ.get("GPTPU_BENCH_CROP_MARGIN", "1.25")),
        # zoom, measured 14.66 s vs speculative's 19.8 s at the headline
        # config AND converging further (r2 1.027 vs 0.873); zoom_carry
        # measured 16.10 s — see COVERAGE.md round 3.
        linesearch=os.environ.get("GPTPU_BENCH_LINESEARCH", "zoom"),
        estep_solver=os.environ.get("GPTPU_BENCH_ESTEP_SOLVER", "schulz"),
        mstep_inverse=os.environ.get("GPTPU_BENCH_MSTEP_INV", "schulz"),
        mstep_gram=os.environ.get("GPTPU_BENCH_MSTEP_GRAM", "exact"),
        mstep_proj_rank=int(os.environ.get("GPTPU_BENCH_PROJ_RANK", "40")),
        eigh_impl=os.environ.get("GPTPU_BENCH_EIGH_IMPL", "subspace"),
        init_rank=(int(os.environ["GPTPU_BENCH_INIT_RANK"])
                   if os.environ.get("GPTPU_BENCH_INIT_RANK")
                   else (pin_rank
                         if os.environ.get("GPTPU_BENCH_EIGH_IMPL",
                                           "subspace") == "subspace"
                         else None)),
        pin_rank=pin_rank, pin_window_w=pin_w,
        refresh_power_steps=int(os.environ.get("GPTPU_BENCH_REFRESH_POWER",
                                               "4")),
        subspace_power_steps=int(os.environ.get("GPTPU_BENCH_WARM_POWER",
                                                "2")),
        eigh_refresh_every=int(os.environ.get("GPTPU_BENCH_REFRESH_EVERY",
                                              "8")),
        # Convergence gates OFF by default (round-4 qualification on the
        # easy golden): measured ls4-only 6.378 s / loss gap +13.7 vs the
        # gate combos' +75..+106 gaps for NO additional speed (the
        # relative mstep gate at 1e-4 never fires on easy; estep_tol=1e-3
        # costs ~70-100 loss points here).  The gates remain available for
        # hard/production workloads via tpu_fast() where they ARE measured
        # wins (COVERAGE.md round-4 gate table: rel_1e-4 7.5 s vs exact_dyn
        # 9.5 s on the hard regime at -1.9 sigma).
        mstep_ftol=float(os.environ.get("GPTPU_BENCH_MSTEP_FTOL", "0")),
        mstep_ftol_rel=float(os.environ.get("GPTPU_BENCH_MSTEP_FTOL_REL",
                                            "0")),
        mstep_gtol=float(os.environ.get("GPTPU_BENCH_MSTEP_GTOL", "0")),
        # Zoom trial budget: 15 = the FitConfig default = full strong-Wolfe
        # semantics.  Round 5 RETRACTED the shipped budget-4 headline: the
        # multi-seed hard requalification measured its cost as
        # seed-dependent and non-monotonic in the budget (seed 1: exact
        # r2 0.730, ls4 0.588, ls8 0.513 — truncating the zoom mid-bracket
        # sends theta down a different nonconvex path on wandering-RF
        # problems).  ls4 remains an opt-in speed knob (6.38 s) with its
        # price table in COVERAGE.md.
        max_linesearch_steps=int(os.environ.get("GPTPU_BENCH_MAX_LS", "15")),
        # E-step Newton early exit on a stalled posterior mean (relative
        # inf-norm move; 0 = off, all n_estep steps)
        estep_tol=float(os.environ.get("GPTPU_BENCH_ESTEP_TOL", "0")),
        # dispatch every iteration back-to-back (no in-loop schedule
        # probes); exactness checked post hoc over EVERY tracked
        # iteration's theta, with a dynamic-schedule re-run fallback
        static_schedule=bool(int(os.environ.get("GPTPU_BENCH_STATIC_SCHED",
                                                "1"))))


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((NT, N_PX * N_PX)).astype(np.float32)
    lin = np.linspace(-1, 1, N_PX)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.1 ** 2)).ravel()
    w = (w / np.linalg.norm(w)).astype(np.float32)
    lam = np.exp(0.8 * X @ w)
    R = rng.poisson(lam).astype(np.float32)
    return X, R


def _run_hard_quality_gate(deadline, budget):
    """Fit ONE hard-regime cell with the shipped preset (dynamic schedule:
    the pins are tuned to the easy workload) and return (r2, sigma,
    final_loss, failed).

    Runs as a SUBPROCESS (benchmarks/bench_hard_quality.py at the SHIPPED
    preset's ladder rung — exact_dyn since the round-5 ls4 retraction —
    same config path through make_config) with a
    budget-aware timeout: a cold or wedged remote compile then costs this
    phase its own slice of the budget, never the whole artifact (the
    round-4 BENCH_r04 failure mode: the in-process hard gate sat inside a
    native compile until the watchdog os._exit).  Raises on timeout or
    missing output."""
    here = os.path.dirname(os.path.abspath(__file__)) or "."
    # Gates outrank secondaries (round-4 VERDICT item 1): reserve only
    # 0.3x budget for them here — _run_secondary re-checks the actual
    # remaining time per script anyway, so an overrunning gate degrades
    # the secondary list from its tail, never the gate itself.  Measured
    # round 5: the warm-cache gate subprocess costs ~420-500 s (cache
    # deserialization + ~280 MB of compiled-binary transfer through the
    # ~3 MB/s dev tunnel + the 8.9 s fit itself).
    sec_reserve = (0.3 * budget
                   if int(os.environ.get("GPTPU_BENCH_SECONDARY", "1"))
                   else 60.0)
    remaining = deadline - time.monotonic()
    tmo = min(1000.0, max(240.0, remaining - sec_reserve - 60.0))
    env = dict(os.environ)
    env.setdefault("GPTPU_HARD_SEED", "0")
    env["GPTPU_HARD_WARM"] = "0"          # gate needs quality, not timing
    env["GPTPU_HARD_ORACLE"] = "0"        # oracle recorded offline
    gate_cfg = os.environ.get("GPTPU_BENCH_HARD_CONFIG", "exact_dyn")
    out = subprocess.run(
        [sys.executable,
         os.path.join(here, "benchmarks", "bench_hard_quality.py"),
         gate_cfg],
        capture_output=True, text=True, env=env, cwd=here, timeout=tmo)
    rec = None
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            rec = json.loads(line)
            break
    if rec is None:
        raise RuntimeError("hard gate produced no JSON: "
                           + (out.stderr or "")[-200:])
    return (float(rec["r2"]), float(rec["r2_sigma"]),
            float(rec["final_loss"]), bool(rec["failed"]))


# Secondary plan, SMALLEST-FIRST (round-4 VERDICT item 1a): nominal
# timeouts are warm-cache realistic costs; _run_secondary scales them so
# their sum never exceeds half the total bench budget, so a slow tail
# script can never starve the artifact of the fast ones.
SECONDARY = [
    # name, script, nominal timeout (s), env overrides
    ("acquisition", "benchmarks/bench_acquisition.py", 120, {}),
    ("active_refit", "benchmarks/bench_active_refit.py", 180,
     {"GPTPU_REFIT_MSTEP_FTOL": "0.3", "GPTPU_REFIT_ESTEP_TOL": "1e-3"}),
    ("large_ntilde", "benchmarks/bench_large_ntilde.py", 210, {}),
    ("acquisition_pipelined", "benchmarks/bench_active_pipelined.py", 240,
     {"GPTPU_PIPE_NADD": "16"}),
    ("population", "benchmarks/bench_population.py", 300,
     {"GPTPU_POP_CELLS": "8", "GPTPU_POP_SEQ": "2"}),
]


def _run_secondary(deadline, budget):
    here = os.path.dirname(os.path.abspath(__file__)) or "."
    nominal_sum = sum(tmo for _, _, tmo, _ in SECONDARY)
    scale = min(1.0, (0.5 * budget) / max(nominal_sum, 1))
    for name, script, tmo, env_extra in SECONDARY:
        tmo = max(60.0, tmo * scale)
        remaining = deadline - time.monotonic()
        if remaining < tmo * 0.5 + 30:
            _state["secondary"][name] = {"skipped": "budget exhausted"}
            continue
        env = dict(os.environ)
        env.update(env_extra)
        _state["phase"] = f"secondary:{name}"
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(here, script)],
                capture_output=True, text=True, env=env, cwd=here,
                timeout=min(tmo, max(60, remaining - 30)))
            rec = None
            for line in reversed(out.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    break
            _state["secondary"][name] = (
                rec if rec is not None
                else {"error": (out.stderr or "no JSON output")[-300:]})
        except subprocess.TimeoutExpired:
            _state["secondary"][name] = {"error": f"timeout after {tmo:.0f}s"}
        except Exception as e:
            _state["secondary"][name] = {"error": str(e)[:300]}


def main():
    budget = float(os.environ.get("GPTPU_BENCH_BUDGET", "1500"))
    deadline = time.monotonic() + budget
    threading.Thread(target=_watchdog, args=(budget,), daemon=True).start()

    import jax
    # Persistent compilation cache: the tunnel'd remote compiler is slow
    # (minutes per program at these shapes); cache across processes.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__) or ".",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from gaussian_processes_tpu.config import FitConfig
    from gaussian_processes_tpu.models.fit import fit
    from gaussian_processes_tpu.models.inference import evaluate

    X, R = make_data()
    X = jnp.asarray(X)
    R = jnp.asarray(R)

    key = jax.random.PRNGKey(0)
    idx = jax.random.permutation(key, NT)[:NTILDE]
    xtilde = X[idx]

    theta = {"sigma_0": 1.0, "eps_0x": 0.0001, "eps_0y": 0.0001,
             "-2log2beta": -2 * np.log(2 * 0.1),
             "-log2rho2": -np.log(2 * 0.1 ** 2), "Amp": 1.0}
    theta = {k: jnp.float32(v) for k, v in theta.items()}
    f_params = {"logA": jnp.float32(np.log(0.01)),
                "lambda0": jnp.float32(1.0)}

    # Golden-refresh mode (see the GOLDEN comment): run the UNGATED exact
    # config and report the measured golden instead of gating against it.
    measure_golden = bool(int(os.environ.get("GPTPU_BENCH_MEASURE_GOLDEN",
                                             "0")))
    if measure_golden:
        os.environ["GPTPU_BENCH_MAX_LS"] = "15"
        os.environ["GPTPU_BENCH_MSTEP_FTOL"] = "0"
        os.environ["GPTPU_BENCH_MSTEP_FTOL_REL"] = "0"
        os.environ["GPTPU_BENCH_ESTEP_TOL"] = "0"

    cfg = make_config(FitConfig)

    def run():
        res = fit(X, R, cfg, xtilde=xtilde, theta=theta, f_params=f_params)
        jax.block_until_ready(res.m_b)
        return res

    # warm-up (compile)
    _state["phase"] = "warmup"
    tw = time.perf_counter()
    res = run()
    _state["warm_elapsed"] = time.perf_counter() - tw
    _state["phase"] = "timed"
    t0 = time.perf_counter()
    res = run()
    elapsed = time.perf_counter() - t0
    _state["elapsed"] = elapsed

    loss = np.asarray(res.track.logmarginal)
    ok_run = bool(np.all(np.isfinite(loss))) and not res.failed
    final_loss = float(-loss[-1])

    if measure_golden:
        _state["phase"] = "measure_golden"
        _state["quality"]["golden_remeasured"] = {
            "easy_ungated_loss": round(final_loss, 1),
            "wallclock_s": round(elapsed, 3),
            "previous_constant": GOLDEN["easy_ungated_loss"],
        }
        _state["done"] = True
        _emit(elapsed, ok_run,
              extra={"note": "GPTPU_BENCH_MEASURE_GOLDEN=1: ungated golden "
                             "re-measurement, not a gated headline run"})
        return

    # ---- quality gate 1: gated-vs-golden loss on the easy bench data ----
    loss_gap = final_loss - GOLDEN["easy_ungated_loss"]
    ok_easy = ok_run and (loss_gap <= GOLDEN["easy_loss_budget"])
    _state["quality"]["easy_final_loss"] = round(final_loss, 1)
    _state["quality"]["easy_loss_gap_vs_ungated_golden"] = round(loss_gap, 1)
    _state["quality"]["easy_loss_budget"] = GOLDEN["easy_loss_budget"]
    # NOTE: _state["ok"] stays False until BOTH gates complete — a watchdog
    # emission mid-hard-gate reports vs_baseline 0.0 with quality.easy_gate_ok
    # and a phase note, so "gates never finished" is visible but never
    # counted as a pass.
    _state["quality"]["easy_gate_ok"] = bool(ok_easy)

    # easy held-out r2 (informational: saturates at ~1.0 by construction)
    try:
        rng = np.random.default_rng(1)
        lin = np.linspace(-1, 1, N_PX)
        yy, xx = np.meshgrid(lin, lin, indexing="ij")
        w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.1 ** 2)).ravel()
        w = (w / np.linalg.norm(w)).astype(np.float32)
        Xt = rng.standard_normal((30, N_PX * N_PX)).astype(np.float32)
        lam_t = np.exp(0.8 * Xt @ w)
        Rt = rng.poisson(lam_t[None, :].repeat(30, 0)).astype(np.float32)
        _, _, r2, s2 = evaluate(res, jnp.asarray(Xt), jnp.asarray(Rt),
                                nbootstrap=200)
        _state["quality"]["easy_r2_saturated"] = round(float(r2), 3)
    except Exception as e:
        print(f"[bench] easy r2 check failed: {e}", file=sys.stderr)

    # ---- quality gate 2: hard-regime r2 with the same preset ----
    ok_hard = True
    if int(os.environ.get("GPTPU_BENCH_HARD_GATE", "1")):
        _state["phase"] = "hard_gate"
        try:
            r2h, s2h, loss_h, failed_h = _run_hard_quality_gate(
                deadline, budget)
            ok_hard = (not failed_h) and (r2h >= GOLDEN["hard_r2_min"])
            _state["quality"]["hard_r2"] = round(r2h, 4)
            _state["quality"]["hard_r2_sigma"] = round(s2h, 4)
            _state["quality"]["hard_r2_min"] = GOLDEN["hard_r2_min"]
            _state["quality"]["hard_final_loss"] = round(loss_h, 1)
        except Exception as e:
            print(f"[bench] hard gate errored: {e}", file=sys.stderr)
            _state["quality"]["hard_gate_error"] = str(e)[:200]
            ok_hard = False
        _state["quality"]["hard_gate_ok"] = bool(ok_hard)

    ok = ok_run and ok_easy and ok_hard
    _state["ok"] = ok
    _state["quality"]["gates_passed"] = bool(ok_easy and ok_hard)
    print(f"[bench] loss {-loss[0]:.1f} -> {final_loss:.1f} "
          f"(gap vs ungated golden {loss_gap:+.1f}, budget "
          f"{GOLDEN['easy_loss_budget']}); "
          f"hard r2 = {_state['quality'].get('hard_r2', 'n/a')} "
          f"(min {GOLDEN['hard_r2_min']}); warm-up "
          f"{_state['warm_elapsed']:.1f} s",
          file=sys.stderr)

    # ---- secondary metrics (driver artifacts, never fatal) ----
    if int(os.environ.get("GPTPU_BENCH_SECONDARY", "1")):
        _run_secondary(deadline, budget)

    _state["phase"] = "complete"
    _state["done"] = True
    value = elapsed if ok_run else float("inf")
    extra = None
    if not ok:
        why = []
        if not ok_run:
            why.append("run failed/non-finite loss")
        if not ok_easy:
            why.append(f"easy loss gap {loss_gap:+.1f} > budget "
                       f"{GOLDEN['easy_loss_budget']}")
        if not ok_hard:
            why.append("hard-regime r2 gate failed")
        extra = {"note": "gates FAILED: " + "; ".join(why)}
    _emit(value, ok, extra=extra)


if __name__ == "__main__":
    main()
