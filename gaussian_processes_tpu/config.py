"""Global configuration for the TPU-native spatial-GP framework.

Mirrors the numerics posture of the reference implementation
(reference: Spatial_GP_repo/utils.py:31-41): the reference runs float64 with
MIN_TOLERANCE=1e-11 and EIGVAL_TOL=1e-4.  On TPU we default to float32 compute
with HIGHEST matmul precision (6-pass bf16 on the MXU, accurate to f32) and
expose an x64 mode (CPU / validation) through standard ``jax.config``
``jax_enable_x64``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

# Tolerance below which a matrix is not considered symmetric / posdef
# (reference: Spatial_GP_repo/utils.py:37).
MIN_TOLERANCE = 1.0e-11

# Relative eigenvalue cutoff for the stabilizing eigenspace projection
# (reference: Spatial_GP_repo/utils.py:39).
EIGVAL_TOL = 1.0e-4

# Hard threshold on the localized RF envelope alpha; pixels with
# alpha < ALPHA_THRESHOLD contribute exactly zero to the kernel.  The
# reference crops them out of the computation (dynamic shapes,
# Spatial_GP_repo/utils.py:883-887); we zero their weight instead, which gives
# bit-identical Gram entries with fully static shapes.
ALPHA_THRESHOLD = 1.0e-3

# Additive guard in the cosine-angle denominator
# (reference: Spatial_GP_repo/utils.py:984).
COSDELTA_JITTER = 1.0e-7

# Matmul precision for all kernel/Gram contractions.  HIGHEST (6-pass bf16
# on the MXU) produces f32-accurate products (required to match the f64
# reference to the 1e-5 target at nx ~ 1e4 contraction lengths).  HIGH
# (3-pass) is ~25-40% faster at ~1e-5 median relative error; DEFAULT
# (single-pass bf16) is fastest at ~1e-3.  Override with
# GPTPU_MATMUL_PRECISION={default,high,highest} before import.
import os as _os

_PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
               "high": jax.lax.Precision.HIGH,
               "highest": jax.lax.Precision.HIGHEST}
MATMUL_PRECISION = _PRECISIONS[
    _os.environ.get("GPTPU_MATMUL_PRECISION", "highest").lower()]

# Trace-time precision override: code wrapped in ``precision_scope("high")``
# traces its matmuls at that precision instead of MATMUL_PRECISION.  Used by
# the M-step objective, whose values only steer a line search (the tracked
# loss/posterior is always computed at full precision outside the scope).
_PRECISION_STACK: list = []


def current_precision():
    return _PRECISION_STACK[-1] if _PRECISION_STACK else MATMUL_PRECISION


import contextlib as _contextlib


@_contextlib.contextmanager
def precision_scope(p):
    """Override the matmul precision for ops TRACED inside the scope.
    ``p`` is a jax.lax.Precision or one of {"default","high","highest"}."""
    if isinstance(p, str):
        p = _PRECISIONS[p.lower()]
    _PRECISION_STACK.append(p)
    try:
        yield
    finally:
        _PRECISION_STACK.pop()


def default_dtype() -> jnp.dtype:
    """Framework compute dtype: f64 iff jax_enable_x64 is on, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Configuration of one EM fit (the ``fit_parameters`` dict of the
    reference, Spatial_GP_repo/utils.py:1632-1645, with identical defaults)."""

    ntilde: Optional[int] = None      # inducing points (None -> min(100, nt))
    maxiter: int = 50                 # outer EM iterations
    n_estep: int = 50                 # E-step (m, V + f-param) iterations per outer
    n_mstep: int = 20                 # L-BFGS iterations on theta per outer
    n_fparamstep: int = 10            # L-BFGS iterations on logA per E-step
    n_px_side: int = 108              # stimulus is n_px_side x n_px_side pixels
    cellid: int = 0
    kernfun: str = "acosker"
    eigval_tol: float = EIGVAL_TOL
    min_tolerance: float = MIN_TOLERANCE
    alpha_threshold: float = ALPHA_THRESHOLD
    lr_fparams: float = 0.1           # reference: utils.py:1895
    lr_hyperparams: float = 0.1       # reference: utils.py:2009
    track_variational: bool = True    # record (m_b, V_b) per iteration
    # Also record the stabilized basis B per iteration.  The reference
    # reconstructs any tracked iteration with a fresh eigh
    # (utils.py:358-386) because its per-iteration eigh is deterministic in
    # theta; here the warm-started subspace eigensolver's Rayleigh-Ritz
    # basis is NOT reproducible from theta alone, so exact
    # ``state_at_iteration`` under reduced-rank/subspace runs requires the
    # stored basis.  Off by default (maxiter x ntilde x ntilde memory);
    # ``state_at_iteration`` raises when it would need it.
    track_basis: bool = False
    jit_whole_fit: bool = True        # compile the entire EM loop as one program
    # Static crop window around the RF (exact — cropped pixels carry zero
    # kernel weight).  Active only in per-iteration mode
    # (jit_whole_fit=False), where the window tracks theta between compiled
    # calls.  w is bucketed to crop_bucket multiples so jit caches a handful
    # of window sizes.
    crop_window: bool = True
    crop_margin: float = 1.25
    crop_bucket: int = 16
    # Rematerialize the Gram construction inside the M-step backward pass
    # (jax.checkpoint): one extra forward per gradient instead of storing
    # the (nt, nx)-scale weighted/smoothed stimulus intermediates.  Enabled
    # automatically for vmapped population fits, where storing them per
    # cell lane spills HBM.
    remat_gram: bool = False
    # Reduced-rank stabilization (per-iteration mode only): run each EM
    # iteration at a static rank budget = bucketed(kept-rank * slack + pad)
    # instead of the full ntilde.  The kept rank (the reference's dynamic
    # n_eigen truncation, utils.py:1683) is typically 10-20% of ntilde, so
    # square-matrix work in the stabilized basis drops ~(ntilde/rank)^2.
    # Exact vs the full-shape path whenever the budget covers the kept rank
    # (dropped coordinates are exact zeros); the budget self-corrects via a
    # host sync per iteration.
    reduced_rank: bool = True
    rank_slack: float = 1.25
    rank_pad: int = 16
    rank_bucket: int = 64
    # Pin the reduced-rank budget (per-iteration mode) to a FLOOR: the
    # budget starts at this value and never shrinks below it (it still
    # grows on true saturation — exactness wins).  Production compiles cost
    # ~10 min per _fit_iteration variant through the remote compiler, and a
    # kept-rank hovering at a bucket boundary otherwise flaps the schedule
    # between two static shapes — one fresh 10-minute compile per flip.
    # Set it to a previous run's steady-state budget (track.n_eigen) to make
    # a fit compile exactly ONE rank variant.  None = pure measured schedule.
    pin_rank: Optional[int] = None
    # Pin the per-iteration crop-window SIZE the same way (a FLOOR, in
    # pixels, bucketed): windows smaller than the pin are grown to it (the
    # corner still tracks theta), windows larger use their scheduled size.
    # Kills window-bucket churn/flap for a known workload.  None = measured.
    pin_window_w: Optional[int] = None
    # Per-iteration eigensolver for the stabilizing eigenspace (reduced-rank
    # per-iteration mode only).  "subspace" = warm-started subspace
    # iteration + Rayleigh-Ritz from the previous basis (theta moves little
    # between EM iterations), with a full eigh refresh every
    # ``eigh_refresh_every`` iterations and an in-graph fallback to full
    # eigh on numerical failure.  "eigh" = always the full factorization
    # (the reference recomputes eigh per iteration, utils.py:1808).
    eigensolver: str = "subspace"
    subspace_power_steps: int = 2
    eigh_refresh_every: int = 8
    # LOWERING of the full eigenspace construction (init + the periodic
    # refresh).  "eigh" = XLA's self-adjoint eigensolver — numerically a
    # direct factorization, but at ntilde=2100 it compiles to a ~120 MB TPU
    # executable (~84 s compile, ~10 s per-process LOAD through the remote
    # tunnel, measured round 3) and every program embedding one pays that.
    # "subspace" = subspace iteration + Rayleigh-Ritz at a static rank
    # (ops/stabilize.compute_eigenspace_iterative, ~9 MB of code): cold
    # start with ``subspace_init_power`` power steps at init, warm-seeded
    # with ``refresh_power_steps`` steps at the periodic refresh.  Requires
    # a static rank: the refresh always has one (reduced-rank carry); init
    # uses ``init_rank`` (falls back to the full eigh when unset).
    eigh_impl: str = "eigh"
    # Static rank for the INIT eigenspace (per-iteration mode): the carry is
    # born at this rank instead of full ntilde, skipping the i=1 slice (and,
    # with eigh_impl="subspace", the init program never lowers a full eigh).
    # Exact whenever init_rank covers the kept rank at theta0 — same
    # contract as whole_fit_rank/pin_rank; the rank schedule still grows on
    # true saturation at the next sync.  None = full-rank init (default).
    init_rank: Optional[int] = None
    # Power steps for the iterative eigenspace (eigh_impl="subspace"):
    # cold-start init / warm-seeded periodic refresh.  Each step multiplies
    # Ritz-pair error by (lam_{rank+1}/lam_i); kernel spectra here decay
    # ~4 orders within a few hundred directions, so these defaults sit at
    # the measured parity floor with wide margin (tests/test_stabilize.py).
    subspace_init_power: int = 12
    refresh_power_steps: int = 8
    # Static rank budget for WHOLE-FIT mode (jit_whole_fit=True): the init
    # runs one full eigh and slices to the top ``whole_fit_rank``
    # eigendirections; every EM iteration then runs the '_b' algebra at that
    # static rank with the warm-started subspace eigensolver (periodic
    # in-graph full-eigh refresh via lax.cond).  Exact vs the full-shape
    # path whenever the budget covers the kept rank; fit() checks the
    # tracked n_eigen post hoc and auto-falls back to the full-rank program
    # if the budget ever saturated.  The active loop sets this from the
    # previous round's kept rank — its refits drop from O(ntilde^2)-per-op
    # to O(rank^2).  None = full rank (default).
    whole_fit_rank: Optional[int] = None
    # Matmul precision inside the M-step objective (value + grad per
    # line-search trial — the hottest region, reference utils.py:2013-2114).
    # Its values only steer the L-BFGS line search; the tracked loss and the
    # final posterior are always computed at full MATMUL_PRECISION outside
    # this scope.  "high" = 3-pass bf16 (~1e-5 median rel error, ~2x faster
    # grams than "highest"); validated against the f64 reference in
    # tests/test_fit.py.
    mstep_precision: str = "high"
    # Inner-optimizer line search.  "zoom" = optax strong-Wolfe zoom (the
    # reference's torch.optim.LBFGS semantics; the default).  "speculative"
    # = Armijo L-BFGS that evaluates value+grad at the unit step and only
    # falls back to value-only backtracking trials on rejection — ~1
    # value+grad per step vs zoom's measured ~2.7 (optim/lbfgs.py), the
    # fastest single-lane choice; reference-trajectory parity is pinned by
    # tests/test_fit.py.  "backtracking" = optax Armijo backtracking with
    # stored accepted-point value+grad (optax evaluates value+grad per
    # trial; measured slower than zoom — kept for robustness to noisy
    # objectives).  "armijo" = branch-free batched-backtracking L-BFGS —
    # the vmap-linear choice for population fits, where zoom's
    # cond/while_loop control flow costs ~10x per lane.  "zoom_carry" =
    # zoom with the M-step L-BFGS state carried across EM iterations
    # (optim/lbfgs.lbfgs_minimize_zoom_carry): identical strong-Wolfe
    # semantics per step, but theta's 6-dim curvature memory persists so
    # the unit step is well-scaled from step 1 of every M-step instead of
    # being re-learned (~2.7 value+grad Gram rebuilds per step measured
    # for cold zoom at bench shapes).  MEASURED NEGATIVE at the headline
    # config (round 3, COVERAGE.md): 16.10 s vs plain zoom's 12.11 s —
    # the carried directions overshoot on the per-iteration objective
    # (the E-step moved m/V and the eigenspace reprojected), costing more
    # zoom trials than the cold restart's re-learning they save.  Kept
    # for workloads with static E-state; prefer "zoom".  Requires
    # mstep_memory=True to take effect; f-param updates still run plain
    # zoom.
    linesearch: str = "zoom"
    # Inner SPD solver of the E-step Newton update.  "schulz" warm-starts
    # each Newton step's (I + S G S)^-1 from the previous step's inverse via
    # Newton-Schulz iteration (pure MXU matmuls; in-graph exact-Cholesky
    # fallback on residual failure) — the small-matrix triangular-solve
    # latency (~4 ms/step at rank ~384, docs/tpu_linalg.md) disappears from
    # 9 of every 10 Newton steps.  "chol" = exact Cholesky solve every step.
    estep_solver: str = "schulz"
    # Inverse of the projected K_tilde_b inside the M-step objective (one
    # per line-search evaluation — the hottest region).  "schulz" seeds
    # Newton-Schulz with the fixed eigenspace's k_tilde_inv_diag (exact at
    # the iteration-start theta; line-search trials stay nearby), with the
    # exact inverse as in-graph fallback.  "exact" = jnp.linalg.inv
    # (measured 3.2 ms of LU latency per evaluation at rank 384).
    mstep_inverse: str = "schulz"
    # Newton-Schulz iteration count for both knobs above (each step is two
    # rank x rank matmuls; quadratic convergence, residual-guarded with a
    # 3-step lag so any ACCEPTED result sits at the machine floor).
    schulz_steps: int = 12
    # log|K_tilde_b| inside the M-step objective (one per line-search
    # evaluation).  "series": warm-seeded 8th-order trace series — three
    # rank x rank MXU matmuls, no small-matrix Cholesky latency; in-graph
    # Cholesky fallback when the trial is too far from the eigenspace's
    # seed (|E|_F >= 0.25).  "chol": branchless Cholesky logdet each time.
    mstep_logdet: str = "series"
    # Gram construction inside the M-step objective (one per line-search
    # evaluation).  "exact": the full windowed Gram (contraction length
    # w^2).  "projected": spectrally projected smoothing — the top
    # ``mstep_proj_rank`` eigenbasis of the 1-D smoothing factor (computed
    # once per EM iteration at the iteration-start theta) cuts the
    # contraction to rank^2, a 4-7x FLOP reduction at production shapes;
    # a per-evaluation closed-form residual check falls back in-graph to
    # the exact Gram whenever the projection error exceeds
    # ``mstep_proj_tol`` (relative Frobenius).  See
    # ops/kernels.py:gram_matrices_projected.  Population (vmapped) fits
    # should keep "exact": under vmap the fallback lax.cond executes both
    # branches for every lane.
    mstep_gram: str = "exact"
    # None: fit() sizes the rank from the start theta's smoothing spectrum
    # (ops/kernels.suggest_proj_rank: 1e-8 residual + 8 of slack, bucketed);
    # an int pins it (the bench pins 40 so one program variant compiles)
    mstep_proj_rank: Optional[int] = None
    mstep_proj_tol: float = 3e-6
    # Out-of-tolerance behavior of the projected Gram.  "exact": in-graph
    # lax.cond recomputes the exact Gram (single-cell default — one branch
    # executes per call, trajectory identical to mstep_gram="exact").
    # "poison": the trial's loss goes +inf branchlessly so the line search
    # backtracks toward the basis's seed theta (for vmapped population
    # fits, where a cond would execute the exact branch for every lane).
    mstep_proj_fallback: str = "exact"
    # Non-convergence fallback of the M-step warm inverse.  "exact": in-graph
    # lax.cond exact inverse — trajectory-identical to mstep_inverse="exact",
    # LU paid only on actual fallbacks (single-cell default).  "poison":
    # branchless NaN-poison, turning the trial's loss into +inf so the line
    # search backtracks toward the seed — for vmapped population fits, where
    # a cond with a batched predicate would pay batched LU on EVERY call
    # (fit_population sets this automatically).
    schulz_fallback: str = "exact"
    # Carry the M-step L-BFGS curvature memory across EM iterations
    # (linesearch="speculative" or "zoom_carry").  theta moves little
    # between EM iterations — the same observation behind the warm-started
    # subspace eigensolver — so each M-step starts with the previous
    # iteration's curvature instead of re-learning it: the unit step is
    # well-scaled from step one and the speculative accept almost never
    # wastes its gradient.  Staleness is safe (non-descent directions fall
    # back to steepest descent; the Armijo test rejects bad steps; pairs
    # are stored only when s'y > 0 on the current objective).
    mstep_memory: bool = True
    # Batched-ladder length: the "armijo" mode's per-step trial count, and
    # the "speculative" mode's rejection ladder (one batched value call of
    # alphas 0.5..0.5^armijo_trials when the unit step fails Armijo).
    armijo_trials: int = 6
    # Strong-Wolfe zoom line-search trial budget per L-BFGS step.  Under
    # vmap (population fits) the zoom while_loop runs to the all-lanes-done
    # bound and its conds execute both branches, so a tight budget bounds
    # the lockstep waste; single-lane fits rarely need more than ~3 trials.
    max_linesearch_steps: int = 15
    # M-step early termination — the reference's torch.optim.LBFGS
    # tolerances (utils.py:2012: tolerance_grad=1e-7, tolerance_change=1e-9;
    # inf-norm of the gradient / absolute objective change between accepted
    # steps).  Nonzero values wrap the zoom L-BFGS step in a lax.cond whose
    # converged branch is an identity copy: once theta is stationary the
    # remaining n_mstep steps cost ZERO Gram rebuilds (late EM iterations
    # move theta very little, so this is where the M-step's ~84% share of
    # the iteration budget goes).  0.0 (default) disables the gate and keeps
    # the traced program identical to the plain scan.  Applies to the
    # "zoom" and "zoom_carry" line searches.  PER-CELL optimization: under
    # vmap (population fits) the lax.cond lowers to a select that executes
    # both branches per lane — fit_population zeroes these gates
    # automatically (max_linesearch_steps is the knob that helps there).
    mstep_gtol: float = 0.0
    mstep_ftol: float = 0.0
    # RELATIVE M-step objective-change gate: converged when
    # |f - f_prev| < mstep_ftol + mstep_ftol_rel * |f|.  The absolute
    # ftol does not transfer across problems — round 4's hard-regime
    # requalification measured mstep_ftol=1.0 (tuned on the easy planted-RF
    # data, where it cost nothing measurable) dropping held-out r2 from
    # 0.603 to 0.444 on the hard validation regime, because the hard
    # problem's per-step objective moves are smaller at the same loss
    # scale.  The relative gate scales with the objective magnitude; see
    # COVERAGE.md round-4 gate table for the measured quality/speed
    # tradeoff.  0.0 disables (same lax.cond structure as mstep_ftol).
    mstep_ftol_rel: float = 0.0
    # E-step early termination (relative inf-norm move of the posterior
    # mean between Newton steps; 0 = run all n_estep steps).  The alpha=1
    # Newton update converges quadratically, so late EM iterations
    # typically need 2-3 of the configured steps; converged steps take a
    # lax.cond identity branch, skipping their SPD solve AND their f-param
    # L-BFGS run.  The reference has no analog (it always runs nEstep
    # torch steps) — this is a wall-clock knob with the same convergence
    # target, not a semantics change when left at 0.
    estep_tol: float = 0.0
    # Static per-iteration schedule: skip the in-loop window/rank probes
    # entirely and dispatch every EM iteration back-to-back with the
    # INITIAL window (grown to the pin_window_w floor) and the init rank.
    # The in-loop probe's device_get makes the host wait for iteration
    # i-1's completion before dispatching iteration i, so every iteration
    # pays one tunnel round trip of device idle; with the schedule pinned
    # (pin_rank / pin_window_w at the measured steady state) the probes
    # decide nothing.  Exactness contract mirrors the whole-fit program:
    # ONE post-hoc check of the final theta's margin-1.0 alpha mask
    # against the dispatched window, and of the tracked kept-rank against
    # the rank budget — on violation the fit re-runs with the dynamic
    # (probing) schedule.  Per-iteration mode only; ignored when
    # jit_whole_fit=True.
    static_schedule: bool = False

    def __post_init__(self):
        if self.eigensolver not in ("eigh", "subspace"):
            raise ValueError(
                f"eigensolver must be 'eigh' or 'subspace', got "
                f"{self.eigensolver!r}")
        if self.eigh_impl not in ("eigh", "subspace"):
            raise ValueError(
                f"eigh_impl must be 'eigh' or 'subspace', got "
                f"{self.eigh_impl!r}")
        if self.linesearch not in ("zoom", "zoom_carry", "speculative",
                                   "backtracking", "armijo"):
            raise ValueError(
                f"linesearch must be 'zoom', 'zoom_carry', 'speculative', "
                f"'backtracking' or 'armijo', got {self.linesearch!r}")
        if self.estep_solver not in ("chol", "schulz"):
            raise ValueError(
                f"estep_solver must be 'chol' or 'schulz', got "
                f"{self.estep_solver!r}")
        if self.mstep_inverse not in ("exact", "schulz"):
            raise ValueError(
                f"mstep_inverse must be 'exact' or 'schulz', got "
                f"{self.mstep_inverse!r}")
        if self.mstep_logdet not in ("chol", "series"):
            raise ValueError(
                f"mstep_logdet must be 'chol' or 'series', got "
                f"{self.mstep_logdet!r}")
        if self.mstep_gram not in ("exact", "projected"):
            raise ValueError(
                f"mstep_gram must be 'exact' or 'projected', got "
                f"{self.mstep_gram!r}")
        if self.mstep_proj_fallback not in ("exact", "poison"):
            raise ValueError(
                f"mstep_proj_fallback must be 'exact' or 'poison', got "
                f"{self.mstep_proj_fallback!r}")
        if self.schulz_fallback not in ("exact", "poison"):
            raise ValueError(
                f"schulz_fallback must be 'exact' or 'poison', got "
                f"{self.schulz_fallback!r}")
        if self.mstep_precision not in ("default", "high", "highest"):
            raise ValueError(
                f"mstep_precision must be one of default/high/highest, got "
                f"{self.mstep_precision!r}")
        if self.whole_fit_rank is not None and not self.jit_whole_fit:
            import warnings
            warnings.warn(
                "whole_fit_rank is only used by the whole-fit program "
                "(jit_whole_fit=True); the per-iteration path derives its "
                "rank budget from the measured kept-rank instead "
                "(reduced_rank/rank_* knobs) and ignores whole_fit_rank")

    def resolve_ntilde(self, nt: int) -> int:
        if self.ntilde is not None:
            return self.ntilde
        return 100 if nt > 100 else nt

    @classmethod
    def tpu_fast(cls, *, pin_rank: int = None,
                 pin_window_w: int = None, **kwargs) -> "FitConfig":
        """The measured TPU production preset (requalified round 4 on the
        HARD validation regime — the full gate ladder is in COVERAGE.md):

        * convergence gates — ``mstep_ftol_rel`` (RELATIVE M-step
          objective-change gate: |f - f_prev| < rel * |f|) and
          ``estep_tol = 1e-3`` (E-step Newton stall gate, also relative).
          Round 3 shipped an ABSOLUTE ``mstep_ftol`` scaled by a
          user-supplied loss_scale; requalification on the hard regime
          (r2 ~= 0.6, where the metric can actually drop) measured that
          preset at r2 0.603 -> 0.424 — the absolute threshold over-fires
          on problems whose per-step objective moves are smaller at the
          same loss scale.  The relative gate transfers (COVERAGE.md
          round-4 gate table).
        * zoom trial budget 4 (the accepted path rarely needs more; the
          budget bounds the cost of the final failing search a gated
          M-step pays);
        * ``static_schedule`` with the given pins (dispatch all EM
          iterations back-to-back; post-hoc per-iteration exactness check,
          dynamic-schedule auto re-run on violation), enabled whenever a
          pin is supplied;
        * small-executable subspace lowering for init and refresh
          (``eigh_impl="subspace"``), CholQR refresh at 4 power steps.

        Every gate here fails safe — too-tight gates merely run all
        configured steps, and the schedule check re-runs dynamically on
        any violation.  All other fields pass through ``**kwargs``.
        """
        defaults = dict(
            mstep_ftol_rel=1e-4,
            estep_tol=1e-3,
            max_linesearch_steps=4,
            eigh_impl="subspace",
            refresh_power_steps=4,
            jit_whole_fit=False,
            pin_rank=pin_rank,
            pin_window_w=pin_window_w,
            init_rank=kwargs.pop("init_rank", pin_rank),
            static_schedule=(pin_rank is not None
                             or pin_window_w is not None),
        )
        defaults.update(kwargs)
        return cls(**defaults)


def tree_cast(tree: Any, dtype) -> Any:
    """Cast every floating leaf of a pytree to ``dtype``."""
    def _cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)
