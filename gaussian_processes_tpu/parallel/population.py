"""Population-scale fits: many cells, one stimulus set, one compiled program.

The reference fits one retinal ganglion cell at a time (a notebook run per
cell, one_cell_fit.ipynb); its dataset carries 41 cells' responses to the
same 3,160 stimuli.  Here the full EM fit program (models/fit.py) is vmapped
over the cell axis — each cell keeps its own hyperparameters, kernels,
eigenspace, and variational state — and sharded over a ("cells", "data")
device mesh: cells are the DP-analog axis, training-point rows of the
stimulus/Gram matrices the TP/SP-analog axis.  XLA inserts the ICI
collectives from the sharding annotations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import FitConfig
from ..models.fit import Carry, FitResult, _fit_program
from ..params import THETA_KEYS, default_f_params, theta_bounds
from .mesh import population_shardings


def _vmap_safe_config(cfg: FitConfig) -> FitConfig:
    """Rewrite vmap-hostile knobs for the batched (per-cell-lane) program.

    Under vmap a lax.cond with a batched predicate lowers to a select that
    executes BOTH branches for every lane, and a while_loop runs to the
    all-lanes bound — so the single-lane optimizations below become pure
    overhead (or worse) and are forced to their branchless/exact forms:

    * warm-inverse / projected-Gram fallback conds -> branchless poison;
    * convergence gates (mstep_ftol/_rel, mstep_gtol, estep_tol) -> 0
      (their identity branches skip nothing under vmap; the trial-budget
      knob max_linesearch_steps is the lever that does help and passes
      through untouched);
    * estep_solver "schulz" -> "chol" (every lane would pay 12 Schulz
      matmul pairs ON TOP of the exact solve it falls back to);
    * mstep_logdet "series" -> "chol" (same both-branches argument per
      line-search trial).
    """
    if cfg.mstep_inverse == "schulz" and cfg.schulz_fallback == "exact":
        cfg = dataclasses.replace(cfg, schulz_fallback="poison")
    if (cfg.mstep_gram == "projected"
            and cfg.mstep_proj_fallback == "exact"):
        cfg = dataclasses.replace(cfg, mstep_proj_fallback="poison")
    if cfg.mstep_ftol or cfg.mstep_gtol or cfg.estep_tol or cfg.mstep_ftol_rel:
        cfg = dataclasses.replace(cfg, mstep_ftol=0.0, mstep_gtol=0.0,
                                  estep_tol=0.0, mstep_ftol_rel=0.0)
    if cfg.estep_solver == "schulz":
        cfg = dataclasses.replace(cfg, estep_solver="chol")
    if cfg.mstep_logdet == "series":
        cfg = dataclasses.replace(cfg, mstep_logdet="chol")
    return cfg


def population_em_program(cfg: FitConfig, shared: bool, bounds_static,
                          win_w=None):
    """The vmapped EM fit: maps (r, theta, f_params, m, window corner) over
    the leading cell axis with (x, xtilde) shared.  The iteration body is
    branch-free (models/fit.py, knobs normalized by ``_vmap_safe_config``),
    so vmap executes each stage exactly once per lane; the optional crop
    window has a static shared side ``win_w`` with per-cell traced
    corners."""
    cfg = _vmap_safe_config(cfg)
    if win_w is None:
        prog = partial(_fit_program, has_V=False, shared=shared, cfg=cfg,
                       bounds_static=bounds_static, wt=None, wi=None)

        def single(x, r, xtilde, theta, f_params, m0, V0):
            return prog(x, r, xtilde, theta, f_params, m0, V0)

        return jax.vmap(single, in_axes=(None, 0, None, 0, 0, 0, None))

    prog = partial(_fit_program, has_V=False, shared=shared, cfg=cfg,
                   bounds_static=bounds_static, wt=None, wi=None,
                   win_w=win_w)

    def single(x, r, xtilde, theta, f_params, m0, V0, i0, j0):
        return prog(x, r, xtilde, theta, f_params, m0, V0,
                    win_i0=i0, win_j0=j0)

    return jax.vmap(single, in_axes=(None, 0, None, 0, 0, 0, None, 0, 0))


def fit_population(x: jnp.ndarray, rs: jnp.ndarray,
                   cfg: Optional[FitConfig] = None,
                   xtilde: Optional[jnp.ndarray] = None,
                   thetas: Optional[Dict[str, jnp.ndarray]] = None,
                   f_params: Optional[Dict[str, jnp.ndarray]] = None,
                   mesh=None, seed: int = 0, lower_only: bool = False):
    """Fit every cell in ``rs`` (ncells, nt) against stimuli ``x`` (nt, nx).

    ``thetas``/``f_params`` may carry a leading cell axis or be scalar (then
    broadcast).  With ``mesh``, inputs are sharded cells x data and the whole
    population EM runs as one GSPMD program.  Returns a cell-stacked Carry
    pytree (leading axis = cell) plus the theta bounds.
    """
    from .. import params as P

    cfg = cfg or FitConfig()
    x = jnp.asarray(x)
    rs = jnp.asarray(rs)
    ncells, nt = rs.shape
    dtype = x.dtype
    ntilde = cfg.resolve_ntilde(nt)

    if xtilde is None:
        if ntilde == nt:
            xtilde = x
        else:
            key = jax.random.PRNGKey(seed)
            idx = jax.random.permutation(key, nt)[:ntilde]
            xtilde = x[idx]
    else:
        xtilde = jnp.asarray(xtilde, dtype)
        ntilde = xtilde.shape[0]
    if cfg.ntilde != ntilde:
        cfg = dataclasses.replace(cfg, ntilde=ntilde)
    # per-lane (nt, nx) gram intermediates spill HBM when stored for the
    # backward pass: rematerialize instead
    if not cfg.remat_gram:
        cfg = dataclasses.replace(cfg, remat_gram=True)
    # vmap-linear inner optimizer: the zoom line search's cond/while_loop
    # control flow costs ~10x per lane under vmap; the batched-backtracking
    # Armijo L-BFGS (optim/lbfgs.py) is branch-free
    if cfg.linesearch == "zoom":
        cfg = dataclasses.replace(cfg, linesearch="armijo")
    if cfg.max_linesearch_steps > 5:
        cfg = dataclasses.replace(cfg, max_linesearch_steps=5)
    shared = xtilde is x or (xtilde.shape == x.shape
                             and bool(jnp.all(xtilde == x)))

    lower, upper = theta_bounds()
    if thetas is None:
        theta1, _, _ = P.generate_theta(x, rs[0], cfg.n_px_side)
        thetas = {k: jnp.broadcast_to(v, (ncells,)) for k, v in theta1.items()}
    else:
        thetas = {k: jnp.broadcast_to(jnp.asarray(v, dtype), (ncells,))
                  for k, v in thetas.items()}
    if f_params is None:
        fp1 = default_f_params(dtype)
        f_params = {k: jnp.broadcast_to(v, (ncells,)) for k, v in fp1.items()}
    else:
        f_params = {k: jnp.broadcast_to(jnp.asarray(v, dtype), (ncells,))
                    for k, v in f_params.items()}

    if cfg.mstep_gram == "projected" and cfg.mstep_proj_rank is None:
        # one static rank for all lanes: size it for the sharpest cell's
        # smoothing spectrum (rank grows with gr)
        from ..ops.kernels import suggest_proj_rank
        gr_max = float(jnp.max(jnp.exp(thetas["-log2rho2"])))
        cfg = dataclasses.replace(
            cfg, mstep_proj_rank=suggest_proj_rank(gr_max, cfg.n_px_side,
                                                   cfg.n_px_side))

    m0 = jnp.zeros((ncells, ntilde), dtype)
    V0 = jnp.zeros((ntilde, ntilde), dtype)   # unused (has_V=False)
    bounds_static = (tuple(sorted(lower.items())),
                     tuple(sorted(upper.items())))

    # per-cell crop windows with a shared static side (fixed for the whole
    # program, from the initial thetas; 1.5x margin as in the
    # whole-fit single-cell path)
    win_w = None
    i0s = j0s = None
    if cfg.crop_window:
        from ..ops.kernels import crop_window_for_theta
        wins = [crop_window_for_theta(
            {k: jnp.asarray(v[c]) for k, v in thetas.items()},
            cfg.n_px_side, cfg.alpha_threshold, cfg.crop_margin * 1.5,
            cfg.crop_bucket) for c in range(ncells)]
        w_max = max(w for _, _, w in wins)
        if w_max < cfg.n_px_side:
            win_w = w_max
            i0s = jnp.asarray([max(0, min(i, cfg.n_px_side - w_max))
                               for i, _, _ in wins], jnp.int32)
            j0s = jnp.asarray([max(0, min(j, cfg.n_px_side - w_max))
                               for _, j, _ in wins], jnp.int32)

    vprog = population_em_program(cfg, shared, bounds_static, win_w=win_w)
    args = (x, rs, xtilde, thetas, f_params, m0, V0)
    if win_w is not None:
        args = args + (i0s, j0s)

    if mesh is not None:
        x_sh, cell_sh, repl = population_shardings(mesh)
        in_shardings = (x_sh, cell_sh, repl,
                        {k: cell_sh for k in THETA_KEYS},
                        {k: cell_sh for k in ("logA", "lambda0")},
                        cell_sh, repl)
        if win_w is not None:
            in_shardings = in_shardings + (cell_sh, cell_sh)
        jitted = jax.jit(vprog, in_shardings=in_shardings)
    else:
        jitted = jax.jit(vprog)
    if lower_only:
        # AOT hook: (jitted_fn, args) so callers can .lower(*args).compile()
        # for per-device cost analysis / HLO inspection without executing
        # (benchmarks/bench_multichip_scaling.py)
        return (jitted, args), (lower, upper)
    fitted = jitted(*args)
    return fitted, (lower, upper)


def fit_cells_sequential(x: jnp.ndarray, rs: jnp.ndarray,
                         cfg: Optional[FitConfig] = None,
                         xtilde: Optional[jnp.ndarray] = None,
                         thetas: Optional[Dict] = None,
                         f_params: Optional[Dict] = None,
                         seed: int = 0) -> list:
    """Fit cells one at a time through the cached single-cell program — the
    recommended multi-cell path on a single device.

    The vmapped program (fit_population) lowers every lax.cond in the inner
    L-BFGS line searches to execute-both-branches and runs their while_loops
    to the all-lanes bound, costing ~10x per cell on one chip (measured;
    see benchmarks/bench_population.py).  Sequential fits reuse one compiled
    program at full efficiency; the vmapped path is for sharding the cell
    axis across a mesh where per-device lane counts stay small.
    """
    from ..models.fit import fit
    import dataclasses as _dc

    cfg = cfg or FitConfig()
    if cfg.jit_whole_fit:
        cfg = _dc.replace(cfg, jit_whole_fit=False)
    rs = jnp.asarray(rs)
    out = []
    for c in range(rs.shape[0]):
        th = None if thetas is None else             {k: (v[c] if jnp.ndim(v) > 0 else v) for k, v in thetas.items()}
        out.append(fit(x, rs[c], cfg, xtilde=xtilde, theta=th,
                       f_params=f_params, seed=seed))
    return out


def population_results(carry: Carry, cfg: FitConfig, xtilde,
                       lower, upper) -> list:
    """Split a cell-stacked Carry into per-cell FitResult objects."""
    ncells = carry.m_b.shape[0]
    out = []
    for c in range(ncells):
        one = jax.tree_util.tree_map(lambda a: a[c], carry)
        kern = one.kern
        es = kern.es
        out.append(FitResult(
            config=cfg, xtilde=xtilde, theta=one.theta,
            theta_lower=lower, theta_upper=upper,
            f_params=one.f_params, m_b=one.m_b, V_b=one.V_b,
            B=es.B, keep=es.keep, eigvals=es.eigvals,
            k_tilde_b_diag=es.k_tilde_b_diag,
            k_tilde_inv_diag=es.k_tilde_inv_diag,
            K_tilde=kern.K_tilde, K=kern.K, Kvec=kern.Kvec, K_b=kern.K_b,
            a=kern.a, track=one.track,
            failed=bool(one.failed), failed_at=int(one.failed_at)))
    return out
