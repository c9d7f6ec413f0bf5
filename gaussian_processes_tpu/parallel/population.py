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


def population_em_program(cfg: FitConfig, shared: bool, bounds_static):
    """The vmapped EM fit: maps (r, theta, f_params, m) over the leading
    cell axis with (x, xtilde) shared."""
    prog = partial(_fit_program, has_V=False, shared=shared, cfg=cfg,
                   bounds_static=bounds_static, wt=None, wi=None)

    def single(x, r, xtilde, theta, f_params, m0, V0):
        return prog(x, r, xtilde, theta, f_params, m0, V0)

    return jax.vmap(single, in_axes=(None, 0, None, 0, 0, 0, None))


def fit_population(x: jnp.ndarray, rs: jnp.ndarray,
                   cfg: Optional[FitConfig] = None,
                   xtilde: Optional[jnp.ndarray] = None,
                   thetas: Optional[Dict[str, jnp.ndarray]] = None,
                   f_params: Optional[Dict[str, jnp.ndarray]] = None,
                   mesh=None, seed: int = 0):
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

    m0 = jnp.zeros((ncells, ntilde), dtype)
    V0 = jnp.zeros((ntilde, ntilde), dtype)   # unused (has_V=False)
    bounds_static = (tuple(sorted(lower.items())),
                     tuple(sorted(upper.items())))

    vprog = population_em_program(cfg, shared, bounds_static)

    if mesh is not None:
        x_sh, cell_sh, repl = population_shardings(mesh)
        in_shardings = (x_sh, cell_sh, repl,
                        {k: cell_sh for k in THETA_KEYS},
                        {k: cell_sh for k in ("logA", "lambda0")},
                        cell_sh, repl)
        fitted = jax.jit(vprog, in_shardings=in_shardings)(
            x, rs, xtilde, thetas, f_params, m0, V0)
    else:
        fitted = jax.jit(vprog)(x, rs, xtilde, thetas, f_params, m0, V0)
    return fitted, (lower, upper)


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
