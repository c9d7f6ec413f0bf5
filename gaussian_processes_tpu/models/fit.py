"""The EM trainer: sparse variational GP fit with Poisson observations.

This is the TPU-native re-architecture of the reference's ``varGP``
(Spatial_GP_repo/utils.py:1569-2316).  Same algorithm — alternating
closed-form Newton E-steps on the variational Gaussian (m, V), L-BFGS updates
of the firing-rate gain logA with closed-form optimal lambda0, and L-BFGS
M-steps on the six kernel hyperparameters — but expressed as ONE jit-compiled
program:

* static shapes everywhere (Kronecker-factored kernels, keep-mask eigenspace
  stabilization), so the whole ``maxiter`` EM loop is a ``lax.fori_loop``;
* hyperparameter gradients via ``jax.grad`` through the kernel rebuild (the
  reference hand-codes them; those formulas are the test-suite oracle);
* failure recovery matching the reference's rollback semantics
  (utils.py:2127-2189): a non-finite iteration reverts to the last good state
  and freezes, recorded in ``failed_at`` — but detected with ``lax.cond``
  instead of host-side exceptions;
* per-iteration tracking (loss decomposition, theta, f-params, variational
  state, kept-rank) stored in preallocated device arrays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import FitConfig, MATMUL_PRECISION, precision_scope
from ..ops.kernels import (crop_images, crop_window_for_theta,
                           gram_matrices, gram_matrices_precropped,
                           gram_matrices_projected,
                           gram_matrices_windowed, local_envelope,
                           smooth_projection_basis)
from ..ops.precision import split_matmul
from ..ops.stabilize import (Eigenspace, compute_eigenspace,
                             compute_eigenspace_iterative, masked_inverse,
                             masked_inverse_warm, masked_logdet_series,
                             project_gram, reproject, subspace_eigenspace)
from ..optim.lbfgs import (empty_lbfgs_memory, lbfgs_minimize,
                           lbfgs_minimize_armijo,
                           lbfgs_minimize_backtracking,
                           lbfgs_minimize_speculative,
                           lbfgs_minimize_zoom_carry, zoom_carry_init)


def _minimize(cfg: FitConfig, fun, x0, num_steps, gtol=0.0, ftol=0.0,
              ftol_rel=0.0):
    """Inner L-BFGS dispatch on cfg.linesearch (see FitConfig).  The
    "zoom_carry" mode only changes the M-step (state threaded through the
    EM carry); every other minimize site — the f-param updates, and the
    M-step when mstep_memory is off — runs the plain zoom.  ``gtol``/
    ``ftol`` (M-step call site only) early-terminate converged zoom
    L-BFGS runs; see FitConfig.mstep_gtol."""
    if cfg.linesearch == "armijo":
        return lbfgs_minimize_armijo(fun, x0, num_steps,
                                     ls_trials=cfg.armijo_trials)
    if cfg.linesearch == "backtracking":
        return lbfgs_minimize_backtracking(
            fun, x0, num_steps,
            max_linesearch_steps=cfg.max_linesearch_steps)
    if cfg.linesearch == "speculative":
        x, f, _ = lbfgs_minimize_speculative(
            fun, x0, num_steps, max_backtracks=cfg.armijo_trials)
        return x, f
    return lbfgs_minimize(fun, x0, num_steps,
                          max_linesearch_steps=cfg.max_linesearch_steps,
                          gtol=gtol, ftol=ftol, ftol_rel=ftol_rel)


def _mstep_carries_memory(cfg: FitConfig) -> bool:
    """True when the M-step L-BFGS curvature memory is threaded through the
    EM carry (cross-iteration warm start; speculative or zoom_carry line
    search)."""
    return (cfg.linesearch in ("speculative", "zoom_carry")
            and cfg.mstep_memory and cfg.n_mstep > 0)
from ..params import THETA_KEYS, clip_theta, theta_bounds, theta_in_bounds
from .estep import estep_update
from .moments import (kl_divergence, lambda0_given_logA, lambda_moments,
                      mean_f_given_lambda_moments, poisson_ell)

Theta = Dict[str, jnp.ndarray]
FParams = Dict[str, jnp.ndarray]


class KernelState(NamedTuple):
    """Kernels + stabilizing eigenspace for the current theta."""
    K_tilde: jnp.ndarray   # (ntilde, ntilde)
    K: jnp.ndarray         # (nt, ntilde) — alias of K_tilde when shared
    Kvec: jnp.ndarray      # (nt,)
    es: Eigenspace
    K_b: jnp.ndarray       # (nt, ntilde) = K @ B
    a: jnp.ndarray         # (nt, ntilde) = K_b K_tilde_b^-1 (or B when shared)


class Track(NamedTuple):
    """Per-iteration history (the reference's values_track,
    utils.py:1713-1727)."""
    logmarginal: jnp.ndarray
    loglikelihood: jnp.ndarray
    KL: jnp.ndarray
    theta: Dict[str, jnp.ndarray]
    logA: jnp.ndarray
    lambda0: jnp.ndarray
    n_eigen: jnp.ndarray
    m_b: jnp.ndarray        # (maxiter, ntilde) or (maxiter, 0)
    V_b: jnp.ndarray        # (maxiter, ntilde, ntilde) or (maxiter, 0, 0)
    B: jnp.ndarray          # (maxiter, ntilde, ntilde) or (maxiter, ntilde, 0)
                            # — the stabilized basis per iteration, recorded
                            # only when cfg.track_basis (exact
                            # state_at_iteration under warm-basis runs)


class Carry(NamedTuple):
    theta: Theta
    f_params: FParams
    m_b: jnp.ndarray
    V_b: jnp.ndarray
    kern: KernelState
    lambda_m: jnp.ndarray
    lambda_var: jnp.ndarray
    track: Track
    failed: jnp.ndarray      # bool scalar
    failed_at: jnp.ndarray   # int scalar, -1 if clean
    # M-step L-BFGS memory carried across EM iterations — (S, Y, rho, age)
    # when _mstep_carries_memory(cfg), else the empty pytree ()
    mem: Any = ()


@dataclasses.dataclass
class FitResult:
    """Everything the reference's ``fit_model`` dict returns
    (utils.py:2271-2288), as a typed result."""
    config: FitConfig
    xtilde: jnp.ndarray
    theta: Theta
    theta_lower: Dict[str, float]
    theta_upper: Dict[str, float]
    f_params: FParams
    m_b: jnp.ndarray
    V_b: jnp.ndarray
    B: jnp.ndarray
    keep: jnp.ndarray
    eigvals: jnp.ndarray
    k_tilde_b_diag: jnp.ndarray
    k_tilde_inv_diag: jnp.ndarray
    K_tilde: jnp.ndarray
    K: jnp.ndarray
    Kvec: jnp.ndarray
    K_b: jnp.ndarray
    a: jnp.ndarray
    track: Track
    failed: bool
    failed_at: int
    timing: Optional[Dict[str, Any]] = None
    # True when any EM iteration ran the warm-started subspace eigensolver:
    # the per-iteration bases are then Rayleigh-Ritz bases NOT reproducible
    # from theta alone (state_at_iteration needs cfg.track_basis).
    used_warm_basis: bool = False

    @property
    def mask(self) -> jnp.ndarray:
        """Boolean pixel mask of the final theta (the reference stores it in
        fit_model; here it is derived on demand)."""
        _, _, mask = local_envelope(self.theta, self.config.n_px_side,
                                    alpha_threshold=self.config.alpha_threshold)
        return mask

    @property
    def eigenspace(self) -> Eigenspace:
        return Eigenspace(self.B, self.eigvals, self.keep,
                          self.k_tilde_b_diag, self.k_tilde_inv_diag)

    @property
    def kernel_state(self) -> KernelState:
        """The final kernels + eigenspace, reusable as ``fit(...,
        init_kernel=)`` (the reference's ``init_kernel`` warm-start dict,
        utils.py:1674-1694)."""
        return KernelState(self.K_tilde, self.K, self.Kvec, self.eigenspace,
                           self.K_b, self.a)

    def values_track(self) -> Dict[str, Any]:
        """Reference-shaped values_track dict (utils.py:1713-1727)."""
        t = self.track
        return {
            "loss_track": {"logmarginal": t.logmarginal,
                           "loglikelihood": t.loglikelihood, "KL": t.KL},
            "theta_track": dict(t.theta),
            "f_par_track": {"logA": t.logA, "lambda0": t.lambda0},
            "variation_par_track": {"m_b": t.m_b, "V_b": t.V_b},
            "n_eigen_track": t.n_eigen,
        }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _masked_grams(theta, x=None, xtilde=None, shared=None, cfg=None,
                  wt=None, wi=None, win=None):
    """Gram matrices with optional pad-and-mask weights: inactive inducing
    rows/cols of K_tilde and inactive training rows of K / Kvec are zeroed,
    which confines the whole downstream algebra (eigh keep-mask, E-step,
    moments) to the active subproblem without any shape change.  ``win`` is
    an optional (i0, j0, w) static-size crop window."""
    if win is not None:
        K_tilde, K, Kvec = gram_matrices_windowed(
            theta, x, xtilde, cfg.n_px_side, shared, win[0], win[1], win[2],
            cfg.alpha_threshold)
    else:
        K_tilde, K, Kvec = gram_matrices(theta, x, xtilde, cfg.n_px_side,
                                         shared, cfg.alpha_threshold)
    return _apply_pad_weights(K_tilde, K, Kvec, shared, wt, wi)


def _apply_pad_weights(K_tilde, K, Kvec, shared, wt=None, wi=None):
    if wi is not None:
        K_tilde = K_tilde * (wi[:, None] * wi[None, :])
        if shared:
            K = K_tilde
        else:
            K = K * wi[None, :]
    if wt is not None:
        if shared:
            K = K_tilde
        else:
            K = K * wt[:, None]
        Kvec = Kvec * wt
    return K_tilde, K, Kvec


def _build_kernel_state(theta: Theta, x, xtilde, shared: bool,
                        cfg: FitConfig, wt=None, wi=None,
                        win=None, rank=None, es_warm=None,
                        refresh_pred=None) -> KernelState:
    K_tilde, K, Kvec = _masked_grams(theta, x, xtilde, shared, cfg, wt, wi,
                                     win)
    if es_warm is not None and rank is not None:
        # warm-started subspace Rayleigh-Ritz with a refresh fallback on
        # numerical failure (lax.cond: only one branch executes per call).
        # ``refresh_pred`` (traced bool) forces the refresh branch — the
        # whole-fit program's periodic refresh, decided by the loop index
        # in-graph (per-iteration mode decides it on the host instead).
        es_sub, ok = subspace_eigenspace(K_tilde, es_warm.B,
                                         cfg.eigval_tol,
                                         n_power=cfg.subspace_power_steps)
        use_warm = ok if refresh_pred is None else (ok & ~refresh_pred)
        if cfg.eigh_impl == "subspace":
            # the refresh is the same warm iteration driven harder (more
            # power steps pull the subspace onto the true top-rank span
            # regardless of accumulated Rayleigh-Ritz drift).  It uses the
            # CholQR orthogonalization (one Rayleigh-Ritz eigh total): the
            # clamped-eigh orthogonalization inside compute_eigenspace_
            # iterative exists for ill-conditioned COLD subspaces, and at
            # rank 384 each eigh costs ~20 ms of sequential panel work on
            # this hardware — a refresh paid 9 of them per firing (~32% of
            # the whole fit, profiled round 3).  A rank-deficient CholQR
            # falls back to the eigh-orthogonalized route in-graph.
            def refresh():
                es_r, ok_r = subspace_eigenspace(
                    K_tilde, es_warm.B, cfg.eigval_tol,
                    n_power=cfg.refresh_power_steps)
                return lax.cond(
                    ok_r, lambda: es_r,
                    lambda: compute_eigenspace_iterative(
                        K_tilde, rank, cfg.eigval_tol,
                        n_power=cfg.refresh_power_steps, seed_B=es_warm.B))
        else:
            refresh = lambda: compute_eigenspace(K_tilde, cfg.eigval_tol,
                                                 rank=rank)
        es = lax.cond(use_warm, lambda: es_sub, refresh)
    elif (cfg.eigh_impl == "subspace" and rank is not None
          and rank < K_tilde.shape[-1]):
        es = compute_eigenspace_iterative(K_tilde, rank, cfg.eigval_tol,
                                          n_power=cfg.subspace_init_power)
    else:
        es = compute_eigenspace(K_tilde, cfg.eigval_tol, rank=rank)
    K_b = jnp.matmul(K, es.B, precision=MATMUL_PRECISION)
    a = es.B if shared else K_b * es.k_tilde_inv_diag[None, :]
    return KernelState(K_tilde, K, Kvec, es, K_b, a)


def _fparam_objective(logA, r, lambda_m, lambda_var, wt=None):
    """Profiled negative ELL: lambda0 at its closed-form optimum for the
    trial logA (the reference interleaves the closed form with the L-BFGS
    closure, utils.py:1892-1934; at convergence both are identical by the
    envelope theorem)."""
    lam0 = lambda0_given_logA(logA, r, lambda_m, lambda_var, weight=wt)
    f_params = {"logA": logA, "lambda0": lam0}
    f_mean = mean_f_given_lambda_moments(f_params, lambda_m, lambda_var)
    return -poisson_ell(r, f_mean, lambda_m, f_params, weight=wt)


def _estep_block(x, r, kern: KernelState, m_b, V_b, f_params, lambda_m,
                 lambda_var, cfg: FitConfig, wt=None):
    """n_estep Newton updates on (m_b, V_b), each followed by an L-BFGS
    update of logA with closed-form lambda0 (reference: utils.py:1859-1943).

    With ``cfg.estep_solver == "schulz"`` the inner SPD inverse of every
    Newton step after the first is warm-started from the previous step's
    inverse via Newton-Schulz (exact-Cholesky fallback in-graph): f moves
    less and less between Newton steps, so the seed converges in a few MXU
    matmuls and the per-step triangular-solve latency disappears.

    ``cfg.estep_tol`` (0 = off) early-terminates the Newton loop once the
    posterior mean stops moving — the alpha=1 Newton update converges
    quadratically, so late EM iterations typically need 2-3 of the
    configured n_estep steps.  Converged steps take a lax.cond identity
    branch (zero solves, zero f-param L-BFGS runs), exactly like the
    M-step's mstep_ftol gate."""
    schulz = cfg.estep_solver == "schulz"
    early = cfg.estep_tol > 0.0

    def one_step(i, state):
        m_b, V_b, f_params, lambda_m, lambda_var, Minv = state
        f_mean = mean_f_given_lambda_moments(f_params, lambda_m, lambda_var)
        if schulz:
            m_b, V_b, Minv = estep_update(
                r, kern.a, m_b, f_mean, kern.es.k_tilde_b_diag, f_params,
                weight=wt, Minv_warm=Minv, use_warm=(i > 0),
                schulz_steps=cfg.schulz_steps, return_minv=True)
        else:
            m_b, V_b = estep_update(r, kern.a, m_b, f_mean,
                                    kern.es.k_tilde_b_diag, f_params,
                                    weight=wt)
        lambda_m, lambda_var = lambda_moments(kern.a, kern.K_b, kern.Kvec,
                                              m_b, V_b)
        logA, _ = _minimize(
            cfg,
            partial(_fparam_objective, r=r, lambda_m=lambda_m,
                    lambda_var=lambda_var, wt=wt),
            f_params["logA"], cfg.n_fparamstep)
        lam0 = lambda0_given_logA(logA, r, lambda_m, lambda_var, weight=wt)
        f_params = {"logA": logA, "lambda0": lam0}
        return m_b, V_b, f_params, lambda_m, lambda_var, Minv

    if not early:
        def body(i, state):
            return one_step(i, state)
    else:
        def body(i, state):
            inner, done = state
            def upd(inner):
                m_old = inner[0]
                new = one_step(i, inner)
                # relative inf-norm move of the posterior mean; lambda
                # moments, V and the f-params are smooth functions of m, so
                # a stalled m means a stalled E-step
                dm = jnp.max(jnp.abs(new[0] - m_old))
                conv = dm <= cfg.estep_tol * (1.0 + jnp.max(jnp.abs(m_old)))
                return new, conv
            new, conv = lax.cond(done, lambda s: (s, jnp.asarray(True)),
                                 upd, inner)
            return new, done | conv

    rank = m_b.shape[0]
    state = (m_b, V_b, f_params, lambda_m, lambda_var,
             jnp.zeros((rank, rank), m_b.dtype))
    if early:
        state = (state, jnp.asarray(False))
        out = lax.fori_loop(0, cfg.n_estep, body, state)[0]
    else:
        out = lax.fori_loop(0, cfg.n_estep, body, state)
    return out[:5]


def _mstep_objective(theta: Theta, x, xtilde, r, es: Eigenspace, m_b, V_b,
                     f_params, shared: bool, cfg: FitConfig,
                     lower, upper, wt=None, wi=None, win=None, proj=None,
                     xcrop=None):
    """Negative log-marginal as a function of theta with the eigenspace B
    FIXED (reference closure: utils.py:2017-2112).  Out-of-bounds trial
    points return +inf (utils.py:2020-2028); the loss itself is evaluated on
    clipped theta so its gradient stays finite.

    ``proj`` (optional, cfg.mstep_gram == "projected"): the per-iteration
    spectral projection ``(E, xc, xtc, i0, j0)`` — the smoothing eigenbasis
    at the iteration-start theta plus the pre-cropped stimuli.  The Gram
    then runs at contraction length rank^2 instead of w^2, with an in-graph
    residual-guarded fallback to the exact path (ops/kernels.py)."""
    ok = theta_in_bounds(theta, lower, upper)
    theta_c = clip_theta(theta, lower, upper)

    # This objective only steers the L-BFGS line search — its matmuls run
    # at cfg.mstep_precision ("high" = 3-pass bf16, ~2x faster grams); the
    # tracked loss and the posterior are computed at full precision outside.
    with precision_scope(cfg.mstep_precision):
        if proj is not None:
            E, xc, xtc, pi0, pj0 = proj

            def gram_fn(theta_t):
                Kt, K, Kv, p_ok = gram_matrices_projected(
                    theta_t, xc, xtc, E, pi0, pj0, cfg.n_px_side, shared,
                    cfg.alpha_threshold, cfg.mstep_proj_tol)

                if cfg.mstep_proj_fallback == "exact":
                    def exact():
                        if win is not None:
                            return gram_matrices_windowed(
                                theta_t, x, xtilde, cfg.n_px_side, shared,
                                win[0], win[1], win[2], cfg.alpha_threshold)
                        return gram_matrices(theta_t, x, xtilde,
                                             cfg.n_px_side, shared,
                                             cfg.alpha_threshold)

                    Kt, K, Kv = lax.cond(p_ok, lambda: (Kt, K, Kv), exact)
                    p_ok = jnp.asarray(True)
                # "poison": keep the projected matrices and let p_ok drive
                # the loss to +inf below — branchless, so vmapped population
                # lanes never batch the exact-Gram fallback
                Kt, K, Kv = _apply_pad_weights(Kt, K, Kv, shared, wt, wi)
                return Kt, K, Kv, p_ok
        elif xcrop is not None and win is not None:
            # the crop of the theta-independent stimuli is hoisted to the
            # EM-iteration body (ONE strided copy per iteration instead of
            # one per line-search evaluation — see gram_matrices_precropped)
            xc_h, xtc_h = xcrop

            def gram_fn(theta_t):
                Kt, K, Kv = gram_matrices_precropped(
                    theta_t, xc_h, xtc_h, cfg.n_px_side, shared,
                    win[0], win[1], win[2], cfg.alpha_threshold)
                Kt, K, Kv = _apply_pad_weights(Kt, K, Kv, shared, wt, wi)
                return Kt, K, Kv, jnp.asarray(True)
        else:
            def gram_fn(theta_t):
                Kt, K, Kv = _masked_grams(theta_t, x=x, xtilde=xtilde,
                                          shared=shared, cfg=cfg, wt=wt,
                                          wi=wi, win=win)
                return Kt, K, Kv, jnp.asarray(True)
        if cfg.remat_gram:
            gram_fn = jax.checkpoint(gram_fn)
        K_tilde, K, Kvec, proj_ok = gram_fn(theta_c)
        B = es.B
        K_tilde_b = split_matmul(B.T, split_matmul(K_tilde, B))
        K_tilde_b = 0.5 * (K_tilde_b + K_tilde_b.T)
        K_b = split_matmul(K, B)
        if cfg.mstep_inverse == "schulz":
            # warm-seeded Newton-Schulz: es.k_tilde_inv_diag is the EXACT
            # inverse of K_tilde_b at the theta where the fixed eigenspace
            # was computed, so nearby line-search trials converge in a few
            # MXU matmuls (exact-inverse fallback in-graph on residual
            # failure) — no LU latency per objective evaluation
            K_tilde_inv_b = masked_inverse_warm(
                K_tilde_b, es.keep, es.k_tilde_inv_diag,
                steps=cfg.schulz_steps, fallback=cfg.schulz_fallback)
        else:
            K_tilde_inv_b = masked_inverse(K_tilde_b, es.keep)
        a = B if shared else split_matmul(K_b, K_tilde_inv_b)

        lambda_m, lambda_var = lambda_moments(a, K_b, Kvec, m_b, V_b)
        f_mean = mean_f_given_lambda_moments(f_params, lambda_m, lambda_var)
        ell = poisson_ell(r, f_mean, lambda_m, f_params, weight=wt)
        # log|V| is constant in theta: omit it (pure offset; saves an O(n^3)
        # factorization per line-search evaluation).  Cholesky-only logdet: a
        # non-PSD trial K_tilde_b gives NaN -> inf loss -> rejected step.
        ld_K = None
        if cfg.mstep_logdet == "series":
            # warm-seeded trace series: three rank x rank matmuls instead
            # of the small-matrix Cholesky's fixed latency; in-graph
            # Cholesky fallback for far trials (ops/stabilize.py)
            ld_K = masked_logdet_series(K_tilde_b, es.keep,
                                        es.k_tilde_inv_diag)
        kl = kl_divergence(m_b, V_b, es, K_tilde_b=K_tilde_b,
                           K_tilde_inv_b=K_tilde_inv_b, skip_logdet_V=True,
                           chol_only=True, logdet_K=ld_K)
    loss = -(ell - kl)
    return jnp.where(ok & proj_ok & jnp.isfinite(loss), loss, jnp.inf)


def _track_update(track: Track, i, loss_tuple, theta, f_params, es, m_b, V_b,
                  cfg: FitConfig) -> Track:
    ell, kl = loss_tuple
    new_theta = {k: track.theta[k].at[i].set(theta[k]) for k in THETA_KEYS}
    t = track._replace(
        logmarginal=track.logmarginal.at[i].set(ell - kl),
        loglikelihood=track.loglikelihood.at[i].set(ell),
        KL=track.KL.at[i].set(kl),
        theta=new_theta,
        logA=track.logA.at[i].set(f_params["logA"]),
        lambda0=track.lambda0.at[i].set(f_params["lambda0"]),
        n_eigen=track.n_eigen.at[i].set(
            jnp.sum(es.keep).astype(jnp.int32)),
    )
    if cfg.track_variational:
        # Reduced-rank state is left-padded into the full-width track slots
        # so tracked coordinates always align with a full ascending eigh
        # (the sliced basis is the LAST rank columns).
        off = t.m_b.shape[1] - m_b.shape[0]
        t = t._replace(m_b=t.m_b.at[i, off:].set(m_b),
                       V_b=t.V_b.at[i, off:, off:].set(V_b))
        if t.B.shape[2] > 0:
            offb = t.B.shape[2] - es.B.shape[1]
            t = t._replace(B=t.B.at[i, :, offb:].set(es.B))
    return t


# ---------------------------------------------------------------------------
# The jitted fit program
# ---------------------------------------------------------------------------

def _fit_init(x, r, xtilde, theta0: Theta, f_params0: FParams, m0, V0,
              has_V: bool, shared: bool, cfg: FitConfig, wt=None, wi=None,
              win_i0=None, win_j0=None, win_w=None, kern0=None) -> Carry:
    """Initialization: kernels, eigenspace, variational state, tracking
    (reference: utils.py:1667-1791).  ``kern0`` is an optional precomputed
    KernelState (the reference's ``init_kernel`` warm start,
    utils.py:1674-1694) that skips the initial gram + eigh."""
    dtype = x.dtype
    ntilde = xtilde.shape[0]
    maxiter = cfg.maxiter

    win = None if win_w is None else (win_i0, win_j0, win_w)
    init_rank = cfg.init_rank
    if init_rank is not None and init_rank >= ntilde:
        init_rank = None
    kern = kern0 if kern0 is not None else _build_kernel_state(
        theta0, x, xtilde, shared, cfg, wt, wi, win, rank=init_rank)
    es = kern.es
    m_b = jnp.matmul(es.B.T, m0, precision=MATMUL_PRECISION)
    if has_V:
        V_b = jnp.matmul(es.B.T, jnp.matmul(V0, es.B,
                                            precision=MATMUL_PRECISION),
                         precision=MATMUL_PRECISION)
        ld_V0 = None
    else:
        V_b = jnp.diag(es.k_tilde_b_diag)
        # V_b is exactly diagonal here (V init = K_tilde, utils.py:1700):
        # its kept-block log-determinant is a sum of logs — skipping the
        # generic Cholesky/eigh-fallback logdet keeps the full-size eigh
        # (a ~120 MB TPU executable at ntilde=2100) out of the init program
        ld_V0 = jnp.sum(jnp.log(jnp.where(es.keep, es.eigvals,
                                          jnp.ones_like(es.eigvals))))

    lambda_m, lambda_var = lambda_moments(kern.a, kern.K_b, kern.Kvec,
                                          m_b, V_b)
    f_mean = mean_f_given_lambda_moments(f_params0, lambda_m, lambda_var)
    ell0 = poisson_ell(r, f_mean, lambda_m, f_params0, weight=wt)
    kl0 = kl_divergence(m_b, V_b, es, logdet_V=ld_V0)

    nvar = ntilde if cfg.track_variational else 0
    nbas = ntilde if (cfg.track_variational and cfg.track_basis) else 0
    track = Track(
        logmarginal=jnp.zeros(maxiter, dtype),
        loglikelihood=jnp.zeros(maxiter, dtype),
        KL=jnp.zeros(maxiter, dtype),
        theta={k: jnp.zeros(maxiter, dtype) for k in THETA_KEYS},
        logA=jnp.zeros(maxiter, dtype),
        lambda0=jnp.zeros(maxiter, dtype),
        n_eigen=jnp.zeros(maxiter, jnp.int32),
        m_b=jnp.zeros((maxiter, nvar), dtype),
        V_b=jnp.zeros((maxiter, nvar, nvar), dtype),
        B=jnp.zeros((maxiter, ntilde, nbas), dtype),
    )
    track = _track_update(track, 0, (ell0, kl0), theta0, f_params0, es,
                          m_b, V_b, cfg)

    if _mstep_carries_memory(cfg):
        mem = (zoom_carry_init(theta0,
                               max_linesearch_steps=cfg.max_linesearch_steps)
               if cfg.linesearch == "zoom_carry"
               else empty_lbfgs_memory(len(THETA_KEYS), dtype))
    else:
        mem = ()
    return Carry(theta0, f_params0, m_b, V_b, kern, lambda_m, lambda_var,
                 track, jnp.asarray(False), jnp.asarray(-1, jnp.int32), mem)


def _fit_iteration(i, c: Carry, x, r, xtilde, shared: bool, cfg: FitConfig,
                   bounds_static, wt=None, wi=None,
                   win_i0=None, win_j0=None, win_w=None,
                   do_mstep: bool = True, warm_eigh: bool = False) -> Carry:
    """One EM iteration (reference loop body: utils.py:1794-2125), a no-op
    once the carry is marked failed.

    Branch-free by design: under vmap (population fits) a lax.cond lowers to
    executing BOTH branches for every lane, so the kernel rebuild runs
    unconditionally (recomputing identical kernels at i=1 — same values, one
    redundant gram+eigh per fit) and the skip-M-step-in-last-iteration rule
    is a static ``do_mstep`` flag resolved by the caller.  Failure rollback
    is a tree-select, not a branch.
    """
    lower = dict(bounds_static[0])
    upper = dict(bounds_static[1])
    win = None if win_w is None else (win_i0, win_j0, win_w)

    def do_iteration(c: Carry) -> Carry:
        theta, f_params = c.theta, c.f_params
        m_b, V_b, kern = c.m_b, c.V_b, c.kern

        # Rebuild kernels + eigenspace and reproject the variational state
        # (utils.py:1801-1841).  At i=1 theta is unchanged since init, so
        # this reproduces the same kernels/eigenspace (the reprojection is
        # through B^T B = masked identity).  The stabilized rank is static,
        # inferred from the carry (ntilde = full-shape mode; anything
        # smaller = reduced-rank mode, see _slice_carry / fit()).
        if cfg.n_mstep > 0:
            rnk = m_b.shape[0]
            reduced = rnk < xtilde.shape[0]
            warm = warm_eigh and reduced
            # The refresh schedule is decided in-graph from the (traced)
            # loop index: the warm program's full-eigh fallback branch
            # doubles as the periodic refresh, so ONE compiled program
            # serves warm and refresh iterations alike (compiles are
            # expensive on this class of host).
            rp = None
            if warm and cfg.eigh_refresh_every > 0:
                rp = (i % cfg.eigh_refresh_every) == 0
            kern_new = _build_kernel_state(
                theta, x, xtilde, shared, cfg, wt, wi, win,
                rank=rnk if reduced else None,
                es_warm=kern.es if warm else None,
                refresh_pred=rp)
            m_b, V_b = reproject(kern_new.es, kern.es, m_b, V_b)
            kern = kern_new

        # Refresh moments + closed-form lambda0 at iteration start
        # (the reference's first-E-step refresh, utils.py:1870-1874).
        lambda_m, lambda_var = lambda_moments(kern.a, kern.K_b, kern.Kvec,
                                              m_b, V_b)
        lam0 = lambda0_given_logA(f_params["logA"], r, lambda_m, lambda_var,
                                  weight=wt)
        f_params = {"logA": f_params["logA"], "lambda0": lam0}

        if cfg.n_estep > 0:
            m_b, V_b, f_params, lambda_m, lambda_var = _estep_block(
                x, r, kern, m_b, V_b, f_params, lambda_m, lambda_var, cfg,
                wt=wt)

        # Track loss decomposition (utils.py:1953-1991).
        f_mean = mean_f_given_lambda_moments(f_params, lambda_m, lambda_var)
        ell = poisson_ell(r, f_mean, lambda_m, f_params, weight=wt)
        kl = kl_divergence(m_b, V_b, kern.es)
        track = _track_update(c.track, i, (ell, kl), theta, f_params,
                              kern.es, m_b, V_b, cfg)

        # M-step on theta with the eigenspace fixed; the caller skips it in
        # the last iteration so the final state matches its eigenspace
        # (utils.py:1999-2114).
        mem = c.mem
        if cfg.n_mstep > 0 and do_mstep:
            proj = None
            if cfg.mstep_gram == "projected":
                # Per-iteration spectral projection: eigenbasis of the 1-D
                # smoothing factor at the ITERATION-START theta (theta moves
                # little within one line search — the same warm-seeding
                # insight as the subspace eigensolver), plus the
                # theta-independent crop hoisted out of the line search.
                side = win[2] if win is not None else cfg.n_px_side
                rank = min(cfg.mstep_proj_rank, side)
                E = smooth_projection_basis(theta, side, cfg.n_px_side,
                                            rank, dtype=m_b.dtype)
                if win is not None:
                    xc = crop_images(x, win[0], win[1], side, cfg.n_px_side)
                    xtc = (xc if shared else
                           crop_images(xtilde, win[0], win[1], side,
                                       cfg.n_px_side))
                    pi0, pj0 = win[0], win[1]
                else:
                    xc = x
                    xtc = x if shared else xtilde
                    pi0 = pj0 = 0
                proj = (E, xc, xtc, pi0, pj0)
            xcrop = None
            if proj is None and win is not None:
                # hoist the theta-independent crop out of the line search:
                # one strided copy per EM iteration instead of one per
                # objective evaluation (see gram_matrices_precropped)
                xc = crop_images(x, win[0], win[1], win[2], cfg.n_px_side)
                xtc = (xc if shared else
                       crop_images(xtilde, win[0], win[1], win[2],
                                   cfg.n_px_side))
                xcrop = (xc, xtc)
            obj = partial(_mstep_objective, x=x, xtilde=xtilde, r=r,
                          es=kern.es, m_b=m_b, V_b=V_b,
                          f_params=f_params, shared=shared, cfg=cfg,
                          lower=lower, upper=upper, wt=wt, wi=wi,
                          win=win, proj=proj, xcrop=xcrop)
            if _mstep_carries_memory(cfg):
                if cfg.linesearch == "zoom_carry":
                    theta, _, mem = lbfgs_minimize_zoom_carry(
                        obj, theta, cfg.n_mstep, state=c.mem,
                        max_linesearch_steps=cfg.max_linesearch_steps,
                        gtol=cfg.mstep_gtol, ftol=cfg.mstep_ftol,
                        ftol_rel=cfg.mstep_ftol_rel)
                else:
                    theta, _, mem = lbfgs_minimize_speculative(
                        obj, theta, cfg.n_mstep,
                        max_backtracks=cfg.armijo_trials, memory=c.mem)
            else:
                theta, _ = _minimize(cfg, obj, theta, cfg.n_mstep,
                                     gtol=cfg.mstep_gtol,
                                     ftol=cfg.mstep_ftol,
                                     ftol_rel=cfg.mstep_ftol_rel)

        new = Carry(theta, f_params, m_b, V_b, kern, lambda_m, lambda_var,
                    track, c.failed, c.failed_at, mem)

        # Rollback on numerical failure (reference except-handlers,
        # utils.py:2127-2189): revert to the iteration-start state and
        # freeze.
        finite = (jnp.isfinite(ell - kl)
                  & jnp.all(jnp.isfinite(m_b))
                  & jnp.all(jnp.isfinite(V_b))
                  & jnp.all(jnp.isfinite(
                      jnp.stack([theta[k] for k in THETA_KEYS]))))
        failed_now = ~finite
        reverted = c._replace(failed=jnp.asarray(True),
                              failed_at=jnp.asarray(i, jnp.int32))
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(failed_now, a, b), reverted, new)

    out = do_iteration(c)
    # freeze once failed (tree-select, branch-free)
    return jax.tree_util.tree_map(
        lambda frozen, live: jnp.where(c.failed, frozen, live), c, out)


def _fit_finalize(c: Carry, cfg: FitConfig) -> Carry:
    """Final V_b symmetry / PSD repair (utils.py:2243-2248)."""
    dtype = c.V_b.dtype
    ntilde = c.V_b.shape[0]
    V_b = 0.5 * (c.V_b + c.V_b.T)
    keepf = c.kern.es.keep.astype(dtype)
    # guarded eigh: a non-finite V (failed fit, frozen carry) must not
    # reach the TPU eigensolver (NaN input faults the device)
    from ..ops.stabilize import _eigh_safe
    ev, _, v_finite = _eigh_safe(V_b + jnp.diag(1.0 - keepf))
    min_eig = jnp.where(v_finite, jnp.min(ev), jnp.asarray(jnp.nan, dtype))
    V_b = jnp.where(min_eig <= 0,
                    V_b + jnp.eye(ntilde, dtype=dtype) * cfg.eigval_tol
                    * keepf[:, None] * keepf[None, :],
                    V_b)
    return c._replace(V_b=V_b)


def _slice_carry(c: Carry, rank: int, shared: bool) -> Carry:
    """Re-shape the carry's stabilized-basis state to a new static ``rank``.

    Shrinking takes the LAST ``rank`` coordinates (the top of the ascending
    eigh — exactly the keep-masked subspace whenever rank >= n_eigen, since
    dropped coordinates are exact zeros).  Growing left-pads with zero
    coordinates (keep=False), which contribute nothing until the next
    kernel rebuild re-derives the eigenspace at the larger rank."""
    es = c.kern.es
    r_in = c.m_b.shape[0]
    if rank == r_in:
        return c
    if rank < r_in:
        sl = slice(r_in - rank, None)
        es_new = Eigenspace(es.B[:, sl], es.eigvals[sl], es.keep[sl],
                            es.k_tilde_b_diag[sl], es.k_tilde_inv_diag[sl])
        K_b = c.kern.K_b[:, sl]
        a = es_new.B if shared else c.kern.a[:, sl]
        m_b = c.m_b[sl]
        V_b = c.V_b[sl][:, sl]
    else:
        pad = rank - r_in
        dtype = c.m_b.dtype
        ntilde = es.B.shape[0]
        zc = jnp.zeros((ntilde, pad), dtype)
        zv = jnp.zeros(pad, dtype)
        es_new = Eigenspace(
            jnp.concatenate([zc, es.B], axis=1),
            jnp.concatenate([zv, es.eigvals]),
            jnp.concatenate([jnp.zeros(pad, bool), es.keep]),
            jnp.concatenate([zv, es.k_tilde_b_diag]),
            jnp.concatenate([zv, es.k_tilde_inv_diag]))
        ztc = jnp.zeros((c.kern.K_b.shape[0], pad), dtype)
        K_b = jnp.concatenate([ztc, c.kern.K_b], axis=1)
        a = es_new.B if shared else jnp.concatenate([ztc, c.kern.a], axis=1)
        m_b = jnp.concatenate([zv, c.m_b])
        V_b = jnp.zeros((rank, rank), dtype).at[pad:, pad:].set(c.V_b)
    kern = c.kern._replace(es=es_new, K_b=K_b, a=a)
    return c._replace(m_b=m_b, V_b=V_b, kern=kern)


_slice_carry_jit = jax.jit(_slice_carry, static_argnames=("rank", "shared"))


def _rank_bucket(n_eigen: int, cfg: FitConfig, ntilde: int) -> int:
    """Static rank budget for a measured kept-rank: slack + bucket so jit
    caches a handful of shapes and the budget survives modest growth."""
    r = int(n_eigen * cfg.rank_slack) + cfg.rank_pad
    r = ((r + cfg.rank_bucket - 1) // cfg.rank_bucket) * cfg.rank_bucket
    return min(r, ntilde)


def _fit_program(x, r, xtilde, theta0: Theta, f_params0: FParams,
                 m0, V0, has_V: bool, shared: bool, cfg: FitConfig,
                 bounds_static, wt=None, wi=None,
                 win_i0=None, win_j0=None, win_w=None, kern0=None):
    """The whole EM fit as ONE program (init + fori_loop + finalize).
    The optional crop window is FIXED for the whole program (computed from
    the initial theta with an enlarged margin); fit() checks post hoc that
    the final RF mask stayed inside it."""
    carry = _fit_init(x, r, xtilde, theta0, f_params0, m0, V0, has_V,
                      shared, cfg, wt, wi, win_i0, win_j0, win_w, kern0)
    # Whole-fit reduced-rank mode: one full eigh at init, then every EM
    # iteration runs the '_b' algebra at this static rank with the
    # warm-started subspace eigensolver (periodic in-graph full refresh).
    # fit() verifies post hoc that the budget never saturated.
    rank = cfg.whole_fit_rank
    warm = False
    if rank is not None and rank < xtilde.shape[0]:
        carry = _slice_carry(carry, rank, shared)
        warm = cfg.eigensolver == "subspace"
    if cfg.maxiter > 2:
        carry = lax.fori_loop(
            1, cfg.maxiter - 1,
            lambda i, c: _fit_iteration(i, c, x, r, xtilde, shared, cfg,
                                        bounds_static, wt, wi,
                                        win_i0, win_j0, win_w,
                                        do_mstep=True, warm_eigh=warm),
            carry)
    if cfg.maxiter > 1:
        # final iteration: no M-step (utils.py:1999 skips it so the final
        # state matches its eigenspace)
        carry = _fit_iteration(jnp.asarray(cfg.maxiter - 1, jnp.int32),
                               carry, x, r, xtilde, shared, cfg,
                               bounds_static, wt, wi,
                               win_i0, win_j0, win_w, do_mstep=False,
                               warm_eigh=warm)
    return _fit_finalize(carry, cfg)


_fit_program_jit = jax.jit(
    _fit_program,
    static_argnames=("has_V", "shared", "cfg", "bounds_static", "win_w"))

# Per-iteration compilation: the same math as _fit_program but driven by a
# host loop — three small programs instead of one maxiter-times-unrolled HLO.
# Numerically identical; dispatch overhead is microseconds per EM iteration.
_fit_init_jit = jax.jit(_fit_init,
                        static_argnames=("has_V", "shared", "cfg", "win_w"))
_fit_iteration_jit = jax.jit(
    _fit_iteration,
    static_argnames=("shared", "cfg", "bounds_static", "win_w", "do_mstep",
                     "warm_eigh"),
    donate_argnums=(1,))
_fit_finalize_jit = jax.jit(_fit_finalize, static_argnames=("cfg",))


def _sync_probe(c: Carry):
    """The per-iteration host-sync payload (window theta scalars + keep
    mask), extracted as fresh small buffers.  Dispatched BEFORE the donating
    iteration call so the host can read iteration i-1's schedule data while
    iteration i executes on device (the carry's own buffers are donated and
    gone by then)."""
    th = c.theta
    return (th["-2log2beta"], th["eps_0x"], th["eps_0y"], c.kern.es.keep)


_sync_probe_jit = jax.jit(_sync_probe)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

def fit(x: jnp.ndarray, r: jnp.ndarray, cfg: Optional[FitConfig] = None,
        xtilde: Optional[jnp.ndarray] = None,
        theta: Optional[Theta] = None,
        f_params: Optional[FParams] = None,
        m: Optional[jnp.ndarray] = None,
        V: Optional[jnp.ndarray] = None,
        sample_weight: Optional[jnp.ndarray] = None,
        inducing_weight: Optional[jnp.ndarray] = None,
        init_kernel: Optional[KernelState] = None,
        mesh=None, seed: int = 0, profile: bool = False) -> FitResult:
    """Fit the spatial GP to (x, r).  The ``varGP`` equivalent.

    x: (nt, nx) stimuli, r: (nt,) spike counts.  All optional arguments
    mirror the reference's kwargs (xtilde / hyperparams / f_params / m / V
    warm starts, utils.py:1651-1704).

    ``sample_weight`` (nt,) / ``inducing_weight`` (ntilde,) are 0/1 masks for
    the pad-and-mask active-learning path: the buffers stay at fixed capacity
    (one compiled program for the whole closed loop) while masked entries are
    exactly excluded from the fit.

    ``init_kernel`` — a precomputed KernelState (e.g. ``prev.kernel_state``
    from an earlier FitResult at the same theta/xtilde) that skips the
    initial gram + eigendecomposition, matching the reference's
    ``init_kernel`` warm-start kwarg (utils.py:1674-1694; its active loop
    hands kernels across rounds this way).

    ``mesh`` — a jax Mesh with a "data" axis: training points (rows of x,
    r, K, and the moment/E-step reductions) are sharded across it and GSPMD
    inserts the ICI collectives.  This is the big-nt scale-out of a single
    cell's fit (the cells axis is fit_population's); numerics are identical
    to the unsharded program.
    """
    from .. import params as P

    cfg = cfg or FitConfig()
    x = jnp.asarray(x)
    r = jnp.asarray(r)
    dtype = x.dtype
    nt = x.shape[0]
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
    if ntilde != xtilde.shape[0]:
        ntilde = xtilde.shape[0]
        cfg = dataclasses.replace(cfg, ntilde=ntilde)
    # inducing set identical to training set -> shared fast path
    # (reference: K = K_tilde, KKtilde_inv_b = B, utils.py:1677-1694)
    shared = xtilde is x or (
        xtilde.shape == x.shape and bool(jnp.all(xtilde == x)))

    if theta is None:
        theta, lower, upper = P.generate_theta(x, r, cfg.n_px_side)
    else:
        theta = {k: jnp.asarray(v, dtype) for k, v in theta.items()}
        lower, upper = P.theta_bounds()
    if f_params is None:
        f_params = P.default_f_params(dtype)
    else:
        f_params = {k: jnp.asarray(v, dtype) for k, v in f_params.items()}

    if cfg.mstep_gram == "projected" and cfg.mstep_proj_rank is None:
        # size the spectral rank from the start theta (one host sync); the
        # per-trial residual guard still protects every evaluation if rho
        # later outgrows the budget
        from ..ops.kernels import suggest_proj_rank
        gr0 = float(jax.device_get(jnp.exp(theta["-log2rho2"])))
        cfg = dataclasses.replace(
            cfg, mstep_proj_rank=suggest_proj_rank(gr0, cfg.n_px_side,
                                                   cfg.n_px_side))

    has_V = V is not None
    m0 = jnp.zeros(ntilde, dtype) if m is None else jnp.asarray(m, dtype)
    V0 = jnp.zeros((ntilde, ntilde), dtype) if V is None else jnp.asarray(V, dtype)

    bounds_static = (tuple(sorted(lower.items())),
                     tuple(sorted(upper.items())))
    wt = None if sample_weight is None else jnp.asarray(sample_weight, dtype)
    wi = None if inducing_weight is None else jnp.asarray(inducing_weight,
                                                          dtype)
    if mesh is not None:
        # shard the training-point axis; GSPMD propagates the sharding
        # through the Gram rows and psums the E-step / moment reductions
        from jax.sharding import NamedSharding, PartitionSpec as _P
        row_sh = NamedSharding(mesh, _P("data", None))
        vec_sh = NamedSharding(mesh, _P("data"))
        repl = NamedSharding(mesh, _P())
        x = jax.device_put(x, row_sh)
        r = jax.device_put(r, vec_sh)
        xtilde = jax.device_put(xtilde, row_sh if shared else repl)
        if wt is not None:
            wt = jax.device_put(wt, vec_sh)
        if wi is not None:
            wi = jax.device_put(wi, vec_sh if shared else repl)
    if shared and (wt is not None or wi is not None):
        # one buffer, one mask
        wt = wt if wt is not None else wi
        wi = wi if wi is not None else wt
    timing = None
    used_warm = False
    if cfg.jit_whole_fit:
        used_warm = (cfg.whole_fit_rank is not None
                     and cfg.whole_fit_rank < ntilde
                     and cfg.eigensolver == "subspace"
                     and cfg.n_mstep > 0 and cfg.maxiter > 1)
        # fixed crop window from the initial theta (doubled margin); checked
        # against the final mask below
        wf_win = dict(win_i0=None, win_j0=None, win_w=None)
        if cfg.crop_window:
            i0, j0, w = crop_window_for_theta(
                theta, cfg.n_px_side, cfg.alpha_threshold,
                cfg.crop_margin * 1.5, cfg.crop_bucket)
            if w < cfg.n_px_side:
                wf_win = dict(win_i0=jnp.asarray(i0, jnp.int32),
                              win_j0=jnp.asarray(j0, jnp.int32), win_w=w)
        carry = _fit_program_jit(x, r, xtilde, theta, f_params, m0, V0,
                                 has_V=has_V, shared=shared, cfg=cfg,
                                 bounds_static=bounds_static, wt=wt, wi=wi,
                                 kern0=init_kernel, **wf_win)
        if cfg.whole_fit_rank is not None and cfg.whole_fit_rank < ntilde:
            # The budget saturated: the keep mask filled the whole static
            # rank, so the truncation may have been harder than the
            # reference's eigenvalue rule.  Auto-fall-back to the exact
            # full-rank program instead of returning a possibly-inexact fit.
            if int(jnp.max(carry.track.n_eigen)) >= cfg.whole_fit_rank:
                import warnings as _warnings
                _warnings.warn(
                    f"whole_fit_rank={cfg.whole_fit_rank} saturated "
                    "(kept rank hit the budget); re-running at full rank")
                return fit(x, r,
                           dataclasses.replace(cfg, whole_fit_rank=None),
                           xtilde=xtilde, theta=theta, f_params=f_params,
                           m=m, V=V, sample_weight=sample_weight,
                           inducing_weight=inducing_weight,
                           init_kernel=init_kernel, mesh=mesh, seed=seed,
                           profile=profile)
        if wf_win["win_w"] is not None:
            fi0, fj0, fw = crop_window_for_theta(
                carry.theta, cfg.n_px_side, cfg.alpha_threshold,
                1.0, 1)
            w0 = wf_win["win_w"]
            i0v = int(wf_win["win_i0"]); j0v = int(wf_win["win_j0"])
            if not (fi0 >= i0v and fj0 >= j0v
                    and fi0 + fw <= i0v + w0 and fj0 + fw <= j0v + w0):
                # The RF outgrew the fixed window: the whole-fit result is
                # inexact.  Auto-fall-back to the per-iteration path, whose
                # window tracks theta between compiled calls (exact), instead
                # of returning a silently-wrong fit.
                import warnings as _warnings
                _warnings.warn(
                    "RF mask outgrew the fixed crop window during a "
                    "whole-fit run; re-running with the per-iteration "
                    "tracking window (exact)")
                return fit(x, r,
                           dataclasses.replace(cfg, jit_whole_fit=False),
                           xtilde=xtilde, theta=theta, f_params=f_params,
                           m=m, V=V, sample_weight=sample_weight,
                           inducing_weight=inducing_weight,
                           init_kernel=init_kernel, mesh=mesh, seed=seed,
                           profile=profile)
    else:
        import os as _os
        _log_win = bool(_os.environ.get("GPTPU_LOG_WINDOW"))

        from ..ops.kernels import crop_window_from_scalars

        def window_args_from(lb, ex, ey):
            if not cfg.crop_window:
                return dict(win_i0=None, win_j0=None, win_w=None)
            i0, j0, w = crop_window_from_scalars(
                lb, ex, ey, cfg.n_px_side, cfg.alpha_threshold,
                cfg.crop_margin, cfg.crop_bucket)
            if cfg.pin_window_w is not None and w < cfg.pin_window_w:
                # grow to the pinned floor (recentred around the scheduled
                # window; still covers the alpha mask) so one static window
                # shape serves the whole fit — see config.pin_window_w
                wp = min(cfg.pin_window_w, cfg.n_px_side)
                i0 = max(0, min(i0 - (wp - w) // 2, cfg.n_px_side - wp))
                j0 = max(0, min(j0 - (wp - w) // 2, cfg.n_px_side - wp))
                w = wp
            if _log_win:
                import sys as _sys
                print(f"[fit] crop window i0={i0} j0={j0} w={w}",
                      file=_sys.stderr)
            if w >= cfg.n_px_side:
                return dict(win_i0=None, win_j0=None, win_w=None)
            return dict(win_i0=jnp.asarray(i0, jnp.int32),
                        win_j0=jnp.asarray(j0, jnp.int32), win_w=w)

        def sync_scalars(carry_or_theta, keep=None):
            """ONE host transfer per iteration: the window's theta scalars
            plus (optionally) the keep mask for the rank budget."""
            th = (carry_or_theta.theta if hasattr(carry_or_theta, "theta")
                  else carry_or_theta)
            vals = [th["-2log2beta"], th["eps_0x"], th["eps_0y"]]
            if keep is not None:
                vals.append(keep)
            got = jax.device_get(tuple(vals))
            lb, ex, ey = (float(v) for v in got[:3])
            n_eig = int(got[3].sum()) if keep is not None else None
            return window_args_from(lb, ex, ey), n_eig

        import time as _time
        timing = {"per_iteration": []} if profile else None
        t0 = _time.perf_counter()
        wargs0, _ = sync_scalars(theta)
        carry = _fit_init_jit(x, r, xtilde, theta, f_params, m0, V0,
                              has_V=has_V, shared=shared, cfg=cfg,
                              wt=wt, wi=wi, kern0=init_kernel, **wargs0)
        if profile:
            jax.block_until_ready(carry.m_b)
            timing["init"] = _time.perf_counter() - t0
        # Reduced-rank mode: run every iteration at a static rank budget
        # derived from the measured kept-rank (the reference's dynamic
        # n_eigen, utils.py:1683, realized as a handful of bucketed static
        # shapes).  n_eigen is synced together with theta's window scalars.
        # ``cfg_it`` normalizes maxiter out of the iteration/finalize cache
        # keys: their programs do not depend on it, and production-shape
        # compiles cost minutes on this class of host.
        reduced = cfg.reduced_rank
        cfg_it = dataclasses.replace(cfg, maxiter=0)
        n_eig_hist: list = []
        # Lag-1 pipelined syncs: the window/rank schedule for iteration i is
        # decided from iteration i-2's carry, probed into fresh small
        # buffers (``_sync_probe_jit``) before the donating iteration call.
        # The host's device_get then only waits for an already-finished
        # probe, so the tunnel round trip overlaps with the in-flight
        # iteration instead of stalling the device between every pair of
        # iterations.  The crop window's margin and the rank budget's
        # slack+hysteresis make the one-iteration staleness exact-safe (a
        # window is exact whenever it covers the alpha mask; a rank budget
        # is exact whenever it covers the kept rank).
        def window_covers(wargs_used, lb, ex, ey):
            """True when the (possibly full-frame) window dispatched earlier
            still covers the margin-1.0 alpha mask of the probed theta."""
            if wargs_used is None or wargs_used["win_w"] is None:
                return True
            fi0, fj0, fw = crop_window_from_scalars(
                lb, ex, ey, cfg.n_px_side, cfg.alpha_threshold, 1.0, 1)
            i0v = int(wargs_used["win_i0"])
            j0v = int(wargs_used["win_j0"])
            w0 = wargs_used["win_w"]
            return (fi0 >= i0v and fj0 >= j0v
                    and fi0 + fw <= i0v + w0 and fj0 + fw <= j0v + w0)

        def rerun_grown_window(it):
            """A dispatched crop window failed to cover the resulting
            theta's margin-1.0 alpha mask: that iteration's kernels were
            inexact.  NEVER return a silently-inexact fit (the same
            contract as the whole-fit and static-schedule paths, which
            re-run on their post-hoc checks): re-run the whole fit with
            the margin doubled — a fast-drifting RF needs more slack for
            the lag-1 schedule — falling back to the full frame
            (crop_window=False, exact by construction) once the margin is
            implausibly large.  Recursion terminates: the margin doubles
            at most ~3 times before the full-frame fallback."""
            import warnings as _warnings
            if cfg.crop_margin * 2.0 <= 8.0:
                grown = dataclasses.replace(
                    cfg, crop_margin=cfg.crop_margin * 2.0)
                how = f"crop_margin {cfg.crop_margin} -> {grown.crop_margin}"
            else:
                grown = dataclasses.replace(cfg, crop_window=False)
                how = "crop_window=False (full frame)"
            _warnings.warn(
                f"crop window used at EM iteration {it} no longer covers "
                "the RF alpha mask of the iteration's resulting theta "
                "(fast-drifting RF outran the lag-1 window schedule); "
                f"re-running the fit with {how}.")
            return fit(x, r, grown, xtilde=xtilde, theta=theta,
                       f_params=f_params, m=m, V=V,
                       sample_weight=sample_weight,
                       inducing_weight=inducing_weight,
                       init_kernel=init_kernel, mesh=mesh, seed=seed,
                       profile=profile)

        if cfg.static_schedule:
            # No in-loop probes: every iteration is dispatched back-to-back
            # with the INIT window and rank, so the device never idles on a
            # host round trip (see config.static_schedule).  Exactness is
            # checked once post hoc, with a dynamic-schedule re-run as the
            # fallback — the same contract as the whole-fit program above.
            for i in range(1, cfg.maxiter):
                ti = _time.perf_counter()
                warm = (reduced and cfg.eigensolver == "subspace"
                        and carry.m_b.shape[0] < ntilde)
                used_warm = used_warm or warm
                carry = _fit_iteration_jit(jnp.asarray(i, jnp.int32), carry,
                                           x, r, xtilde, shared=shared,
                                           cfg=cfg_it,
                                           bounds_static=bounds_static,
                                           wt=wt, wi=wi,
                                           do_mstep=(i < cfg.maxiter - 1),
                                           warm_eigh=warm,
                                           **wargs0)
                if profile:
                    jax.block_until_ready(carry.m_b)
                    timing["per_iteration"].append(_time.perf_counter() - ti)
            carry = _fit_finalize_jit(carry, cfg=cfg_it)
            if profile:
                jax.block_until_ready(carry.m_b)
                timing["total"] = _time.perf_counter() - t0
            rank_now = carry.m_b.shape[0]
            saturated = (reduced and rank_now < ntilde
                         and int(jnp.max(carry.track.n_eigen)) >= rank_now)
            # Post-hoc exactness: validate the fixed window against EVERY
            # tracked iteration's theta, not just the final one — theta can
            # drift outside the window mid-fit and return (the dynamic path
            # checks each dispatched iteration; this is its batched analog).
            # One host transfer: the three tracked window-scalar arrays.
            covered = True
            if (cfg.crop_window and wargs0.get("win_w") is not None
                    and not bool(carry.failed)):
                tt = carry.track.theta
                lbs, exs, eys = jax.device_get(
                    (tt["-2log2beta"], tt["eps_0x"], tt["eps_0y"]))
                covered = all(
                    window_covers(wargs0, float(lbs[i]), float(exs[i]),
                                  float(eys[i]))
                    for i in range(cfg.maxiter))
            if saturated or not covered:
                import warnings as _warnings
                _warnings.warn(
                    "static_schedule run was inexact (rank budget "
                    "saturated or the RF outgrew the fixed window); "
                    "re-running with the dynamic probing schedule")
                return fit(x, r,
                           dataclasses.replace(cfg, static_schedule=False),
                           xtilde=xtilde, theta=theta, f_params=f_params,
                           m=m, V=V, sample_weight=sample_weight,
                           inducing_weight=inducing_weight,
                           init_kernel=init_kernel, mesh=mesh, seed=seed,
                           profile=profile)
            kern = carry.kern
            es = kern.es
            return FitResult(
                config=cfg, xtilde=xtilde, theta=carry.theta,
                theta_lower=lower, theta_upper=upper,
                f_params=carry.f_params, m_b=carry.m_b, V_b=carry.V_b,
                B=es.B, keep=es.keep, eigvals=es.eigvals,
                k_tilde_b_diag=es.k_tilde_b_diag,
                k_tilde_inv_diag=es.k_tilde_inv_diag,
                K_tilde=kern.K_tilde, K=kern.K, Kvec=kern.Kvec, K_b=kern.K_b,
                a=kern.a, track=carry.track,
                failed=bool(carry.failed), failed_at=int(carry.failed_at),
                timing=timing, used_warm_basis=used_warm,
            )

        # Retroactive exactness check for the lag-1 pipelined window
        # schedule: when iteration i-2's end-state probe arrives, verify the
        # window DISPATCHED for iteration i-2 still covers its resulting
        # theta's margin-1.0 alpha mask (the whole-fit path has the same
        # post-hoc check against its fixed window).
        wargs_used: dict = {}
        pending = _sync_probe_jit(carry)
        for i in range(1, cfg.maxiter):
            ti = _time.perf_counter()
            got = jax.device_get(pending)
            probed = tuple(float(v) for v in got[:3])
            wargs = window_args_from(*probed)
            if cfg.crop_window and i - 2 in wargs_used:
                if not window_covers(wargs_used.pop(i - 2), *probed):
                    return rerun_grown_window(i - 2)
            if reduced:
                # Budget from the MAX kept-rank of the last few syncs: the
                # warm subspace solver's tail eigenvalues are biased low, so
                # its kept-rank undershoots the periodic full-eigh refresh's
                # — without the history the budget flaps between two buckets
                # every refresh (one expensive recompile each way) and can
                # spuriously saturate.
                n_eig_hist.append(int(got[3].sum()))
                r_next = _rank_bucket(max(n_eig_hist[-3:]), cfg, ntilde)
                if cfg.pin_rank is not None:
                    # floor at the pinned budget: prevents bucket-boundary
                    # flap (one fresh ~10-min compile per flip) while still
                    # growing on true saturation — see config.pin_rank
                    r_next = min(max(r_next, cfg.pin_rank), ntilde)
                if _log_win:
                    import sys as _sys
                    print(f"[fit] i={i} n_eig={n_eig_hist[-1]} "
                          f"rank {carry.m_b.shape[0]} -> {r_next} "
                          f"window {wargs.get('win_w')}", file=_sys.stderr)
                if r_next != carry.m_b.shape[0]:
                    carry = _slice_carry_jit(carry, rank=r_next,
                                             shared=shared)
            # Warm-started subspace eigensolver whenever the carry is in a
            # reduced basis (the i=1 basis comes from init's converged full
            # eigh, so warming is exact there too); the periodic full-eigh
            # refresh happens IN-GRAPH via the traced i (one compiled
            # program covers warm + refresh iterations).
            warm = (reduced and cfg.eigensolver == "subspace"
                    and carry.m_b.shape[0] < ntilde)
            used_warm = used_warm or warm
            pending = _sync_probe_jit(carry)
            wargs_used[i] = wargs
            carry = _fit_iteration_jit(jnp.asarray(i, jnp.int32), carry,
                                       x, r, xtilde, shared=shared,
                                       cfg=cfg_it,
                                       bounds_static=bounds_static,
                                       wt=wt, wi=wi,
                                       do_mstep=(i < cfg.maxiter - 1),
                                       warm_eigh=warm,
                                       **wargs)   # ...iteration i executes
            if profile:
                jax.block_until_ready(carry.m_b)
                timing["per_iteration"].append(_time.perf_counter() - ti)
        carry = _fit_finalize_jit(carry, cfg=cfg_it)
        if cfg.crop_window and wargs_used:
            # the last one/two dispatched windows were never probed in-loop;
            # check them against the final theta
            fin = tuple(float(v)
                        for v in jax.device_get(_sync_probe_jit(carry))[:3])
            for it, wu in sorted(wargs_used.items()):
                if not window_covers(wu, *fin):
                    return rerun_grown_window(it)
        if profile:
            jax.block_until_ready(carry.m_b)
            timing["total"] = _time.perf_counter() - t0
    kern = carry.kern
    es = kern.es
    return FitResult(
        config=cfg, xtilde=xtilde, theta=carry.theta,
        theta_lower=lower, theta_upper=upper,
        f_params=carry.f_params, m_b=carry.m_b, V_b=carry.V_b,
        B=es.B, keep=es.keep, eigvals=es.eigvals,
        k_tilde_b_diag=es.k_tilde_b_diag,
        k_tilde_inv_diag=es.k_tilde_inv_diag,
        K_tilde=kern.K_tilde, K=kern.K, Kvec=kern.Kvec, K_b=kern.K_b,
        a=kern.a, track=carry.track,
        failed=bool(carry.failed), failed_at=int(carry.failed_at),
        timing=timing if (not cfg.jit_whole_fit and profile) else None,
        used_warm_basis=used_warm,
    )
