"""Closed-loop active learning: fit -> score -> select -> grow -> refit.

TPU-native re-architecture of the reference's active-training loop
(one_cell_active_training.ipynb:cell17): instead of growing every tensor by
one row per acquisition (new shapes every round, fresh CUDA kernels, a fresh
eigendecomposition of a bigger matrix), the loop runs at **fixed capacity**
with pad-and-mask buffers.  Every round reuses the same compiled fit program,
the same compiled batched acquisition scorer, and the same compiled
evaluation — zero recompiles across hundreds of acquisitions.

The warm-start semantics follow the reference exactly: the variational state
is carried through the original (unprojected) coordinates, the newly added
point gets a unit prior variance row/col and the mean of the current
variational mean (cell17 "Update variational parameters"), and theta /
f_params continue from the previous fit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FitConfig, MATMUL_PRECISION
from .acquisition import score_candidates
from .fit import FitResult, fit
from .inference import evaluate, predict_rates
from .moments import lambda_moments, mean_f_given_lambda_moments, poisson_ell


@dataclasses.dataclass
class ActiveLoopResult:
    selected_idx: List[int]          # pool index chosen at each round
    utilities: List[float]           # utility of the chosen candidate
    r2_history: List[float]          # test r2 after each refit (if test set)
    r2_sigma_history: List[float]
    test_ll_history: List[float]     # held-out log-likelihood per round
    final_fit: FitResult
    in_use_idx: np.ndarray           # all pool indices in the final model


def _test_loglikelihood(res: FitResult, X_ll, R_ll) -> jnp.ndarray:
    """Held-out expected log-likelihood (the reference's fixed-1000-image
    track, one_cell_active_training.ipynb:cell17).  The reference overlaps
    this evaluation with the refit via a host thread (cell19); here the
    DEVICE SCALAR is returned un-synchronized — the caller holds it and
    reads the float only after dispatching the next round's work, so the
    evaluation genuinely overlaps the refit (converting to float here
    would synchronize immediately and serialize the two)."""
    from ..ops.kernels import gram_matrices
    _, K_t, Kvec_t = gram_matrices(res.theta, X_ll, res.xtilde,
                                   res.config.n_px_side, shared=False,
                                   alpha_threshold=res.config.alpha_threshold)
    K_t_b = jnp.matmul(K_t, res.B, precision=MATMUL_PRECISION)
    a_t = K_t_b * res.k_tilde_inv_diag[None, :]
    lam_m, lam_var = lambda_moments(a_t, K_t_b, Kvec_t, res.m_b, res.V_b)
    f_mean = mean_f_given_lambda_moments(res.f_params, lam_m, lam_var)
    return poisson_ell(jnp.asarray(R_ll), f_mean, lam_m, res.f_params)


def active_loop(X_pool, R_pool, start_idx, n_add: int,
                cfg: Optional[FitConfig] = None,
                theta: Optional[Dict] = None,
                f_params: Optional[Dict] = None,
                select: str = "utility",
                X_test=None, R_test=None,
                X_test_ll=None, R_test_ll=None,
                exclude_idx=None,
                r_cutoff: int = 100,
                nbootstrap: int = 200,
                seed: int = 0,
                verbose: bool = False) -> ActiveLoopResult:
    """Run ``n_add`` acquisition rounds starting from ``start_idx``.

    X_pool: (npool, nx) candidate stimuli; R_pool: (npool,) responses (the
    simulated experiment's answers); ``select`` is "utility" (information
    maximization) or "random" (the reference's A/B control,
    one_cell_active_training.ipynb:cell19/23).  ``exclude_idx`` marks pool
    rows never to acquire (e.g. a held-out test set).
    """
    X_pool = jnp.asarray(X_pool)
    R_pool = np.asarray(R_pool)
    npool = X_pool.shape[0]
    start_idx = np.asarray(start_idx)
    n_start = len(start_idx)
    capacity = n_start + n_add
    cfg = cfg or FitConfig()
    cfg = dataclasses.replace(cfg, ntilde=capacity)
    rng = np.random.default_rng(seed)

    dtype = X_pool.dtype
    x_buf = np.zeros((capacity, X_pool.shape[1]), dtype)
    r_buf = np.zeros(capacity, dtype)
    x_buf[:n_start] = np.asarray(X_pool)[start_idx]
    r_buf[:n_start] = R_pool[start_idx]

    used = np.zeros(npool, bool)
    used[start_idx] = True
    if exclude_idx is not None:
        used[np.asarray(exclude_idx)] = True

    n = n_start
    m_warm = None
    V_warm = None
    selected, utilities = [], []
    r2_hist, r2_sig_hist, ll_hist = [], [], []

    res = None
    rank_budget = None
    for round_i in range(n_add + 1):
        mask = (np.arange(capacity) < n).astype(np.float64)
        # Reduced-rank refits: after round 0, run the whole-fit program at a
        # static rank budget derived from the previous round's kept rank
        # (the kept rank grows by at most one per added point, so the
        # bucketed budget is stable across many rounds and the compiled
        # program is reused; fit() auto-falls back to full rank if the
        # budget ever saturates).  This is the TPU answer to the
        # reference's rank-1 K_tilde growth (block_matrix_inverse,
        # utils.py:1055-1070): all square-matrix work in the refit runs at
        # O(rank^2) instead of O(capacity^2).
        cfg_r = cfg if rank_budget is None else dataclasses.replace(
            cfg, whole_fit_rank=rank_budget)
        res = fit(jnp.asarray(x_buf), jnp.asarray(r_buf), cfg_r,
                  xtilde=jnp.asarray(x_buf), theta=theta, f_params=f_params,
                  m=m_warm, V=V_warm,
                  sample_weight=jnp.asarray(mask, dtype))
        theta = res.theta
        f_params = res.f_params
        if cfg.jit_whole_fit:
            from .fit import _rank_bucket
            n_eig = int(np.asarray(res.track.n_eigen).max())
            rank_budget = _rank_bucket(n_eig + 1, cfg, capacity)
            if rank_budget >= capacity:
                rank_budget = None

        if X_test is not None and R_test is not None:
            _, _, r2, s = evaluate(res, X_test, R_test, nbootstrap=nbootstrap)
            r2_hist.append(float(r2)); r2_sig_hist.append(float(s))
        if X_test_ll is not None and R_test_ll is not None:
            # device scalar held un-synchronized; floats are read in one
            # batch at loop end so each eval overlaps the following
            # refit/scorer dispatches (the reference's cell19 thread trick)
            ll_hist.append(_test_loglikelihood(res, jnp.asarray(X_test_ll),
                                               R_test_ll))
        if verbose:
            msg = f"round {round_i}: n={n}"
            if r2_hist:
                msg += f" r2={r2_hist[-1]:.3f}"
            print(msg)

        if round_i == n_add:
            break

        # ---- score remaining candidates and select ----
        if select == "utility":
            from ..ops.kernels import crop_window_for_theta
            wi0, wj0, ww = crop_window_for_theta(
                res.theta, cfg.n_px_side, cfg.alpha_threshold,
                cfg.crop_margin, cfg.crop_bucket) if cfg.crop_window else \
                (0, 0, cfg.n_px_side)
            win = {} if ww >= cfg.n_px_side else dict(
                win_i0=jnp.asarray(wi0, jnp.int32),
                win_j0=jnp.asarray(wj0, jnp.int32), win_w=ww)
            u, _ = score_candidates(
                X_pool, res.xtilde, res.theta, res.f_params, res.m_b,
                res.V_b, res.B, res.k_tilde_inv_diag,
                n_px_side=cfg.n_px_side,
                alpha_threshold=cfg.alpha_threshold, r_cutoff=r_cutoff,
                **win)
            u = np.array(u)
            u[used] = -np.inf
            best = int(np.argmax(u))
            utilities.append(float(u[best]))
        elif select == "random":
            remaining = np.flatnonzero(~used)
            best = int(rng.choice(remaining))
            utilities.append(float("nan"))
        else:
            raise ValueError(f"unknown selection strategy {select!r}")
        selected.append(best)
        used[best] = True

        # ---- grow the buffers (cell17 "Update indices and Kernels") ----
        x_buf[n] = np.asarray(X_pool)[best]
        r_buf[n] = R_pool[best]

        # warm-start the variational state in original coordinates: new
        # point gets unit prior variance and the mean of the current m
        B = np.asarray(res.B)
        m_orig = B @ np.asarray(res.m_b)
        V_orig = B @ np.asarray(res.V_b) @ B.T
        V_orig[n, n] = 1.0
        m_orig[n] = m_orig[:n].mean()
        m_warm = jnp.asarray(m_orig)
        V_warm = jnp.asarray(0.5 * (V_orig + V_orig.T))
        n += 1

    return ActiveLoopResult(
        selected_idx=selected, utilities=utilities, r2_history=r2_hist,
        r2_sigma_history=r2_sig_hist,
        test_ll_history=[float(v) for v in ll_hist],
        final_fit=res, in_use_idx=np.concatenate([start_idx,
                                                  np.asarray(selected,
                                                             int)]),
    )


def ab_experiment(X_pool, R_pool, n_start: int, n_add: int, seeds,
                  cfg: Optional[FitConfig] = None, **loop_kwargs):
    """Active-vs-random A/B control from identical starting models across
    seeds (the reference's scientific control,
    one_cell_active_training.ipynb:cell19/cell23, run over 8 seeds there).

    Each seed draws a fresh random starting set; both arms share it.
    Returns {"active": [ActiveLoopResult...], "random": [...]} in seed
    order.
    """
    npool = np.asarray(X_pool).shape[0]
    out = {"active": [], "random": []}
    for seed in seeds:
        rng = np.random.default_rng(seed)
        start_idx = rng.permutation(npool)[:n_start]
        for arm, select in (("active", "utility"), ("random", "random")):
            out[arm].append(active_loop(
                X_pool, R_pool, start_idx=start_idx, n_add=n_add, cfg=cfg,
                select=select, seed=seed, **loop_kwargs))
    return out


# ---------------------------------------------------------------------------
# Device-resident pipelined loop (round 4): acquisition at device cost
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=(3, 4, 5))
def _select_and_grow(u, X_pool, R_pool, x_buf, r_buf, used, B, m_b, V_b, n):
    """On-device selection + buffer growth + warm-start update — the
    reference's cell17 'Update indices / Update variational parameters'
    block with ZERO host round trips.  ``n`` is the traced count of rows in
    use; the new point gets unit prior variance and the mean of the current
    variational mean, exactly as the reference does."""
    u = jnp.where(used, -jnp.inf, u)
    best = jnp.argmax(u)
    used = used.at[best].set(True)
    x_buf = x_buf.at[n].set(X_pool[best])
    r_buf = r_buf.at[n].set(R_pool[best])
    m_orig = jnp.matmul(B, m_b, precision=MATMUL_PRECISION)
    V_orig = jnp.matmul(jnp.matmul(B, V_b, precision=MATMUL_PRECISION), B.T,
                        precision=MATMUL_PRECISION)
    V_orig = 0.5 * (V_orig + V_orig.T)
    V_orig = V_orig.at[n, n].set(1.0)
    lane = jnp.arange(m_orig.shape[0])
    m_mean = (jnp.sum(jnp.where(lane < n, m_orig, 0.0))
              / jnp.maximum(n, 1).astype(m_orig.dtype))
    m_orig = m_orig.at[n].set(m_mean)
    return x_buf, r_buf, used, m_orig, V_orig, best, u[best]


@partial(jax.jit, donate_argnums=(2, 3, 4))
def _grow_random(best, X_pool, x_buf, r_buf, used, R_pool, B, m_b, V_b, n):
    """Random-arm twin of _select_and_grow (the A/B control): same growth
    and warm-start updates for a host-chosen index."""
    used = used.at[best].set(True)
    x_buf = x_buf.at[n].set(X_pool[best])
    r_buf = r_buf.at[n].set(R_pool[best])
    m_orig = jnp.matmul(B, m_b, precision=MATMUL_PRECISION)
    V_orig = jnp.matmul(jnp.matmul(B, V_b, precision=MATMUL_PRECISION), B.T,
                        precision=MATMUL_PRECISION)
    V_orig = 0.5 * (V_orig + V_orig.T)
    V_orig = V_orig.at[n, n].set(1.0)
    lane = jnp.arange(m_orig.shape[0])
    m_mean = (jnp.sum(jnp.where(lane < n, m_orig, 0.0))
              / jnp.maximum(n, 1).astype(m_orig.dtype))
    m_orig = m_orig.at[n].set(m_mean)
    return x_buf, r_buf, used, m_orig, V_orig


def active_loop_pipelined(X_pool, R_pool, start_idx, n_add: int,
                          cfg: Optional[FitConfig] = None,
                          theta: Optional[Dict] = None,
                          f_params: Optional[Dict] = None,
                          select: str = "utility",
                          exclude_idx=None,
                          r_cutoff: int = 100,
                          seed: int = 0,
                          round_times: Optional[list] = None
                          ) -> ActiveLoopResult:
    """The closed loop with acquisition at DEVICE cost, not tunnel cost.

    ``active_loop`` reads the utilities to the host every round
    (np.argmax), paying one synchronous dispatch round trip (~50 ms through
    the dev tunnel) per acquisition on top of the ~2 ms of device compute.
    Here scoring, masking, argmax, buffer growth, and the warm-start
    variational update all stay ON DEVICE (reference:
    one_cell_active_training.ipynb:cell17's update block + the cell19
    overlap thread): the host never touches the utilities, so the next
    refit's dispatch absorbs the scorer's device time, and the selected
    indices/utilities are read back in ONE transfer after the loop.

    Pool stimuli AND responses must be available as arrays (true for the
    reference's simulated-experiment protocol; a live rig that must display
    the chosen stimulus pays its own readback by construction).

    ``round_times`` (optional, a list) receives per-round wall-clock
    seconds, measured with a synchronization barrier per round —
    benchmarking hook for bench_active_pipelined.py.
    """
    import time as _time

    X_pool = jnp.asarray(X_pool)
    R_pool = jnp.asarray(R_pool, X_pool.dtype)
    npool = X_pool.shape[0]
    start_idx = np.asarray(start_idx)
    n_start = len(start_idx)
    capacity = n_start + n_add
    cfg = cfg or FitConfig()
    cfg = dataclasses.replace(cfg, ntilde=capacity, track_variational=False)
    rng = np.random.default_rng(seed)
    dtype = X_pool.dtype

    x_buf = jnp.zeros((capacity, X_pool.shape[1]), dtype)
    r_buf = jnp.zeros(capacity, dtype)
    x_buf = x_buf.at[:n_start].set(X_pool[start_idx])
    r_buf = r_buf.at[:n_start].set(R_pool[start_idx])
    used_h = np.zeros(npool, bool)
    used_h[start_idx] = True
    if exclude_idx is not None:
        used_h[np.asarray(exclude_idx)] = True
    used = jnp.asarray(used_h)

    lanes = jnp.arange(capacity, dtype=jnp.float64
                       if dtype == jnp.float64 else jnp.float32)

    m_warm = None
    V_warm = None
    res = None
    rank_budget = None
    best_dev, ubest_dev = [], []     # device scalars, read after the loop
    random_picks = []

    for round_i in range(n_add + 1):
        n = n_start + round_i
        mask = (lanes < n).astype(dtype)
        cfg_r = cfg if rank_budget is None else dataclasses.replace(
            cfg, whole_fit_rank=rank_budget)
        res = fit(x_buf, r_buf, cfg_r, xtilde=x_buf, theta=theta,
                  f_params=f_params, m=m_warm, V=V_warm, sample_weight=mask)
        theta = res.theta
        f_params = res.f_params
        if cfg.jit_whole_fit and round_i == 0:
            # ONE host sync to size the steady-state rank budget; all later
            # rounds reuse it (fit() auto-falls back if it ever saturates)
            from .fit import _rank_bucket
            n_eig = int(np.asarray(res.track.n_eigen).max())
            rank_budget = _rank_bucket(n_eig + 1 + n_add, cfg, capacity)
            if rank_budget >= capacity:
                rank_budget = None

        if round_i == n_add:
            break
        t0 = _time.perf_counter()
        if select == "utility":
            u, _ = score_candidates(
                X_pool, res.xtilde, res.theta, res.f_params, res.m_b,
                res.V_b, res.B, res.k_tilde_inv_diag,
                n_px_side=cfg.n_px_side,
                alpha_threshold=cfg.alpha_threshold, r_cutoff=r_cutoff)
            (x_buf, r_buf, used, m_warm, V_warm, best,
             ubest) = _select_and_grow(u, X_pool, R_pool, x_buf, r_buf,
                                       used, res.B, res.m_b, res.V_b,
                                       jnp.asarray(n, jnp.int32))
            best_dev.append(best)
            ubest_dev.append(ubest)
        elif select == "random":
            # the host picks from its own exact copy of the used set (all
            # random-arm picks are host-known), so the arm pays NO device
            # read — the device only grows the buffers
            pick = int(rng.choice(np.flatnonzero(~used_h)))
            used_h[pick] = True
            random_picks.append(pick)
            x_buf, r_buf, used, m_warm, V_warm = _grow_random(
                jnp.asarray(pick, jnp.int32), X_pool, x_buf, r_buf, used,
                R_pool, res.B, res.m_b, res.V_b, jnp.asarray(n, jnp.int32))
        else:
            raise ValueError(f"unknown selection strategy {select!r}")
        if round_times is not None:
            jax.block_until_ready(x_buf)
            round_times.append(_time.perf_counter() - t0)

    if select == "utility":
        got = jax.device_get((best_dev, ubest_dev)) if best_dev else ([], [])
        selected = [int(b) for b in got[0]]
        utilities = [float(v) for v in got[1]]
    else:
        selected = random_picks
        utilities = [float("nan")] * len(random_picks)

    return ActiveLoopResult(
        selected_idx=selected, utilities=utilities, r2_history=[],
        r2_sigma_history=[], test_ll_history=[], final_fit=res,
        in_use_idx=np.concatenate([start_idx, np.asarray(selected, int)]),
    )
