"""TPU-native kernel construction for the spatial GP.

The reference (Spatial_GP_repo/utils.py:861-1050) builds a dense pixel-space
prior matrix ``C = Amp * (alpha alpha^T) . C_smooth`` over a dynamically
cropped pixel subset, then forms arc-cosine Gram matrices through it.  Both
choices (materialized nx-by-nx matrix, data-dependent crop) are hostile to
XLA.  This module re-architects the same math TPU-first:

1. **Kronecker factorization.**  On the regular n-by-n pixel grid the
   smoothness prior separates exactly: ``C_smooth = S (row axis) (x) S (col
   axis)`` with ``S[a, b] = exp(-g_rho (lin_a - lin_b)^2)`` an n-by-n matrix.
   Applying C to an image w is ``Amp * alpha . vec(S W S)`` where W is the
   alpha-weighted image — two n-by-n matmuls on the MXU instead of one
   nx-by-nx (n^2 x n^2) matrix-vector product.  C is never materialized on
   the hot path.

2. **Static masking.**  The reference crops pixels whose envelope
   ``alpha < 1e-3`` (utils.py:883-887).  Because a cropped pixel only ever
   enters the Gram through products weighted by its alpha, zeroing its weight
   (``alpha_eff = where(alpha >= 1e-3, alpha, 0)``) yields *identical* kernel
   values with fully static shapes...  almost: the reference keeps the raw
   stimulus values of cropped pixels out of the smoothing sum as well.  Since
   C couples pixels i,j through alpha_i * alpha_j, zeroing alpha removes both
   row and column exactly.  The Gram matrices agree to machine precision.

3. **Safe arc-cosine J.**  The order-1 arc-cosine angular factor
   ``J(c) = (sqrt(1-c^2) + (pi - acos(c)) c) / pi`` has the well-known
   removable singularity dJ/dc = (pi - acos(c))/pi at |c| -> 1 that autodiff
   turns into inf - inf = NaN.  We register the analytic derivative via
   custom_jvp (reference keeps hand gradients for the same reason,
   utils.py:1000).

All matmuls run at ``Precision.HIGHEST`` so f32 TPU results track the f64
reference to ~1e-6 relative error at nx ~ 1.2e4 contraction lengths.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import (ALPHA_THRESHOLD, COSDELTA_JITTER,
                      MATMUL_PRECISION, current_precision)
from .precision import split_matmul

Theta = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Pixel grid and localized + smooth prior (reference: utils.py:861-914)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _grid_1d_np(n_px_side: int):
    import numpy as np
    return np.linspace(-1.0, 1.0, n_px_side)


def pixel_coords(n_px_side: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flattened (xcord, ycord) of the n x n grid, 'ij' indexing: pixel
    p = i * n + j has ycord = lin[i], xcord = lin[j]
    (reference: utils.py:876-879)."""
    lin = jnp.asarray(_grid_1d_np(n_px_side), dtype)
    ycord = jnp.repeat(lin, n_px_side)
    xcord = jnp.tile(lin, n_px_side)
    return xcord, ycord


def local_envelope(theta: Theta, n_px_side: int, dtype=None,
                   alpha_threshold: float = ALPHA_THRESHOLD):
    """Localized RF envelope alpha over the flattened grid, hard-thresholded
    to zero below ``alpha_threshold`` (reference crops instead,
    utils.py:880-887).  Returns (alpha_eff, logalpha, mask)."""
    if dtype is None:
        dtype = theta["Amp"].dtype
    xcord, ycord = pixel_coords(n_px_side, dtype)
    gb = jnp.exp(theta["-2log2beta"])          # 1 / (4 beta^2)
    logalpha = -gb * ((xcord - theta["eps_0x"]) ** 2 +
                      (ycord - theta["eps_0y"]) ** 2)
    alpha = jnp.exp(logalpha)
    mask = alpha >= alpha_threshold
    alpha_eff = jnp.where(mask, alpha, jnp.zeros((), dtype))
    return alpha_eff, logalpha, mask


def smooth_factor(theta: Theta, n_px_side: int, dtype=None) -> jnp.ndarray:
    """1-D RBF factor S of the separable smoothness prior:
    ``C_smooth = S (row) (x) S (col)``, S[a,b] = exp(-g_rho (lin_a-lin_b)^2)
    (reference materializes the full C_smooth, utils.py:890-892)."""
    if dtype is None:
        dtype = theta["Amp"].dtype
    lin = jnp.asarray(_grid_1d_np(n_px_side), dtype)
    gr = jnp.exp(theta["-log2rho2"])            # 1 / (2 rho^2)
    d2 = (lin[:, None] - lin[None, :]) ** 2
    return jnp.exp(-gr * d2)


def materialize_C(theta: Theta, n_px_side: int, dtype=None,
                  alpha_threshold: float = ALPHA_THRESHOLD):
    """Dense nx-by-nx prior matrix C with masked rows/cols zeroed, plus the
    boolean mask.  For tests, small problems, and API parity with the
    reference's ``localker`` (utils.py:861-914); the hot path never calls
    this."""
    alpha_eff, _, mask = local_envelope(theta, n_px_side, dtype, alpha_threshold)
    S = smooth_factor(theta, n_px_side, dtype)
    C_smooth = jnp.einsum("ik,jl->ijkl", S, S).reshape(
        n_px_side * n_px_side, n_px_side * n_px_side)
    C = theta["Amp"] * alpha_eff[:, None] * C_smooth * alpha_eff[None, :]
    C = 0.5 * (C + C.T)
    return C, mask


# ---------------------------------------------------------------------------
# Quadratic forms through C without materializing it
# ---------------------------------------------------------------------------

def smooth_apply(S: jnp.ndarray, w: jnp.ndarray, n_px_side: int,
                 Sx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Apply the separable smoothness prior to flattened images w
    (batch, nx): reshape to (batch, n, n), compute Sy W Sx, flatten back.
    ``Sx`` defaults to S (full-grid case); a cropped window passes distinct
    row/column factors."""
    b = w.shape[0]
    if Sx is None:
        Sx = S
    imgs = w.reshape(b, n_px_side, n_px_side)
    out = split_matmul(split_matmul(S, imgs), Sx)
    return out.reshape(b, n_px_side * n_px_side)


# ---------------------------------------------------------------------------
# Static crop window: exact FLOP reduction around the RF
# ---------------------------------------------------------------------------
#
# Pixels with envelope alpha < threshold contribute exactly zero to every
# kernel quantity (their weight is zeroed), so restricting the computation to
# any window that CONTAINS the mask is bit-exact while cutting the
# contraction length from n^2 to w^2 (the reference gets the same saving
# from its dynamic crop, utils.py:883-887).  The window has a static side w
# (bucketed so jit caches a handful of variants) and traced corner (i0, j0),
# recomputed between jit boundaries as theta moves.

def crop_window_for_theta(theta: Theta, n_px_side: int,
                          alpha_threshold: float = ALPHA_THRESHOLD,
                          margin: float = 1.25, bucket: int = 16):
    """(i0, j0, w) covering {alpha >= threshold} with a safety margin.

    Host-side helper (concrete theta values).  Returns w == n_px_side when
    the RF covers most of the grid (no crop benefit).
    """
    import jax as _jax
    # one batched transfer instead of three (device->host latency through
    # the TPU tunnel is tens of ms per sync)
    lb, eps_x, eps_y = (float(v) for v in _jax.device_get(
        (theta["-2log2beta"], theta["eps_0x"], theta["eps_0y"])))
    return crop_window_from_scalars(lb, eps_x, eps_y, n_px_side,
                                    alpha_threshold, margin, bucket)


def crop_window_from_scalars(lb: float, eps_x: float, eps_y: float,
                             n_px_side: int,
                             alpha_threshold: float = ALPHA_THRESHOLD,
                             margin: float = 1.25, bucket: int = 16):
    """Pure-host window computation from already-synced theta scalars
    (callers batching several host syncs into one transfer use this)."""
    import math as _math
    gb = _math.exp(lb)
    # alpha >= t  <=>  d^2 <= ln(1/t) / gb
    radius = _math.sqrt(max(_math.log(1.0 / alpha_threshold) / max(gb, 1e-12),
                            0.0)) * margin
    # [-1, 1] grid: pixel spacing 2 / (n - 1)
    half_px = radius * (n_px_side - 1) / 2.0
    w = int(2 * half_px) + 2
    w = min(((w + bucket - 1) // bucket) * bucket, n_px_side)
    if w >= n_px_side:
        return 0, 0, n_px_side
    cx = (eps_x + 1.0) * (n_px_side - 1) / 2.0
    cy = (eps_y + 1.0) * (n_px_side - 1) / 2.0
    i0 = int(round(cy)) - w // 2
    j0 = int(round(cx)) - w // 2
    i0 = max(0, min(i0, n_px_side - w))
    j0 = max(0, min(j0, n_px_side - w))
    return i0, j0, w


def crop_images(x: jnp.ndarray, i0, j0, w: int, n_px_side: int) -> jnp.ndarray:
    """Crop flattened images (nt, n^2) to the (w, w) window -> (nt, w^2).
    i0/j0 may be traced scalars; w is static."""
    nt = x.shape[0]
    imgs = x.reshape(nt, n_px_side, n_px_side)
    win = jax.lax.dynamic_slice(imgs, (jnp.zeros((), jnp.int32),
                                       jnp.asarray(i0, jnp.int32),
                                       jnp.asarray(j0, jnp.int32)),
                                (nt, w, w))
    return win.reshape(nt, w * w)


def window_coords(i0, j0, w: int, n_px_side: int, dtype):
    """(xcord, ycord) of the flattened window, plus the 1-D coordinate
    slices used for the smoothness factors."""
    lin = jnp.asarray(_grid_1d_np(n_px_side), dtype)
    lin_y = jax.lax.dynamic_slice(lin, (jnp.asarray(i0, jnp.int32),), (w,))
    lin_x = jax.lax.dynamic_slice(lin, (jnp.asarray(j0, jnp.int32),), (w,))
    ycord = jnp.repeat(lin_y, w)
    xcord = jnp.tile(lin_x, w)
    return xcord, ycord, lin_y, lin_x


def quad_forms(theta: Theta, x1: jnp.ndarray, x2: Optional[jnp.ndarray],
               n_px_side: int, alpha_threshold: float = ALPHA_THRESHOLD,
               with_cross: bool = True):
    """All quadratic forms through C needed for an arc-cosine Gram block.

    Returns ``(q11, q22, q12)`` with q11 = diag(x1^T C x1), q22 = diag(x2^T C
    x2), and q12 = x1^T C x2 (or None when with_cross=False / x2 is None).
    """
    dtype = x1.dtype
    alpha_eff, _, _ = local_envelope(theta, n_px_side, dtype, alpha_threshold)
    S = smooth_factor(theta, n_px_side, dtype)
    amp = theta["Amp"].astype(dtype)

    u1 = x1 * alpha_eff
    s1 = smooth_apply(S, u1, n_px_side)
    q11 = amp * jnp.sum(u1 * s1, axis=1)

    if x2 is None:
        return q11, None, None

    u2 = x2 * alpha_eff
    s2 = smooth_apply(S, u2, n_px_side)
    q22 = amp * jnp.sum(u2 * s2, axis=1)
    q12 = None
    if with_cross:
        q12 = amp * jnp.matmul(u1, s2.T, precision=current_precision())
    return q11, q22, q12


# ---------------------------------------------------------------------------
# Arc-cosine kernel, order 1 (reference: utils.py:939-1050)
# ---------------------------------------------------------------------------

@jax.custom_jvp
def acos_J(c: jnp.ndarray) -> jnp.ndarray:
    """Order-1 arc-cosine angular factor
    ``J(c) = (sqrt(1 - c^2) + (pi - acos(c)) c) / pi``
    with the analytically-exact derivative ``dJ/dc = (pi - acos(c)) / pi``
    registered to avoid the inf - inf autodiff NaN at |c| = 1."""
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    delta = jnp.arccos(c)
    return (s + (jnp.pi - delta) * c) / jnp.pi


@acos_J.defjvp
def _acos_J_jvp(primals, tangents):
    (c,), (dc,) = primals, tangents
    return acos_J(c), (jnp.pi - jnp.arccos(c)) / jnp.pi * dc


def _acos_from_quads(theta, q11, q22, q12, symmetrize: bool):
    sigma0 = theta["sigma_0"].astype(q11.dtype)
    s02 = sigma0 * sigma0
    X1 = jnp.sqrt(q11 + s02)
    X2 = jnp.sqrt(q22 + s02)
    X1X2 = X1[:, None] * X2[None, :]
    x1x2 = q12 + s02
    cosdelta = jnp.clip(x1x2 / (X1X2 + COSDELTA_JITTER), -1.0, 1.0)
    K = X1X2 * acos_J(cosdelta)
    if symmetrize:
        K = 0.5 * (K + K.T)
    return K


def acosker(theta: Theta, x1: jnp.ndarray, x2: Optional[jnp.ndarray] = None,
            n_px_side: int = 108, diag: bool = False,
            alpha_threshold: float = ALPHA_THRESHOLD) -> jnp.ndarray:
    """Arc-cosine (order-1) covariance through the localized + smooth prior.

    ``diag=True`` returns the nt-vector ``diag(K(x1, x1)) = diag(x1^T C x1) +
    sigma_0^2`` (reference: utils.py:1027-1030); otherwise the full
    (n1, n2) Gram, symmetrized when x1 is x2
    (reference: utils.py:1024-1025).
    """
    if diag:
        q11, _, _ = quad_forms(theta, x1, None, n_px_side, alpha_threshold)
        s0 = theta["sigma_0"].astype(q11.dtype)
        return q11 + s0 * s0
    same = x2 is None or x2 is x1
    x2c = x1 if x2 is None else x2
    q11, q22, q12 = quad_forms(theta, x1, x2c, n_px_side, alpha_threshold)
    if x2 is None:
        q22 = q11
    return _acos_from_quads(theta, q11, q22, q12, symmetrize=same)


def linker(theta: Theta, x1: jnp.ndarray, x2: Optional[jnp.ndarray] = None,
           n_px_side: int = 108, diag: bool = False,
           alpha_threshold: float = ALPHA_THRESHOLD) -> jnp.ndarray:
    """Linear kernel k(x1, x2) = x1^T C x2 through the localized+smooth
    prior.  API parity with the reference's vestigial ``linker``
    (utils.py:916-937, marked "does not work" there); here it is a working
    but non-default kernel, sharing the Kronecker-factored quadratic forms.
    """
    if diag:
        q11, _, _ = quad_forms(theta, x1, None, n_px_side, alpha_threshold)
        return q11
    same = x2 is None or x2 is x1
    x2c = x1 if x2 is None else x2
    _, _, q12 = quad_forms(theta, x1, x2c, n_px_side, alpha_threshold)
    if same:
        q12 = 0.5 * (q12 + q12.T) + 1e-9 * jnp.eye(q12.shape[0], dtype=q12.dtype)
    return q12


def gram_matrices(theta: Theta, x: jnp.ndarray, xtilde: jnp.ndarray,
                  n_px_side: int, shared: bool,
                  alpha_threshold: float = ALPHA_THRESHOLD,
                  backend: str = "xla"):
    """K_tilde (ntilde, ntilde), K (nt, ntilde), Kvec (nt,) in one pass,
    sharing the smoothed images (the reference computes them with three
    separate acosker calls, utils.py:1675-1680 / 2031-2033).

    ``shared=True`` means xtilde is x (inducing points == training points), in
    which case K = K_tilde and all quantities come from a single smoothing
    pass.

    ``backend="pallas"`` routes the big Gram contractions through the fused
    Pallas tile kernel (ops/gram_pallas.py); "xla" (default) uses
    HIGHEST-precision jnp.matmul and lets XLA fuse the epilogue.
    """
    dtype = x.dtype
    alpha_eff, _, _ = local_envelope(theta, n_px_side, dtype, alpha_threshold)
    S = smooth_factor(theta, n_px_side, dtype)
    return _gram_core(theta, x, xtilde, alpha_eff, S, S, n_px_side, shared,
                      backend)


def _gram_core(theta: Theta, x, xtilde, alpha_eff, Sy, Sx, side: int,
               shared: bool, backend: str):
    """Shared Gram assembly over a (side x side) pixel set (full grid or
    crop window) with precomputed envelope and smoothing factors."""
    dtype = x.dtype
    amp = theta["Amp"].astype(dtype)
    sigma0 = theta["sigma_0"].astype(dtype)

    ut = xtilde * alpha_eff
    st = smooth_apply(Sy, ut, side, Sx)
    qtt_diag = amp * jnp.sum(ut * st, axis=1)

    if backend == "pallas":
        from .gram_pallas import acos_gram_pallas, _use_interpret
        interp = _use_interpret()
        # fold Amp into one side of the product so the kernel's q12 is the
        # complete quadratic form
        K_tilde = acos_gram_pallas(ut * amp, st.T, qtt_diag, qtt_diag,
                                   sigma0, interpret=interp).astype(dtype)
        K_tilde = 0.5 * (K_tilde + K_tilde.T)
    else:
        qtt = amp * split_matmul(ut, st.T)
        K_tilde = _acos_from_quads(theta, qtt_diag, qtt_diag, qtt,
                                   symmetrize=True)

    if shared:
        Kvec = qtt_diag + sigma0 * sigma0
        return K_tilde, K_tilde, Kvec

    u = x * alpha_eff
    s = smooth_apply(Sy, u, side, Sx)
    q_diag = amp * jnp.sum(u * s, axis=1)
    if backend == "pallas":
        from .gram_pallas import acos_gram_pallas, _use_interpret
        K = acos_gram_pallas(u * amp, st.T, q_diag, qtt_diag, sigma0,
                             interpret=_use_interpret()).astype(dtype)
    else:
        q = amp * split_matmul(u, st.T)
        K = _acos_from_quads(theta, q_diag, qtt_diag, q, symmetrize=False)
    Kvec = q_diag + sigma0 * sigma0
    return K_tilde, K, Kvec


# ---------------------------------------------------------------------------
# Spectrally projected Gram: the M-step line-search fast path
# ---------------------------------------------------------------------------
#
# The Gram's contraction length is the window area w^2 (6400 at the
# production w=80), but the smoothness factor S(gr) = exp(-gr d^2) is a
# Gaussian kernel matrix whose spectrum decays super-exponentially: at the
# production gr ~ 50 only ~30 of 80 eigenvalues exceed 1e-7 of the largest.
# Projecting BOTH sides of the separable smoothing onto the top-R eigenbasis
# E of S replaces the (n1, w^2) x (w^2, n2) contraction with an
# (n1, R^2) x (R^2, n2) one — a 4-7x FLOP cut at production shapes — while
# the dropped directions carry relative Frobenius mass ~1e-8, far below the
# f32 HIGHEST arithmetic noise (~1e-6) of the exact path.
#
# Exactness is GUARDED, not assumed: the projected kernel equals the exact
# arc-cosine kernel of the modified smoothing operator P S P (P = E E^T),
# whose Frobenius distance to S is computable in closed form per evaluation
# (||S - P S P||_F^2 = ||S||_F^2 - ||E^T S E||_F^2, exact for orthonormal
# E).  The caller falls back to the exact Gram whenever the relative
# residual exceeds a tolerance — e.g. when the line search drives rho far
# from the basis's seed theta, or when rho sharpens beyond the static rank
# budget.  Because P S P is itself PSD, even in-tolerance projections keep
# every downstream stabilization property (PSD Gram, real spectrum).
#
# The basis E is computed ONCE per EM iteration (models/fit.py) at the
# iteration-start theta — the same warm-seeding insight as the subspace
# eigensolver and the Newton-Schulz inverses: theta moves little within a
# line search.  S depends only on pixel DIFFERENCES, so every w-wide crop
# window of the uniform grid shares one static d^2 matrix regardless of the
# (traced) window corner.

def window_smooth_d2(w: int, n_px_side: int, dtype=jnp.float32) -> jnp.ndarray:
    """Static (w, w) squared-distance matrix of any w-point window of the
    uniform [-1, 1] grid (placement-independent: only differences enter)."""
    import numpy as np
    delta = 2.0 / (n_px_side - 1)
    idx = np.arange(w) * delta
    return jnp.asarray((idx[:, None] - idx[None, :]) ** 2, dtype)


def suggest_proj_rank(gr: float, w: int, n_px_side: int,
                      tol: float = 1e-8, slack: int = 8,
                      bucket: int = 8) -> int:
    """Host-side spectral rank for ``gram_matrices_projected``: the smallest
    R whose dropped-spectrum relative Frobenius residual is <= ``tol``, plus
    ``slack`` eigendirections of headroom for within-M-step rho drift,
    bucketed so jit caches few variants.  numpy ``eigvalsh`` at (w, w) —
    microseconds at w <= 108.  ``fit()`` calls this at the start theta when
    ``cfg.mstep_proj_rank`` is None; the per-trial residual guard still
    protects every evaluation if rho later outgrows the budget."""
    import numpy as np
    delta = 2.0 / (n_px_side - 1)
    idx = np.arange(w) * delta
    S = np.exp(-float(gr) * (idx[:, None] - idx[None, :]) ** 2)
    ev = np.linalg.eigvalsh(S)[::-1]
    tail = np.cumsum((ev * ev)[::-1])[::-1]   # tail[k] = sum_{j>=k} ev_j^2
    ok = tail <= (tol * tol) * tail[0]
    R = int(np.argmax(ok)) if ok.any() else w
    R = ((R + slack + bucket - 1) // bucket) * bucket
    return max(min(R, w), bucket)


def smooth_projection_basis(theta: Theta, w: int, n_px_side: int,
                            rank: int, dtype=None) -> jnp.ndarray:
    """Top-``rank`` eigenbasis E (w, rank) of the 1-D smoothing factor
    S(gr) on a w-point window.  Guarded eigh (non-finite theta would fault
    the TPU eigensolver); on bad input returns zeros, which drives the
    projection residual to ||S||_F so the caller's guard falls back to the
    exact path."""
    from .stabilize import _eigh_safe
    if dtype is None:
        dtype = theta["Amp"].dtype
    gr = jnp.exp(theta["-log2rho2"]).astype(dtype)
    S = jnp.exp(-gr * window_smooth_d2(w, n_px_side, dtype))
    _, vecs, finite = _eigh_safe(S)
    E = vecs[:, -rank:]
    return jnp.where(finite, E, jnp.zeros_like(E))


def gram_matrices_projected(theta: Theta, xc: jnp.ndarray, xtc: jnp.ndarray,
                            E: jnp.ndarray, i0, j0, n_px_side: int,
                            shared: bool,
                            alpha_threshold: float = ALPHA_THRESHOLD,
                            tol: float = 3e-6):
    """``gram_matrices_windowed`` through the spectrally projected smoothing
    operator P S P (P = E E^T): returns ``(K_tilde, K, Kvec, ok)`` where
    ``ok`` certifies the relative Frobenius residual of the projection is
    within ``tol`` (the caller lax.cond's to the exact Gram otherwise).

    ``xc``/``xtc`` are the PRE-CROPPED (n, w^2) stimuli of the window at
    (i0, j0) — cropping is theta-independent within an EM iteration, so the
    caller hoists it out of the line search.  Identity used per image pair
    (U = w x w image, Z = E^T U E, M = E^T S E):

        q12 = amp * tr(U1^T S U2 S)  ->  amp * tr(Z1^T M Z2 M)
            = amp * <vec(Z1), vec(M Z2 M)>

    so the big contraction runs at length rank^2 instead of w^2."""
    dtype = xc.dtype
    w = E.shape[0]
    amp = theta["Amp"].astype(dtype)
    sigma0 = theta["sigma_0"].astype(dtype)

    # window envelope at the (traced) corner — identical to the windowed path
    xcord, ycord, _, _ = window_coords(i0, j0, w, n_px_side, dtype)
    gb = jnp.exp(theta["-2log2beta"]).astype(dtype)
    logalpha = -gb * ((xcord - theta["eps_0x"]) ** 2 +
                      (ycord - theta["eps_0y"]) ** 2)
    alpha = jnp.exp(logalpha)
    alpha_eff = jnp.where(alpha >= alpha_threshold, alpha,
                          jnp.zeros((), dtype))

    gr = jnp.exp(theta["-log2rho2"]).astype(dtype)
    S = jnp.exp(-gr * window_smooth_d2(w, n_px_side, dtype))
    hp = jax.lax.Precision.HIGHEST
    M = jnp.matmul(E.T, jnp.matmul(S, E, precision=hp), precision=hp)
    # ||S - P S P||_F^2 = ||S||_F^2 - ||M||_F^2 (exact, orthonormal E)
    s_fro2 = jnp.sum(S * S)
    resid2 = s_fro2 - jnp.sum(M * M)
    ok = jnp.isfinite(resid2) & (resid2 <= (tol * tol) * s_fro2)

    R = E.shape[1]

    def project(u):
        # Z_i = E^T U_i E and Y_i = M Z_i M, batched over images
        U = u.reshape(u.shape[0], w, w)
        Z = split_matmul(split_matmul(E.T, U), E)
        Y = split_matmul(split_matmul(M, Z), M)
        return Z.reshape(-1, R * R), Y.reshape(-1, R * R)

    ut = xtc * alpha_eff
    Zt, Yt = project(ut)
    qtt_diag = amp * jnp.sum(Zt * Yt, axis=1)
    qtt = amp * split_matmul(Zt, Yt.T)
    K_tilde = _acos_from_quads(theta, qtt_diag, qtt_diag, qtt,
                               symmetrize=True)
    if shared:
        Kvec = qtt_diag + sigma0 * sigma0
        return K_tilde, K_tilde, Kvec, ok

    u = xc * alpha_eff
    Z, Y = project(u)
    q_diag = amp * jnp.sum(Z * Y, axis=1)
    q = amp * split_matmul(Z, Yt.T)
    K = _acos_from_quads(theta, q_diag, qtt_diag, q, symmetrize=False)
    Kvec = q_diag + sigma0 * sigma0
    return K_tilde, K, Kvec, ok


def gram_matrices_windowed(theta: Theta, x: jnp.ndarray, xtilde: jnp.ndarray,
                           n_px_side: int, shared: bool,
                           i0, j0, w: int,
                           alpha_threshold: float = ALPHA_THRESHOLD,
                           backend: str = "xla"):
    """gram_matrices restricted to a static (w, w) crop window at traced
    corner (i0, j0).  Bit-exact with the full-grid computation whenever the
    window covers the {alpha >= threshold} mask — the cropped pixels all
    carry zero weight.  Cuts the contraction length from n^2 to w^2 (the
    same saving the reference's dynamic crop provides, utils.py:883-887,
    but with jit-stable shapes)."""
    if w >= n_px_side:
        return gram_matrices(theta, x, xtilde, n_px_side, shared,
                             alpha_threshold, backend)
    xc = crop_images(x, i0, j0, w, n_px_side)
    xtc = xc if shared else crop_images(xtilde, i0, j0, w, n_px_side)
    return gram_matrices_precropped(theta, xc, xtc, n_px_side, shared,
                                    i0, j0, w, alpha_threshold, backend)


def gram_matrices_precropped(theta: Theta, xc: jnp.ndarray,
                             xtc: jnp.ndarray, n_px_side: int, shared: bool,
                             i0, j0, w: int,
                             alpha_threshold: float = ALPHA_THRESHOLD,
                             backend: str = "xla"):
    """``gram_matrices_windowed`` on ALREADY-CROPPED stimuli.

    The crop itself (a strided reshape + dynamic-slice copy of the full
    (nt, n^2) stimulus) is theta-independent, but closed over by the
    M-step objective it executes once per line-search evaluation — ~15% of
    the whole headline fit in device 'data formatting' time (profiled
    round 3; XLA does not move the copies out of the line-search loop).
    Callers hoist the crop to the EM-iteration body and pass (xc, xtc)
    here, with (i0, j0) still locating the window's coordinate grid."""
    dtype = xc.dtype
    xcord, ycord, lin_y, lin_x = window_coords(i0, j0, w, n_px_side, dtype)

    gb = jnp.exp(theta["-2log2beta"]).astype(dtype)
    logalpha = -gb * ((xcord - theta["eps_0x"]) ** 2 +
                      (ycord - theta["eps_0y"]) ** 2)
    alpha = jnp.exp(logalpha)
    alpha_eff = jnp.where(alpha >= alpha_threshold, alpha,
                          jnp.zeros((), dtype))
    gr = jnp.exp(theta["-log2rho2"]).astype(dtype)
    Sy = jnp.exp(-gr * (lin_y[:, None] - lin_y[None, :]) ** 2)
    Sx = jnp.exp(-gr * (lin_x[:, None] - lin_x[None, :]) ** 2)
    return _gram_core(theta, xc, xtc, alpha_eff, Sy, Sx, w, shared, backend)
