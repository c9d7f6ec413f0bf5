"""The large-ntilde path: >=50k-point kernels, factored over the mesh.

The reference caps problem size with inducing points and eigenvalue
truncation (SURVEY.md section 5 — its only scaling levers; a 50k-point
K_tilde in its f64 posture is a 20 GB matrix plus an O(n^3) ``eigh`` it
never attempts).  Here the Gram is built row-sharded over the mesh's
"data" axis (``sharded_gram``) and factored by the distributed blocked
Cholesky (``distributed_cholesky``) — the whole pipeline stays f32 on
device, 10 GB at n=50k, with ICI collectives carrying the panel
broadcasts.  On a single chip the same entry point routes through a
donated in-place factorization so only ONE n x n buffer is ever resident
(required to fit 50k^2 f32 = 10 GB in a 16 GB HBM).

What this enables end-to-end is the conjugate (Gaussian-likelihood) limit
of the model at a scale the reference cannot touch: the stabilized
posterior-mean weights ``alpha = (K_tilde + sigma^2 I)^-1 y`` and the
predictive mean ``mu* = K* alpha`` for >=50k inducing/training points
(the active-learning regime where xtilde == the full acquired set).  The
Poisson-link EM fit keeps its eigenspace stabilization at moderate ntilde
(models/fit.py); this module is the TP-analog scale-out of its linear
algebra (SURVEY.md section 2.4, last row).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MATMUL_PRECISION
from .sharded_linalg import distributed_cholesky


@partial(jax.jit, donate_argnums=(0,), static_argnames=("nb", "jitter"))
def _chol_step(A: jnp.ndarray, k: jnp.ndarray, nb: int,
               jitter: float) -> jnp.ndarray:
    """One block-column step of the left-looking blocked Cholesky, as its
    own DONATED jit program (called n/nb times from a host loop).

    The memory story is the whole point.  ``jnp.linalg.cholesky`` (and a
    divide-and-conquer recursion of slices + concatenates — the round-2
    design) presents XLA with a web of full-size intermediates whose
    liveness analysis peaks far above one matrix: the 50k attempt was
    declared "Used 248 G of 15.75 G hbm" AT COMPILE TIME.  A single
    ``lax.fori_loop`` over a carried matrix (the first rewrite) fixed that
    but still double-buffered the carry (2 x 10 GB at n=50k, measured OOM
    down to n=32k): XLA's copy-insertion will not alias a while-loop carry
    that the body both fully reads (the update GEMM) and writes.  Buffer
    DONATION at the jit boundary is the aliasing XLA honors reliably, so
    the loop lives on the host: one small program, one (n, n) buffer
    aliased in place, O(n * nb) block temporaries, ~25 dispatches at n=50k
    (~1 s of tunnel latency, irrelevant next to the GEMMs).  The per-step
    program is also ~nblocks times cheaper to compile than the unrolled
    fori_loop fusion web — compiles are the scarcest resource through the
    tunnel (docs/tpu_linalg.md rule 5).

    Per step k (block column c0 = k*nb, k a TRACED scalar so all steps
    share one compiled program):
      * ``R``: row block (nb, n) at c0; columns >= c0 masked to zero.
      * ``P = A @ R_masked^T``: the left-looking update.  Unfactored columns
        of A multiply the zeroed part of R, so no masked copy of A is ever
        materialized; the cost is a full (n, n)x(n, nb) GEMM per step — a
        deliberate ~6x flop overcount vs the classical n^3/3 that buys the
        single-buffer structure (MXU flops are cheap; HBM is not).
      * diagonal block Cholesky (+ jitter folded per block — equivalent to
        factoring A + jitter I, with no n x n identity ever built).
      * panel solve as an explicit (nb, nb) triangular inverse + ONE GEMM:
        the blocked triangular_solve lowering at (n, nb) RHS keeps ~15
        partial-solution temporaries live (~14 GB at n=50k, measured OOM);
        inv(lkk) is small, and the GEMM has exactly one (n, nb) output.
      * one ``dynamic_update_slice`` writes the finished column back, upper
        part zeroed, so after the last step the buffer IS the lower factor.

    Requires ``n % nb == 0`` (the caller picks a divisor).
    """
    n = A.shape[0]
    dtype = A.dtype
    c0 = k * nb
    zero = jnp.zeros((), c0.dtype)  # literal 0 would be int64 under x64
    R = lax.dynamic_slice(A, (c0, zero), (nb, n))
    colmask = (lax.iota(c0.dtype, n) < c0).astype(dtype)
    P = jnp.matmul(A, (R * colmask[None, :]).T, precision=MATMUL_PRECISION)
    col = lax.dynamic_slice(A, (zero, c0), (n, nb)) - P
    akk = (lax.dynamic_slice(col, (c0, zero), (nb, nb))
           + jnp.asarray(jitter, dtype) * jnp.eye(nb, dtype=dtype))
    lkk = jnp.linalg.cholesky(akk)
    inv_lkk = lax.linalg.triangular_solve(
        lkk, jnp.eye(nb, dtype=dtype), left_side=True, lower=True)
    sol = jnp.matmul(col, inv_lkk.T, precision=MATMUL_PRECISION)
    below = (lax.iota(c0.dtype, n)[:, None] >= c0 + nb).astype(dtype)
    newcol = lax.dynamic_update_slice(sol * below, lkk, (c0, zero))
    return lax.dynamic_update_slice(A, newcol, (zero, c0))


def _pick_block(n: int, nb: int) -> int:
    """A block size near ``nb`` that divides n (the loop needs n % nb == 0).
    Searches outward from round(n / nb) block counts; falls back to 1 block
    (plain Cholesky) only for awkward small primes."""
    if n <= nb:
        return n
    target = max(1, round(n / nb))
    for delta in range(0, target + 1):
        for cand in (target + delta, target - delta):
            if cand >= 1 and n % cand == 0 and n // cand <= 2 * nb:
                return n // cand
    return n


def _chol_single_device(A: jnp.ndarray, nb: int = 4096,
                        jitter: float = 0.0) -> jnp.ndarray:
    """Host loop of donated ``_chol_step`` programs (see its docstring for
    why the loop is NOT a fori_loop).  The caller must not reuse ``A``."""
    n = A.shape[0]
    nbb = _pick_block(n, nb)
    A = jnp.asarray(A)
    for k in range(n // nbb):
        A = _chol_step(A, jnp.int32(k), nbb, jitter)
    return A


@partial(jax.jit, static_argnames=("n_px_side",))
def _gram_prep(theta, xtilde: jnp.ndarray, n_px_side: int):
    """Weighted + smoothed stimuli and diagonal quadratic forms — the O(n)
    pieces of the arc-cosine Gram, one small program."""
    from ..ops.kernels import local_envelope, smooth_apply, smooth_factor

    dtype = xtilde.dtype
    alpha_eff, _, _ = local_envelope(theta, n_px_side, dtype)
    S = smooth_factor(theta, n_px_side, dtype)
    amp = theta["Amp"].astype(dtype)
    ut = xtilde * alpha_eff
    st = smooth_apply(S, ut, n_px_side)
    qd = amp * jnp.sum(ut * st, axis=1)
    return ut * amp, st, qd


@partial(jax.jit, donate_argnums=(0,), static_argnames=("nb",))
def _gram_row_step(K: jnp.ndarray, k: jnp.ndarray, ut_amp: jnp.ndarray,
                   st: jnp.ndarray, qd: jnp.ndarray, sigma0: jnp.ndarray,
                   nb: int) -> jnp.ndarray:
    """One (nb, n) row block of the arc-cosine Gram, written into the
    DONATED output buffer (the same host-loop-of-donated-programs pattern
    as ``_chol_step``: at n=50k the full q12 intermediate plus the epilogue
    output would otherwise keep 2 x 10 GB live)."""
    dtype = K.dtype
    r0 = k * nb
    zero = jnp.zeros((), r0.dtype)
    u_blk = lax.dynamic_slice(ut_amp, (r0, zero), (nb, ut_amp.shape[1]))
    q_blk = jnp.matmul(u_blk, st.T, precision=MATMUL_PRECISION)
    s02 = (sigma0 * sigma0).astype(dtype)
    qd_blk = lax.dynamic_slice(qd, (r0,), (nb,))
    X1 = jnp.sqrt(qd_blk + s02)[:, None]
    X2 = jnp.sqrt(qd + s02)[None, :]
    X1X2 = X1 * X2
    from ..config import COSDELTA_JITTER
    from ..ops.kernels import acos_J
    cosd = jnp.clip((q_blk + s02) / (X1X2 + COSDELTA_JITTER), -1.0, 1.0)
    K_blk = X1X2 * acos_J(cosd)
    return lax.dynamic_update_slice(K, K_blk, (r0, zero))


def large_gram(theta, xtilde: jnp.ndarray, n_px_side: int,
               mesh: Optional[Mesh] = None,
               axis: str = "data", nb: int = 8192) -> jnp.ndarray:
    """K_tilde = gram(xtilde, xtilde) at >=50k points.

    Multi-device: row-sharded over ``mesh[axis]`` (one smoothing pass;
    GSPMD all-gathers the smoothed images and keeps the (n, n) result
    sharded — no device ever holds more than its row block).

    Single device: a host loop of donated row-block programs — the (n, n)
    buffer is written in place, block by block, so the q12 intermediate
    never coexists with the full output (10 GB each at n=50k f32).  The
    result is NOT explicitly symmetrized (the quadratic form is symmetric
    up to f32 matmul roundoff ~1e-7, and the downstream Cholesky reads only
    the lower triangle); callers needing exact symmetry at moderate n
    should use ``ops.kernels.gram_matrices``."""
    from ..ops.kernels import gram_matrices

    if mesh is not None and mesh.shape.get(axis, 1) > 1:
        fn = partial(gram_matrices, n_px_side=n_px_side, shared=True)
        x_sh = NamedSharding(mesh, P(axis, None))
        repl = NamedSharding(mesh, P())
        jfn = jax.jit(fn, in_shardings=(repl, x_sh, x_sh),
                      out_shardings=(x_sh, x_sh, NamedSharding(mesh, P(axis))))
        K_tilde, _, _ = jfn(theta, jax.device_put(xtilde, x_sh),
                            jax.device_put(xtilde, x_sh))
        return K_tilde

    n = xtilde.shape[0]
    nbb = _pick_block(n, nb)
    ut_amp, st, qd = _gram_prep(theta, xtilde, n_px_side)
    K = jnp.zeros((n, n), xtilde.dtype)
    sigma0 = jnp.asarray(theta["sigma_0"], xtilde.dtype)
    for k in range(n // nbb):
        K = _gram_row_step(K, jnp.int32(k), ut_amp, st, qd, sigma0, nbb)
    return K


def large_cholesky(A: jnp.ndarray, mesh: Optional[Mesh] = None,
                   axis: str = "data", jitter: float = 0.0,
                   nb: int = 4096) -> jnp.ndarray:
    """Lower Cholesky factor at large n: distributed over ``mesh[axis]``
    when it has more than one device, else the memory-lean single-device
    divide-and-conquer factorization (donated input).  Jitter is applied
    inside the factorization programs as a diagonal add — never as a dense
    ``jitter*eye(n)`` sum at this scale."""
    if mesh is not None and mesh.shape.get(axis, 1) > 1:
        return distributed_cholesky(A, mesh, axis=axis, jitter=jitter)
    return _chol_single_device(A, nb=nb, jitter=jitter)


def large_posterior_mean(theta, xtilde: jnp.ndarray, y: jnp.ndarray,
                         xstar: jnp.ndarray, n_px_side: int,
                         mesh: Optional[Mesh] = None,
                         noise_var: float = 1.0,
                         nb: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conjugate-limit GP posterior mean at >=50k points.

    Builds K_tilde row-sharded over the mesh, factors
    ``K_tilde + noise_var I`` through the distributed / in-place blocked
    Cholesky, solves for ``alpha``, and returns ``(mu_star, alpha)`` with
    ``mu_star = K(xstar, xtilde) alpha``.  This is the large-ntilde
    factorization path of the framework (SURVEY.md section 2.4 last row);
    the Poisson-EM fit proper stays at moderate ntilde.
    """
    K_tilde = large_gram(theta, xtilde, n_px_side, mesh=mesh)
    L = large_cholesky(K_tilde, mesh=mesh, jitter=noise_var, nb=nb)
    y = jnp.asarray(y, L.dtype)
    alpha = lax.linalg.triangular_solve(L, y[:, None], left_side=True,
                                        lower=True)
    alpha = lax.linalg.triangular_solve(L, alpha, left_side=True, lower=True,
                                        transpose_a=True)[:, 0]
    from ..ops.kernels import gram_matrices
    _, K_star, _ = gram_matrices(theta, xstar, xtilde, n_px_side,
                                 shared=False)
    mu = jnp.matmul(K_star, alpha, precision=MATMUL_PRECISION)
    return mu, alpha
