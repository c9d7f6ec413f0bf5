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


def _chol_inplace_dc(A: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Divide-and-conquer blocked Cholesky with static shapes.

    ``jnp.linalg.cholesky`` materializes input and output simultaneously —
    2x the matrix footprint, an OOM at n=50k f32 on a 16 GB chip.  The
    recursion below keeps every intermediate at half the previous level's
    size, so with a donated input the peak footprint is ~1.5x one matrix.
    Flops are the exact n^3/3 + O(n^2 nb) of the classical algorithm; all
    three kernels (triangular solve, syrk update, leaf Cholesky) are MXU
    matmul work.
    """
    n = A.shape[0]
    if n <= nb:
        return jnp.linalg.cholesky(A)
    n1 = n // 2
    A11 = A[:n1, :n1]
    A21 = A[n1:, :n1]
    A22 = A[n1:, n1:]
    L11 = _chol_inplace_dc(A11, nb)
    L21 = lax.linalg.triangular_solve(L11, A21, left_side=False, lower=True,
                                      transpose_a=True)
    S22 = A22 - jnp.matmul(L21, L21.T, precision=MATMUL_PRECISION)
    L22 = _chol_inplace_dc(S22, nb)
    top = jnp.concatenate([L11, jnp.zeros((n1, n - n1), A.dtype)], axis=1)
    bottom = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("nb", "jitter"))
def _chol_single_device(A: jnp.ndarray, nb: int = 4096,
                        jitter: float = 0.0) -> jnp.ndarray:
    # Jitter is folded in HERE, inside the donated program, as a diagonal
    # scatter-add: `A + jitter*eye(n)` at the call site would materialize a
    # dense n x n identity plus an un-donated sum (20 GB extra at n=50k f32)
    # and break the donation chain into the factorization.
    if jitter:
        n = A.shape[0]
        idx = jnp.arange(n)
        A = A.at[idx, idx].add(jnp.asarray(jitter, A.dtype))
    return _chol_inplace_dc(A, nb)


def large_gram(theta, xtilde: jnp.ndarray, n_px_side: int,
               mesh: Optional[Mesh] = None,
               axis: str = "data") -> jnp.ndarray:
    """K_tilde = gram(xtilde, xtilde), row-sharded over ``mesh[axis]`` (one
    smoothing pass; GSPMD all-gathers the smoothed images and keeps the
    (n, n) result sharded — no device ever holds more than its row block)."""
    from ..ops.kernels import gram_matrices

    fn = partial(gram_matrices, n_px_side=n_px_side, shared=True)
    if mesh is None or mesh.shape.get(axis, 1) <= 1:
        K_tilde, _, _ = jax.jit(fn)(theta, xtilde, xtilde)
        return K_tilde
    x_sh = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())
    jfn = jax.jit(fn, in_shardings=(repl, x_sh, x_sh),
                  out_shardings=(x_sh, x_sh, NamedSharding(mesh, P(axis))))
    K_tilde, _, _ = jfn(theta, jax.device_put(xtilde, x_sh),
                        jax.device_put(xtilde, x_sh))
    return K_tilde


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
