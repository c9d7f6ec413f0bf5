"""Sharded Gram construction and distributed blocked Cholesky.

The reference caps problem size with inducing points + eigenvalue truncation
on one device (SURVEY.md section 5: its only scaling levers).  For >=50k-point
kernels a single chip cannot hold or factor the Gram; these primitives spread
it over the mesh's "data" axis:

* ``sharded_gram`` — row-block sharded kernel construction: each device
  computes its block of K against replicated inducing points; GSPMD keeps
  the (nt, ntilde) result sharded, no gather.
* ``distributed_cholesky`` — right-looking fan-out block Cholesky via
  shard_map: the diagonal block is factorized by its owner and broadcast
  (psum), every device panel-solves its rows, and one all-gather of the
  (n, nb) panel per step feeds the trailing update.  Collectives are ICI
  all-gathers/psums; compute is local MXU matmuls.
* ``distributed_cholesky_solve`` — solve A x = b from the distributed factor
  by forward/backward substitution over the gathered factor (b is small:
  one all-gather of L, suitable for ntilde-scale right-hand sides).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MATMUL_PRECISION


def sharded_gram(theta, x, xtilde, n_px_side: int, mesh: Mesh,
                 shared: bool = False, axis: str = "data"):
    """gram_matrices with x row-sharded over ``mesh[axis]``.  Returns
    (K_tilde replicated, K row-sharded, Kvec row-sharded)."""
    from ..ops.kernels import gram_matrices

    x_sh = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        functools.partial(gram_matrices, n_px_side=n_px_side, shared=shared),
        in_shardings=(repl, x_sh, repl),
        out_shardings=(repl, x_sh, NamedSharding(mesh, P(axis))))
    return fn(theta, jax.device_put(x, x_sh), jax.device_put(xtilde, repl))


def _dist_chol_body(A_loc, nb: int, nblocks: int, axis: str):
    """shard_map body: A_loc is this device's (nb, n) row block."""
    me = lax.axis_index(axis)
    n = A_loc.shape[1]
    dtype = A_loc.dtype

    def step(k, carry):
        A_loc, L_loc = carry
        c0 = k * nb
        Acols = lax.dynamic_slice(A_loc, (0, c0), (nb, nb))

        # Broadcast the (already fully-updated) diagonal block from its
        # owner to everyone.
        is_owner = (me == k)
        diag = jnp.where(is_owner, Acols, jnp.zeros_like(Acols))
        diag = lax.psum(diag, axis)
        Lkk = jnp.linalg.cholesky(diag)

        # Panel solve on every device's rows: L_ik = A_ik Lkk^{-T}.
        panel = lax.linalg.triangular_solve(Lkk, Acols.T, left_side=True,
                                            lower=True)
        panel = panel.T
        below = me > k
        panel = jnp.where(below, panel,
                          jnp.where(is_owner, Lkk, jnp.zeros_like(panel)))

        # Record this block column of L.
        L_loc = lax.dynamic_update_slice(L_loc, panel, (0, c0))

        # Trailing update with the gathered panel column.
        panel_all = lax.all_gather(panel, axis)          # (P, nb, nb)
        panel_full = panel_all.reshape(nblocks * nb, nb)  # (n, nb)
        update = jnp.matmul(panel, panel_full.T,
                            precision=MATMUL_PRECISION)   # (nb, n)
        colmask = (jnp.arange(n) >= c0 + nb)[None, :]
        apply = jnp.where(below, jnp.ones((), dtype), jnp.zeros((), dtype))
        A_loc = A_loc - update * colmask.astype(dtype) * apply
        return A_loc, L_loc

    L_loc = jnp.zeros_like(A_loc)
    _, L_loc = lax.fori_loop(0, nblocks, step, (A_loc, L_loc))
    return L_loc


def distributed_cholesky(A: jnp.ndarray, mesh: Mesh, axis: str = "data",
                         jitter: float = 0.0) -> jnp.ndarray:
    """Lower Cholesky factor of a PSD matrix, computed cooperatively over
    the mesh axis.  n is padded to a multiple of the axis size with an
    identity block (the padding factors to identity and is sliced away)."""
    from jax import shard_map

    n = A.shape[0]
    p = mesh.shape[axis]
    nb = -(-n // p)                # rows per device
    npad = nb * p
    dtype = A.dtype
    if jitter:
        # diagonal scatter-add, not `A + jitter*eye(n)`: a dense identity at
        # n=50k f32 is 10 GB and the sum un-donates the input buffer
        idx = jnp.arange(n)
        A = A.at[idx, idx].add(jnp.asarray(jitter, dtype))
    if npad != n:
        Ap = jnp.eye(npad, dtype=dtype)
        Ap = Ap.at[:n, :n].set(A)
        A = Ap

    spec_in = P(axis, None)
    body = functools.partial(_dist_chol_body, nb=nb, nblocks=p, axis=axis)
    L = shard_map(body, mesh=mesh, in_specs=(spec_in,), out_specs=spec_in)(A)
    return L[:n, :n]


def distributed_cholesky_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given the (possibly sharded) lower factor L of A."""
    y = lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
    return lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                       transpose_a=True)
