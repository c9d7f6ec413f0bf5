"""Pallas TPU kernel: tiled arc-cosine Gram with fused epilogue.

The Gram hot path is ``q12 = U1 @ S2^T`` (U1 = alpha-weighted stimuli,
S2 = smoothness-convolved weighted stimuli; ops/kernels.py) followed by the
arc-cosine assembly ``K = X1X2 * J(clip((q12 + s0^2) / (X1X2 + eps)))``.
This kernel computes one (bm, bn) tile of K per grid step, streaming the
contraction dimension (nx ~ 11.7k) through VMEM in bk-chunks accumulated in
an f32 scratch, and applies the full arc-cosine epilogue in-register before
the single HBM write — the q12 intermediate never exists in HBM.

This is the "Pallas tiled Gram kernel" deliverable of SURVEY.md section 2.4;
``ops/kernels.py`` exposes it behind ``backend="pallas"`` with the XLA path
(jnp.matmul at HIGHEST precision + fused epilogue) as the default, and the
benchmark suite compares both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import COSDELTA_JITTER


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _acos_poly(x):
    """arccos via the Abramowitz & Stegun 4.4.45 minimax polynomial
    (|error| <= 2e-8 rad — below f32 roundoff for the J factor).  Mosaic has
    no acos lowering, so the kernel carries its own."""
    ax = jnp.abs(x)
    p = (((((((-0.0012624911 * ax + 0.0066700901) * ax - 0.0170881256) * ax
             + 0.0308918810) * ax - 0.0501743046) * ax + 0.0889789874) * ax
          - 0.2145988016) * ax + 1.5707963050)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0, r, jnp.pi - r)


def _acos_tile(q12, x1, x2, s02):
    """Arc-cosine assembly for one tile.  x1: (bm, 1) sqrt-norms, x2:
    (1, bn) sqrt-norms (sigma0^2 already included)."""
    X1X2 = x1 * x2
    cosd = jnp.clip((q12 + s02) / (X1X2 + COSDELTA_JITTER), -1.0, 1.0)
    delta = _acos_poly(cosd)
    s = jnp.sqrt(jnp.maximum(1.0 - cosd * cosd, 0.0))
    J = (s + (jnp.pi - delta) * cosd) / jnp.pi
    return X1X2 * J


def _gram_kernel(x1_ref, x2_ref, s02_ref, u_ref, st_ref, out_ref, acc_ref,
                 *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(u_ref[:], st_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        s02 = s02_ref[0, 0]
        out_ref[:] = _acos_tile(acc_ref[:], x1_ref[:], x2_ref[:], s02)


def _use_interpret() -> bool:
    """Interpret mode off-TPU so the same code path is testable on CPU."""
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def acos_gram_pallas(u1: jnp.ndarray, s2t: jnp.ndarray, q11: jnp.ndarray,
                     q22: jnp.ndarray, sigma0: jnp.ndarray,
                     bm: int = 256, bn: int = 256, bk: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """K(x1, x2) tile-by-tile on the MXU.

    u1:  (m, kdim) alpha-weighted stimuli rows
    s2t: (kdim, n) smoothed weighted stimuli, transposed
    q11: (m,) diag quadratic forms of side 1;  q22: (n,) of side 2
    sigma0: scalar kernel offset.
    """
    m, kdim = u1.shape
    n = s2t.shape[1]
    dtype = jnp.float32
    s02 = (sigma0 * sigma0).astype(dtype)

    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(kdim, bk)
    u1p = jnp.zeros((mp, kp), dtype).at[:m, :kdim].set(u1.astype(dtype))
    s2tp = jnp.zeros((kp, np_), dtype).at[:kdim, :n].set(s2t.astype(dtype))
    # sqrt-norms with sigma0^2 folded in; padded entries get 1.0 to avoid
    # 0/0 in the epilogue (they are sliced away)
    x1 = jnp.ones((mp, 1), dtype).at[:m, 0].set(
        jnp.sqrt(q11.astype(dtype) + s02))
    x2 = jnp.ones((1, np_), dtype).at[0, :n].set(
        jnp.sqrt(q22.astype(dtype) + s02))
    s02_arr = jnp.asarray([[s02]], dtype)

    nk = kp // bk
    grid = (mp // bm, np_ // bn, nk)

    out = pl.pallas_call(
        functools.partial(_gram_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * 4,
            transcendentals=mp * np_,
        ),
        interpret=interpret,
    )(x1, x2, s02_arr, u1p, s2tp)
    return out[:m, :n]
