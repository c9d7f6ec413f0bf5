"""Split-precision matmul: exact forward, configurable-precision backward.

The M-step objective value feeds a strong-Wolfe line search and the recorded
loss trajectory — it must track the f64 reference, so forward Gram
contractions run at HIGHEST (6-pass bf16 = f32-accurate on the MXU).  The
gradient only steers L-BFGS; ~1e-3 relative error is irrelevant to the
search direction but the backward matmuls cost twice the forward.  This
module provides a matmul whose cotangent products run at an independently
chosen precision.

Default backward precision is HIGHEST (bit-identical to plain autodiff);
set ``GPTPU_GRAD_PRECISION={default,high,highest}`` before import to trade
gradient precision for M-step speed.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import MATMUL_PRECISION, _PRECISIONS, current_precision

GRAD_PRECISION = _PRECISIONS[
    os.environ.get("GPTPU_GRAD_PRECISION", "highest").lower()]


@jax.custom_vjp
def split_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """matmul(a, b) with forward at MATMUL_PRECISION and backward at
    GRAD_PRECISION.  Operands must be >= 2-D (batched broadcasting
    supported); use plain jnp.matmul for matrix-vector products — their
    backward is quadratic-cost anyway."""
    assert a.ndim >= 2 and b.ndim >= 2, "split_matmul requires >=2-D operands"
    return jnp.matmul(a, b, precision=current_precision())


def _fwd(a, b):
    return split_matmul(a, b), (a, b)


def _bwd(res, g):
    a, b = res
    ga = jnp.matmul(g, jnp.swapaxes(b, -1, -2), precision=GRAD_PRECISION)
    gb = jnp.matmul(jnp.swapaxes(a, -1, -2), g, precision=GRAD_PRECISION)
    # un-broadcast batched cotangents back to operand shapes
    ga = _unbroadcast(ga, a.shape)
    gb = _unbroadcast(gb, b.shape)
    return ga, gb


def _unbroadcast(g, shape):
    if g.shape == shape:
        return g
    n_extra = g.ndim - len(shape)
    if n_extra > 0:
        g = jnp.sum(g, axis=tuple(range(n_extra)))
    axes = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape))
                 if gs != s)
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return g.reshape(shape)


split_matmul.defvjp(_fwd, _bwd)
