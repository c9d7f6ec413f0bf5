"""On-device Lambert W (principal branch, real non-negative argument).

The reference round-trips every acquisition batch through SciPy on the host
("LambertW on the GPU would be great ... it still doubles the time of the
function", Spatial_GP_repo/utils.py:454-466).  The acquisition scorer only
ever evaluates W at z = sigma^2 * exp(r sigma^2 + mu) >= 0, where W0 is
smooth; Halley's method from an asymptotic-aware initial guess converges to
machine precision in a handful of iterations, fully on device and batched.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def lambertw(z: jnp.ndarray, iterations: int = 24) -> jnp.ndarray:
    """W0(z) for real z >= 0 (elementwise), to ~machine precision.

    Initial guess: w ~ z/(1+z) for small z (matches the series w = z - z^2 +
    ...), and w ~ log z - log log z for large z.  Halley updates:

        w <- w - f / (e^w (w+1) - (w+2) f / (2w+2)),   f = w e^w - z
    """
    z = jnp.asarray(z)
    dtype = z.dtype
    one = jnp.ones((), dtype)

    logz = jnp.log(jnp.maximum(z, jnp.finfo(dtype).tiny))
    big = z > jnp.asarray(jnp.e, dtype)
    w_big = logz - jnp.log(jnp.maximum(logz, one))
    w_small = z / (one + z)
    w0 = jnp.where(big, w_big, w_small)

    def body(_, w):
        ew = jnp.exp(w)
        f = w * ew - z
        wp1 = w + one
        denom = ew * wp1 - (w + 2.0) * f / (2.0 * wp1)
        return w - f / denom

    return lax.fori_loop(0, iterations, body, w0)
