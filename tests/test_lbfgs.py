"""Unit tests for the shared L-BFGS drivers (optim/lbfgs.py) — fast gate
for semantics the fit-level slow tests exercise end to end."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu.optim.lbfgs import (lbfgs_minimize,
                                                lbfgs_minimize_zoom_carry,
                                                zoom_carry_init)


def quad(x):
    return jnp.sum((x - 3.0) ** 2) + 0.5 * jnp.sum(x[:2] * x[1:3])


def test_early_termination_tolerances_inactive_match_full():
    """Tolerances tight enough to never fire must reproduce the plain run
    bit-for-bit (the converged branch is an identity copy)."""
    x0 = jnp.zeros(4)
    # 12 steps solve the 4-d quadratic to machine precision; the eager
    # zoom line search costs ~0.15 s/step on one CPU core (fast-gate
    # budget), so don't run 30
    x_full, f_full = lbfgs_minimize(quad, x0, 12)
    x_g, f_g = lbfgs_minimize(quad, x0, 12, gtol=1e-8)
    x_f, f_f = lbfgs_minimize(quad, x0, 12, ftol=1e-12)
    # the quadratic is solved to machine precision either way
    np.testing.assert_allclose(float(f_g), float(f_full), atol=1e-10)
    np.testing.assert_allclose(float(f_f), float(f_full), atol=1e-10)


def test_early_termination_halts():
    """A huge ftol must stop after the first accepted step (f_prev starts
    at +inf so step 0 always runs), matching a num_steps=1 run exactly."""
    x0 = jnp.zeros(4)
    x1, f1 = lbfgs_minimize(quad, x0, 1)
    xh, fh = lbfgs_minimize(quad, x0, 30, ftol=1e10)
    np.testing.assert_allclose(float(fh), float(f1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xh), np.asarray(x1), rtol=1e-12)


def test_early_termination_jits():
    x0 = jnp.zeros(4)
    f = jax.jit(lambda x: lbfgs_minimize(quad, x, 20, gtol=1e-6,
                                         ftol=1e-10)[1])(x0)
    assert np.isfinite(float(f))


def test_zoom_carry_state_roundtrip():
    """Carrying the state across calls converges at least as fast as two
    cold restarts, and the poisoned stored value forces a fresh first
    evaluation (the result must not depend on the stale value)."""
    x0 = jnp.zeros(4)
    state = zoom_carry_init(x0)
    x1, f1, state = lbfgs_minimize_zoom_carry(quad, x0, 3, state)
    x2, f2, state = lbfgs_minimize_zoom_carry(quad, x1, 3, state)
    xc1, fc1 = lbfgs_minimize(quad, x0, 3)
    xc2, fc2 = lbfgs_minimize(quad, xc1, 3)
    assert float(f2) <= float(fc2) + 1e-8
    assert float(f2) <= float(f1)
