"""jit-compatible L-BFGS with strong-Wolfe zoom line search.

The reference drives both inner optimizations with ``torch.optim.LBFGS``
(strong-Wolfe line search): the per-E-step update of logA
(Spatial_GP_repo/utils.py:1897-1932) and the M-step over the six kernel
hyperparameters (utils.py:2013-2114).  Box constraints are enforced the same
way the reference does — an out-of-bounds trial point returns an infinite
loss so the line search rejects the step (utils.py:2020-2028) — except the
objective is evaluated on the clipped parameters so gradients stay finite.

Implementation: optax.lbfgs (zoom linesearch satisfying strong Wolfe) driven
by a lax.scan, so a fixed number of L-BFGS iterations compiles into the
enclosing jit program (the whole EM fit is one compiled program)."""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax


def lbfgs_minimize(fun: Callable[[Any], jnp.ndarray], x0: Any,
                   num_steps: int, memory_size: int = 15,
                   max_linesearch_steps: int = 20) -> Tuple[Any, jnp.ndarray]:
    """Run ``num_steps`` L-BFGS iterations minimizing ``fun`` from ``x0``.

    Returns ``(x_best, f_best)``.  The best-so-far iterate is tracked
    explicitly so a divergent late step cannot degrade the result (torch's
    LBFGS similarly returns the last accepted point of the line search).
    ``fun`` may return +inf (bound violation); the zoom line search then
    backtracks.  NaN objective values freeze the iterate.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one"))
    value_and_grad = optax.value_and_grad_from_state(fun)

    f0 = fun(x0)
    state0 = opt.init(x0)

    def step(carry, _):
        x, state, x_best, f_best = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad,
                                    value_fn=fun)
        x_new = optax.apply_updates(x, updates)
        # Freeze on non-finite parameters (divergent line search).
        bad = ~jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree_util.tree_leaves(x_new)]))
        x_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(bad, old, new), x_new, x)
        f_new = fun(x_new)
        better = jnp.isfinite(f_new) & (f_new < f_best)
        x_best = jax.tree_util.tree_map(
            lambda b, n: jnp.where(better, n, b), x_best, x_new)
        f_best = jnp.where(better, f_new, f_best)
        return (x_new, state, x_best, f_best), f_new

    f_best0 = jnp.where(jnp.isfinite(f0), f0, jnp.inf)
    (xf, _, x_best, f_best), _ = jax.lax.scan(
        step, (x0, state0, x0, f_best0), None, length=num_steps)
    return x_best, f_best
