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

from typing import Any, Callable, Optional, Tuple

import os as _os

import jax
import jax.numpy as jnp
import optax
from jax import lax

# Dev-only line-search telemetry (jax.debug.print per L-BFGS step).
_LS_DEBUG = bool(_os.environ.get("GPTPU_LS_DEBUG"))


def _two_loop(g, S, Y, rho, age):
    """L-BFGS two-loop recursion over a fixed-size memory of (s, y) pairs.

    ``age[i]`` is a monotone step id for slot i (-1 = empty); the recursion
    visits pairs newest-to-oldest, so slots are processed in descending age
    order.  Empty slots carry rho=0 and contribute exactly nothing.  Returns
    the (descent) direction -H g."""
    dtype = g.dtype
    order = jnp.argsort(-age)           # newest first
    valid = age >= 0

    def bwd(q, i):
        a_i = rho[i] * jnp.dot(S[i], q) * valid[i]
        return q - a_i * Y[i], a_i
    q, a_list = lax.scan(bwd, g, order)
    # gamma scaling from the most recent pair
    last = order[0]
    ys = jnp.dot(Y[last], Y[last])
    sy = 1.0 / jnp.where(rho[last] > 0, rho[last], jnp.ones((), dtype))
    gamma = jnp.where(jnp.any(valid),
                      sy / jnp.maximum(ys, jnp.finfo(dtype).tiny),
                      jnp.ones((), dtype))
    r = gamma * q

    def fwd(carry, ia):
        r = carry
        i, a_i = ia
        b_i = rho[i] * jnp.dot(Y[i], r) * valid[i]
        return r + (a_i - b_i) * S[i], None
    r, _ = lax.scan(fwd, r, (order[::-1], a_list[::-1]))
    return -r


def _zoom_opt(memory_size: int, max_linesearch_steps: int):
    return optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one"))


def lbfgs_minimize(fun: Callable[[Any], jnp.ndarray], x0: Any,
                   num_steps: int, memory_size: int = 15,
                   max_linesearch_steps: int = 20, gtol: float = 0.0,
                   ftol: float = 0.0, ftol_rel: float = 0.0
                   ) -> Tuple[Any, jnp.ndarray]:
    """Run ``num_steps`` L-BFGS iterations minimizing ``fun`` from ``x0``.

    Returns ``(x_best, f_best)``.  The best-so-far iterate is tracked
    explicitly so a divergent late step cannot degrade the result (torch's
    LBFGS similarly returns the last accepted point of the line search).
    ``fun`` may return +inf (bound violation); the zoom line search then
    backtracks.  NaN objective values freeze the iterate.
    """
    return _drive_lbfgs(_zoom_opt(memory_size, max_linesearch_steps),
                        fun, x0, num_steps, gtol=gtol, ftol=ftol,
                        ftol_rel=ftol_rel)


def zoom_carry_init(x0: Any, memory_size: int = 15,
                    max_linesearch_steps: int = 20):
    """Fresh optax L-BFGS state for ``lbfgs_minimize_zoom_carry`` — built
    once at fit init and threaded through the EM carry."""
    return _zoom_opt(memory_size, max_linesearch_steps).init(x0)


def lbfgs_minimize_zoom_carry(fun: Callable[[Any], jnp.ndarray], x0: Any,
                              num_steps: int, state: Any,
                              memory_size: int = 15,
                              max_linesearch_steps: int = 20,
                              gtol: float = 0.0, ftol: float = 0.0,
                              ftol_rel: float = 0.0
                              ) -> Tuple[Any, jnp.ndarray, Any]:
    """Strong-Wolfe zoom L-BFGS whose optimizer state (curvature memory)
    is CARRIED across calls — the cross-EM-iteration warm start for the
    M-step, with the zoom semantics unchanged.

    Rationale: theta is 6-dimensional, and every M-step of the reference
    restarts ``torch.optim.LBFGS`` from scratch (utils.py:2013), so the
    first 2-3 steps of EVERY M-step re-learn the same Hessian scale with
    badly-scaled trial steps the zoom search must reject (~2.7 value+grad
    Gram rebuilds per step measured at bench shapes, vs the 1 a well-scaled
    unit step costs).  Across EM iterations the hyperparameter curvature
    barely moves — the same observation that justifies the warm-started
    subspace eigensolver — so carrying the (s, y) memory makes step 1 of
    every M-step a well-scaled quasi-Newton step.

    The stored line-search value/gradient belong to the PREVIOUS M-step's
    objective (the eigenspace, m_b, V_b and the E-step state all moved), so
    they are poisoned to +inf here: ``optax.value_and_grad_from_state``
    then evaluates the new objective fresh at the carried iterate.
    Staleness of the memory itself is safe under the strong-Wolfe search:
    a poor direction just costs extra zoom trials, and curvature pairs are
    only stored when they satisfy s'y > 0 on the current objective.

    Returns ``(x_best, f_best, state_out)``.
    """
    opt = _zoom_opt(memory_size, max_linesearch_steps)
    value = optax.tree.get(state, "value")
    state = optax.tree.set(state, value=jnp.full_like(value, jnp.inf))
    return _drive_lbfgs(opt, fun, x0, num_steps, state0=state,
                        return_state=True, gtol=gtol, ftol=ftol,
                        ftol_rel=ftol_rel)


def _drive_lbfgs(opt, fun, x0, num_steps, state0=None, return_state=False,
                 gtol: float = 0.0, ftol: float = 0.0,
                 ftol_rel: float = 0.0):
    """Shared L-BFGS driver with EVAL-FREE best-iterate tracking: the
    linesearch stores the accepted point's value (and, for store_grad
    searches, its gradient) in the optimizer state, so both the next
    update's value+grad and the best-so-far bookkeeping reuse it instead of
    paying one extra objective evaluation per step (~10 Gram rebuilds per
    M-step at production shapes).

    ``gtol`` / ``ftol`` are the reference's ``torch.optim.LBFGS``
    early-termination tolerances (utils.py:2012: tolerance_grad=1e-7,
    tolerance_change=1e-9 — inf-norm of the gradient, and the absolute
    objective change between accepted steps).  When either is nonzero the
    step body is wrapped in a ``lax.cond`` whose converged branch is an
    identity copy, so a converged M-step's remaining L-BFGS steps cost no
    objective evaluations (the stored value/grad serve the predicate for
    free).  Both zero (the default) keeps the plain scan body — the traced
    program is unchanged, preserving compiled-program cache hits."""
    value_and_grad = optax.value_and_grad_from_state(fun)
    if state0 is None:
        state0 = opt.init(x0)
    early = (gtol > 0.0) or (ftol > 0.0) or (ftol_rel > 0.0)

    def step(carry, _):
        if early:
            x, state, x_best, f_best, was_frozen, done, f_prev = carry
        else:
            x, state, x_best, f_best, was_frozen = carry
        value, grad = value_and_grad(x, state=state)
        # best-iterate bookkeeping for the CURRENT point, from the stored
        # (or, at step 0, freshly computed) value — no extra evaluation.
        # After a frozen step x was reverted but the state still stores the
        # REJECTED point's value, so that value must not be attributed to x
        # (it could mislabel x_best): poison it for the bookkeeping only.
        value_for_best = jnp.where(was_frozen, jnp.inf, value)
        better = jnp.isfinite(value_for_best) & (value_for_best < f_best)
        x_best = jax.tree_util.tree_map(
            lambda b, c: jnp.where(better, c, b), x_best, x)
        f_best = jnp.where(better, value_for_best, f_best)

        def do_update(x, state):
            updates, state = opt.update(grad, state, x, value=value,
                                        grad=grad, value_fn=fun)
            x_new = optax.apply_updates(x, updates)
            # Freeze on non-finite parameters (divergent line search).
            bad = ~jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(leaf))
                 for leaf in jax.tree_util.tree_leaves(x_new)]))
            x_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(bad, old, new), x_new, x)
            return x_new, state, bad

        if not early:
            x_new, state, bad = do_update(x, state)
            return (x_new, state, x_best, f_best, bad), value

        # Convergence predicate from the STORED value/grad (free).  A
        # frozen step keeps stepping from the reverted x as before; its
        # stale stored value must not feed the ftol test.
        conv = jnp.asarray(False)
        if gtol > 0.0:
            gmax = jnp.max(jnp.asarray(
                [jnp.max(jnp.abs(leaf))
                 for leaf in jax.tree_util.tree_leaves(grad)]))
            conv = conv | (jnp.isfinite(value) & (gmax <= gtol))
        if ftol > 0.0 or ftol_rel > 0.0:
            # |f - f_prev| over ACCEPTED steps; f_prev starts at +inf so
            # step 0 never triggers, and a frozen step resets the window.
            # The RELATIVE term scales the gate to the objective magnitude
            # — an absolute ftol tuned on one problem's loss scale
            # over-fires on another (measured: mstep_ftol=1.0 cost r2
            # 0.60 -> 0.44 on the hard validation regime while costing
            # nothing measurable on the easy one; COVERAGE.md round 4).
            thresh = ftol + ftol_rel * jnp.abs(value)
            conv = conv | (jnp.abs(value - f_prev) < thresh)
        done = done | (conv & ~was_frozen)

        def skip_update(x, state):
            # Identity branch — but write the (possibly just recomputed)
            # finite value/grad back into the state: if the gate latches
            # while the stored value is +inf (gtol firing at step 0, or a
            # zoom_carry entry whose value is deliberately poisoned),
            # value_and_grad_from_state would otherwise re-evaluate the
            # full objective on EVERY remaining step and in the final
            # fold, defeating the 'converged steps cost zero evaluations'
            # guarantee exactly in the converged-at-entry case.
            state = optax.tree_utils.tree_set(state, value=value, grad=grad)
            return x, state, jnp.asarray(False)

        x_new, state, bad = jax.lax.cond(done, skip_update, do_update,
                                         x, state)
        f_prev = jnp.where(was_frozen, jnp.inf, value)
        return (x_new, state, x_best, f_best, bad, done, f_prev), value

    f_best0 = jnp.asarray(jnp.inf, jnp.result_type(float))
    carry0 = (x0, state0, x0, f_best0, jnp.asarray(False))
    if early:
        carry0 = carry0 + (jnp.asarray(False),
                           jnp.asarray(jnp.inf, jnp.result_type(float)))
    out_carry, _ = jax.lax.scan(step, carry0, None, length=num_steps)
    xf, state_f, x_best, f_best, frozen_f = out_carry[:5]
    # fold the final iterate in (its value is stored in the state; same
    # frozen-step poisoning as above)
    value_f, _ = optax.value_and_grad_from_state(fun)(xf, state=state_f)
    value_f = jnp.where(frozen_f, jnp.inf, value_f)
    better = jnp.isfinite(value_f) & (value_f < f_best)
    x_best = jax.tree_util.tree_map(
        lambda b, c: jnp.where(better, c, b), x_best, xf)
    f_best = jnp.where(better, value_f, f_best)
    if return_state:
        return x_best, f_best, state_f
    return x_best, f_best


def lbfgs_minimize_backtracking(fun: Callable[[Any], jnp.ndarray], x0: Any,
                                num_steps: int, memory_size: int = 15,
                                max_linesearch_steps: int = 15
                                ) -> Tuple[Any, jnp.ndarray]:
    """L-BFGS with Armijo backtracking (sufficient-decrease only) instead of
    the strong-Wolfe zoom.

    Offered as an alternative single-lane mode; reference-trajectory parity
    is pinned by tests/test_fit.py::test_backtracking_linesearch_trajectory_
    parity.  Measured on the production fit it does NOT beat zoom (18.8 s vs
    16.8 s headline): with ``store_grad=True`` optax evaluates value+grad
    per backtracking trial — the same per-trial cost as zoom — and zoom's
    interpolation needs fewer trials.  Kept because the Armijo semantics are
    more robust to noisy objectives (no curvature test to fail) and the
    sufficient-decrease-only search is what some lab configs expect.

    Same contract as ``lbfgs_minimize``.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_linesearch_steps,
            decrease_factor=0.5, increase_factor=2.0,
            store_grad=True))
    return _drive_lbfgs(opt, fun, x0, num_steps)


def lbfgs_minimize_armijo(fun: Callable[[Any], jnp.ndarray], x0: Any,
                          num_steps: int, memory_size: int = 8,
                          ls_trials: int = 6, c1: float = 1e-4,
                          ) -> Tuple[Any, jnp.ndarray]:
    """vmap-linear L-BFGS: two-loop recursion + BATCHED Armijo backtracking.

    optax's zoom line search lowers to data-dependent lax.cond/while_loop
    control flow; under vmap (population fits, one lane per cell) every cond
    executes BOTH branches for all lanes and every while_loop runs to the
    slowest lane's bound — measured ~10x per-cell overhead.  This variant is
    branch-free: each L-BFGS step evaluates a geometric ladder of
    ``ls_trials`` step sizes as ONE batched objective call (jax.vmap over the
    trial axis — on TPU the trial Grams batch onto the MXU), selects the
    first Armijo-satisfying trial with masks, then takes one value+grad call
    at the accepted point for the curvature pair.  Fixed cost per step:
    1 batched value + 1 value-and-grad, with no lane-dependent control flow.

    Same contract as ``lbfgs_minimize``: +inf objective values (bound
    violations) fail the Armijo test and are never accepted; returns the
    best-so-far iterate.
    """
    from jax.flatten_util import ravel_pytree

    flat0, unravel = ravel_pytree(x0)
    d = flat0.shape[0]
    dtype = flat0.dtype

    def fv(flat):
        return fun(unravel(flat))

    vg = jax.value_and_grad(fv)
    fv_batch = jax.vmap(fv)

    alphas = (0.5 ** jnp.arange(ls_trials)).astype(dtype)
    two_loop = _two_loop

    f0, g0 = vg(flat0)
    S0 = jnp.zeros((memory_size, d), dtype)
    Y0 = jnp.zeros((memory_size, d), dtype)
    rho0 = jnp.zeros(memory_size, dtype)
    age0 = jnp.full(memory_size, -1, jnp.int32)
    f_best0 = jnp.where(jnp.isfinite(f0), f0, jnp.inf)

    def step(carry, k):
        flat, f, g, S, Y, rho, age, x_best, f_best = carry
        direction = two_loop(g, S, Y, rho, age)
        gd = jnp.dot(g, direction)
        # non-descent direction (memory gone stale): fall back to -g
        bad_dir = (gd >= 0) | ~jnp.isfinite(gd)
        direction = jnp.where(bad_dir, -g, direction)
        gd = jnp.where(bad_dir, -jnp.dot(g, g), gd)

        trials = flat[None, :] + alphas[:, None] * direction[None, :]
        fs = fv_batch(trials)
        ok = fs <= f + c1 * alphas * gd
        first_ok = jnp.argmax(ok)            # index of first True (0 if none)
        any_ok = jnp.any(ok)
        alpha = jnp.where(any_ok, alphas[first_ok], jnp.zeros((), dtype))
        x_new = flat + alpha * direction
        f_new, g_new = vg(x_new)
        # reject non-finite results (frozen lane keeps its state)
        finite = jnp.isfinite(f_new) & jnp.all(jnp.isfinite(x_new))
        accept = any_ok & finite
        x_new = jnp.where(accept, x_new, flat)
        f_new = jnp.where(accept, f_new, f)
        g_new = jnp.where(accept, g_new, g)

        s = x_new - flat
        y = g_new - g
        sy = jnp.dot(s, y)
        store = accept & (sy > 1e-10 * jnp.maximum(jnp.dot(s, s), 1e-30))
        slot = k % memory_size
        S = jnp.where(store, S.at[slot].set(s), S)
        Y = jnp.where(store, Y.at[slot].set(y), Y)
        rho = jnp.where(store, rho.at[slot].set(
            1.0 / jnp.maximum(sy, jnp.finfo(dtype).tiny)), rho)
        age = jnp.where(store, age.at[slot].set(k.astype(jnp.int32)), age)

        better = jnp.isfinite(f_new) & (f_new < f_best)
        x_best = jnp.where(better, x_new, x_best)
        f_best = jnp.where(better, f_new, f_best)
        return (x_new, f_new, g_new, S, Y, rho, age, x_best, f_best), None

    carry0 = (flat0, f0, g0, S0, Y0, rho0, age0, flat0, f_best0)
    carry, _ = jax.lax.scan(step, carry0, jnp.arange(num_steps))
    x_best, f_best = carry[-2], carry[-1]
    return unravel(x_best), f_best


def empty_lbfgs_memory(d: int, dtype, memory_size: int = 8):
    """An empty carryable L-BFGS memory: (S, Y, rho, age) with every slot
    marked unused (age = -1).  ``d`` is the flattened parameter dimension."""
    return (jnp.zeros((memory_size, d), dtype),
            jnp.zeros((memory_size, d), dtype),
            jnp.zeros(memory_size, dtype),
            jnp.full(memory_size, -1, jnp.int32))


def lbfgs_minimize_speculative(fun: Callable[[Any], jnp.ndarray], x0: Any,
                               num_steps: int, memory_size: int = 8,
                               max_backtracks: int = 10, c1: float = 1e-4,
                               memory: Optional[tuple] = None,
                               ) -> Tuple[Any, jnp.ndarray, tuple]:
    """L-BFGS with a SPECULATIVE-accept Armijo line search (single-lane).

    The strong-Wolfe zoom line search pays one value+grad per trial; at the
    M-step every trial is a full Gram rebuild — the hottest region of the
    whole fit (reference closure: Spatial_GP_repo/utils.py:2013-2114, 63.7 s
    of its 85.2 s stored run).  This driver exploits two facts:

    * with a warm L-BFGS memory the unit step satisfies Armijo almost
      always, so the first trial's gradient is almost never wasted;
    * a REJECTED trial only needs the objective value (about 1/3 the cost of
      value+grad: the gradient is a second Gram-scale pass).

    Each step therefore evaluates value+grad at ONE speculative step along
    the two-loop direction; only on Armijo failure does it fall back to ONE
    batched value-only evaluation of a geometric step ladder (jax.vmap over
    the trial axis, the trial Grams batch onto the MXU) plus one value+grad
    at the first Armijo-passing trial.  Rejection cost is therefore bounded
    by one batched call — the round-2 variant's serial ``lax.while_loop``
    paid up to ``max_backtracks`` dependent Gram rebuilds per rejection,
    which is where the measured 29.4 s headline regression came from (a
    stale cross-iteration memory makes early-iteration unit steps
    overshoot).

    The speculative step size is ADAPTIVE: it starts at 1 (the L-BFGS unit
    step), is set to the accepted ladder rung after any rejection, and
    doubles back toward 1 after each speculative accept.  Measured on the
    synthetic fit, the fixed-unit-step variant rejected ~39% of its
    speculations (each rejection = 1 wasted value+grad + the ladder call);
    carrying the accepted scale keeps the speculation aligned with the
    objective's local trust region, so the expected cost per step stays at
    ~1 value+grad vs the zoom search's measured ~2.7.

    ``memory`` carries (S, Y, rho, age) across calls.  Across EM iterations
    the hyperparameter curvature barely moves — the same observation that
    justifies the warm-started subspace eigensolver — so a carried memory
    keeps the unit step well-scaled from the FIRST step of every M-step.
    Staleness is safe by construction: a non-descent direction falls back to
    scaled steepest descent and the Armijo test rejects bad steps; curvature
    pairs are only stored when s'y > 0 holds on the current objective.

    Not vmap-linear (the lax.cond would execute both branches per lane) —
    population fits use ``lbfgs_minimize_armijo`` instead.

    Returns ``(x_best, f_best, memory_out)``.
    """
    from jax.flatten_util import ravel_pytree

    flat0, unravel = ravel_pytree(x0)
    d = flat0.shape[0]
    dtype = flat0.dtype

    def fv(flat):
        return fun(unravel(flat))

    vg = jax.value_and_grad(fv)
    fv_batch = jax.vmap(fv)
    ladder = (0.5 ** jnp.arange(1, max_backtracks + 1)).astype(dtype)

    if memory is None:
        S0, Y0, rho0, age0 = empty_lbfgs_memory(d, dtype, memory_size)
    else:
        S0, Y0, rho0, age0 = memory

    f0, g0 = vg(flat0)
    f_best0 = jnp.where(jnp.isfinite(f0), f0, jnp.asarray(jnp.inf, dtype))

    def step(carry, _):
        flat, f, g, S, Y, rho, age, x_best, f_best, a_spec = carry
        direction = _two_loop(g, S, Y, rho, age)
        gd = jnp.dot(g, direction)
        # Non-descent / non-finite direction (stale or empty memory): fall
        # back to steepest descent with the torch-LBFGS first-step scale
        # min(1, 1/|g|_1) so the unit trial is sane.
        bad_dir = (gd >= 0) | ~jnp.isfinite(gd)
        gscale = jnp.minimum(
            jnp.ones((), dtype),
            1.0 / jnp.maximum(jnp.sum(jnp.abs(g)), jnp.finfo(dtype).tiny))
        direction = jnp.where(bad_dir, -g * gscale, direction)
        gd = jnp.where(bad_dir, -jnp.dot(g, g) * gscale, gd)

        # Speculative step at the carried trust scale: value AND gradient
        # in one pass.
        x1 = flat + a_spec * direction
        f1, g1 = vg(x1)
        ok1 = (jnp.isfinite(f1) & (f1 <= f + c1 * a_spec * gd)
               & jnp.all(jnp.isfinite(g1)))

        def spec(_):
            return x1, f1, g1, jnp.asarray(True), a_spec

        def backtrack(_):
            # one BATCHED value-only evaluation of the whole geometric
            # ladder below a_spec (the trial Grams batch onto the MXU),
            # then value+grad at the first Armijo-passing alpha — same
            # selected step as a serial halving loop, bounded cost
            alphas = a_spec * ladder
            trials = flat[None, :] + alphas[:, None] * direction[None, :]
            fs = fv_batch(trials)
            ok = jnp.isfinite(fs) & (fs <= f + c1 * alphas * gd)
            first_ok = jnp.argmax(ok)
            done = jnp.any(ok)
            alpha = jnp.where(done, alphas[first_ok], jnp.zeros((), dtype))
            xa = flat + alpha * direction
            fa, ga = vg(xa)
            acc = done & jnp.isfinite(fa) & jnp.all(jnp.isfinite(ga))
            return xa, fa, ga, acc, alpha

        x_new, f_new, g_new, accept, a_used = lax.cond(ok1, spec,
                                                       backtrack, None)
        if _LS_DEBUG:
            jax.debug.print(
                "[ls] unit_ok={u} accept={a} f={f:.6f} f_new={fn:.6f} "
                "gd={gd:.3e} bad_dir={bd}",
                u=ok1, a=accept, f=f, fn=f_new, gd=gd, bd=bad_dir)
        accept = accept & jnp.all(jnp.isfinite(x_new))
        x_new = jnp.where(accept, x_new, flat)
        f_new = jnp.where(accept, f_new, f)
        g_new = jnp.where(accept, g_new, g)

        # curvature pair into the oldest slot (age -1 = empty = oldest)
        s = x_new - flat
        y = g_new - g
        sy = jnp.dot(s, y)
        store = accept & (sy > 1e-10 * jnp.maximum(jnp.dot(s, s), 1e-30))
        slot = jnp.argmin(age)
        next_age = jnp.max(age) + 1
        S = jnp.where(store, S.at[slot].set(s), S)
        Y = jnp.where(store, Y.at[slot].set(y), Y)
        rho = jnp.where(store, rho.at[slot].set(
            1.0 / jnp.maximum(sy, jnp.finfo(dtype).tiny)), rho)
        age = jnp.where(store, age.at[slot].set(next_age), age)

        better = jnp.isfinite(f_new) & (f_new < f_best)
        x_best = jnp.where(better, x_new, x_best)
        f_best = jnp.where(better, f_new, f_best)
        # adapt the speculation scale: an accepted speculation doubles it
        # back toward 1; a ladder accept adopts the accepted rung; a total
        # failure halves it (the next direction will be rebuilt anyway)
        a_next = jnp.where(
            accept & ok1, jnp.minimum(1.0, 2.0 * a_used),
            jnp.where(accept, jnp.maximum(a_used, jnp.finfo(dtype).tiny),
                      0.5 * a_spec))
        a_next = jnp.clip(a_next, 2.0 ** (-20), 1.0)
        return (x_new, f_new, g_new, S, Y, rho, age, x_best, f_best,
                a_next), None

    carry0 = (flat0, f0, g0, S0, Y0, rho0, age0, flat0, f_best0,
              jnp.ones((), dtype))
    carry, _ = lax.scan(step, carry0, None, length=num_steps)
    x_best, f_best = carry[7], carry[8]
    mem_out = (carry[3], carry[4], carry[5], carry[6])
    return unravel(x_best), f_best, mem_out
