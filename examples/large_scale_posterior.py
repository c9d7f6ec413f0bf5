"""Beyond-the-reference scale: a >=50k-point GP posterior on one chip.

The reference caps problem size with inducing points and eigenvalue
truncation (Spatial_GP_repo/utils.py:1683) — a 50k-point K_tilde in its
f64 posture is a 20 GB matrix plus an O(n^3) eigh it never attempts.
This example runs the framework's large-ntilde path end to end
(parallel/large.py): the arc-cosine Gram built block-by-block into one
donated (n, n) buffer, the in-place blocked Cholesky of
``K_tilde + sigma^2 I``, the posterior-mean weights, and predictions for
a batch of held-out stimuli — the conjugate (Gaussian-likelihood) limit
of the model at a scale the reference cannot touch.

Usage:
    python examples/large_scale_posterior.py              # n=8192 demo
    python examples/large_scale_posterior.py --n 50000    # the full thing
                                                          # (~16 GB HBM chip)
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192,
                    help="training/inducing points (50k needs a 16 GB chip)")
    ap.add_argument("--n-px", type=int, default=48,
                    help="pixels per side (48 = the production crop scale)")
    ap.add_argument("--nstar", type=int, default=64)
    ap.add_argument("--noise-var", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gaussian_processes_tpu.parallel.large import large_posterior_mean

    n, n_px = args.n, args.n_px
    rng = np.random.default_rng(0)

    # stream the stimuli in chunks to bound host memory
    xt = np.empty((n, n_px * n_px), np.float32)
    for i in range(0, n, 8192):
        j = min(i + 8192, n)
        xt[i:j] = rng.standard_normal((j - i, n_px * n_px)).astype(np.float32)

    # a planted smooth RF drives the (Gaussianized) responses
    lin = np.linspace(-1, 1, n_px)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    w = np.exp(-((xx - 0.1) ** 2 + (yy + 0.2) ** 2) / (2 * 0.2 ** 2)).ravel()
    w = (w / np.linalg.norm(w)).astype(np.float32)
    y = xt @ w + rng.normal(0, np.sqrt(args.noise_var), n).astype(np.float32)
    xstar = rng.standard_normal((args.nstar, n_px * n_px)).astype(np.float32)
    y_star_true = xstar @ w

    theta = {k: jnp.float32(v) for k, v in [
        ("sigma_0", 1.0), ("eps_0x", 0.1), ("eps_0y", -0.2),
        ("-2log2beta", -2 * np.log(2 * 0.25)),
        ("-log2rho2", -np.log(2 * 0.1 ** 2)), ("Amp", 1.0)]}

    print(f"n={n}: building Gram + factoring + solving ...", file=sys.stderr)
    t0 = time.perf_counter()
    mu, alpha = large_posterior_mean(theta, jnp.asarray(xt), jnp.asarray(y),
                                     jnp.asarray(xstar), n_px,
                                     noise_var=args.noise_var)
    mu = np.asarray(mu)
    elapsed = time.perf_counter() - t0

    corr = np.corrcoef(mu, y_star_true)[0, 1]
    print(f"n={n}: end-to-end {elapsed:.1f} s "
          f"(compile-inclusive on first run); "
          f"corr(posterior mean, true signal) = {corr:.3f} "
          f"over {args.nstar} held-out stimuli")
    assert np.all(np.isfinite(mu)), "posterior mean has non-finite entries"


if __name__ == "__main__":
    main()
