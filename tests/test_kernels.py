"""Kernel construction: Kronecker-factored path vs dense brute force, and
parity of the static-zeroed mask with the reference's dynamic crop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu.ops import kernels
from gaussian_processes_tpu.ops.analytic_grads import localker_with_grads
from gaussian_processes_tpu import params as P

N = 12  # small pixel grid: nx = 144


def make_theta(beta=0.35, rho=0.18, eps=(0.1, -0.2), sigma_0=1.0, amp=1.3):
    return {
        "sigma_0": jnp.float64(sigma_0),
        "eps_0x": jnp.float64(eps[0]),
        "eps_0y": jnp.float64(eps[1]),
        "-2log2beta": jnp.float64(-2 * np.log(2 * beta)),
        "-log2rho2": jnp.float64(-np.log(2 * rho * rho)),
        "Amp": jnp.float64(amp),
    }


def brute_force_C(theta, n):
    """Direct transcription of the mathematical definition over the masked
    pixel set: C = Amp * alpha alpha^T . exp(-g_rho d^2), alpha >= 1e-3."""
    lin = np.linspace(-1, 1, n)
    yc = np.repeat(lin, n)
    xc = np.tile(lin, n)
    gb = np.exp(float(theta["-2log2beta"]))
    gr = np.exp(float(theta["-log2rho2"]))
    alpha = np.exp(-gb * ((xc - float(theta["eps_0x"])) ** 2 +
                          (yc - float(theta["eps_0y"])) ** 2))
    mask = alpha >= 1e-3
    a = np.where(mask, alpha, 0.0)
    d2 = (xc[:, None] - xc[None, :]) ** 2 + (yc[:, None] - yc[None, :]) ** 2
    Cs = np.exp(-gr * d2)
    return float(theta["Amp"]) * a[:, None] * Cs * a[None, :], mask


def test_materialize_C_matches_brute_force():
    theta = make_theta()
    C, mask = kernels.materialize_C(theta, N)
    C_ref, mask_ref = brute_force_C(theta, N)
    np.testing.assert_array_equal(np.asarray(mask), mask_ref)
    np.testing.assert_allclose(np.asarray(C), C_ref, rtol=1e-12, atol=1e-14)


def test_localker_with_grads_C_matches():
    theta = make_theta()
    C1, mask1 = kernels.materialize_C(theta, N)
    C2, mask2, _ = localker_with_grads(theta, N)
    np.testing.assert_array_equal(np.asarray(mask1), np.asarray(mask2))
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2),
                               rtol=1e-12, atol=1e-14)


def test_quad_forms_match_dense(rng):
    theta = make_theta()
    x1 = jnp.asarray(rng.standard_normal((7, N * N)))
    x2 = jnp.asarray(rng.standard_normal((5, N * N)))
    C, _ = kernels.materialize_C(theta, N)
    q11, q22, q12 = kernels.quad_forms(theta, x1, x2, N)
    np.testing.assert_allclose(np.asarray(q11),
                               np.einsum("ip,pq,iq->i", x1, C, x1),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(q22),
                               np.einsum("ip,pq,iq->i", x2, C, x2),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(q12), np.asarray(x1 @ C @ x2.T),
                               rtol=1e-10)


def test_acosker_matches_dense_definition(rng):
    theta = make_theta()
    x1 = jnp.asarray(rng.standard_normal((6, N * N)))
    x2 = jnp.asarray(rng.standard_normal((4, N * N)))
    C, _ = kernels.materialize_C(theta, N)

    # dense arc-cosine from the definition
    s02 = float(theta["sigma_0"]) ** 2
    X1 = np.sqrt(np.einsum("ip,pq,iq->i", x1, C, x1) + s02)
    X2 = np.sqrt(np.einsum("ip,pq,iq->i", x2, C, x2) + s02)
    X1X2 = np.outer(X1, X2)
    x1x2 = np.asarray(x1 @ C @ x2.T) + s02
    cosd = np.clip(x1x2 / (X1X2 + 1e-7), -1, 1)
    delta = np.arccos(cosd)
    J = (np.sqrt(1 - cosd ** 2) + np.pi * cosd - delta * cosd) / np.pi
    K_ref = X1X2 * J

    K = kernels.acosker(theta, x1, x2, n_px_side=N)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-10)


def test_acosker_diag(rng):
    theta = make_theta()
    x = jnp.asarray(rng.standard_normal((9, N * N)))
    C, _ = kernels.materialize_C(theta, N)
    Kvec = kernels.acosker(theta, x, diag=True, n_px_side=N)
    ref = np.einsum("ip,pq,iq->i", x, C, x) + float(theta["sigma_0"]) ** 2
    np.testing.assert_allclose(np.asarray(Kvec), ref, rtol=1e-10)


def test_gram_matrices_consistency(rng):
    theta = make_theta()
    x = jnp.asarray(rng.standard_normal((8, N * N)))
    xt = jnp.asarray(rng.standard_normal((5, N * N)))
    K_tilde, K, Kvec = kernels.gram_matrices(theta, x, xt, N, shared=False)
    np.testing.assert_allclose(np.asarray(K_tilde),
                               np.asarray(kernels.acosker(theta, xt, n_px_side=N)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(K),
                               np.asarray(kernels.acosker(theta, x, xt, n_px_side=N)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Kvec),
                               np.asarray(kernels.acosker(theta, x, diag=True, n_px_side=N)),
                               rtol=1e-12)
    # shared path
    K_tilde_s, K_s, Kvec_s = kernels.gram_matrices(theta, x, x, N, shared=True)
    assert K_s is K_tilde_s
    np.testing.assert_allclose(np.asarray(K_tilde_s),
                               np.asarray(kernels.acosker(theta, x, n_px_side=N)),
                               rtol=1e-12)


def test_acos_J_grad_no_nan_at_edges():
    c = jnp.asarray([-1.0, -0.999999, 0.0, 0.999999, 1.0])
    J = kernels.acos_J(c)
    assert np.all(np.isfinite(np.asarray(J)))
    dJ = jax.vmap(jax.grad(kernels.acos_J))(c)
    assert np.all(np.isfinite(np.asarray(dJ)))
    np.testing.assert_allclose(np.asarray(dJ),
                               (np.pi - np.arccos(np.asarray(c))) / np.pi,
                               rtol=1e-12)


def test_kernel_symmetric_psd(rng):
    theta = make_theta()
    x = jnp.asarray(rng.standard_normal((10, N * N)))
    K = kernels.acosker(theta, x, n_px_side=N)
    Kn = np.asarray(K)
    np.testing.assert_allclose(Kn, Kn.T, atol=1e-12)
    eig = np.linalg.eigvalsh(Kn)
    assert eig.min() > -1e-8


@pytest.mark.slow
def test_crop_window_exactness():
    """A crop window covering the RF mask reproduces the full-grid kernels
    to fp roundoff (the cropped pixels all carry zero weight)."""
    from gaussian_processes_tpu.ops.kernels import (
        gram_matrices, gram_matrices_windowed, crop_window_for_theta,
        local_envelope)
    NN = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((15, NN * NN)))
    xt = jnp.asarray(rng.standard_normal((8, NN * NN)))
    theta = {"sigma_0": jnp.float64(1.0), "eps_0x": jnp.float64(0.15),
             "eps_0y": jnp.float64(-0.2),
             "-2log2beta": jnp.float64(-2 * np.log(2 * 0.08)),
             "-log2rho2": jnp.float64(-np.log(2 * 0.04 ** 2)),
             "Amp": jnp.float64(1.1)}
    i0, j0, w = crop_window_for_theta(theta, NN)
    assert w < NN
    _, _, mask = local_envelope(theta, NN)
    midx = np.flatnonzero(np.asarray(mask))
    rows, cols = midx // NN, midx % NN
    assert rows.min() >= i0 and rows.max() < i0 + w
    assert cols.min() >= j0 and cols.max() < j0 + w
    K1t, K1, Kv1 = gram_matrices(theta, x, xt, NN, shared=False)
    K2t, K2, Kv2 = gram_matrices_windowed(theta, x, xt, NN, False, i0, j0, w)
    np.testing.assert_allclose(np.asarray(K2t), np.asarray(K1t), atol=1e-12)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Kv2), np.asarray(Kv1), atol=1e-12)


def test_linker_matches_dense(rng):
    from gaussian_processes_tpu.ops.kernels import linker
    theta = make_theta()
    x = jnp.asarray(rng.standard_normal((6, N * N)))
    C, _ = kernels.materialize_C(theta, N)
    K = linker(theta, x, n_px_side=N)
    ref = np.asarray(x @ C @ x.T)
    ref = 0.5 * (ref + ref.T) + 1e-9 * np.eye(6)
    np.testing.assert_allclose(np.asarray(K), ref, rtol=1e-10, atol=1e-14)
    Kd = linker(theta, x, diag=True, n_px_side=N)
    np.testing.assert_allclose(np.asarray(Kd),
                               np.einsum("ip,pq,iq->i", x, C, x), rtol=1e-10)


# ---------------------------------------------------------------------------
# Spectrally projected Gram (the M-step fast path)
# ---------------------------------------------------------------------------

def _theta_rho(rho):
    t = make_theta()
    t["-log2rho2"] = jnp.float64(-np.log(2 * rho * rho))
    return t


def _projected(theta, x, xt, rank, shared=False, n=N, tol=3e-6):
    from gaussian_processes_tpu.ops.kernels import (
        gram_matrices_projected, smooth_projection_basis)
    E = smooth_projection_basis(theta, n, n, rank, dtype=x.dtype)
    return gram_matrices_projected(theta, x, xt, E, 0, 0, n, shared,
                                   tol=tol)


def test_projected_gram_full_rank_is_exact(rng):
    """rank == side makes the projection the identity: the restructured
    contraction must reproduce gram_matrices to fp roundoff."""
    theta = make_theta()
    x = jnp.asarray(rng.standard_normal((9, N * N)))
    xt = jnp.asarray(rng.standard_normal((5, N * N)))
    Kt0, K0, Kv0 = kernels.gram_matrices(theta, x, xt, N, shared=False)
    Kt, K, Kv, ok = _projected(theta, x, xt, rank=N)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(Kt), np.asarray(Kt0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Kv), np.asarray(Kv0), atol=1e-10)


def test_projected_gram_truncated_within_tol(rng):
    """A genuinely truncated basis (rank 10 of 12 at a smooth rho) passes
    the residual guard and matches the exact Gram to the advertised
    tolerance class."""
    theta = _theta_rho(0.5)   # rel Frobenius residual ~4e-8 at rank 10
    x = jnp.asarray(rng.standard_normal((9, N * N)))
    xt = jnp.asarray(rng.standard_normal((5, N * N)))
    Kt0, K0, Kv0 = kernels.gram_matrices(theta, x, xt, N, shared=False)
    Kt, K, Kv, ok = _projected(theta, x, xt, rank=10)
    assert bool(ok)
    scale = float(np.max(np.abs(np.asarray(Kt0))))
    np.testing.assert_allclose(np.asarray(Kt), np.asarray(Kt0),
                               atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K0),
                               atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(Kv), np.asarray(Kv0),
                               atol=3e-6 * scale)


def test_projected_gram_guard_rejects_insufficient_rank(rng):
    """When the static rank cannot carry the smoothing spectrum (sharp rho),
    the closed-form residual check must flag the projection as invalid."""
    theta = make_theta()   # rho=0.18 on 12 px: rank 6 leaves ~19% residual
    x = jnp.asarray(rng.standard_normal((4, N * N)))
    _, _, _, ok = _projected(theta, x, x, rank=6, shared=True)
    assert not bool(ok)


def test_projected_gram_windowed_corner(rng):
    """Projected Gram on a crop window at a nonzero traced corner matches
    gram_matrices_windowed (same envelope handling; S is
    placement-independent on the uniform grid)."""
    from gaussian_processes_tpu.ops.kernels import (
        crop_images, crop_window_for_theta, gram_matrices_projected,
        gram_matrices_windowed, smooth_projection_basis)
    NN = 48
    theta = {"sigma_0": jnp.float64(1.0), "eps_0x": jnp.float64(0.15),
             "eps_0y": jnp.float64(-0.2),
             "-2log2beta": jnp.float64(-2 * np.log(2 * 0.08)),
             "-log2rho2": jnp.float64(-np.log(2 * 0.25 ** 2)),
             "Amp": jnp.float64(1.1)}
    x = jnp.asarray(rng.standard_normal((7, NN * NN)))
    xt = jnp.asarray(rng.standard_normal((4, NN * NN)))
    i0, j0, w = crop_window_for_theta(theta, NN)
    assert w < NN
    K0t, K0, Kv0 = gram_matrices_windowed(theta, x, xt, NN, False, i0, j0, w)
    xc = crop_images(x, i0, j0, w, NN)
    xtc = crop_images(xt, i0, j0, w, NN)
    E = smooth_projection_basis(theta, w, NN, rank=min(20, w), dtype=x.dtype)
    Kt, K, Kv, ok = gram_matrices_projected(theta, xc, xtc, E, i0, j0, NN,
                                            shared=False)
    assert bool(ok)
    scale = float(np.max(np.abs(np.asarray(K0t))))
    np.testing.assert_allclose(np.asarray(Kt), np.asarray(K0t),
                               atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K0),
                               atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(Kv), np.asarray(Kv0),
                               atol=3e-6 * scale)


@pytest.mark.slow
def test_projected_gram_value_and_grad_finite(rng):
    """The projected path (including the cond fallback) is differentiable
    wrt theta."""
    theta = _theta_rho(0.5)
    x = jnp.asarray(rng.standard_normal((6, N * N)))

    def loss(th):
        Kt, K, Kv, ok = _projected(th, x, x, rank=10, shared=True)
        return jnp.sum(Kt) + jnp.sum(Kv)

    val, grads = jax.value_and_grad(loss)(theta)
    assert np.isfinite(float(val))
    for k, g in grads.items():
        assert np.isfinite(float(g)), k


def test_suggest_proj_rank():
    from gaussian_processes_tpu.ops.kernels import suggest_proj_rank
    # production-like: gr=50 on the 108-grid needs ~42 directions at 1e-8;
    # +8 slack bucketed -> 56; monotone in gr; capped at w
    r80 = suggest_proj_rank(50.0, 80, 108)
    r108 = suggest_proj_rank(50.0, 108, 108)
    assert 32 <= r80 <= 56
    assert r80 <= r108 <= 64
    assert suggest_proj_rank(200.0, 80, 108) >= r80
    assert suggest_proj_rank(50.0, 16, 108) <= 16
    # numerically verify the claimed residual at the suggested rank
    import numpy as np
    delta = 2.0 / 107
    idx = np.arange(80) * delta
    S = np.exp(-50.0 * (idx[:, None] - idx[None, :]) ** 2)
    ev = np.linalg.eigvalsh(S)[::-1]
    resid = np.sqrt((ev[r80:] ** 2).sum() / (ev ** 2).sum())
    assert resid <= 1e-8
