"""Pallas tiled Gram kernel vs the XLA path (interpret mode on CPU; the
same code compiles with Mosaic on TPU — exercised by bench.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_processes_tpu.ops.kernels import gram_matrices

N = 16


def theta32():
    vals = {"sigma_0": 1.0, "eps_0x": 0.1, "eps_0y": -0.2,
            "-2log2beta": -2 * np.log(2 * 0.4),
            "-log2rho2": -np.log(2 * 0.18 ** 2), "Amp": 1.3}
    return {k: jnp.float32(v) for k, v in vals.items()}


@pytest.mark.slow
def test_pallas_gram_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((20, N * N)), jnp.float32)
    xt = jnp.asarray(rng.standard_normal((12, N * N)), jnp.float32)
    th = theta32()
    Kt1, K1, Kv1 = gram_matrices(th, x, xt, N, shared=False, backend="xla")
    Kt2, K2, Kv2 = gram_matrices(th, x, xt, N, shared=False, backend="pallas")
    np.testing.assert_allclose(np.asarray(Kt2), np.asarray(Kt1),
                               rtol=3e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K1),
                               rtol=3e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Kv2), np.asarray(Kv1), rtol=1e-6)


def test_pallas_gram_shared_path():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((20, N * N)), jnp.float32)
    th = theta32()
    Kt1, K1, _ = gram_matrices(th, x, x, N, shared=True, backend="xla")
    Kt2, K2, _ = gram_matrices(th, x, x, N, shared=True, backend="pallas")
    assert K2 is Kt2
    np.testing.assert_allclose(np.asarray(Kt2), np.asarray(Kt1),
                               rtol=3e-6, atol=1e-6)
    # exact symmetry preserved
    np.testing.assert_array_equal(np.asarray(Kt2), np.asarray(Kt2).T)


def test_pallas_gram_nonaligned_shapes():
    """Shapes that are not multiples of the tile sizes pad correctly."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((37, N * N)), jnp.float32)
    xt = jnp.asarray(rng.standard_normal((5, N * N)), jnp.float32)
    th = theta32()
    Kt1, K1, _ = gram_matrices(th, x, xt, N, shared=False, backend="xla")
    Kt2, K2, _ = gram_matrices(th, x, xt, N, shared=False, backend="pallas")
    assert K2.shape == (37, 5)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K1),
                               rtol=3e-6, atol=1e-6)
