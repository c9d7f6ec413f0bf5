"""On-device Lambert-W and the batched acquisition scorer."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_processes_tpu.ops.lambertw import lambertw
from gaussian_processes_tpu.models.acquisition import nd_utility, utility

REF_PATH = "/root/reference/Spatial_GP_repo"


def test_lambertw_vs_scipy():
    from scipy.special import lambertw as scipy_w
    z = np.concatenate([
        np.linspace(0.0, 5.0, 101),
        np.logspace(-12, -1, 40),
        np.logspace(1, 100, 60),
    ])
    ours = np.asarray(lambertw(jnp.asarray(z)))
    ref = np.real(scipy_w(z, k=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-15)


def test_lambertw_identity():
    z = jnp.asarray(np.logspace(-8, 8, 50))
    w = lambertw(z)
    np.testing.assert_allclose(np.asarray(w * jnp.exp(w)), np.asarray(z),
                               rtol=1e-12)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF_PATH),
                    reason="reference checkout not available")
def test_nd_utility_parity():
    """Batched utility parity with the reference scorer on a realistic range
    of log-f moments."""
    import torch
    sys.path.insert(0, REF_PATH)
    try:
        import utils as ref
    finally:
        sys.path.remove(REF_PATH)

    rng = np.random.default_rng(11)
    ns = 57
    mu = rng.uniform(-2.0, 1.5, ns)
    sigma2 = rng.uniform(0.01, 1.2, ns)
    r_masked = torch.arange(0, 100, dtype=torch.float64)
    u_ref = ref.nd_utility(torch.tensor(sigma2), torch.tensor(mu), r_masked)
    u_ours = nd_utility(jnp.asarray(sigma2), jnp.asarray(mu), r_cutoff=100)
    np.testing.assert_allclose(np.asarray(u_ours), u_ref.cpu().numpy(),
                               rtol=1e-7, atol=1e-10)


@pytest.mark.skipif(not os.path.isdir(REF_PATH),
                    reason="reference checkout not available")
def test_scalar_utility_parity():
    import torch
    sys.path.insert(0, REF_PATH)
    try:
        import utils as ref
    finally:
        sys.path.remove(REF_PATH)
    r_masked = torch.arange(0, 100, dtype=torch.float64)
    for mu, s2 in [(0.3, 0.5), (-1.0, 0.05), (1.2, 0.9)]:
        u_ref = ref.nd_utility(torch.tensor([s2], dtype=torch.float64),
                               torch.tensor([mu], dtype=torch.float64),
                               r_masked)
        u = utility(jnp.float64(s2), jnp.float64(mu))
        np.testing.assert_allclose(float(u), float(u_ref[0]), rtol=1e-7)


def test_utility_prefers_uncertain_candidates():
    """With matched means, higher posterior variance of log f must yield
    higher information gain."""
    mu = jnp.zeros(5)
    s2 = jnp.asarray([0.01, 0.1, 0.3, 0.6, 1.0])
    u = np.asarray(nd_utility(s2, mu))
    assert np.all(np.diff(u) > 0)
