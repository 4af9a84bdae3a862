import numpy as np
import jax
import jax.numpy as jnp

from langevin_mcmc_tpu.mcmc import gaussian as G
from langevin_mcmc_tpu.options import Options


def test_isotropic_logpdf_matches_scipy():
    from scipy.stats import multivariate_normal
    dim, sigma = 6, 0.01
    g = G.isotropic_gaussian((4,), dim, sigma)
    x = np.random.default_rng(0).normal(0, 0.01, (4, dim)).astype(np.float32)
    lp = np.asarray(G.gaussian_log_pdf(jnp.asarray(x), g))
    want = multivariate_normal.logpdf(x, np.zeros(dim),
                                      np.eye(dim) * sigma ** 2)
    np.testing.assert_allclose(lp, want, rtol=1e-3)


def test_gaussian_sample_statistics():
    dim, sigma = 4, 0.5
    g = G.isotropic_gaussian((20000,), dim, sigma)
    x = np.asarray(G.gaussian_sample(jax.random.PRNGKey(0), g))
    assert abs(x.mean()) < 0.02
    np.testing.assert_allclose(x.std(0), sigma, rtol=0.05)


def test_mala_gaussian_matches_reference_formula():
    opts = Options()
    dim = 4
    rng = np.random.default_rng(1)
    v1 = jnp.asarray(rng.normal(0, 2, (3, dim)).astype(np.float32))
    v2 = jnp.asarray(rng.uniform(0.1, 2, (3, dim)).astype(np.float32))
    M = jnp.asarray(rng.uniform(0.1, 10, (3, dim)).astype(np.float32))
    ss, shk = 0.005, 0.005
    sc = jnp.ones(3)
    g = G.mala_gaussian(v1, v2, ss, shk, M, sc, opts)
    # reference mala.cpp:42-50
    cov_t = ss * ss * (np.asarray(M) + 1.0)
    inv_cov = 1.0 / cov_t + 1.0 / (shk * shk)
    cov = 1.0 / inv_cov
    mean = np.clip(np.asarray(v1), -5, 5) * cov / 2.0
    np.testing.assert_allclose(np.asarray(g.inv_cov_d), inv_cov, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g.cov_l_d), np.sqrt(cov), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g.mean), mean, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g.log_det),
                               np.log(inv_cov).sum(-1), rtol=1e-4)
    # zero-score fallback
    g0 = G.mala_gaussian(v1, v2, ss, shk, M, jnp.zeros(3), opts)
    np.testing.assert_allclose(np.asarray(g0.cov_l_d), shk, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0.mean), 0.0)


def test_h2mc_gaussian_properties():
    """Quadratic target: H2MC proposal should be near the mode with the
    curvature-shaped covariance; also checks symmetry and fallback."""
    dim = 4
    rng = np.random.default_rng(2)
    A = rng.normal(size=(dim, dim))
    hess_np = -(A @ A.T) - np.eye(dim) * 2.0   # negative definite
    x0 = rng.normal(size=dim) * 0.1
    grad_np = hess_np @ (-x0)                  # grad of 0.5 x^T H x at x0...
    grad = jnp.asarray(grad_np[None].astype(np.float32))
    hess = jnp.asarray(hess_np[None].astype(np.float32))
    g = G.h2mc_gaussian(grad, hess, 0.01, jnp.ones(1))
    inv_cov = np.asarray(g.inv_cov)[0]
    np.testing.assert_allclose(inv_cov, inv_cov.T, rtol=1e-3, atol=1e-3)
    # eigenvalues of invCov >= invSigmaSq prior
    ev = np.linalg.eigvalsh(inv_cov)
    assert ev.min() >= 1.0 / (0.01 ** 2) * 0.99
    # covL covL^T == cov
    cov_l = np.asarray(g.cov_l)[0]
    np.testing.assert_allclose(cov_l @ cov_l.T, np.linalg.inv(inv_cov),
                               rtol=2e-2, atol=1e-8)
    # tiny-Hessian fallback -> isotropic
    g2 = G.h2mc_gaussian(jnp.zeros((1, dim)), jnp.zeros((1, dim, dim)),
                         0.01, jnp.ones(1))
    np.testing.assert_allclose(np.asarray(g2.cov_l)[0],
                               np.eye(dim) * 0.01, atol=1e-6)


def test_padded_dims_cancel_in_mh_ratio():
    """Padded dims must contribute identically to both sides of the ratio."""
    opts = Options()
    dim, active = 8, 4
    rng = np.random.default_rng(3)
    v1a = rng.normal(0, 1, (1, dim)).astype(np.float32)
    v1b = rng.normal(0, 1, (1, dim)).astype(np.float32)
    v1a[:, active:] = 0
    v1b[:, active:] = 0
    v2a = np.zeros((1, dim), np.float32)
    v2b = np.zeros((1, dim), np.float32)
    v2a[:, :active] = rng.uniform(0.1, 1, (1, active))
    v2b[:, :active] = rng.uniform(0.1, 1, (1, active))
    M = np.clip(1.0 / (1e-3 + np.sqrt(v2a)), 0.01, 100).astype(np.float32)
    Mb = np.clip(1.0 / (1e-3 + np.sqrt(v2b)), 0.01, 100).astype(np.float32)
    ga = G.mala_gaussian(jnp.asarray(v1a), jnp.asarray(v2a), 0.005, 0.005,
                         jnp.asarray(M), jnp.ones(1), opts)
    gb = G.mala_gaussian(jnp.asarray(v1b), jnp.asarray(v2b), 0.005, 0.005,
                         jnp.asarray(Mb), jnp.ones(1), opts)
    off = rng.normal(0, 0.005, (1, dim)).astype(np.float32)
    full = (np.asarray(G.gaussian_log_pdf(jnp.asarray(-off), gb))
            - np.asarray(G.gaussian_log_pdf(jnp.asarray(off), ga)))
    off_trunc = off.copy()
    off_trunc[:, active:] = 0.123  # different padded offsets
    trunc = (np.asarray(G.gaussian_log_pdf(jnp.asarray(-off_trunc), gb))
             - np.asarray(G.gaussian_log_pdf(jnp.asarray(off_trunc), ga)))
    np.testing.assert_allclose(full, trunc, rtol=1e-3, atol=1e-3)
