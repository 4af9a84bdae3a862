import numpy as np
import jax
import jax.numpy as jnp

from langevin_mcmc_tpu.ops import bsdf
from langevin_mcmc_tpu.scene.scenedata import (BSDF_LAMBERTIAN, BSDF_PHONG,
                                               BSDF_ROUGH_DIELECTRIC)
from langevin_mcmc_tpu.utils import vecmath as vm


def make_mp(n, mat_type, **kw):
    d = dict(
        mat_type=jnp.full((n,), mat_type, jnp.int32),
        twosided=jnp.zeros((n,), bool),
        kd=jnp.tile(jnp.asarray([[0.6, 0.4, 0.2]]), (n, 1)),
        ks=jnp.tile(jnp.asarray([[0.3, 0.3, 0.3]]), (n, 1)),
        exponent=jnp.full((n,), 50.0),
        ks_weight=jnp.full((n,), 0.35),
        eta=jnp.full((n,), 1.5),
        inv_eta=jnp.full((n,), 1.0 / 1.5),
        alpha=jnp.full((n,), 0.1),
    )
    for k, v in kw.items():
        d[k] = v
    return bsdf.MatParams(**d)


def _rand_dirs(n, seed, up=True):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    if up:
        d[:, 2] = np.abs(d[:, 2]) + 0.05
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(d.astype(np.float32))


NORMAL = jnp.asarray([0.0, 0.0, 1.0])


def test_lambertian_white_furnace():
    n = 200_000
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((n, 2), np.float32))
    mp = make_mp(n, BSDF_LAMBERTIAN)
    wi = jnp.tile(jnp.asarray([[0.3, 0.1, 0.95]]) / np.linalg.norm([0.3, 0.1, 0.95]), (n, 1))
    normal = jnp.tile(NORMAL[None], (n, 1))
    wo, contrib, cos_wo, pdf, rev_pdf, valid = bsdf.sample(
        mp, wi, normal, u, jnp.zeros(n))
    c = np.asarray(contrib)
    v = np.asarray(valid)
    # E[f/pdf * cos] = albedo for cosine-sampled lambertian
    est = (c * v[:, None]).mean(0)
    assert np.allclose(est, [0.6, 0.4, 0.2], atol=0.01)


def test_sample_eval_consistency_phong():
    n = 4096
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random((n, 2), np.float32))
    mp = make_mp(n, BSDF_PHONG)
    wi = _rand_dirs(n, 2)
    normal = jnp.tile(NORMAL[None], (n, 1))
    wo, contrib_s, cos_wo_s, pdf_s, rev_s, valid = bsdf.sample(
        mp, wi, normal, u, jnp.zeros(n))
    contrib_e, cos_wo_e, pdf_e, rev_e = bsdf.evaluate(mp, wi, normal, wo)
    v = np.asarray(valid)
    # sample contrib = eval contrib / pdf
    lhs = np.asarray(contrib_s)[v] * np.asarray(pdf_s)[v][:, None]
    rhs = np.asarray(contrib_e)[v]
    assert np.allclose(lhs, rhs, rtol=2e-2, atol=1e-4)
    assert np.allclose(np.asarray(pdf_s)[v], np.asarray(pdf_e)[v], rtol=2e-2, atol=1e-5)
    assert np.allclose(np.asarray(rev_s)[v], np.asarray(rev_e)[v], rtol=2e-2, atol=1e-5)


def test_sample_eval_consistency_roughdielectric():
    n = 4096
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random((n, 2), np.float32))
    ud = jnp.asarray(rng.random((n,), np.float32))
    mp = make_mp(n, BSDF_ROUGH_DIELECTRIC,
                 kd=jnp.ones((n, 3)), ks=jnp.ones((n, 3)))
    wi = _rand_dirs(n, 4, up=False)
    normal = jnp.tile(NORMAL[None], (n, 1))
    wo, contrib_s, cos_wo_s, pdf_s, rev_s, valid = bsdf.sample(
        mp, wi, normal, u, ud)
    contrib_e, cos_wo_e, pdf_e, rev_e = bsdf.evaluate(mp, wi, normal, wo)
    v = np.asarray(valid)
    lhs = np.asarray(contrib_s)[v] * np.asarray(pdf_s)[v][:, None]
    rhs = np.asarray(contrib_e)[v]
    keep = np.abs(rhs).max(1) > 1e-7
    assert v.mean() > 0.5
    assert np.allclose(lhs[keep], rhs[keep], rtol=5e-2, atol=1e-3)
    assert np.allclose(np.asarray(pdf_s)[v], np.asarray(pdf_e)[v], rtol=5e-2, atol=1e-4)


def test_phong_pdf_integrates_to_one():
    # MC over uniform sphere: E[pdf / (1/4pi)] ~= 1 (pdf of sampled lobe)
    n = 400_000
    rng = np.random.default_rng(5)
    sph = rng.normal(size=(n, 3))
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    wo = jnp.asarray(sph.astype(np.float32))
    mp = make_mp(n, BSDF_PHONG)
    wi = jnp.tile(jnp.asarray([[0.2, -0.3, 0.93]]) / np.linalg.norm([0.2, -0.3, 0.93]), (n, 1))
    normal = jnp.tile(NORMAL[None], (n, 1))
    _, _, pdf, _ = bsdf.evaluate(mp, wi, normal, wo)
    est = np.asarray(pdf).mean() * 4.0 * np.pi
    assert abs(est - 1.0) < 0.02


def test_fresnel_total_internal_reflection():
    f, cos_t = bsdf.fresnel_dielectric_ext(jnp.asarray(-0.1), 1.5, 1.0 / 1.5)
    assert float(f) == 1.0 and float(cos_t) == 0.0
    f2, cos_t2 = bsdf.fresnel_dielectric_ext(jnp.asarray(1.0), 1.5, 1.0 / 1.5)
    # normal incidence: ((n-1)/(n+1))^2 = 0.04
    assert abs(float(f2) - 0.04) < 1e-3
    assert float(cos_t2) < 0  # entering

def test_bsdf_differentiable():
    mp = make_mp(1, BSDF_ROUGH_DIELECTRIC)
    wi = jnp.asarray([[0.3, 0.2, 0.93]])
    wi = wi / jnp.linalg.norm(wi)
    normal = jnp.asarray([[0.0, 0.0, 1.0]])

    def f(u):
        wo, contrib, *_ = bsdf.sample(mp, wi, normal, u[None], jnp.asarray([0.9]))
        return jnp.sum(contrib)

    g = jax.grad(f)(jnp.asarray([0.4, 0.6]))
    assert np.isfinite(np.asarray(g)).all()
