import numpy as np
import jax.numpy as jnp

from langevin_mcmc_tpu.ops import lights
from langevin_mcmc_tpu.utils import vecmath as vm


def test_env_sample_pdf_consistency(torus_scene):
    """env_emission pdf at a sampled direction should match the sampling pdf."""
    scene, _, _ = torus_scene
    rng = np.random.default_rng(0)
    n = 512
    rnd = jnp.asarray(rng.random((n, 2), np.float32))
    time = jnp.zeros(n)
    lprim, d, value, pdf = lights.env_sample_direction(scene, rnd, time)
    lprim2, em, dpdf, epdf = lights.env_emission(scene, d, time)
    pdf, dpdf = np.asarray(pdf), np.asarray(dpdf)
    em, value = np.asarray(em), np.asarray(value)
    # same pixel neighbourhood -> nearly identical value & pdf
    ratio = pdf / np.maximum(dpdf, 1e-12)
    assert np.median(np.abs(ratio - 1.0)) < 0.05
    vr = vm.luminance(jnp.asarray(em)) / np.maximum(
        np.asarray(vm.luminance(jnp.asarray(value))), 1e-12)
    assert np.median(np.abs(np.asarray(vr) - 1.0)) < 0.05


def test_env_sampling_importance(torus_scene):
    """MC integral of luminance/pdf over sampled dirs == total power integral.

    Uses a smooth synthetic envmap: with the reference's tent-filter scheme
    (envlight.cpp:148-169) value and pdf can both go negative next to
    high-contrast texels (sun edges), where the estimator is only consistent
    as a matched value/pdf pair, not per-sample."""
    import dataclasses
    from langevin_mcmc_tpu.scene.scenedata import (
        build_env_sample_info, _env_neighborhoods, _env_rw_pairs)
    scene, _, _ = torus_scene
    h, w = 64, 128
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    img = (1.0 + np.sin(xx / w * 2 * np.pi) * 0.5
           + yy / h)[..., None].repeat(3, -1).astype(np.float32)
    cdf_rows, cdf_cols, row_w, norm, pix = build_env_sample_info(img)
    scene = dataclasses.replace(
        scene, env_image=jnp.asarray(img),
        env_neigh=jnp.asarray(_env_neighborhoods(img)),
        env_rw2=jnp.asarray(_env_rw_pairs(row_w)),
        env_cdf_rows=jnp.asarray(cdf_rows),
        env_cdf_cols=jnp.asarray(cdf_cols), env_row_weights=jnp.asarray(row_w),
        env_normalization=jnp.asarray(norm), env_pixel_size=jnp.asarray(pix))
    rng = np.random.default_rng(1)
    n = 200_000
    rnd = jnp.asarray(rng.random((n, 2), np.float32))
    time = jnp.zeros(n)
    _, d, value, pdf = lights.env_sample_direction(scene, rnd, time)
    lum = np.asarray(vm.luminance(value))
    est = (lum / np.asarray(pdf)).mean()
    lum_img = 0.212671 * img[..., 0] + 0.715160 * img[..., 1] + 0.072169 * img[..., 2]
    sin_t = np.sin((np.arange(h) + 0.5) * np.pi / h)
    integral = (lum_img * sin_t[:, None]).sum() * (2 * np.pi / w) * (np.pi / h)
    assert abs(est / integral - 1.0) < 0.05


def test_pick_light(torus_scene):
    scene, _, _ = torus_scene
    u = jnp.asarray(np.linspace(0.01, 0.99, 64, dtype=np.float32))
    lid, prob = lights.pick_light(scene, u)
    assert (np.asarray(lid) == 0).all()
    assert np.allclose(np.asarray(prob), 1.0)


def test_area_light_veachdoor():
    from langevin_mcmc_tpu.scene.parse import parse_scene
    scene, _, _ = parse_scene('/root/reference/scenes/veachdoor/lmc.xml')
    area_ids = np.where(np.asarray(scene.light_type) == 1)[0]
    assert len(area_ids) > 0
    lid = int(area_ids[0])
    rng = np.random.default_rng(2)
    n = 1024
    light_id = jnp.full((n,), lid, jnp.int32)
    u_disc = jnp.asarray(rng.random(n, np.float32))
    tri = lights.sample_discrete(scene, light_id, u_disc)
    rnd = jnp.asarray(rng.random((n, 2), np.float32))
    pos = jnp.tile(jnp.asarray(np.asarray(scene.bsphere_center))[None], (n, 1))
    out = lights.sample_direct(scene, light_id, tri, rnd, pos, jnp.zeros(n))
    # sampled points should lie on the light mesh triangles
    tid = np.asarray(tri)
    assert (np.asarray(scene.tri_light)[tid] == lid).all()
    assert np.isfinite(np.asarray(out['dist'])).all()
