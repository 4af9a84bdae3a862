import numpy as np
import jax
import jax.numpy as jnp

from langevin_mcmc_tpu.ops import intersect as isect
from langevin_mcmc_tpu.ops import bvh as bvh_mod
from langevin_mcmc_tpu.scene.camera import sample_primary


def _random_rays(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    sp = rng.random((n, 2)).astype(np.float32)
    time = np.zeros(n, np.float32)
    org, d, mn, mx = sample_primary(scene.camera, jnp.asarray(sp), jnp.asarray(time))
    return org, d, jnp.asarray(time), mn, mx


def test_primary_rays_hit_torus(torus_scene):
    scene, _, _ = torus_scene
    org, d, time, mn, mx = _random_rays(scene, 64)
    hit, tid, t, u, v = isect.intersect_bruteforce(scene, org, d, time, mn, mx)
    hit = np.asarray(hit)
    # camera looks at the scene; most primary rays should hit something
    assert hit.mean() > 0.5
    pos, sn, gn, st = isect.compute_hit_geometry(
        scene, tid, org, d, t, u, v, time)
    assert np.isfinite(np.asarray(pos)[hit]).all()
    nlen = np.linalg.norm(np.asarray(sn)[hit], axis=-1)
    assert np.allclose(nlen, 1.0, atol=1e-3)


def test_bvh_matches_bruteforce(torus_scene):
    scene, _, _ = torus_scene
    scene_bvh = bvh_mod.attach_bvh(scene)
    org, d, time, mn, mx = _random_rays(scene, 256, seed=3)
    hit_b, tid_b, t_b, u_b, v_b = isect.intersect_bruteforce(
        scene, org, d, time, mn, mx)
    hit_v, tid_v, t_v, u_v, v_v = bvh_mod.intersect_bvh(
        scene_bvh, org, d, time, mn, mx)
    hit_b, hit_v = np.asarray(hit_b), np.asarray(hit_v)
    assert (hit_b == hit_v).all()
    # same hit distance (triangle ids can differ on shared edges)
    assert np.allclose(np.asarray(t_b)[hit_b], np.asarray(t_v)[hit_b],
                       rtol=1e-4, atol=1e-4)


def test_bvh_occlusion(torus_scene):
    scene, _, _ = torus_scene
    scene_bvh = bvh_mod.attach_bvh(scene)
    org, d, time, mn, mx = _random_rays(scene, 128, seed=7)
    occ_brute = np.asarray(isect.occluded_bruteforce(scene, org, d, time, mn, mx))
    occ_bvh = np.asarray(bvh_mod.occluded_bvh(scene_bvh, org, d, time, mn, mx))
    assert (occ_brute == occ_bvh).all()


def test_frozen_replay_matches_trace(torus_scene):
    scene, _, _ = torus_scene
    org, d, time, mn, mx = _random_rays(scene, 64, seed=5)
    hit, tid, t, u, v = isect.intersect_bruteforce(scene, org, d, time, mn, mx)
    pos, sn, gn, st = isect.compute_hit_geometry(scene, tid, org, d, t, u, v, time)
    tp = isect.tri_vertices_at_time(scene, tid, time)
    tn = isect.tri_normals_at_time(scene, tid, time)
    tst = scene.tri_st[tid]
    pos2, sn2, gn2, st2, t2 = isect.intersect_frozen_triangle(tp, tn, tst, org, d)
    h = np.asarray(hit)
    assert np.allclose(np.asarray(pos)[h], np.asarray(pos2)[h], atol=1e-3)
    assert np.allclose(np.asarray(sn)[h], np.asarray(sn2)[h], atol=1e-3)
    assert np.allclose(np.asarray(st)[h], np.asarray(st2)[h], atol=1e-3)


def test_frozen_replay_differentiable(torus_scene):
    scene, _, _ = torus_scene
    org, d, time, mn, mx = _random_rays(scene, 8, seed=11)
    hit, tid, t, u, v = isect.intersect_bruteforce(scene, org, d, time, mn, mx)
    tp = isect.tri_vertices_at_time(scene, tid, time)
    tn = isect.tri_normals_at_time(scene, tid, time)
    tst = scene.tri_st[tid]

    def f(o):
        pos, _, _, _, _ = isect.intersect_frozen_triangle(tp[0], tn[0], tst[0], o, d[0])
        return jnp.sum(pos)

    g = jax.grad(f)(org[0])
    assert np.isfinite(np.asarray(g)).all()
