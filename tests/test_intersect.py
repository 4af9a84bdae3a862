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


def test_matmul_backend_matches_bruteforce(torus_scene):
    """The MXU Woop-frame backend must agree with Moller-Trumbore
    (regression: a transposed frame layout once passed every *consistency*
    test because gen and replay shared the same wrong hits)."""
    scene, _, _ = torus_scene
    org, d, time, mn, mx = _random_rays(scene, 512, seed=9)
    hb, tb, ttb, _, _ = isect.intersect_bruteforce(scene, org, d, time, mn, mx)
    hm, tm, ttm, _, _ = isect.intersect_matmul(scene, org, d, time, mn, mx)
    hb, hm = np.asarray(hb), np.asarray(hm)
    assert (hb == hm).mean() > 0.999
    both = hb & hm
    assert (np.asarray(tb)[both] == np.asarray(tm)[both]).mean() > 0.995
    np.testing.assert_allclose(np.asarray(ttb)[both], np.asarray(ttm)[both],
                               rtol=1e-3, atol=1e-3)


def test_native_woop_matches_python(torus_scene):
    from langevin_mcmc_tpu.native import woop_tables_native
    from langevin_mcmc_tpu.ops.intersect import build_matmul_tables
    scene, _, _ = torus_scene
    tri = np.asarray(scene.tri_p[0])[:2000]
    out = woop_tables_native(tri)
    if out is None:
        import pytest
        pytest.skip('native lib unavailable')
    B2, C2, ok2 = build_matmul_tables(tri)
    np.testing.assert_allclose(out[0], np.asarray(B2), atol=1e-5)
    np.testing.assert_allclose(out[1], np.asarray(C2), atol=1e-5)


def test_native_bvh_matches_layout(torus_scene):
    from langevin_mcmc_tpu.native import build_bvh_native
    scene, _, _ = torus_scene
    tri = np.asarray(scene.tri_p)
    lo = tri.min(axis=(0, 2))
    hi = tri.max(axis=(0, 2))
    out = build_bvh_native(lo, hi)
    if out is None:
        import pytest
        pytest.skip('native lib unavailable')
    nodes, prims = out
    import dataclasses
    import jax.numpy as jnp
    scene_n = dataclasses.replace(scene, bvh_nodes=jnp.asarray(nodes),
                                  bvh_prim_ids=jnp.asarray(prims),
                                  use_bvh=True)
    org, d, time, mn, mx = _random_rays(scene, 128, seed=13)
    hb, tb, ttb, _, _ = isect.intersect_bruteforce(scene, org, d, time, mn, mx)
    hv, tv, ttv, _, _ = bvh_mod.intersect_bvh(scene_n, org, d, time, mn, mx)
    hb, hv = np.asarray(hb), np.asarray(hv)
    assert (hb == hv).all()
    np.testing.assert_allclose(np.asarray(ttb)[hb], np.asarray(ttv)[hb],
                               rtol=1e-4, atol=1e-4)


def test_pallas_backend_matches_bruteforce(torus_scene):
    """Pallas VMEM-sweep kernel (interpret mode on CPU) vs the oracle."""
    from langevin_mcmc_tpu.ops.pallas_isect import (intersect_pallas,
                                                    occluded_pallas)
    scene, _, _ = torus_scene
    org, d, time, mn, mx = _random_rays(scene, 300, seed=21)
    hb, tb, ttb, _, _ = isect.intersect_bruteforce(scene, org, d, time, mn, mx)
    hp, tp, ttp, _, _ = intersect_pallas(scene, org, d, time, mn, mx)
    hb, hp = np.asarray(hb), np.asarray(hp)
    assert (hb == hp).all()
    both = hb & hp
    assert (np.asarray(tb)[both] == np.asarray(tp)[both]).mean() > 0.995
    occ = np.asarray(occluded_pallas(scene, org, d, time, mn, mx))
    assert (occ == hb).all()


def test_chunkwalk_resident_matches_bruteforce(torus_scene, monkeypatch):
    """VMEM-resident chunk-walk variant (interpret mode on CPU) vs the
    oracle — the DMA variant's manual async copies cannot interpret, so
    this is the chunk-walk logic's only CPU-side parity check (same tile
    test, same block chunk lists; only the chunk fetch differs)."""
    from langevin_mcmc_tpu.ops import chunkwalk as cw
    monkeypatch.setattr(cw, 'VMEM_RESIDENT_BYTES', 6 * 1024 * 1024)
    scene, _, _ = torus_scene
    rng = np.random.default_rng(17)
    n = 600
    tp = np.asarray(scene.tri_p)[0]
    tri = rng.integers(0, tp.shape[0], n)
    b1, b2 = rng.uniform(0, 1, n), rng.uniform(0, 1, n)
    fl = b1 + b2 > 1
    b1, b2 = np.where(fl, 1 - b1, b1), np.where(fl, 1 - b2, b2)
    p = tp[tri]
    org = (p[:, 0] * (1 - b1 - b2)[:, None] + p[:, 1] * b1[:, None]
           + p[:, 2] * b2[:, None]).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    alive = rng.uniform(0, 1, n) < 0.7   # dead rays exercise the sort
    mn = jnp.full(n, 1e-4)
    mx = jnp.asarray(np.where(alive, np.inf, 0.0).astype(np.float32))
    tz = jnp.zeros(n)
    org, d = jnp.asarray(org), jnp.asarray(d)

    hb, tb, ttb, _, _ = isect.intersect_bruteforce(scene, org, d, tz, mn, mx)
    hc, tc, ttc, _, _ = cw.intersect_chunkwalk(scene, org, d, tz, mn, mx)
    hb, hc = np.asarray(hb), np.asarray(hc)
    assert (hb == hc).all()
    both = hb & hc
    same_tri = np.asarray(tb) == np.asarray(tc)
    assert same_tri[both].mean() > 0.995
    sel = both & same_tri
    np.testing.assert_allclose(np.asarray(ttb)[sel], np.asarray(ttc)[sel],
                               rtol=2e-4, atol=2e-4)
    occ = np.asarray(cw.occluded_chunkwalk(scene, org, d, tz, mn, mx))
    assert (occ == hb).all()
