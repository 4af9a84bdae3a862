"""Ray/triangle intersection and occlusion over the whole scene.

Replaces Embree's rtcIntersect1/rtcOccluded1 single-ray queries (reference
src/scene.cpp:106-149) with wavefront queries: a whole batch of rays is
tested at once. Two backends:

  * brute force — lax.scan over triangle chunks with a running closest-hit
    reduction; exact, used as the test oracle and for tiny scenes.
  * BVH — flattened-node traversal (ops/bvh.py), used by default.

The Möller–Trumbore math matches reference src/trianglemesh.cpp:30-56; the
*frozen-triangle* replay variant below matches the relaxed in-plane check of
Shape::Intersect used during path replay (trianglemesh.cpp:50 checks only
v >= 0 and u+v <= 1, tolerating drift for the known hit triangle) and the
symbolic IntersectTriangleMesh (trianglemesh.cpp:81-105) which has no checks
at all.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import vecmath as vm

TRI_CHUNK = 1024


def tri_vertices_at_time(scene, tri_idx, time):
    """Gather triangle vertices [..., 3, 3] interpolated at shutter time."""
    p = scene.tri_p
    if scene.has_motion:
        p0 = p[0, tri_idx]
        p1 = p[1, tri_idx]
        return vm.lerp(time[..., None, None], p0, p1)
    return p[0, tri_idx]


def tri_normals_at_time(scene, tri_idx, time):
    n = scene.tri_n
    if scene.has_motion:
        return vm.lerp(time[..., None, None], n[0, tri_idx], n[1, tri_idx])
    return n[0, tri_idx]


def moller_trumbore(org, d, p0, e1, e2):
    """Batched ray-triangle test. Returns (t, u, v, divisor)."""
    s1 = vm.cross(d, e2)
    divisor = vm.dot(s1, e1)
    inv_div = 1.0 / jnp.where(divisor == 0.0, 1.0, divisor)
    s = org - p0
    u = vm.dot(s, s1) * inv_div
    s2 = vm.cross(s, e1)
    v = vm.dot(d, s2) * inv_div
    t = vm.dot(e2, s2) * inv_div
    return t, u, v, divisor


def intersect_bruteforce(scene, org, d, time, min_t, max_t):
    """Closest hit over all triangles.

    org/d: [R,3]; time,min_t,max_t: [R]. Returns (hit, tri_id, t, u, v).
    Scans triangle chunks to bound the [R, C] working set in VMEM/HBM.
    """
    T = scene.num_tris
    nchunk = -(-T // TRI_CHUNK)

    def chunk_body(carry, ci):
        best_t, best_id, best_u, best_v = carry
        start = ci * TRI_CHUNK
        idx = start + jnp.arange(TRI_CHUNK)
        valid_tri = idx < T
        idxc = jnp.minimum(idx, T - 1)
        if scene.has_motion:
            tp = vm.lerp(time[:, None, None, None],
                         scene.tri_p[0][idxc][None], scene.tri_p[1][idxc][None])
            p0 = tp[..., 0, :]
            e1 = tp[..., 1, :] - p0
            e2 = tp[..., 2, :] - p0
        else:
            tp = scene.tri_p[0][idxc]          # [C,3,3]
            p0 = tp[None, :, 0, :]
            e1 = (tp[:, 1, :] - tp[:, 0, :])[None]
            e2 = (tp[:, 2, :] - tp[:, 0, :])[None]
        t, u, v, divisor = moller_trumbore(org[:, None, :], d[:, None, :],
                                           p0, e1, e2)
        ok = ((divisor != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= min_t[:, None]) & (t <= max_t[:, None])
              & valid_tri[None, :])
        t = jnp.where(ok, t, jnp.inf)
        amin = jnp.argmin(t, axis=1)
        rows = jnp.arange(t.shape[0])
        ct, cu, cv = t[rows, amin], u[rows, amin], v[rows, amin]
        cid = idxc[amin]
        better = ct < best_t
        return (jnp.where(better, ct, best_t),
                jnp.where(better, cid, best_id),
                jnp.where(better, cu, best_u),
                jnp.where(better, cv, best_v)), None

    R = org.shape[0]
    init = (jnp.full((R,), jnp.inf), jnp.zeros((R,), jnp.int32),
            jnp.zeros((R,)), jnp.zeros((R,)))
    (t, tid, u, v), _ = jax.lax.scan(chunk_body, init, jnp.arange(nchunk))
    hit = jnp.isfinite(t)
    return hit, tid, jnp.where(hit, t, 0.0), u, v


def occluded_bruteforce(scene, org, d, time, min_t, max_t):
    """Any-hit query; returns bool [R]."""
    hit, _, _, _, _ = intersect_bruteforce(scene, org, d, time, min_t, max_t)
    return hit


def make_intersect_fns(scene):
    """Return (intersect, occluded) using the BVH when attached."""
    if scene.use_bvh:
        from .bvh import intersect_bvh, occluded_bvh
        return (partial(intersect_bvh, scene), partial(occluded_bvh, scene))
    return (partial(intersect_bruteforce, scene),
            partial(occluded_bruteforce, scene))


def compute_hit_geometry(scene, tri_id, org, d, t, u, v, time):
    """Hit point attributes from a confirmed hit, matching reference
    TriangleIntersect (trianglemesh.cpp:58-79): position from ray equation,
    shading normal from barycentric vertex normals, geometric normal from
    cross(e1, e2) flipped to the shading-normal side, barycentric st.
    """
    tp = tri_vertices_at_time(scene, tri_id, time)
    tn = tri_normals_at_time(scene, tri_id, time)
    e1 = tp[..., 1, :] - tp[..., 0, :]
    e2 = tp[..., 2, :] - tp[..., 0, :]
    geom_n = vm.normalize(vm.cross(e1, e2))
    w = 1.0 - u - v
    position = org + t[..., None] * d
    shading_n = vm.normalize(w[..., None] * tn[..., 0, :]
                             + u[..., None] * tn[..., 1, :]
                             + v[..., None] * tn[..., 2, :])
    flip = vm.dot(geom_n, shading_n) < 0.0
    geom_n = jnp.where(flip[..., None], -geom_n, geom_n)
    sts = scene.tri_st[tri_id]
    st = (w[..., None] * sts[..., 0, :] + u[..., None] * sts[..., 1, :]
          + v[..., None] * sts[..., 2, :])
    return position, shading_n, geom_n, st


def intersect_frozen_triangle(tp, tn, tst, org, d):
    """Differentiable replay intersection against a known (frozen) triangle.

    Mirrors the reference's symbolic IntersectTriangleMesh
    (trianglemesh.cpp:81-105): ray/plane solve with NO validity checks —
    topology is frozen, only derivatives flow. tp/tn [..., 3, 3], tst [...,3,2].
    Returns (position, shading_n, geom_n, st, t).
    """
    p0 = tp[..., 0, :]
    e1 = tp[..., 1, :] - p0
    e2 = tp[..., 2, :] - p0
    t, u, v, _ = moller_trumbore(org, d, p0, e1, e2)
    geom_n = vm.normalize(vm.cross(e1, e2))
    w = 1.0 - u - v
    position = org + t[..., None] * d
    shading_n = vm.normalize(w[..., None] * tn[..., 0, :]
                             + u[..., None] * tn[..., 1, :]
                             + v[..., None] * tn[..., 2, :])
    # geomNormal sign fix is non-differentiable; use stop_gradient on the flip
    flip = jax.lax.stop_gradient(vm.dot(geom_n, shading_n) < 0.0)
    geom_n = jnp.where(flip[..., None], -geom_n, geom_n)
    st = (w[..., None] * tst[..., 0, :] + u[..., None] * tst[..., 1, :]
          + v[..., None] * tst[..., 2, :])
    return position, shading_n, geom_n, st, t
