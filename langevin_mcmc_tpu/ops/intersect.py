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
    inv_div = 1.0 / vm.clamp_abs(divisor)
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
    """Return (intersect, occluded).

    Backend order: explicit BVH if attached; the chunk-walk kernel
    (ops/chunkwalk.py: per-ray-block dynamic chunk lists, the hot path on
    TPU) for static scenes; the VPU brute-force path for motion scenes;
    the XLA matmul sweep on CPU. LMCMC_ISECT_BACKEND overrides
    (chunkwalk|pallas|matmul|brute)."""
    import os
    backend = os.environ.get('LMCMC_ISECT_BACKEND', '')
    if scene.use_bvh and backend == '':
        from .bvh import intersect_bvh, occluded_bvh
        return (partial(intersect_bvh, scene), partial(occluded_bvh, scene))
    if backend == 'matmul':
        return (partial(intersect_matmul, scene),
                partial(occluded_matmul, scene))
    if backend == 'brute' or scene.has_motion:
        return (partial(intersect_bruteforce, scene),
                partial(occluded_bruteforce, scene))
    if backend == 'pallas':
        from .pallas_isect import intersect_pallas, occluded_pallas
        return (partial(intersect_pallas, scene),
                partial(occluded_pallas, scene))
    if backend == 'chunkwalk' or jax.default_backend() != 'cpu':
        from .chunkwalk import intersect_chunkwalk, occluded_chunkwalk
        return (partial(intersect_chunkwalk, scene),
                partial(occluded_chunkwalk, scene))
    return (partial(intersect_matmul, scene),
            partial(occluded_matmul, scene))


# ---------------------------------------------------------------------------
# packed per-triangle attribute table
#
# TPU XLA gathers move ~one element per cycle: the naive per-step fetches
# (vertices + normals + st + mat/light ids, 5-6 separate gathers of ~40
# scalars per lane) dominated the replay walk (~40 ms of a 44 ms replay at
# 16k lanes x depth 4). One contiguous [T, 32] row per triangle turns that
# into a single row gather.
# ---------------------------------------------------------------------------

_GEOM_CACHE = {}


def _build_tri_geom(scene):
    """[T, 32] f32: p0(0:3) e1(3:6) e2(6:9) n0..n2(9:18) st0..st2(18:24)
    mat(24) light(25); static scenes only (keyframe 0)."""
    import numpy as np
    tp = np.asarray(scene.tri_p)[0]          # [T, 3, 3]
    tn = np.asarray(scene.tri_n)[0]
    tst = np.asarray(scene.tri_st)
    T = tp.shape[0]
    g = np.zeros((T, 32), np.float32)
    g[:, 0:3] = tp[:, 0]
    g[:, 3:6] = tp[:, 1] - tp[:, 0]
    g[:, 6:9] = tp[:, 2] - tp[:, 0]
    g[:, 9:18] = tn.reshape(T, 9)
    g[:, 18:24] = tst.reshape(T, 6)
    g[:, 24] = np.asarray(scene.tri_mat).astype(np.float32)
    g[:, 25] = np.asarray(scene.tri_light).astype(np.float32)
    return g


def get_tri_geom(scene):
    key = (id(scene.tri_p), scene.num_tris)
    if key not in _GEOM_CACHE:
        if len(_GEOM_CACHE) > 4:
            _GEOM_CACHE.clear()
        _GEOM_CACHE[key] = _build_tri_geom(scene)
    return _GEOM_CACHE[key]


def gather_tri_row_raw(scene, tri_id):
    """One [..., 32] packed-row gather (see _build_tri_geom layout)."""
    return jnp.asarray(get_tri_geom(scene))[tri_id]


def row_dict_from_raw(row):
    """Unpack a raw [..., 32] row (gather_tri_row_raw or a bake slice)."""
    return dict(p0=row[..., 0:3], e1=row[..., 3:6], e2=row[..., 6:9],
                tn=row[..., 9:18].reshape(row.shape[:-1] + (3, 3)),
                tst=row[..., 18:24].reshape(row.shape[:-1] + (3, 2)),
                mat_id=row[..., 24].astype(jnp.int32),
                light_id=row[..., 25].astype(jnp.int32))


def gather_tri_row(scene, tri_id):
    """One row gather -> dict(p0, e1, e2, tn [...,3,3], tst [...,3,2],
    mat_id i32, light_id i32). Static scenes only."""
    return row_dict_from_raw(gather_tri_row_raw(scene, tri_id))


def hit_attrs_from_row(row, org, d, t, u, v):
    """compute_hit_geometry from a prefetched packed row."""
    geom_n = vm.normalize(vm.cross(row['e1'], row['e2']))
    w = 1.0 - u - v
    position = org + t[..., None] * d
    tn = row['tn']
    shading_n = vm.normalize(w[..., None] * tn[..., 0, :]
                             + u[..., None] * tn[..., 1, :]
                             + v[..., None] * tn[..., 2, :])
    flip = vm.dot(geom_n, shading_n) < 0.0
    geom_n = jnp.where(flip[..., None], -geom_n, geom_n)
    sts = row['tst']
    st = (w[..., None] * sts[..., 0, :] + u[..., None] * sts[..., 1, :]
          + v[..., None] * sts[..., 2, :])
    return position, shading_n, geom_n, st


def hit_attrs_full(scene, tri_id, org, d, t, u, v, time):
    """compute_hit_geometry + mat/light ids in one packed row gather.
    Returns (pos, shading_n, geom_n, st, mat_id, light_id)."""
    if not scene.has_motion:
        row = gather_tri_row(scene, tri_id)
        pos, sn, gn, st = hit_attrs_from_row(row, org, d, t, u, v)
        return pos, sn, gn, st, row['mat_id'], row['light_id']
    pos, sn, gn, st = compute_hit_geometry(scene, tri_id, org, d, t, u, v,
                                           time)
    return pos, sn, gn, st, scene.tri_mat[tri_id], scene.tri_light[tri_id]


def compute_hit_geometry(scene, tri_id, org, d, t, u, v, time):
    """Hit point attributes from a confirmed hit, matching reference
    TriangleIntersect (trianglemesh.cpp:58-79): position from ray equation,
    shading normal from barycentric vertex normals, geometric normal from
    cross(e1, e2) flipped to the shading-normal side, barycentric st.
    """
    if not scene.has_motion:
        return hit_attrs_from_row(gather_tri_row(scene, tri_id), org, d,
                                  t, u, v)
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
    # near-parallel rays (masked-out lanes and padding steps) otherwise
    # produce ~1e12-scale positions whose reverse-mode partials overflow
    # and poison every lane's gradient through the masking wheres
    t = jnp.clip(t, -1e6, 1e6)
    u = jnp.clip(u, -1e3, 1e3)
    v = jnp.clip(v, -1e3, 1e3)
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


def frozen_from_row(row, org, d):
    """intersect_frozen_triangle from a prefetched packed geometry row
    (see gather_tri_row); avoids the per-step multi-gather."""
    p0, e1, e2 = row['p0'], row['e1'], row['e2']
    t, u, v, _ = moller_trumbore(org, d, p0, e1, e2)
    t = jnp.clip(t, -1e6, 1e6)
    u = jnp.clip(u, -1e3, 1e3)
    v = jnp.clip(v, -1e3, 1e3)
    geom_n = vm.normalize(vm.cross(e1, e2))
    w = 1.0 - u - v
    position = org + t[..., None] * d
    tn = row['tn']
    shading_n = vm.normalize(w[..., None] * tn[..., 0, :]
                             + u[..., None] * tn[..., 1, :]
                             + v[..., None] * tn[..., 2, :])
    flip = jax.lax.stop_gradient(vm.dot(geom_n, shading_n) < 0.0)
    geom_n = jnp.where(flip[..., None], -geom_n, geom_n)
    sts = row['tst']
    st = (w[..., None] * sts[..., 0, :] + u[..., None] * sts[..., 1, :]
          + v[..., None] * sts[..., 2, :])
    return position, shading_n, geom_n, st, t


# ---------------------------------------------------------------------------
# MXU (matmul) intersection backend
# ---------------------------------------------------------------------------
#
# Woop-style reformulation: per triangle precompute A^-1 where
# A = [e1 | e2 | e1 x e2]; a ray (org, dir) maps to barycentric space with
# two [R,3] x [3,3T] matmuls:
#   O = (org) @ A^-T - A^-1 p0,  Q = dir @ A^-T
#   t = -O_w / Q_w,  u = O_u + t Q_u,  v = O_v + t Q_v
# This puts the whole wavefront x triangle sweep on the MXU (the reference's
# Embree BVH does ~100 scalar node tests per ray on CPU; on TPU the dense
# sweep at MXU rates wins until scenes get very large). Static geometry only
# (A^-1 does not interpolate); motion scenes use the VPU path.

def build_matmul_tables(tri_p0):
    """From [T,3,3] keyframe-0 vertices build (B [3,3T], C [3T], valid [T])."""
    import numpy as np
    p0 = np.asarray(tri_p0[:, 0, :], np.float64)
    e1 = np.asarray(tri_p0[:, 1, :], np.float64) - p0
    e2 = np.asarray(tri_p0[:, 2, :], np.float64) - p0
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)            # [T,3,3] columns
    det = np.linalg.det(A)
    ok = np.abs(det) > 1e-18
    A_safe = np.where(ok[:, None, None], A, np.eye(3))
    Ainv = np.linalg.inv(A_safe)                  # [T,3,3]
    T_ = p0.shape[0]
    # B[j, 3t+c] = Ainv[t, c, j] so that (p @ B)[3t+c] = (A^-1 p)_c
    B = np.transpose(Ainv, (2, 0, 1)).reshape(3, T_ * 3)     # [3, 3T]
    C = np.einsum('tij,tj->ti', Ainv, p0).reshape(T_ * 3)    # [3T]
    return (jnp.asarray(B, jnp.float32), jnp.asarray(C, jnp.float32),
            jnp.asarray(ok))


def intersect_matmul(scene, org, d, time, min_t, max_t, any_hit=False):
    """Closest-hit via chunked MXU sweeps. Signature as intersect_bruteforce."""
    B, C, ok_tri = scene.isect_B, scene.isect_C, scene.isect_ok
    T = scene.num_tris
    nchunk = -(-T // TRI_CHUNK)
    Tpad = nchunk * TRI_CHUNK
    if Tpad != T:
        B = jnp.pad(B, ((0, 0), (0, 3 * (Tpad - T))))
        C = jnp.pad(C, (0, 3 * (Tpad - T)))
        ok_tri = jnp.pad(ok_tri, (0, Tpad - T))
    B3 = B.reshape(3, Tpad, 3)
    C3 = C.reshape(Tpad, 3)

    def chunk_body(carry, ci):
        best_t, best_id = carry
        s = ci * TRI_CHUNK
        Bc = jax.lax.dynamic_slice_in_dim(B3, s, TRI_CHUNK, 1).reshape(3, -1)
        Cc = jax.lax.dynamic_slice_in_dim(C3, s, TRI_CHUNK, 0).reshape(-1)
        okc = jax.lax.dynamic_slice_in_dim(ok_tri, s, TRI_CHUNK, 0)
        O = (org @ Bc - Cc).reshape(org.shape[0], TRI_CHUNK, 3)
        Q = (d @ Bc).reshape(org.shape[0], TRI_CHUNK, 3)
        qw = Q[..., 2]
        t = -O[..., 2] / jnp.where(qw == 0.0, 1e-12, qw)
        u = O[..., 0] + t * Q[..., 0]
        v = O[..., 1] + t * Q[..., 1]
        hit_ok = ((qw != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= min_t[:, None]) & (t <= max_t[:, None])
                  & okc[None, :] & ((s + jnp.arange(TRI_CHUNK)) < T)[None, :])
        t = jnp.where(hit_ok, t, jnp.inf)
        amin = jnp.argmin(t, axis=1)
        rows = jnp.arange(t.shape[0])
        ct = t[rows, amin]
        cid = (s + amin).astype(jnp.int32)
        better = ct < best_t
        return (jnp.where(better, ct, best_t),
                jnp.where(better, cid, best_id)), None

    R = org.shape[0]
    init = (jnp.full((R,), jnp.inf), jnp.zeros((R,), jnp.int32))
    (t, tid), _ = jax.lax.scan(chunk_body, init, jnp.arange(nchunk))
    hit = jnp.isfinite(t)
    # recompute u,v for the winning triangle (cheap, keeps scan carry small)
    tp = scene.tri_p[0][tid]
    t_safe = jnp.where(hit, t, 0.0)
    _, u, v, _ = moller_trumbore(org, d, tp[:, 0],
                                 tp[:, 1] - tp[:, 0], tp[:, 2] - tp[:, 0])
    return hit, tid, t_safe, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)


def occluded_matmul(scene, org, d, time, min_t, max_t):
    hit, _, _, _, _ = intersect_matmul(scene, org, d, time, min_t, max_t,
                                       any_hit=True)
    return hit
