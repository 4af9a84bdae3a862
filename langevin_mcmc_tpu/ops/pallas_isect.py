"""Pallas TPU kernels: wavefront ray-triangle intersection.

The XLA dense sweep (ops/intersect.py intersect_matmul) is HBM-bound: every
triangle chunk materializes [R, CHUNK] intermediates (t, u, v, masks) in
HBM, ~10 passes over ~100 MB per query. These kernels keep the whole
per-(ray-block, tri-chunk) tile in VMEM and reduce the closest hit in
registers, so HBM traffic drops to the ray/hit vectors plus one stream of
the (tiny) triangle tables per ray-block — the speed-of-light pattern for
this op on TPU.

Two variants share one kernel body:

  * plain sweep — every ray block tests every triangle chunk;
  * two-level culled sweep (default) — triangles are Morton-ordered so each
    TRI_CHUNK is spatially tight, rays are sorted by (origin Morton cell,
    direction octant) so each RAY_BLOCK is coherent, and a per-(ray-block,
    tri-chunk) slab-test mask (computed vectorized in XLA) lets the kernel
    skip whole chunks via scalar-prefetch + pl.when. This replaces pointer-
    chasing BVH traversal, which is gather-bound on TPU; Embree parity
    (reference src/scene.cpp:106-149) comes from culling work instead of
    per-ray trees.

Grid: (ray_blocks, tri_chunks), triangle chunks innermost; the output block
maps to the ray block for every chunk step, acting as the running-min
accumulator (initialized at chunk 0).

Triangle data comes from the same Woop inverse-frame tables as the matmul
backend, pre-split into row vectors so the kernel is pure VPU broadcast
FMA:
    O_c[r, t] = org_x[r] Bx_c[t] + org_y[r] By_c[t] + org_z[r] Bz_c[t] - C_c[t]
    (c = u, v, w rows), same for the direction; then
    t = -O_w / Q_w, u = O_u + t Q_u, v = O_v + t Q_v.

The any-hit (occlusion) variant early-outs whole tri chunks once every ray
in the block found a hit.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 256
TRI_CHUNK = 512
BIG = 3.0e38


def _morton3(x, y, z, bits=10):
    """Interleave three `bits`-bit integers (numpy, host-side)."""
    out = np.zeros_like(x, dtype=np.int64)
    for b in range(bits):
        out |= ((x >> b) & 1) << (3 * b + 2)
        out |= ((y >> b) & 1) << (3 * b + 1)
        out |= ((z >> b) & 1) << (3 * b)
    return out


def _prep_tables(scene):
    """Morton-order the triangles, split the [3, 3T] Woop table into 9 row
    vectors + C rows padded to a TRI_CHUNK multiple, and compute per-chunk
    AABBs for the two-level culling.

    Returns (rows [9, Tp], c_rows [3, Tp], ok [Tp] f32, ids [Tp] i32,
    chunk_lo [K, 3], chunk_hi [K, 3], T, Tp)."""
    B = np.asarray(scene.isect_B)      # [3, 3T]
    C = np.asarray(scene.isect_C)      # [3T]
    ok = np.asarray(scene.isect_ok)
    # convert BEFORE slicing: under a jit trace, ops on captured jnp arrays
    # produce tracers that np.asarray cannot consume
    tp = np.asarray(scene.tri_p)[0]    # [T, 3, 3] keyframe-0 vertices
    T = ok.shape[0]

    # Morton order by centroid so chunks are spatially tight
    cen = tp.mean(1)
    lo = cen.min(0)
    span = np.maximum(cen.max(0) - lo, 1e-12)
    q = np.clip(((cen - lo) / span * 1023).astype(np.int64), 0, 1023)
    order = np.argsort(_morton3(q[:, 0], q[:, 1], q[:, 2]), kind='stable')

    Tp = -(-T // TRI_CHUNK) * TRI_CHUNK
    rows = np.zeros((9, Tp), np.float32)
    c_rows = np.zeros((3, Tp), np.float32)
    okp = np.zeros(Tp, np.float32)
    ids = np.zeros(Tp, np.int32)
    # B[j, 3t+c] = Ainv[t, c, j]
    for c in range(3):
        for j in range(3):
            rows[3 * c + j, :T] = B[j, c::3][order]
        c_rows[c, :T] = C[c::3][order]
    okp[:T] = ok[order].astype(np.float32)
    ids[:T] = order.astype(np.int32)

    # per-chunk AABBs over the Morton-ordered triangles (padded slots get
    # an empty box so they never pass the slab test)
    K = Tp // TRI_CHUNK
    vs = tp[order].reshape(T, 9)
    lo3 = np.minimum(np.minimum(vs[:, 0:3], vs[:, 3:6]), vs[:, 6:9])
    hi3 = np.maximum(np.maximum(vs[:, 0:3], vs[:, 3:6]), vs[:, 6:9])
    chunk_lo = np.full((K, 3), np.inf, np.float32)
    chunk_hi = np.full((K, 3), -np.inf, np.float32)
    for k in range(K):
        s, e = k * TRI_CHUNK, min((k + 1) * TRI_CHUNK, T)
        if s < T:
            chunk_lo[k] = lo3[s:e].min(0)
            chunk_hi[k] = hi3[s:e].max(0)
    pad = 1e-4 * np.maximum(chunk_hi - chunk_lo, 1e-6)
    chunk_lo = chunk_lo - pad
    chunk_hi = chunk_hi + pad
    # cache NUMPY buffers: jnp constants created inside one jit trace must
    # not be reused in another (UnexpectedTracerError)
    return rows, c_rows, okp, ids, chunk_lo, chunk_hi, T, Tp


_TABLE_CACHE = {}


def get_tables(scene):
    key = (id(scene.isect_B), scene.num_tris)
    if key not in _TABLE_CACHE:
        if len(_TABLE_CACHE) > 4:
            _TABLE_CACHE.clear()
        _TABLE_CACHE[key] = _prep_tables(scene)
    return _TABLE_CACHE[key]


def _isect_kernel(mask_ref, org_ref, dir_ref, rng_ref, rows_ref, c_ref,
                  ok_ref, ids_ref, best_ref, any_hit: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:, 0] = jnp.full((RAY_BLOCK,), BIG)
        best_ref[:, 1] = jnp.full((RAY_BLOCK,), -1.0)
        best_ref[:, 2] = jnp.zeros((RAY_BLOCK,))
        best_ref[:, 3] = jnp.zeros((RAY_BLOCK,))

    def compute():
        ox = org_ref[:, 0:1]
        oy = org_ref[:, 1:2]
        oz = org_ref[:, 2:3]
        dx = dir_ref[:, 0:1]
        dy = dir_ref[:, 1:2]
        dz = dir_ref[:, 2:3]
        rows = rows_ref[:, :]
        c_rows = c_ref[:, :]

        def proj(c):
            b0 = rows[3 * c + 0][None, :]
            b1 = rows[3 * c + 1][None, :]
            b2 = rows[3 * c + 2][None, :]
            O = ox * b0 + oy * b1 + oz * b2 - c_rows[c][None, :]
            Q = dx * b0 + dy * b1 + dz * b2
            return O, Q

        Ou, Qu = proj(0)
        Ov, Qv = proj(1)
        Ow, Qw = proj(2)
        qw_safe = jnp.where(jnp.abs(Qw) < 1e-12,
                            jnp.where(Qw < 0, -1e-12, 1e-12), Qw)
        t = -Ow / qw_safe
        u = Ou + t * Qu
        v = Ov + t * Qv
        min_t = rng_ref[:, 0:1]
        max_t = rng_ref[:, 1:2]
        tri_ids = jnp.broadcast_to(ids_ref[:, :][0][None, :].astype(jnp.int32),
                                   (RAY_BLOCK, TRI_CHUNK))
        ok = ((jnp.abs(Qw) >= 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t >= min_t) & (t <= max_t)
              & (ok_ref[:, :][0][None, :] > 0.5))
        t_m = jnp.where(ok, t, BIG)
        chunk_min = jnp.min(t_m, axis=1)
        prev_best = best_ref[:, 0]
        better = chunk_min < prev_best
        # select the winning triangle without gathers: min over masked ids,
        # then masked sums for u, v
        is_min = ok & (t_m <= chunk_min[:, None])
        win_id = jnp.min(jnp.where(is_min, tri_ids, jnp.int32(2 ** 30)),
                         axis=1)
        uniq = is_min & (tri_ids == win_id[:, None])
        win_u = jnp.sum(jnp.where(uniq, u, 0.0), axis=1)
        win_v = jnp.sum(jnp.where(uniq, v, 0.0), axis=1)
        best_ref[:, 0] = jnp.where(better, chunk_min, prev_best)
        best_ref[:, 1] = jnp.where(better, win_id.astype(jnp.float32),
                                   best_ref[:, 1])
        best_ref[:, 2] = jnp.where(better, win_u, best_ref[:, 2])
        best_ref[:, 3] = jnp.where(better, win_v, best_ref[:, 3])

    live = mask_ref[i, j] > 0
    if any_hit:
        # compute only while some ray in the block is still unhit
        @pl.when(live & (jnp.max(best_ref[:, 0]) >= BIG))
        def _():
            compute()
    else:
        @pl.when(live)
        def _():
            compute()


def _chunk_mask(org, d, min_t, max_t, chunk_lo, chunk_hi):
    """Conservative per-(ray-block, chunk) visibility: slab test of every
    ray segment against every chunk AABB, OR-reduced per RAY_BLOCK.
    org/d [Rp,3]; returns [Rp/RAY_BLOCK, K] int32."""
    safe_d = jnp.where(jnp.abs(d) < 1e-12,
                       jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = 1.0 / safe_d                                    # [Rp,3]
    t0 = (chunk_lo[None] - org[:, None]) * inv[:, None]   # [Rp,K,3]
    t1 = (chunk_hi[None] - org[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), -1)
    tf = jnp.min(jnp.maximum(t0, t1), -1)
    hit = (tn <= tf) & (tf >= min_t[:, None]) & (tn <= max_t[:, None])
    nblk = org.shape[0] // RAY_BLOCK
    return jnp.any(hit.reshape(nblk, RAY_BLOCK, -1), 1).astype(jnp.int32)


def _sort_rays(scene, org, d):
    """Coherence sort key: origin Morton cell (scene-bbox 64^3) high bits,
    direction octant low bits. Returns the sort permutation [R]."""
    lo = jnp.min(scene.tri_p[0].reshape(-1, 3), 0)
    hi = jnp.max(scene.tri_p[0].reshape(-1, 3), 0)
    q = jnp.clip(((org - lo) / jnp.maximum(hi - lo, 1e-12) * 63.0)
                 .astype(jnp.int32), 0, 63)
    m = jnp.zeros(org.shape[0], jnp.int32)
    for b in range(6):
        m = (m | (((q[:, 0] >> b) & 1) << (3 * b + 2))
             | (((q[:, 1] >> b) & 1) << (3 * b + 1))
             | (((q[:, 2] >> b) & 1) << (3 * b)))
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    return jnp.argsort(m * 8 + octant)


def _run(scene, org, d, min_t, max_t, any_hit, sort_rays=True):
    rows_np, c_rows_np, okp_np, ids_np, clo_np, chi_np, T, Tp = \
        get_tables(scene)
    rows = jnp.asarray(rows_np)
    c_rows = jnp.asarray(c_rows_np)
    okp = jnp.asarray(okp_np)
    ids = jnp.asarray(ids_np)
    chunk_lo = jnp.asarray(clo_np)
    chunk_hi = jnp.asarray(chi_np)
    R = org.shape[0]
    Rp = -(-R // RAY_BLOCK) * RAY_BLOCK
    if Rp != R:
        pad = Rp - R
        org = jnp.pad(org, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        min_t = jnp.pad(min_t, (0, pad), constant_values=1.0)
        max_t = jnp.pad(max_t, (0, pad), constant_values=0.0)
    max_t = jnp.where(jnp.isinf(max_t), BIG, max_t)

    if sort_rays and Rp > RAY_BLOCK:
        order = _sort_rays(scene, org, d)
        org = org[order]
        d = d[order]
        min_t = min_t[order]
        max_t = max_t[order]
    else:
        order = None

    rng = jnp.stack([min_t, max_t], -1)
    mask = _chunk_mask(org, d, min_t, max_t, chunk_lo, chunk_hi)

    grid = (Rp // RAY_BLOCK, Tp // TRI_CHUNK)
    interpret = jax.default_backend() == 'cpu'
    out = pl.pallas_call(
        partial(_isect_kernel, any_hit=any_hit),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RAY_BLOCK, 3), lambda i, j, m: (i, 0)),
                pl.BlockSpec((RAY_BLOCK, 3), lambda i, j, m: (i, 0)),
                pl.BlockSpec((RAY_BLOCK, 2), lambda i, j, m: (i, 0)),
                pl.BlockSpec((9, TRI_CHUNK), lambda i, j, m: (0, j)),
                pl.BlockSpec((3, TRI_CHUNK), lambda i, j, m: (0, j)),
                pl.BlockSpec((1, TRI_CHUNK), lambda i, j, m: (0, j)),
                pl.BlockSpec((1, TRI_CHUNK), lambda i, j, m: (0, j)),
            ],
            out_specs=pl.BlockSpec((RAY_BLOCK, 4), lambda i, j, m: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, 4), jnp.float32),
        interpret=interpret,
    )(mask, org, d, rng, rows, c_rows, okp[None, :],
      ids.astype(jnp.float32)[None, :])
    if order is not None:
        out = jnp.zeros_like(out).at[order].set(out)
    out = out[:R]
    best_t = out[:, 0]
    hit = best_t < BIG
    tid = jnp.where(hit, out[:, 1].astype(jnp.int32), 0)
    return (hit, tid, jnp.where(hit, best_t, 0.0),
            jnp.where(hit, out[:, 2], 0.0), jnp.where(hit, out[:, 3], 0.0))


def intersect_pallas(scene, org, d, time, min_t, max_t):
    """Closest hit; same signature/semantics as intersect_matmul."""
    return _run(scene, org, d, min_t, max_t, any_hit=False)


def occluded_pallas(scene, org, d, time, min_t, max_t):
    hit, _, _, _, _ = _run(scene, org, d, min_t, max_t, any_hit=True)
    return hit
