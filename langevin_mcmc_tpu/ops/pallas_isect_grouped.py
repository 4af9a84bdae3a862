"""Grouped per-ray-culled intersection: the TPU-native BVH replacement.

Pointer-chasing BVH traversal is gather-bound on TPU (per-lane dynamic
loads don't exist); block-level chunk culling fails on incoherent MCMC
wavefronts (measured block mask density 0.88 on sorted torus rays vs 0.27
per-ray). What works is per-ray culling with Megablox/MoE-style grouped
execution:

  1. triangles are Morton-ordered and cut into spatially tight chunks of
     TC=128 (host, cached);
  2. per query, every ray slab-tests every chunk AABB (vectorized XLA,
     ~20 flops per pair — two orders cheaper than testing the chunk's
     triangles) giving a [R, K] visibility mask;
  3. visible (ray, chunk) pairs are compacted chunk-major with each
     chunk's run padded to PAIR_BLOCK, all with cumsum/scatter (no sort);
  4. a Pallas kernel runs one grid step per pair block: the block's chunk
     id arrives via scalar prefetch and *indexes the triangle-table
     BlockSpec*, so each block streams exactly one chunk's Woop rows from
     HBM and tests them against its 128 gathered rays — zero gathers
     inside the kernel;
  5. per-pair closest hits are segment-min-reduced back to rays.

Per-ray work drops from num_tris Möller-Trumbore tests to
K slab tests + hit_chunks * TC tests (torus: 23614 → ~185*20 + ~25*128).

The pair budget is static (PAIR_BUDGET_FACTOR per ray); overflowing
queries (pathological ray sets) fall back to the dense sweep under
lax.cond. Replaces Embree rtcIntersect1/rtcOccluded1
(reference src/scene.cpp:106-149) by culling work instead of per-ray
trees.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_isect as dense

TC = 128                 # triangles per chunk
PAIR_BLOCK = 128         # (ray, chunk) pairs per kernel block
PAIR_BUDGET_FACTOR = 48  # max padded pairs per ray (overflow -> dense)
BIG = 3.0e38


def _prep_grouped(scene):
    """Morton-order triangles, build per-chunk Woop row tables [13, K*TC]
    (9 B rows + 3 C rows + validity), chunk AABBs, original-id table."""
    B = np.asarray(scene.isect_B)      # [3, 3T]
    C = np.asarray(scene.isect_C)      # [3T]
    ok = np.asarray(scene.isect_ok)
    tp = np.asarray(scene.tri_p)[0]
    T = ok.shape[0]

    cen = tp.mean(1)
    lo = cen.min(0)
    span = np.maximum(cen.max(0) - lo, 1e-12)
    q = np.clip(((cen - lo) / span * 1023).astype(np.int64), 0, 1023)
    order = np.argsort(dense._morton3(q[:, 0], q[:, 1], q[:, 2]),
                       kind='stable')

    Tp = -(-T // TC) * TC
    K = Tp // TC
    rows = np.zeros((13, Tp), np.float32)
    ids = np.zeros(Tp, np.float32)
    for c in range(3):
        for j in range(3):
            rows[3 * c + j, :T] = B[j, c::3][order]
        rows[9 + c, :T] = C[c::3][order]
    rows[12, :T] = ok[order].astype(np.float32)
    ids[:T] = order.astype(np.float32)

    vs = tp[order].reshape(T, 9)
    lo3 = np.minimum(np.minimum(vs[:, 0:3], vs[:, 3:6]), vs[:, 6:9])
    hi3 = np.maximum(np.maximum(vs[:, 0:3], vs[:, 3:6]), vs[:, 6:9])
    chunk_lo = np.full((K, 3), 1e30, np.float32)
    chunk_hi = np.full((K, 3), -1e30, np.float32)
    for k in range(K):
        s, e = k * TC, min((k + 1) * TC, T)
        if s < T:
            chunk_lo[k] = lo3[s:e].min(0)
            chunk_hi[k] = hi3[s:e].max(0)
    pad = 1e-4 * np.maximum(chunk_hi - chunk_lo, 1e-6)
    return (rows, ids, chunk_lo - pad, chunk_hi + pad, T, Tp, K)


_CACHE = {}


def get_grouped_tables(scene):
    key = (id(scene.isect_B), scene.num_tris)
    if key not in _CACHE:
        if len(_CACHE) > 4:
            _CACHE.clear()
        _CACHE[key] = _prep_grouped(scene)
    return _CACHE[key]


def _pair_kernel(meta_ref, org_ref, dir_ref, rng_ref, rows_ref, best_ref):
    """One block = PAIR_BLOCK (ray, chunk) pairs sharing one TC-tri chunk.

    meta_ref (scalar prefetch): [nblocks] chunk id per block (also drives
    the rows BlockSpec); dead pairs arrive with max_t < min_t."""
    i = pl.program_id(0)
    best_ref[:, 0] = jnp.full((PAIR_BLOCK,), BIG)
    best_ref[:, 1] = jnp.full((PAIR_BLOCK,), -1.0)
    best_ref[:, 2] = jnp.zeros((PAIR_BLOCK,))
    best_ref[:, 3] = jnp.zeros((PAIR_BLOCK,))

    @pl.when(meta_ref[i] >= 0)
    def _():
        ox = org_ref[:, 0:1]
        oy = org_ref[:, 1:2]
        oz = org_ref[:, 2:3]
        dx = dir_ref[:, 0:1]
        dy = dir_ref[:, 1:2]
        dz = dir_ref[:, 2:3]
        rows = rows_ref[:, :]

        def proj(c):
            b0 = rows[3 * c + 0][None, :]
            b1 = rows[3 * c + 1][None, :]
            b2 = rows[3 * c + 2][None, :]
            O = ox * b0 + oy * b1 + oz * b2 - rows[9 + c][None, :]
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
        ok = ((jnp.abs(Qw) >= 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t >= min_t) & (t <= max_t)
              & (rows[12][None, :] > 0.5))
        t_m = jnp.where(ok, t, BIG)
        best = jnp.min(t_m, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (PAIR_BLOCK, TC), 1)
        is_min = ok & (t_m <= best[:, None])
        win_lane = jnp.min(jnp.where(is_min, lane, jnp.int32(2 ** 30)),
                           axis=1)
        uniq = is_min & (lane == win_lane[:, None])
        win_u = jnp.sum(jnp.where(uniq, u, 0.0), axis=1)
        win_v = jnp.sum(jnp.where(uniq, v, 0.0), axis=1)
        hit = best < BIG
        best_ref[:, 0] = best
        best_ref[:, 1] = jnp.where(hit, win_lane.astype(jnp.float32), -1.0)
        best_ref[:, 2] = win_u
        best_ref[:, 3] = win_v


def _ray_chunk_mask(org, d, min_t, max_t, chunk_lo, chunk_hi):
    safe_d = jnp.where(jnp.abs(d) < 1e-12,
                       jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = 1.0 / safe_d
    t0 = (chunk_lo[None] - org[:, None]) * inv[:, None]
    t1 = (chunk_hi[None] - org[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), -1)
    tf = jnp.min(jnp.maximum(t0, t1), -1)
    return (tn <= tf) & (tf >= min_t[:, None]) & (tn <= max_t[:, None])


def _run_grouped(scene, org, d, min_t, max_t, any_hit):
    rows_np, ids_np, clo_np, chi_np, T, Tp, K = get_grouped_tables(scene)
    rows = jnp.asarray(rows_np)
    ids = jnp.asarray(ids_np)
    chunk_lo = jnp.asarray(clo_np)
    chunk_hi = jnp.asarray(chi_np)
    R = org.shape[0]
    max_t = jnp.where(jnp.isinf(max_t), BIG, max_t)

    # 1) per-ray chunk visibility [R, K]
    mask = _ray_chunk_mask(org, d, min_t, max_t, chunk_lo, chunk_hi)

    # 2) chunk-major compaction; each chunk's run padded to PAIR_BLOCK
    cnt = jnp.sum(mask.astype(jnp.int32), 0)            # [K]
    run = -(-cnt // PAIR_BLOCK) * PAIR_BLOCK
    chunk_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(run)[:-1]])
    total = chunk_off[-1] + run[-1]
    P = PAIR_BUDGET_FACTOR * (-(-R // PAIR_BLOCK)) * PAIR_BLOCK
    overflow = total > P
    rank = jnp.cumsum(mask.astype(jnp.int32), 0) - 1     # [R, K]
    pos = jnp.where(mask, chunk_off[None, :] + rank, P).reshape(-1)

    ray_flat = jnp.broadcast_to(jnp.arange(R)[:, None], (R, K)).reshape(-1)
    chunk_flat = jnp.broadcast_to(jnp.arange(K)[None, :], (R, K)).reshape(-1)
    pair_ray = jnp.zeros((P,), jnp.int32).at[pos].set(ray_flat, mode='drop')
    pair_chunk = jnp.full((P,), -1, jnp.int32).at[pos].set(chunk_flat,
                                                           mode='drop')
    nblocks = P // PAIR_BLOCK
    block_chunk = pair_chunk[jnp.arange(nblocks) * PAIR_BLOCK]

    # 3) per-pair ray data; dead pairs get an empty [1, 0] range
    live = pair_chunk >= 0
    org_g = org[pair_ray]
    d_g = d[pair_ray]
    rng_g = jnp.stack([jnp.where(live, min_t[pair_ray], 1.0),
                       jnp.where(live, max_t[pair_ray], 0.0)], -1)

    def kernel_path(_):
        out = pl.pallas_call(
            _pair_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblocks,),
                in_specs=[
                    pl.BlockSpec((PAIR_BLOCK, 3), lambda i, m: (i, 0)),
                    pl.BlockSpec((PAIR_BLOCK, 3), lambda i, m: (i, 0)),
                    pl.BlockSpec((PAIR_BLOCK, 2), lambda i, m: (i, 0)),
                    pl.BlockSpec((13, TC),
                                 lambda i, m: (0, jnp.maximum(m[i], 0))),
                ],
                out_specs=pl.BlockSpec((PAIR_BLOCK, 4), lambda i, m: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((P, 4), jnp.float32),
            interpret=jax.default_backend() == 'cpu',
        )(block_chunk, org_g, d_g, rng_g, rows)

        # 4) segment-min back to rays
        pair_t = jnp.where(live & (out[:, 1] >= 0.0), out[:, 0], BIG)
        slot = (jnp.maximum(pair_chunk, 0) * TC
                + jnp.maximum(out[:, 1].astype(jnp.int32), 0))
        best_t = jnp.full((R,), BIG).at[pair_ray].min(
            jnp.where(live, pair_t, BIG), mode='drop')
        win = live & (pair_t <= best_t[pair_ray]) & (pair_t < BIG)
        tgt = jnp.where(win, pair_ray, R)
        tid = jnp.zeros((R,), jnp.int32).at[tgt].set(
            ids[slot].astype(jnp.int32), mode='drop')
        u = jnp.zeros((R,)).at[tgt].set(out[:, 2], mode='drop')
        v = jnp.zeros((R,)).at[tgt].set(out[:, 3], mode='drop')
        hit = best_t < BIG
        return (hit, tid, jnp.where(hit, best_t, 0.0), u, v)

    def dense_path(_):
        return dense._run(scene, org, d, min_t, max_t, any_hit,
                          sort_rays=False)

    return jax.lax.cond(overflow, dense_path, kernel_path, None)


def intersect_grouped(scene, org, d, time, min_t, max_t):
    """Closest hit; same signature/semantics as intersect_bruteforce."""
    return _run_grouped(scene, org, d, min_t, max_t, any_hit=False)


def occluded_grouped(scene, org, d, time, min_t, max_t):
    hit, _, _, _, _ = _run_grouped(scene, org, d, min_t, max_t,
                                   any_hit=True)
    return hit
