"""Chunk-walk Pallas TPU intersection: per-ray-block dynamic chunk lists.

The round-1 sweep kernel (ops/pallas_isect.py) iterates a static
(ray_block, tri_chunk) grid and skips culled chunks with pl.when — but the
grid itself (and its block DMAs) still costs ~1 us per step, and the
block-level culling only pays off for coherent rays. This kernel replaces
Embree's per-ray BVH walk (reference src/scene.cpp:106-149) with the
TPU-shaped equivalent:

  1. XLA stage: slab-test every (ray, chunk) AABB pair -> [R, K] mask;
     OR-reduce per ray block; compact each block's hit chunks into a
     prefix list (argsort) with a count.
  2. Pallas stage: grid over ray blocks only. Each block runs an in-kernel
     fori_loop over ITS OWN count of hit chunks, double-buffering the
     [16, TRI_CHUNK] packed triangle table slices HBM->VMEM by manual DMA.
     Work is proportional to (alive rays x chunks actually overlapped):
     dead rays (max_t < min_t) produce empty chunk lists and their blocks
     cost ~nothing, which makes padded-depth scan iterations in the path
     walk nearly free.

Triangle data is packed as one [K, 16, TRI_CHUNK] f32 array per scene
(Woop inverse-frame rows 0..8, translation rows 9..11, valid 12, id 13),
Morton-ordered so chunks are spatially tight; rays are sorted by (origin
Morton cell, direction octant) so block unions stay small.

The any-hit (occlusion) variant early-outs the chunk walk once every ray
in the block is occluded.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

RAY_BLOCK = int(os.environ.get('LMC_CW_RAY_BLOCK', '256'))
TRI_CHUNK = int(os.environ.get('LMC_CW_TRI_CHUNK', '128'))
# Packed tri tables up to this size stay VMEM-resident for the whole
# kernel (torus: 185 chunks = 1.5 MB; veachdoor: 163 = 1.3 MB) — each
# chunk visit is then a dynamic VMEM slice instead of an HBM DMA
# start/wait pair. Larger scenes fall back to the double-buffered DMA
# walk. Default 0 (DMA path) until the resident variant is measured
# faster on the real chip; set e.g. 6291456 to enable.
VMEM_RESIDENT_BYTES = int(os.environ.get('LMC_CW_VMEM_BYTES', '0'))
BIG = 3.0e38


def _morton3(x, y, z, bits=10):
    out = np.zeros_like(x, dtype=np.int64)
    for b in range(bits):
        out |= ((x >> b) & 1) << (3 * b + 2)
        out |= ((y >> b) & 1) << (3 * b + 1)
        out |= ((z >> b) & 1) << (3 * b)
    return out


def _prep_tables(scene):
    """Morton-order triangles; pack Woop rows + valid + id into one
    [K, 16, TRI_CHUNK] array; per-chunk AABBs [K, 3] lo / hi."""
    B = np.asarray(scene.isect_B)      # [3, 3T] (Ainv columns)
    C = np.asarray(scene.isect_C)      # [3T]
    ok = np.asarray(scene.isect_ok)
    tp = np.asarray(scene.tri_p)[0]    # [T, 3, 3] keyframe-0 vertices
    T = ok.shape[0]

    cen = tp.mean(1)
    lo = cen.min(0)
    span = np.maximum(cen.max(0) - lo, 1e-12)
    q = np.clip(((cen - lo) / span * 1023).astype(np.int64), 0, 1023)
    order = np.argsort(_morton3(q[:, 0], q[:, 1], q[:, 2]), kind='stable')

    Tp = -(-T // TRI_CHUNK) * TRI_CHUNK
    K = Tp // TRI_CHUNK
    pack = np.zeros((16, Tp), np.float32)
    for c in range(3):
        for j in range(3):
            pack[3 * c + j, :T] = B[j, c::3][order]
        pack[9 + c, :T] = C[c::3][order]
    pack[12, :T] = ok[order].astype(np.float32)
    pack[13, :T] = order.astype(np.float32)
    pack = pack.reshape(16, K, TRI_CHUNK).transpose(1, 0, 2).copy()

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
    return pack, chunk_lo - pad, chunk_hi + pad, T, K


_TABLE_CACHE = {}


def get_tables(scene):
    key = (id(scene.isect_B), scene.num_tris)
    if key not in _TABLE_CACHE:
        if len(_TABLE_CACHE) > 4:
            _TABLE_CACHE.clear()
        _TABLE_CACHE[key] = _prep_tables(scene)
    return _TABLE_CACHE[key]


def _sort_rays(scene_lo, scene_hi, org, d, alive=None):
    """(dead-last, origin Morton cell (64^3), direction octant) sort.

    Dead rays (max_t < min_t) sort behind every live ray so they cluster
    into whole RAY_BLOCKs with EMPTY chunk lists — without this they stay
    interleaved by stale origin and a mostly-dead dispatch still pays ~75%
    of a fully-live one (bench_chunkwalk r5: 69 vs 92 ms at 30% alive)."""
    q = jnp.clip(((org - scene_lo) / jnp.maximum(scene_hi - scene_lo, 1e-12)
                  * 63.0).astype(jnp.int32), 0, 63)
    m = jnp.zeros(org.shape[0], jnp.int32)
    for b in range(6):
        m = (m | (((q[:, 0] >> b) & 1) << (3 * b + 2))
             | (((q[:, 1] >> b) & 1) << (3 * b + 1))
             | (((q[:, 2] >> b) & 1) << (3 * b)))
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    key = m * 8 + octant
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(0x3FFFFFFF))
    return jnp.argsort(key)


def _block_chunk_lists(org, d, min_t, max_t, chunk_lo, chunk_hi):
    """Slab-test rays x chunk AABBs; per-RAY_BLOCK union; compact.
    Returns (chunk_idx [NB, K] i32, counts [NB] i32)."""
    safe_d = jnp.where(jnp.abs(d) < 1e-12,
                       jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = 1.0 / safe_d
    t0 = (chunk_lo[None] - org[:, None]) * inv[:, None]   # [R, K, 3]
    t1 = (chunk_hi[None] - org[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), -1)
    tf = jnp.min(jnp.maximum(t0, t1), -1)
    alive = max_t >= min_t
    hit = ((tn <= tf) & (tf >= min_t[:, None]) & (tn <= max_t[:, None])
           & alive[:, None])
    nb = org.shape[0] // RAY_BLOCK
    bm = jnp.any(hit.reshape(nb, RAY_BLOCK, -1), 1)       # [NB, K]
    counts = jnp.sum(bm, -1).astype(jnp.int32)
    # stable argsort of ~hit puts hit chunk ids first, in ascending order
    chunk_idx = jnp.argsort(~bm, axis=-1, stable=True).astype(jnp.int32)
    return chunk_idx, counts


def _walk_kernel(chunk_idx_ref, counts_ref, org_ref, dir_ref, rng_ref,
                 pack_hbm, out_ref, buf, sem, *, any_hit):
    i = pl.program_id(0)
    count = counts_ref[i]

    def get_dma(slot, j):
        cid = chunk_idx_ref[i, j]
        return pltpu.make_async_copy(pack_hbm.at[cid], buf.at[slot],
                                     sem.at[slot])

    @pl.when(count > 0)
    def _():
        get_dma(0, 0).start()

    # NOTE (r5): an MXU formulation of the tile projection (3 dots
    # [2*RB, 4]@[4, TC]) measured 1.6x SLOWER than the VPU chain — the
    # operand concats/relayouts around the thin-K dots dominate
    tile = _make_tile(org_ref, dir_ref, rng_ref)

    def body(j, carry):
        best_t, best_id, best_u, best_v = carry
        slot = j % 2

        if any_hit:
            # NO speculative prefetch before the early-exit decision: an
            # async copy left in flight when the while_loop exits leaves
            # its semaphore signaled-but-unawaited, corrupting the next
            # grid step's DMA waits (data-dependent backend ABORT the
            # moment a block's rays all occlude early — r4 bisection on
            # the torus scene). Prefetch is issued AFTER the hit test,
            # gated on the same predicate the loop cond re-evaluates.
            get_dma(slot, j).wait()
            pack = buf[slot]
            ok, _, _, _, _ = tile(pack)
            hit_any = jnp.any(ok, axis=1)
            new_t = jnp.where(hit_any, 0.0, best_t)

            @pl.when((j + 1 < count) & (jnp.max(new_t) >= BIG))
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            return (new_t, best_id, best_u, best_v)

        @pl.when(j + 1 < count)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        pack = buf[slot]
        ok, t, u, v, ids = tile(pack)
        t_m = jnp.where(ok, t, BIG)
        chunk_min = jnp.min(t_m, axis=1)
        better = chunk_min < best_t
        is_min = ok & (t_m <= chunk_min[:, None])
        idsb = jnp.broadcast_to(ids[None, :], t.shape)
        win_id = jnp.min(jnp.where(is_min, idsb, BIG), axis=1)
        uniq = is_min & (idsb == win_id[:, None])
        win_u = jnp.sum(jnp.where(uniq, u, 0.0), axis=1)
        win_v = jnp.sum(jnp.where(uniq, v, 0.0), axis=1)
        return (jnp.where(better, chunk_min, best_t),
                jnp.where(better, win_id, best_id),
                jnp.where(better, win_u, best_u),
                jnp.where(better, win_v, best_v))

    init = (jnp.full((RAY_BLOCK,), BIG), jnp.full((RAY_BLOCK,), -1.0),
            jnp.zeros((RAY_BLOCK,)), jnp.zeros((RAY_BLOCK,)))
    if any_hit:
        def cond(state):
            j, carry = state
            return (j < count) & (jnp.max(carry[0]) >= BIG)

        def wbody(state):
            j, carry = state
            return j + 1, body(j, carry)

        _, (best_t, best_id, best_u, best_v) = jax.lax.while_loop(
            cond, wbody, (0, init))
    else:
        best_t, best_id, best_u, best_v = jax.lax.fori_loop(
            0, count, body, init)
    out_ref[:, 0] = best_t
    out_ref[:, 1] = best_id
    out_ref[:, 2] = best_u
    out_ref[:, 3] = best_v


def _make_tile(org_ref, dir_ref, rng_ref):
    """Woop-projection tile test [RAY_BLOCK, TRI_CHUNK] shared by both
    kernel variants."""
    ox = org_ref[:, 0:1]
    oy = org_ref[:, 1:2]
    oz = org_ref[:, 2:3]
    dx = dir_ref[:, 0:1]
    dy = dir_ref[:, 1:2]
    dz = dir_ref[:, 2:3]
    min_t = rng_ref[:, 0:1]
    max_t = rng_ref[:, 1:2]

    def tile(pack):
        def proj(c):
            b0 = pack[3 * c + 0][None, :]
            b1 = pack[3 * c + 1][None, :]
            b2 = pack[3 * c + 2][None, :]
            O = ox * b0 + oy * b1 + oz * b2 - pack[9 + c][None, :]
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
        ok = ((jnp.abs(Qw) >= 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t >= min_t) & (t <= max_t)
              & (pack[12][None, :] > 0.5))
        return ok, t, u, v, pack[13]

    return tile


def _walk_kernel_resident(chunk_idx_ref, counts_ref, org_ref, dir_ref,
                          rng_ref, pack_ref, out_ref, *, any_hit):
    """VMEM-resident variant: the whole [K, 16, TRI_CHUNK] pack lives in
    VMEM (constant index_map -> Pallas fetches it once and keeps it across
    grid steps); a chunk visit is a dynamic leading-dim slice, no DMA."""
    i = pl.program_id(0)
    count = counts_ref[i]
    tile = _make_tile(org_ref, dir_ref, rng_ref)

    def chunk_pack(j):
        return pack_ref[chunk_idx_ref[i, j]]

    def body(j, carry):
        best_t, best_id, best_u, best_v = carry
        ok, t, u, v, ids = tile(chunk_pack(j))
        if any_hit:
            hit_any = jnp.any(ok, axis=1)
            return (jnp.where(hit_any, 0.0, best_t), best_id,
                    best_u, best_v)
        t_m = jnp.where(ok, t, BIG)
        chunk_min = jnp.min(t_m, axis=1)
        better = chunk_min < best_t
        is_min = ok & (t_m <= chunk_min[:, None])
        idsb = jnp.broadcast_to(ids[None, :], t.shape)
        win_id = jnp.min(jnp.where(is_min, idsb, BIG), axis=1)
        uniq = is_min & (idsb == win_id[:, None])
        win_u = jnp.sum(jnp.where(uniq, u, 0.0), axis=1)
        win_v = jnp.sum(jnp.where(uniq, v, 0.0), axis=1)
        return (jnp.where(better, chunk_min, best_t),
                jnp.where(better, win_id, best_id),
                jnp.where(better, win_u, best_u),
                jnp.where(better, win_v, best_v))

    init = (jnp.full((RAY_BLOCK,), BIG), jnp.full((RAY_BLOCK,), -1.0),
            jnp.zeros((RAY_BLOCK,)), jnp.zeros((RAY_BLOCK,)))
    if any_hit:
        def cond(state):
            j, carry = state
            return (j < count) & (jnp.max(carry[0]) >= BIG)

        def wbody(state):
            j, carry = state
            return j + 1, body(j, carry)

        _, (best_t, best_id, best_u, best_v) = jax.lax.while_loop(
            cond, wbody, (0, init))
    else:
        best_t, best_id, best_u, best_v = jax.lax.fori_loop(
            0, count, body, init)
    out_ref[:, 0] = best_t
    out_ref[:, 1] = best_id
    out_ref[:, 2] = best_u
    out_ref[:, 3] = best_v


def _run(scene, org, d, min_t, max_t, any_hit, sort_rays=True):
    pack_np, clo_np, chi_np, T, K = get_tables(scene)
    pack = jnp.asarray(pack_np)
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
        slo = jnp.asarray(clo_np.min(0))
        shi = jnp.asarray(chi_np.max(0))
        order = _sort_rays(slo, shi, org, d, alive=max_t >= min_t)
        org, d = org[order], d[order]
        min_t, max_t = min_t[order], max_t[order]
    else:
        order = None

    chunk_idx, counts = _block_chunk_lists(org, d, min_t, max_t,
                                           chunk_lo, chunk_hi)
    rng = jnp.stack([min_t, max_t], -1)
    nb = Rp // RAY_BLOCK

    resident = pack_np.nbytes <= VMEM_RESIDENT_BYTES
    if resident:
        out = pl.pallas_call(
            partial(_walk_kernel_resident, any_hit=any_hit),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((RAY_BLOCK, 3), lambda i, *_: (i, 0)),
                    pl.BlockSpec((RAY_BLOCK, 3), lambda i, *_: (i, 0)),
                    pl.BlockSpec((RAY_BLOCK, 2), lambda i, *_: (i, 0)),
                    # constant index_map: fetched once, stays resident
                    pl.BlockSpec(pack.shape, lambda i, *_: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((RAY_BLOCK, 4),
                                       lambda i, *_: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((Rp, 4), jnp.float32),
            interpret=jax.default_backend() == 'cpu',
        )(chunk_idx, counts, org, d, rng, pack)
    else:
        out = pl.pallas_call(
            partial(_walk_kernel, any_hit=any_hit),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((RAY_BLOCK, 3), lambda i, *_: (i, 0)),
                    pl.BlockSpec((RAY_BLOCK, 3), lambda i, *_: (i, 0)),
                    pl.BlockSpec((RAY_BLOCK, 2), lambda i, *_: (i, 0)),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((RAY_BLOCK, 4),
                                       lambda i, *_: (i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, 16, TRI_CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((Rp, 4), jnp.float32),
        )(chunk_idx, counts, org, d, rng, pack)

    if order is not None:
        # `order` is a permutation: unique_indices keeps XLA on the
        # vectorized scatter path (the conflict-safe path serializes at
        # ~85 ns/row on TPU)
        out = jnp.zeros_like(out).at[order].set(out, unique_indices=True)
    out = out[:R]
    best_t = out[:, 0]
    hit = best_t < BIG
    tid = jnp.where(hit, out[:, 1].astype(jnp.int32), 0)
    return (hit, tid, jnp.where(hit, best_t, 0.0),
            jnp.where(hit, out[:, 2], 0.0), jnp.where(hit, out[:, 3], 0.0))


def intersect_chunkwalk(scene, org, d, time, min_t, max_t):
    """Closest hit; signature/semantics match intersect_matmul."""
    return _run(scene, org, d, min_t, max_t, any_hit=False)


def occluded_chunkwalk(scene, org, d, time, min_t, max_t):
    hit, _, _, _, _ = _run(scene, org, d, min_t, max_t, any_hit=True)
    return hit
