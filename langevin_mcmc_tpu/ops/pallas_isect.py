"""Pallas TPU kernel: wavefront ray-triangle intersection.

The XLA dense sweep (ops/intersect.py intersect_matmul) is HBM-bound: every
triangle chunk materializes [R, CHUNK] intermediates (t, u, v, masks) in
HBM, ~10 passes over ~100 MB per query. This kernel keeps the whole
per-(ray-block, tri-chunk) tile in VMEM and reduces the closest hit in
registers, so HBM traffic drops to the ray/hit vectors plus one stream of
the (tiny) triangle tables per ray-block — the speed-of-light pattern for
this op on TPU.

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
TRI_CHUNK = 2048
BIG = 3.0e38


def _prep_tables(scene):
    """Split the [3, 3T] Woop table into 9 row vectors + C rows, padded to a
    TRI_CHUNK multiple. Returns (rows [9, Tp], c_rows [3, Tp], ok [Tp])."""
    B = np.asarray(scene.isect_B)      # [3, 3T]
    C = np.asarray(scene.isect_C)      # [3T]
    ok = np.asarray(scene.isect_ok)
    T = ok.shape[0]
    Tp = -(-T // TRI_CHUNK) * TRI_CHUNK
    rows = np.zeros((9, Tp), np.float32)
    c_rows = np.zeros((3, Tp), np.float32)
    okp = np.zeros(Tp, bool)
    # B[j, 3t+c] = Ainv[t, c, j]
    for c in range(3):
        for j in range(3):
            rows[3 * c + j, :T] = B[j, c::3]
        c_rows[c, :T] = C[c::3]
    okp[:T] = ok
    # cache NUMPY buffers: jnp constants created inside one jit trace must
    # not be reused in another (UnexpectedTracerError)
    return rows, c_rows, okp.astype(np.float32), T, Tp


_TABLE_CACHE = {}


def get_tables(scene):
    key = (id(scene.isect_B), scene.num_tris)
    if key not in _TABLE_CACHE:
        if len(_TABLE_CACHE) > 4:
            _TABLE_CACHE.clear()
        _TABLE_CACHE[key] = _prep_tables(scene)
    return _TABLE_CACHE[key]


def _isect_kernel(org_ref, dir_ref, rng_ref, rows_ref, c_ref, ok_ref,
                  best_ref, any_hit: bool, num_tris: int):
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
        tri0 = j * TRI_CHUNK
        tri_ids = tri0 + jax.lax.broadcasted_iota(jnp.int32,
                                                  (RAY_BLOCK, TRI_CHUNK), 1)
        ok = ((jnp.abs(Qw) >= 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t >= min_t) & (t <= max_t)
              & (ok_ref[:, :][0][None, :] > 0.5)
              & (tri_ids < num_tris))
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

    if any_hit:
        # compute only while some ray in the block is still unhit
        @pl.when(jnp.max(best_ref[:, 0]) >= BIG)
        def _():
            compute()
    else:
        compute()


def _run(scene, org, d, min_t, max_t, any_hit):
    rows_np, c_rows_np, okp_np, T, Tp = get_tables(scene)
    rows = jnp.asarray(rows_np)
    c_rows = jnp.asarray(c_rows_np)
    okp = jnp.asarray(okp_np)
    R = org.shape[0]
    Rp = -(-R // RAY_BLOCK) * RAY_BLOCK
    if Rp != R:
        pad = Rp - R
        org = jnp.pad(org, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        min_t = jnp.pad(min_t, (0, pad), constant_values=1.0)
        max_t = jnp.pad(max_t, (0, pad), constant_values=0.0)
    rng = jnp.stack([min_t, jnp.where(jnp.isinf(max_t), BIG, max_t)], -1)

    grid = (Rp // RAY_BLOCK, Tp // TRI_CHUNK)
    interpret = jax.default_backend() == 'cpu'
    out = pl.pallas_call(
        partial(_isect_kernel, any_hit=any_hit, num_tris=T),
        out_shape=jax.ShapeDtypeStruct((Rp, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 2), lambda i, j: (i, 0)),
            pl.BlockSpec((9, TRI_CHUNK), lambda i, j: (0, j)),
            pl.BlockSpec((3, TRI_CHUNK), lambda i, j: (0, j)),
            pl.BlockSpec((1, TRI_CHUNK), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 4), lambda i, j: (i, 0)),
        interpret=interpret,
    )(org, d, rng, rows, c_rows, okp[None, :])
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
