"""Flattened BVH: host-side builder + device wavefront traversal.

TPU-native replacement for Embree (reference embree3/, used via
rtcIntersect1/rtcOccluded1 in src/scene.cpp:106-149): a binned-SAH BVH is
built on host (numpy here; ops/native has a C++ builder for large scenes),
flattened into one [N, 8] float32 node array resident in HBM, and traversed
with a fixed-depth stack inside jax.lax.while_loop, vectorized over the ray
wavefront.

Node layout (f32 row of 8):
  [0:3] bbox min, [3:6] bbox max,
  [6]   left child index (inner) | first-primitive offset (leaf)
  [7]   > 0: leaf with that many primitives; <= 0: inner, -right child idx

Leaf primitives are contiguous in `bvh_prim_ids` order.
For two-keyframe motion, nodes bound the union of both keyframes.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import vecmath as vm

MAX_LEAF = 4
N_BUCKETS = 12
STACK_DEPTH = 64


def build_bvh(tri_p):
    """Build from [2, T, 3, 3] keyframe triangle vertices.

    Returns (nodes [N,8] float32, prim_ids [T] int32).
    Binned-SAH sweep, iterative with an explicit stack.
    """
    T = tri_p.shape[1]
    lo = tri_p.min(axis=(0, 2))   # [T, 3] over keyframes & corners
    hi = tri_p.max(axis=(0, 2))
    centers = 0.5 * (lo + hi)

    prim_ids = np.arange(T, dtype=np.int32)
    nodes = []
    # stack of (primitive index slice, parent patch position)
    order = np.arange(T)
    stack = [(order, -1, False)]  # (ids, parent_node, is_right)
    out_prims = []

    while stack:
        ids, parent, is_right = stack.pop()
        node_id = len(nodes)
        if parent >= 0:
            if is_right:
                nodes[parent][7] = -float(node_id)
            else:
                nodes[parent][6] = float(node_id)
        nlo = lo[ids].min(0)
        nhi = hi[ids].max(0)
        n = len(ids)
        if n <= MAX_LEAF:
            first = len(out_prims)
            out_prims.extend(ids.tolist())
            nodes.append([*nlo, *nhi, float(first), float(n)])
            continue

        c = centers[ids]
        cmin, cmax = c.min(0), c.max(0)
        axis = int(np.argmax(cmax - cmin))
        extent = cmax[axis] - cmin[axis]
        if extent <= 1e-12:
            # degenerate: split in half by order
            mid = n // 2
        else:
            # binned SAH
            b = np.minimum(((c[:, axis] - cmin[axis]) / extent * N_BUCKETS)
                           .astype(np.int32), N_BUCKETS - 1)
            counts = np.bincount(b, minlength=N_BUCKETS)
            bucket_lo = np.full((N_BUCKETS, 3), np.inf)
            bucket_hi = np.full((N_BUCKETS, 3), -np.inf)
            for k in range(3):
                np.minimum.at(bucket_lo[:, k], b, lo[ids][:, k])
                np.maximum.at(bucket_hi[:, k], b, hi[ids][:, k])

            def area(l, h):
                d = np.maximum(h - l, 0.0)
                return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                              + d[..., 2] * d[..., 0])

            # prefix/suffix sweeps
            pre_lo = np.minimum.accumulate(bucket_lo, 0)
            pre_hi = np.maximum.accumulate(bucket_hi, 0)
            suf_lo = np.minimum.accumulate(bucket_lo[::-1], 0)[::-1]
            suf_hi = np.maximum.accumulate(bucket_hi[::-1], 0)[::-1]
            pre_cnt = np.cumsum(counts)
            suf_cnt = np.cumsum(counts[::-1])[::-1]
            costs = np.full(N_BUCKETS - 1, np.inf)
            for s in range(N_BUCKETS - 1):
                if pre_cnt[s] == 0 or suf_cnt[s + 1] == 0:
                    continue
                costs[s] = (area(pre_lo[s], pre_hi[s]) * pre_cnt[s]
                            + area(suf_lo[s + 1], suf_hi[s + 1]) * suf_cnt[s + 1])
            s = int(np.argmin(costs))
            if not np.isfinite(costs[s]):
                mid = n // 2
                ids = ids[np.argsort(c[:, axis], kind='stable')]
            else:
                left_mask = b <= s
                ids = np.concatenate([ids[left_mask], ids[~left_mask]])
                mid = int(left_mask.sum())
                if mid == 0 or mid == n:
                    mid = n // 2
        if extent <= 1e-12:
            ids = ids[np.argsort(c[:, axis], kind='stable')]

        nodes.append([*nlo, *nhi, 0.0, 0.0])  # children patched later
        # push right first so left is processed next (contiguous DFS order)
        stack.append((ids[mid:], node_id, True))
        stack.append((ids[:mid], node_id, False))

    nodes = np.asarray(nodes, np.float32)
    prim_ids = np.asarray(out_prims, np.int32)
    return nodes, prim_ids


def attach_bvh(scene):
    """Build and attach the BVH to a SceneData; returns updated scene."""
    nodes, prim_ids = build_bvh(np.asarray(scene.tri_p))
    return dataclasses.replace(
        scene,
        bvh_nodes=jnp.asarray(nodes),
        bvh_prim_ids=jnp.asarray(prim_ids),
        use_bvh=True)


def _ray_box(inv_d, org, lo, hi, t_min, t_max):
    t0 = (lo - org) * inv_d
    t1 = (hi - org) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tn, -1), t_min)
    far = jnp.minimum(jnp.min(tf, -1), t_max)
    return near <= far


def _traverse_one(scene, org, d, time, min_t, max_t, any_hit):
    """Single-ray traversal (vmapped by callers)."""
    nodes = scene.bvh_nodes
    prim_ids = scene.bvh_prim_ids
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)

    def tri_test(pid, best):
        best_t, _, _, _ = best
        if scene.has_motion:
            tp = vm.lerp(time, scene.tri_p[0][pid], scene.tri_p[1][pid])
        else:
            tp = scene.tri_p[0][pid]
        p0 = tp[0]
        e1 = tp[1] - p0
        e2 = tp[2] - p0
        from .intersect import moller_trumbore
        t, u, v, divisor = moller_trumbore(org, d, p0, e1, e2)
        ok = ((divisor != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= min_t) & (t <= max_t) & (t < best_t))
        return ok, t, u, v

    def body(state):
        best, stack, sp, done = state
        sp1 = sp - 1
        node_id = stack[sp1]
        node = nodes[node_id]
        leaf_n = node[7]
        is_leaf = leaf_n > 0.0

        def leaf_fn(best, stack, sp):
            first = node[6].astype(jnp.int32)
            n = leaf_n.astype(jnp.int32)

            def prim_body(k, best):
                pid = prim_ids[jnp.minimum(first + k, prim_ids.shape[0] - 1)]
                ok, t, u, v = tri_test(pid, best)
                ok &= k < n
                bt, bid, bu, bv = best
                return (jnp.where(ok & (t < bt), t, bt),
                        jnp.where(ok & (t < bt), pid, bid),
                        jnp.where(ok & (t < bt), u, bu),
                        jnp.where(ok & (t < bt), v, bv))

            best = jax.lax.fori_loop(0, MAX_LEAF, prim_body, best)
            return best, stack, sp

        def inner_fn(best, stack, sp):
            left = node[6].astype(jnp.int32)
            right = (-node[7]).astype(jnp.int32)
            bt = best[0]
            tmax = jnp.minimum(max_t, bt)
            lnode = nodes[left]
            rnode = nodes[right]
            lhit = _ray_box(inv_d, org, lnode[0:3], lnode[3:6], min_t, tmax)
            rhit = _ray_box(inv_d, org, rnode[0:3], rnode[3:6], min_t, tmax)
            # push hit children (left pushed last -> visited first)
            stack = stack.at[sp].set(jnp.where(rhit, right, stack[sp]))
            sp = sp + rhit.astype(jnp.int32)
            stack = stack.at[sp].set(jnp.where(lhit, left, stack[sp]))
            sp = sp + lhit.astype(jnp.int32)
            return best, stack, sp

        best, stack, sp2 = jax.lax.cond(is_leaf, leaf_fn, inner_fn,
                                        best, stack, sp1)
        done = sp2 <= 0
        if any_hit:
            done |= jnp.isfinite(best[0])
        return best, stack, sp2, done

    def cond(state):
        return ~state[3]

    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)
    best = (jnp.inf, jnp.int32(0), 0.0, 0.0)
    state = (best, stack, jnp.int32(1), jnp.bool_(False))
    final = jax.lax.while_loop(cond, body, state)
    best_t, tid, u, v = final[0]
    return best_t, tid, u, v


def _traverse(scene, org, d, time, min_t, max_t, any_hit):
    f = lambda o, dd, tt, mn, mx: _traverse_one(scene, o, dd, tt, mn, mx, any_hit)
    return jax.vmap(f)(org, d, time, min_t, max_t)


def intersect_bvh(scene, org, d, time, min_t, max_t):
    best_t, tid, u, v = _traverse(scene, org, d, time, min_t, max_t, False)
    hit = jnp.isfinite(best_t)
    return hit, tid, jnp.where(hit, best_t, 0.0), u, v


def occluded_bvh(scene, org, d, time, min_t, max_t):
    best_t, _, _, _ = _traverse(scene, org, d, time, min_t, max_t, True)
    return jnp.isfinite(best_t)
