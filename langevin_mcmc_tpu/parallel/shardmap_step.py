"""Explicit per-device MCMC step via jax.shard_map + per-device caches.

The GSPMD-partitioned step (jit over sharded global arrays) left a ~60%
multi-device overhead (MULTICHIP_r03): the sparse-large argsort runs as a
cross-device sort, and the replicated GlobalCache turns every push_batch
into a cross-device gather. Under shard_map the per-device program is
LOCAL by construction — each device runs the full single-chip step on its
C/S chain slice, with its own film accumulator and its own cache shard:

  * chains: data-parallel, C/S lanes per device (the reference's analogue
    is 32 independent worker threads, src/parallel.cpp:82-155);
  * film: per-device [H, W, 3] partials, ONE cross-device reduce at the
    end of the run (the reference merges per-thread splats via
    AtomicFloat; a single deferred psum is the batched equivalent);
  * global PSS cache: PER-DEVICE caches, merged every merge_every fused
    dispatches (merge_stacked below). The reference's pushes happen under
    one mutex per dimension in arbitrary thread order
    (global_cache.h:237-291 insert; mlt.cpp:120-127 call sites), so entry
    arrival order is already unspecified — delaying cross-device
    visibility by N steps only reorders the arrival sequence, which
    permutes the cache contents exactly like a different thread schedule
    would. Statistically equivalent, and the per-step push stays local.

The only cross-device op inside the step is a pmin of the on-device
iteration counter (bench self-validation).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _specs_like(tree, axis='chains'):
    """P(axis) for every array leaf (all leaves carry a leading sharded
    axis: [C, ...] chain state or [S, ...] stacked per-device cache)."""
    return jax.tree.map(lambda _: P(axis), tree)


def stack_cache(mesh, cache, n_dev):
    """Broadcast one cache to a [S, ...]-stacked per-device cache sharded
    over the mesh (each device holds one identical copy to start)."""
    stacked = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape), cache)
    return jax.device_put(
        stacked, jax.tree.map(lambda _: NamedSharding(mesh, P('chains')),
                              stacked))


def merge_stacked(stacked, prev_count):
    """Merge S per-device caches that share a common prefix of prev_count
    entries per dimension row (the state at the last merge): the merged
    row is [common prefix | dev0 tail | dev1 tail | ...], capped at SIZE.

    Pure jnp — jit it with the stacked cache sharded P('chains') and the
    output replicated; XLA inserts ONE all_gather. score_sum is recomputed
    as the sum of surviving entry weights (its invariant in the reference:
    pushes stop when the row is full, global_cache.h:85-92, so scoreSum
    always equals the sum of stored pathWeights).

    Returns a merged (unstacked) GlobalCache."""
    from ..mcmc.cache import GlobalCache

    counts = stacked.count                       # [S, NDIM]
    S, ndim = counts.shape
    size = stacked.weight.shape[2]
    prev = prev_count                            # [NDIM]
    tails = jnp.maximum(counts - prev[None], 0)  # [S, NDIM]
    offs = prev[None] + jnp.cumsum(tails, 0) - tails   # [S, NDIM]
    new_count = jnp.minimum(prev + tails.sum(0), size)

    p = jnp.arange(size)                         # [SIZE]
    # source device for each merged position: the last s with offs <= p
    dev_sel = jnp.clip(
        jnp.sum((offs[:, :, None] <= p[None, None, :]), 0) - 1,
        0, S - 1)                                # [NDIM, SIZE]
    off_sel = jnp.take_along_axis(
        offs.transpose(1, 0), dev_sel, 1)        # [NDIM, SIZE]
    src_pos = prev[:, None] + p[None, :] - off_sel
    src_pos = jnp.clip(src_pos, 0, size - 1)
    cnt_sel = jnp.take_along_axis(counts.transpose(1, 0), dev_sel, 1)
    is_new = ((p[None, :] >= prev[:, None])
              & (p[None, :] < new_count[:, None])
              & (prev[:, None] + p[None, :] - off_sel < cnt_sel))
    dim_ix = jnp.arange(ndim)[:, None]

    def gather(leaf):
        # leaf [S, NDIM, SIZE, ...]; prefix (p < prev) comes from dev 0
        new_vals = leaf[dev_sel, dim_ix, src_pos]
        old_vals = leaf[0]
        m = is_new
        extra = leaf.ndim - 3
        if extra:
            m = m.reshape(m.shape + (1,) * extra)
        return jnp.where(m, new_vals, old_vals)

    new_w = gather(stacked.weight)
    valid = p[None, :] < new_count[:, None]
    merged = GlobalCache(
        pss=gather(stacked.pss), v1=gather(stacked.v1),
        v2=gather(stacked.v2), weight=new_w,
        s_tag=gather(stacked.s_tag), t_tag=gather(stacked.t_tag),
        count=new_count,
        score_sum=jnp.sum(jnp.where(valid, new_w, 0.0), 1),
        rec=(jax.tree.map(gather, stacked.rec)
             if stacked.rec is not None else None))
    return merged


def make_sharded_multi_step(mesh, scene, opts, normalization, ls_prob,
                            n_inner, length_dist=None, banked_example=None):
    """Build the jitted shard_map multi-step over `mesh`.

    opts.num_chains is the GLOBAL chain count; each device runs the
    single-chip fused multi-step on its num_chains/S slice. Call as
    step(key, banked, films, init_banked) with
      banked.state/bank_* leaves [C, ...] sharded P('chains'),
      banked.cache leaves [S, ...]-stacked (stack_cache) or None,
      films [S, H, W, 3] sharded P('chains').
    Returns (banked, films, n_done) with n_done replicated
    (= n_inner when every device executed every scan iteration)."""
    from ..integrators import mlt

    n_dev = int(mesh.devices.size)
    C = opts.num_chains
    assert C % n_dev == 0, (C, n_dev)
    local_opts = opts.replace(num_chains=C // n_dev)
    step = mlt.make_mlt_multi_step(scene, local_opts, normalization,
                                   ls_prob, n_inner,
                                   length_dist=length_dist)

    def body(key, banked, films, init_banked):
        # per-device RNG stream; chains already differ per lane, this
        # differentiates the per-device shared draws (kernel choices)
        key = jax.random.fold_in(key, jax.lax.axis_index('chains'))
        cache = banked.cache
        local = dataclasses.replace(
            banked,
            cache=(jax.tree.map(lambda a: a[0], cache)
                   if cache is not None else None))
        out, film, nd = step(key, local, films[0], init_banked)
        out = dataclasses.replace(
            out,
            cache=(jax.tree.map(lambda a: a[None], out.cache)
                   if out.cache is not None else None))
        # pmin: every device must have completed all n_inner iterations
        return out, film[None], jax.lax.pmin(nd, 'chains')

    def specs(banked):
        return dataclasses.replace(
            _specs_like(banked),
            cache=(_specs_like(banked.cache)
                   if banked.cache is not None else None))

    assert banked_example is not None, \
        'banked_example (post attach/stack) is needed to build in_specs'
    b_spec = specs(banked_example)
    init_spec = dataclasses.replace(b_spec, cache=None)
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(), b_spec, P('chains'), init_spec),
                       out_specs=(b_spec, P('chains'), P()),
                       check_vma=False)
    return jax.jit(fn)


def make_cache_merger(mesh, cache_example):
    """Jitted periodic cache merge: stacked per-device caches in (sharded),
    merged cache out, re-stacked + re-sharded. Returns
    merge(stacked_cache, prev_count) -> (stacked_cache, new_count)."""
    n_dev = int(mesh.devices.size)
    shard = jax.tree.map(
        lambda _: NamedSharding(mesh, P('chains')), cache_example)

    @partial(jax.jit, out_shardings=(shard, None))
    def merge(stacked, prev_count):
        merged = merge_stacked(stacked, prev_count)
        restacked = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape), merged)
        return restacked, merged.count

    return merge
