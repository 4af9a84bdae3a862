"""Film accumulation: scatter-add splats.

Replaces the reference's AtomicFloat CAS-loop splats (src/parallel.h:12-41,
src/image.h:66-77) with per-device scatter-adds; across devices the film is
psum-reduced by the parallel layer.
"""

import jax
import jax.numpy as jnp


def splat(buffer, screen_pos, contrib, mask=None, sort=None, shard_idx=None):
    """Splat contribs [...,3] at screen_pos [...,2] (in [0,1)) into
    buffer [H,W,3] (or [S,H,W,3] with shard_idx, see below). Matches
    reference Splat (image.h:66-77): nearest-pixel box filter, clamped,
    non-finite contributions dropped.

    sort: pre-sort the points by pixel before the scatter-add. XLA's TPU
    scatter with unsorted conflicting indices serializes (~85 ns/point
    measured on v5e: 700k points = 59 ms); the same scatter on sorted
    indices runs at memory speed (0.06 ms), and the argsort+gather cost is
    ~0.1 ms — a ~500x difference. Default: sort when there are >= 8192
    points.

    shard_idx: optional flat [...] int32 per-point film-shard ids for a
    [S,H,W,3] buffer of per-device partial films. Each point lands in its
    lane's shard, so with chains and the shard axis co-sharded over the
    device mesh every scatter stays device-local; the cross-device reduce
    is the caller's single films.sum(0) at the end of the run.
    """
    sharded = buffer.ndim == 4
    h, w = (buffer.shape[1], buffer.shape[2]) if sharded \
        else (buffer.shape[0], buffer.shape[1])
    ix = jnp.clip((screen_pos[..., 0] * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip((screen_pos[..., 1] * h).astype(jnp.int32), 0, h - 1)
    finite = jnp.all(jnp.isfinite(contrib), -1)
    if mask is not None:
        finite &= mask
    contrib = jnp.where(finite[..., None], contrib, 0.0)
    flat = buffer.reshape(-1, 3)
    idx = (iy * w + ix).reshape(-1)
    if sharded:
        assert shard_idx is not None, '[S,H,W,3] buffer needs shard_idx'
        idx = idx + shard_idx.reshape(-1) * (h * w)
    vals = contrib.reshape(-1, 3)
    if sort is None:
        sort = idx.size >= 8192
    if sort:
        flat = _sorted_segment_splat(flat, idx, vals)
    else:
        flat = flat.at[idx].add(vals)
    return flat.reshape(buffer.shape)


def _sorted_segment_splat(flat, idx, vals):
    """Sort points by pixel, tree-reduce each duplicate run, scatter ONCE
    per unique pixel with globally unique indices.

    The r5 trace showed the sorted scatter-add still runs at the
    serialized ~88 ns/point rate (indices_are_sorted buys nothing for the
    add combiner on this backend): 55 ms/step for ~620k points
    (profiles/PROFILE_r05.md). This path costs sort + log2(n) strided
    segmented-add sweeps + one fully-vectorized scatter:

      * lax.sort carries the values with the keys (no post-sort gathers);
      * an inclusive SEGMENTED tree scan (stride-doubling adds gated on
        equal keys) leaves each duplicate run's total at its last element;
      * non-last rows are redirected to unique scratch rows past the film
        so every scatter index is unique -> XLA's vectorized scatter path.
    """
    n = idx.shape[0]
    npix = flat.shape[0]
    idx_s, r, g, b = jax.lax.sort(
        (idx, vals[:, 0], vals[:, 1], vals[:, 2]), num_keys=1)
    v = jnp.stack([r, g, b], -1)
    # inclusive segmented sum: after ceil(log2 n) rounds, element i holds
    # the sum of its run's elements <= i; the run's LAST element holds the
    # full run total
    s = 1
    while s < n:
        same = jnp.concatenate(
            [jnp.zeros((s,), bool), idx_s[s:] == idx_s[:-s]])
        shifted = jnp.concatenate([jnp.zeros((s, 3), v.dtype), v[:-s]])
        v = v + jnp.where(same[:, None], shifted, 0.0)
        s *= 2
    is_last = jnp.concatenate([idx_s[:-1] != idx_s[1:],
                               jnp.ones((1,), bool)])
    # unique scatter targets: run totals go to their pixel, everything
    # else to its own private scratch row. scatter-SET (not add): the add
    # combiner stays serialized even with unique indices on this backend
    # (measured 29 ms/step; set+gather runs vectorized) — the old value is
    # gathered and pre-added instead
    tgt = jnp.where(is_last, idx_s, npix + jnp.arange(n))
    old = flat[jnp.minimum(idx_s, npix - 1)]
    v_set = jnp.where(is_last[:, None], v + old, 0.0)
    out = jnp.concatenate([flat, jnp.zeros((n, 3), flat.dtype)], 0)
    out = out.at[tgt].set(v_set, unique_indices=True)
    return out[:npix]
