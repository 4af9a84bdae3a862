"""Film accumulation: scatter-add splats.

Replaces the reference's AtomicFloat CAS-loop splats (src/parallel.h:12-41,
src/image.h:66-77) with per-device scatter-adds; across devices the film is
psum-reduced by the parallel layer.
"""

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
        order = jnp.argsort(idx)
        flat = flat.at[idx[order]].add(vals[order], indices_are_sorted=True)
    else:
        flat = flat.at[idx].add(vals)
    return flat.reshape(buffer.shape)
