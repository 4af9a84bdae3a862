"""Global PSS cache: per-dimension moment store with kNN interpolation.

Replaces reference src/global_cache.h:8-559 (nanoflann kd-trees + one mutex
per dimension) TPU-natively:

  * storage is a dense [NDIM, SIZE, Dm] ring of (pss, v1, v2) plus path
    weights (and, when cache sampling is enabled, the full frozen path
    records), one row per PSS dimension 2..pss_max_length;
  * inserts are batched: each MLT step's accepted large-step chains are
    scattered into their dimension's row at positions count+rank (the
    reference pushes under a per-dim mutex from the accept branch,
    mlt.cpp:122-127 — a batched scatter is the lock-free equivalent; entry
    order within a step differs, which only permutes the cache);
  * queries are brute-force radius-kNN over the dimension row (k=5,
    radius^2 = dim * PSS_QUERY_DIST^2, global_cache.h:96-124; nanoflann
    returns SQUARED L2 distances, so the reference weight
    inverse(dist*dist + 1e-6) is 1/(d^4 + 1e-6)). At SIZE=3000 a dense
    [C, SIZE] distance sweep is a single fused matmul+reduce — faster on
    TPU than any tree;
  * the KDE proposal pdf (evalPdfCache, global_cache.h:139-163) is a
    torus-wrapped Gaussian mixture over same-(s,t) entries, each kernel
    weighted by pathWeight_i / score_sum.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import vecmath as vm


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields,
                                            meta_fields=[])


@_register
@dataclasses.dataclass(frozen=True)
class GlobalCache:
    pss: jnp.ndarray      # [NDIM, SIZE, Dm]
    v1: jnp.ndarray       # [NDIM, SIZE, Dm]
    v2: jnp.ndarray       # [NDIM, SIZE, Dm]
    weight: jnp.ndarray   # [NDIM, SIZE] pathWeight (KDE weights + sampling)
    s_tag: jnp.ndarray    # [NDIM, SIZE] int32 camDepth of the entry
    t_tag: jnp.ndarray    # [NDIM, SIZE] int32 lightDepth of the entry
    count: jnp.ndarray    # [NDIM] int32
    score_sum: jnp.ndarray  # [NDIM] running sum of pushed weights
    rec: object = None    # PathRecord pytree [NDIM, SIZE, ...] | None

    @property
    def size(self):
        return self.pss.shape[1]

    def is_ready(self, dim_idx):
        """is_ready flips when the row is full (global_cache.h:85-92)."""
        return self.count[dim_idx] >= self.size


def make_cache(opts, max_dim, rec_proto=None):
    """rec_proto: an unbatched PathRecord prototype (e.g. empty_record((), D))
    — pass it to enable path storage for sampleCache/LargeStepCache."""
    ndim = opts.pss_max_length + 1          # rows indexed by dim directly
    size = opts.pss_max_size
    z = jnp.zeros((ndim, size, max_dim))
    rec = None
    if rec_proto is not None:
        rec = jax.tree.map(
            lambda a: jnp.zeros((ndim, size) + a.shape, a.dtype), rec_proto)
    return GlobalCache(pss=z, v1=z, v2=z,
                       weight=jnp.zeros((ndim, size)),
                       s_tag=jnp.zeros((ndim, size), jnp.int32),
                       t_tag=jnp.zeros((ndim, size), jnp.int32),
                       count=jnp.zeros(ndim, jnp.int32),
                       score_sum=jnp.zeros(ndim), rec=rec)


def push_batch(cache: GlobalCache, dims, pss, v1, v2, weight, mask, opts,
               s_tag=None, t_tag=None, rec=None):
    """Scatter a batch of chain entries into their dimension rows.

    dims [C] int32; pss/v1/v2 [C, Dm]; weight [C]; mask [C] bool
    (accepted-large-step-with-buffered-moments, mlt.cpp:120-127).
    Returns the updated cache."""
    ndim, size = cache.weight.shape
    ok = (mask & (dims >= opts.pss_min_length)
          & (dims <= opts.pss_max_length)
          & (weight > 1e-10)
          & (cache.count[jnp.clip(dims, 0, ndim - 1)] < size))
    d = jnp.clip(dims, 0, ndim - 1)
    # rank within this step per dimension: count strictly-before same-dim
    # occurrences. Sort-based (O(C log C)) — the naive [C, C] comparison
    # matrix costs 1 GB of HBM traffic per step at 16k chains.
    C = dims.shape[0]
    okd = jnp.where(ok, d, ndim)                 # invalid lanes sort last
    order = jnp.argsort(okd * C + jnp.arange(C))  # stable by construction
    ds = okd[order]
    pos = jnp.arange(C)
    is_start = jnp.concatenate([jnp.ones(1, bool), ds[1:] != ds[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0))
    rank = jnp.zeros(C, jnp.int32).at[order].set(
        (pos - seg_start).astype(jnp.int32), unique_indices=True)
    pos = cache.count[d] + rank
    ok = ok & (pos < size)
    # OOB positions drop; keep them distinct so unique_indices stays honest
    flat_idx = jnp.where(ok, d * size + pos, ndim * size + jnp.arange(C))

    def scat(buf, val):
        flat = buf.reshape((ndim * size,) + buf.shape[2:])
        flat = flat.at[flat_idx].set(val, mode='drop', unique_indices=True)
        return flat.reshape(buf.shape)

    new_pss = scat(cache.pss, pss)
    new_v1 = scat(cache.v1, v1)
    new_v2 = scat(cache.v2, v2)
    new_w = scat(cache.weight, weight)
    zero_i = jnp.zeros(C, jnp.int32)
    new_s = scat(cache.s_tag, zero_i if s_tag is None else s_tag)
    new_t = scat(cache.t_tag, zero_i if t_tag is None else t_tag)
    new_rec = cache.rec
    if cache.rec is not None and rec is not None:
        new_rec = jax.tree.map(scat, cache.rec, rec)
    # [C] -> [NDIM] histogram via one-hot reduce: a conflicting scatter-add
    # serializes on TPU (~85 ns/lane); the dense [C, NDIM] reduce is free
    onehot = (d[:, None] == jnp.arange(ndim)[None, :])
    add = jnp.sum(onehot & ok[:, None], 0).astype(jnp.int32)
    add_w = jnp.sum(jnp.where(onehot, jnp.where(ok, weight, 0.0)[:, None],
                              0.0), 0)
    return GlobalCache(pss=new_pss, v1=new_v1, v2=new_v2, weight=new_w,
                       s_tag=new_s, t_tag=new_t,
                       count=jnp.minimum(cache.count + add, size),
                       score_sum=cache.score_sum + add_w, rec=new_rec)


def _chunk_bounds(ci, chunk, size):
    """Clamped dynamic-slice start + per-position validity vs overlap.

    dynamic_slice clamps start to size-chunk; positions already covered by
    the previous chunk must be masked out or they are counted twice."""
    s = ci * chunk
    s_cl = jnp.minimum(s, size - chunk)
    idx = s_cl + jnp.arange(chunk)          # [chunk] global positions
    fresh = idx >= s                        # not covered by earlier chunks
    return s_cl, idx, fresh


def query_knn(cache: GlobalCache, dims, pss, opts, chunk=2048):
    """Radius-kNN moment interpolation (global_cache.h:96-124).

    MXU formulation (VERDICT r3 item 7): the per-lane row gather
    ([C, chunk, Dm] — ~1 GB of HBM traffic per chunk at 16k chains) is
    replaced by ONE matmul per chunk over a flattened pre-masked store:
    with every entry pre-masked to its own row's dimensionality
    (e~ = e * mask_r) and the query masked to the lane's (q~ = q * mask_d),
    ||q~ - e~||^2 = |q~|^2 - 2 q~.e~ + |e~|^2 is exact for same-row pairs,
    and cross-row candidates are inf-masked by the entry's row tag before
    the top-k merge.

    Returns (found [C] bool, v1 [C, Dm], v2 [C, Dm])."""
    ndim, size = cache.weight.shape
    flat_n = ndim * size
    chunk = min(chunk, flat_n)
    Dm = pss.shape[-1]
    C = pss.shape[0]
    d = jnp.clip(dims, 0, ndim - 1)
    k = opts.pss_knn
    radius_sq = dims.astype(jnp.float32) * opts.pss_query_dist ** 2
    dim_mask = (jnp.arange(Dm)[None, :] < dims[:, None]).astype(jnp.float32)
    q = pss * dim_mask                       # q~ [C, Dm]
    q2 = jnp.sum(q * q, -1)                  # [C]

    row_mask = (jnp.arange(Dm)[None, :]
                < jnp.arange(ndim)[:, None]).astype(jnp.float32)
    e_flat = (cache.pss * row_mask[:, None, :]).reshape(flat_n, Dm)
    e2_flat = jnp.sum(e_flat * e_flat, -1)   # [flat_n]
    row_tag = jnp.repeat(jnp.arange(ndim, dtype=jnp.int32), size)
    pos_in_row = jnp.tile(jnp.arange(size, dtype=jnp.int32), ndim)
    live = pos_in_row < cache.count[row_tag]          # [flat_n]

    nchunk = -(-flat_n // chunk)

    def body(carry, ci):
        best_d, best_i = carry               # [C, k]
        s = ci * chunk
        s_cl = jnp.minimum(s, flat_n - chunk)
        idx = s_cl + jnp.arange(chunk)
        fresh = idx >= s                     # not covered by earlier chunks
        e_c = jax.lax.dynamic_slice_in_dim(e_flat, s_cl, chunk, 0)
        # documented deviation (ADVICE r4): |q|^2 - 2 q.e + |e|^2 in f32
        # cancels catastrophically for near-zero distances (~1e-6 absolute
        # error vs the reference's subtract-then-square), which can flip
        # the radius test / kNN weights for coincident entries. Accepted:
        # the moments feed a PROPOSAL preconditioner only — MH acceptance
        # keeps the chain exact for any deterministic interpolation rule —
        # and exact re-evaluation would cost a [C, k, Dm] gather per query
        dist = (q2[:, None]
                - 2.0 * (q @ e_c.T)          # the MXU matmul [C, chunk]
                + e2_flat[idx][None, :])
        valid = (fresh & live[idx])[None, :] \
            & (row_tag[idx][None, :] == d[:, None])
        dist = jnp.where(valid, jnp.maximum(dist, 0.0), jnp.inf)
        all_d = jnp.concatenate([best_d, dist], 1)
        all_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(idx[None], (C, chunk))], 1)
        neg_top, sel = jax.lax.top_k(-all_d, k)
        return (-neg_top, jnp.take_along_axis(all_i, sel, 1)), None

    init = (jnp.full((C, k), jnp.inf), jnp.zeros((C, k), jnp.int32))
    (top_d, top_i), _ = jax.lax.scan(body, init, jnp.arange(nchunk))

    in_r = top_d <= radius_sq[:, None]
    found = jnp.any(in_r, 1)
    # nanoflann hands back squared distances; the reference then weights by
    # inverse(dist * dist + 1e-6) => 1 / (d_sq^2 + 1e-6)
    # (global_cache.h:108-121)
    w = jnp.where(in_r, 1.0 / (jnp.square(top_d) + 1e-6), 0.0)
    wsum = jnp.maximum(jnp.sum(w, 1), 1e-30)
    v1_e = cache.v1.reshape(flat_n, Dm)[top_i]        # [C, k, Dm]
    v2_e = cache.v2.reshape(flat_n, Dm)[top_i]
    v1 = jnp.einsum('ck,ckd->cd', w, v1_e) / wsum[:, None]
    v2 = jnp.einsum('ck,ckd->cd', w, v2_e) / wsum[:, None]
    return found, v1, v2


def eval_pdf_cache(cache: GlobalCache, dims, pss, s, t, opts, chunk=1024):
    """Torus-wrapped Gaussian-KDE pdf over same-(s,t) entries of the
    dimension row, each kernel weighted by pathWeight_i / score_sum
    (evalPdfCache, global_cache.h:139-163)."""
    ndim, size = cache.weight.shape
    chunk = min(chunk, size)
    Dm = pss.shape[-1]
    C = pss.shape[0]
    d = jnp.clip(dims, 0, ndim - 1)
    sig = opts.cache_sig
    dim_mask = (jnp.arange(Dm)[None, :] < dims[:, None]).astype(jnp.float32)
    log_norm_1d = -0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(sig)
    nchunk = -(-size // chunk)

    def body(acc, ci):
        s_cl, idx, fresh = _chunk_bounds(ci, chunk, size)
        e = jax.lax.dynamic_slice_in_dim(cache.pss, s_cl, chunk, 1)[d]
        w_e = jax.lax.dynamic_slice_in_dim(cache.weight, s_cl, chunk, 1)[d]
        s_e = jax.lax.dynamic_slice_in_dim(cache.s_tag, s_cl, chunk, 1)[d]
        t_e = jax.lax.dynamic_slice_in_dim(cache.t_tag, s_cl, chunk, 1)[d]
        diff = jnp.abs(e - pss[:, None, :])
        diff = jnp.minimum(diff, 1.0 - diff)          # torus wrap
        log_k = -0.5 * jnp.square(diff / sig) + log_norm_1d
        log_k = jnp.where(dim_mask[:, None, :] > 0, log_k, 0.0)
        kern = jnp.exp(jnp.sum(log_k, -1))            # [C, chunk]
        valid = (fresh[None, :] & (idx[None, :] < cache.count[d][:, None])
                 & (s_e == s[:, None]) & (t_e == t[:, None]))
        return acc + jnp.sum(jnp.where(valid, kern * w_e, 0.0), 1), None

    acc, _ = jax.lax.scan(body, jnp.zeros(C), jnp.arange(nchunk))
    return acc / jnp.maximum(cache.score_sum[d], 1e-30)


def sample_cache(cache: GlobalCache, key, dims, opts):
    """Draw a stored entry index by pathWeight CDF for each lane
    (sampleCache, global_cache.h:126-137).

    Returns (idx [C], pss [C, Dm], weight [C], rec-or-None)."""
    ndim, size = cache.weight.shape
    d = jnp.clip(dims, 0, ndim - 1)
    w = cache.weight[d]                       # [C, SIZE]
    valid = jnp.arange(size)[None, :] < cache.count[d][:, None]
    w = jnp.where(valid, w, 0.0)
    cdf = jnp.cumsum(w, 1)
    total = cdf[:, -1:]
    u = jax.random.uniform(key, (d.shape[0], 1)) * total
    idx = jnp.sum((cdf <= u).astype(jnp.int32), 1)
    idx = jnp.clip(idx, 0, size - 1)
    rec = None
    if cache.rec is not None:
        rec = jax.tree.map(lambda a: a[d, idx], cache.rec)
    return idx, cache.pss[d, idx], cache.weight[d, idx], rec
