"""shard_map multi-chip step + per-device cache merge (parallel/shardmap_step).

Runs on the virtual 8-device CPU mesh (conftest)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langevin_mcmc_tpu.mcmc.cache import GlobalCache, make_cache, push_batch
from langevin_mcmc_tpu.options import Options
from langevin_mcmc_tpu.parallel.shardmap_step import merge_stacked


def _opts(**kw):
    return Options(**kw)


def _np_merge(stacked, prev_count):
    """Reference merge in plain numpy: common prefix + device tails in
    device order, capped at SIZE."""
    S, ndim, size = stacked['weight'].shape
    out = {k: np.array(v[0]) for k, v in stacked.items() if k != 'count'}
    new_count = np.zeros(ndim, np.int32)
    for d in range(ndim):
        pos = int(prev_count[d])
        for s in range(S):
            cs = int(stacked['count'][s, d])
            for p in range(int(prev_count[d]), cs):
                if pos >= size:
                    break
                for k in out:
                    if k == 'score_sum':
                        continue
                    out[k][d, pos] = stacked[k][s, d, p]
                pos += 1
        new_count[d] = pos
    score = np.array([out['weight'][d, :new_count[d]].sum()
                      for d in range(ndim)])
    return out, new_count, score


def test_merge_stacked_matches_numpy():
    rng = np.random.default_rng(0)
    S, ndim, size, Dm = 4, 5, 16, 3
    prev = np.array([0, 2, 16, 5, 1], np.int32)
    # per-device counts >= prev (devices only append)
    counts = np.stack([prev + rng.integers(0, 6, ndim).astype(np.int32)
                       for _ in range(S)])
    counts = np.minimum(counts, size)
    base = rng.random((ndim, size, Dm)).astype(np.float32)
    stacked = dict(
        pss=np.broadcast_to(base, (S, ndim, size, Dm)).copy(),
        v1=rng.random((S, ndim, size, Dm)).astype(np.float32),
        v2=rng.random((S, ndim, size, Dm)).astype(np.float32),
        weight=rng.random((S, ndim, size)).astype(np.float32) + 0.1,
        s_tag=rng.integers(0, 5, (S, ndim, size)).astype(np.int32),
        t_tag=rng.integers(0, 5, (S, ndim, size)).astype(np.int32),
        count=counts)
    # the common prefix must be identical across devices
    for k in ('pss', 'v1', 'v2', 'weight', 's_tag', 't_tag'):
        for d in range(ndim):
            stacked[k][:, d, :prev[d]] = stacked[k][0, d, :prev[d]]

    cache = GlobalCache(
        pss=jnp.asarray(stacked['pss']), v1=jnp.asarray(stacked['v1']),
        v2=jnp.asarray(stacked['v2']),
        weight=jnp.asarray(stacked['weight']),
        s_tag=jnp.asarray(stacked['s_tag']),
        t_tag=jnp.asarray(stacked['t_tag']),
        count=jnp.asarray(stacked['count']),
        score_sum=jnp.zeros((S, ndim)), rec=None)
    merged = merge_stacked(cache, jnp.asarray(prev))

    want, want_count, want_score = _np_merge(stacked, prev)
    np.testing.assert_array_equal(np.asarray(merged.count), want_count)
    for d in range(ndim):
        n = want_count[d]
        np.testing.assert_allclose(np.asarray(merged.pss)[d, :n],
                                   want['pss'][d, :n], rtol=1e-6,
                                   err_msg=f'dim {d}')
        np.testing.assert_allclose(np.asarray(merged.weight)[d, :n],
                                   want['weight'][d, :n], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(merged.s_tag)[d, :n],
                                      want['s_tag'][d, :n])
    np.testing.assert_allclose(np.asarray(merged.score_sum), want_score,
                               rtol=1e-5)


def test_merge_then_push_roundtrip():
    """A merge's output must accept further pushes exactly like a cache
    that was filled directly (the drivers re-stack and keep pushing)."""
    opts = _opts(pss_min_length=2, pss_max_length=6, pss_max_size=8,
                 pss_knn=3)
    Dm = 4
    S = 2
    c0 = make_cache(opts, Dm)
    key = jax.random.PRNGKey(1)
    dims = jnp.full((6,), 4, jnp.int32)
    mask = jnp.ones(6, bool)
    per_dev = []
    for s in range(S):
        pss = jax.random.uniform(jax.random.fold_in(key, s), (6, Dm))
        per_dev.append(push_batch(c0, dims, pss, pss * 2, pss * 3,
                                  jnp.ones(6), mask, opts))
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *per_dev)
    merged = merge_stacked(stacked, jnp.zeros(7, jnp.int32))
    # 6 + 6 pushes into a size-8 row -> capped at 8
    assert int(merged.count[4]) == 8
    assert np.isclose(float(merged.score_sum[4]), 8.0)
    # row 4 holds dev0's 6 entries then dev1's first 2
    np.testing.assert_allclose(np.asarray(merged.pss[4, :6]),
                               np.asarray(per_dev[0].pss[4, :6]), rtol=0)
    np.testing.assert_allclose(np.asarray(merged.pss[4, 6:8]),
                               np.asarray(per_dev[1].pss[4, :2]), rtol=0)


@pytest.mark.slow
def test_sharded_multi_step_runs():
    """The production shard_map step executes on the 8-device CPU mesh and
    the per-device iteration counter proves every scan ran."""
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
