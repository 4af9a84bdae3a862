import numpy as np
import jax
import jax.numpy as jnp

from langevin_mcmc_tpu.mcmc import cache as cache_mod
from langevin_mcmc_tpu.options import Options


def _opts():
    return Options().replace(pss_max_size=64, pss_max_length=8)


def test_push_and_count():
    opts = _opts()
    Dm = 8
    c = cache_mod.make_cache(opts, Dm)
    rng = np.random.default_rng(0)
    C = 32
    dims = jnp.asarray(rng.choice([4, 6], C).astype(np.int32))
    pss = jnp.asarray(rng.random((C, Dm), np.float32))
    w = jnp.ones(C)
    mask = jnp.asarray(rng.random(C) < 0.7)
    c2 = cache_mod.push_batch(c, dims, pss, pss * 0.1, pss * 0.2, w, mask, opts)
    count = np.asarray(c2.count)
    m = np.asarray(mask)
    d = np.asarray(dims)
    assert count[4] == ((d == 4) & m).sum()
    assert count[6] == ((d == 6) & m).sum()
    assert count.sum() == m.sum()
    # entries are the pushed pss values (order may permute)
    stored = np.asarray(c2.pss[4, :count[4]])
    want = np.asarray(pss)[(d == 4) & m]
    assert np.allclose(np.sort(stored[:, 0]), np.sort(want[:, 0]))


def test_query_knn_interpolates():
    opts = _opts()
    Dm = 8
    c = cache_mod.make_cache(opts, Dm)
    # fill dim 4 row with a grid; v1 = f(pss)
    n = 64
    rng = np.random.default_rng(1)
    pss = rng.random((n, Dm)).astype(np.float32)
    pss[:, 4:] = 0
    v1 = np.tile(pss[:, :1] * 10.0, (1, Dm)).astype(np.float32)
    c = cache_mod.push_batch(
        c, jnp.full(n, 4, jnp.int32), jnp.asarray(pss), jnp.asarray(v1),
        jnp.asarray(v1) * 2, jnp.ones(n), jnp.ones(n, bool), opts)
    assert int(c.count[4]) == n

    # query exactly at a stored point -> exact moments
    q = jnp.asarray(pss[:5])
    found, v1_q, v2_q = cache_mod.query_knn(
        c, jnp.full(5, 4, jnp.int32), q, opts, chunk=16)
    assert np.asarray(found).all()
    np.testing.assert_allclose(np.asarray(v1_q), v1[:5], rtol=2e-2, atol=1e-3)

    # query far away -> not found
    far = jnp.ones((1, Dm)) * jnp.asarray([[0.5] * Dm]) + 10.0
    found2, _, _ = cache_mod.query_knn(
        c, jnp.full(1, 4, jnp.int32), far, opts, chunk=16)
    assert not bool(found2[0])


def test_eval_pdf_cache_normalizes():
    """KDE over a full row of uniform points should approximate 1 on the
    torus (density of U[0,1)^dim)."""
    opts = _opts().replace(pss_max_size=512)
    Dm = 8
    dim = 4
    c = cache_mod.make_cache(opts, Dm)
    rng = np.random.default_rng(2)
    n = 512
    pss = rng.random((n, Dm)).astype(np.float32)
    pss[:, dim:] = 0
    c = cache_mod.push_batch(
        c, jnp.full(n, dim, jnp.int32), jnp.asarray(pss), jnp.asarray(pss),
        jnp.asarray(pss), jnp.ones(n), jnp.ones(n, bool), opts)
    q = jnp.asarray(rng.random((64, Dm), np.float32))
    z = jnp.zeros(64, jnp.int32)
    pdf = np.asarray(cache_mod.eval_pdf_cache(
        c, jnp.full(64, dim, jnp.int32), q, z, z, opts, chunk=128))
    assert np.isfinite(pdf).all()
    assert abs(pdf.mean() - 1.0) < 0.3
    # querying with a non-matching (s,t) filters every entry out
    pdf_other = np.asarray(cache_mod.eval_pdf_cache(
        c, jnp.full(64, dim, jnp.int32), q, z + 3, z, opts, chunk=128))
    assert (pdf_other == 0.0).all()


def test_eval_pdf_cache_weighted_by_path_weight():
    """Kernels are weighted by pathWeight_i / score_sum
    (global_cache.h:156-160)."""
    opts = _opts().replace(pss_max_size=4)
    Dm = 4
    dim = 2
    c = cache_mod.make_cache(opts, Dm)
    pss = np.array([[0.2, 0.2, 0, 0],
                    [0.8, 0.8, 0, 0],
                    [0.5, 0.5, 0, 0],
                    [0.3, 0.7, 0, 0]], np.float32)
    w = np.array([10.0, 1.0, 1.0, 1.0], np.float32)
    c = cache_mod.push_batch(
        c, jnp.full(4, dim, jnp.int32), jnp.asarray(pss), jnp.asarray(pss),
        jnp.asarray(pss), jnp.asarray(w), jnp.ones(4, bool), opts)
    z = jnp.zeros(1, jnp.int32)
    q = jnp.asarray(pss[:1])
    pdf = float(cache_mod.eval_pdf_cache(
        c, jnp.full(1, dim, jnp.int32), q, z, z, opts)[0])
    # manual mixture
    sig = opts.cache_sig
    norm = 1.0 / (np.sqrt(2 * np.pi) * sig)
    acc = 0.0
    for i in range(4):
        d = np.abs(pss[i, :dim] - pss[0, :dim])
        d = np.minimum(d, 1 - d)
        acc += w[i] * norm ** dim * np.exp(-0.5 * np.sum((d / sig) ** 2))
    want = acc / w.sum()
    assert abs(pdf - want) / want < 1e-4


def test_sample_cache_weighted():
    opts = _opts()
    Dm = 8
    c = cache_mod.make_cache(opts, Dm)
    n = 64
    pss = np.random.default_rng(3).random((n, Dm)).astype(np.float32)
    w = np.full(n, 1e-3, np.float32)
    w[7] = 1e4  # nearly all weight on entry 7
    c = cache_mod.push_batch(
        c, jnp.full(n, 4, jnp.int32), jnp.asarray(pss), jnp.asarray(pss),
        jnp.asarray(pss), jnp.asarray(w), jnp.ones(n, bool), opts)
    idx, out, w_out, rec = cache_mod.sample_cache(
        c, jax.random.PRNGKey(0), jnp.full(16, 4, jnp.int32), opts)
    stored_w = np.asarray(c.weight[4])
    target = int(np.argmax(stored_w))
    assert (np.asarray(idx) == target).all()
    assert np.allclose(np.asarray(w_out), stored_w[target])
    assert rec is None


def test_cache_stores_path_records():
    from langevin_mcmc_tpu.path.records import empty_record
    opts = _opts().replace(pss_max_size=8)
    Dm = 8
    proto = jax.tree.map(lambda a: a, empty_record((), 4))
    c = cache_mod.make_cache(opts, Dm, rec_proto=proto)
    n = 8
    rng = np.random.default_rng(4)
    pss = jnp.asarray(rng.random((n, Dm), np.float32))
    rec = empty_record((n,), 4)
    rec = jax.tree.map(
        lambda a: (a + jnp.arange(n).astype(
            jnp.int32 if a.dtype == bool else a.dtype).reshape(
            (n,) + (1,) * (a.ndim - 1)).astype(a.dtype)), rec)
    c = cache_mod.push_batch(
        c, jnp.full(n, 4, jnp.int32), pss, pss, pss, jnp.ones(n),
        jnp.ones(n, bool), opts, s_tag=jnp.full(n, 2, jnp.int32),
        t_tag=jnp.full(n, 1, jnp.int32), rec=rec)
    idx, out, w_out, rec_out = cache_mod.sample_cache(
        c, jax.random.PRNGKey(1), jnp.full(4, 4, jnp.int32), opts)
    # the stored record time field equals the lane index it was pushed from
    stored_time = np.asarray(c.rec.time[4, :n])
    assert sorted(stored_time.tolist()) == list(range(n))
    got = np.asarray(rec_out.time)
    assert np.allclose(got, stored_time[np.asarray(idx)])
