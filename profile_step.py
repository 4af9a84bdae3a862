#!/usr/bin/env python3
"""Loop-amortized MLT step profile on the real TPU.

A fixed ~25 ms per-dispatch overhead through the device tunnel poisons
single-call timings, so every piece is measured as N iterations inside one
jitted lax.scan and divided.

env: PROF_DEPTH (default 8), PROF_RAYS (default 16384), PROF_N (loop len).
"""
import os
import sys
import time
import json

import jax
import jax.numpy as jnp
import numpy as np

from langevin_mcmc_tpu.utils.compilecache import enable as enable_cache
enable_cache()

from langevin_mcmc_tpu.scene.parse import parse_scene


def timeit(fn, *args, n=3):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n, out


def loop_ms(f, state0, length, key=jax.random.PRNGKey(42)):
    """Per-iteration ms of f(key_i, state) -> state inside one jit."""
    def g(state):
        keys = jax.random.split(key, length)

        def body(c, k):
            return f(k, c), ()
        c, _ = jax.lax.scan(body, state, keys)
        return c
    dt, _ = timeit(jax.jit(g), state0)
    return dt * 1e3 / length


def main():
    D = int(os.environ.get('PROF_DEPTH', '8'))
    R = int(os.environ.get('PROF_RAYS', '16384'))
    N = int(os.environ.get('PROF_N', '20'))
    film_wh = None if D == 8 else (256, 192)
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml',
                                 film_wh=film_wh)
    # match bench.py's config exactly: the bootstrap normalization is a
    # baked constant, so identical init sampling => identical step
    # program => persistent-cache hit on the full-step piece
    opts = opts.replace(max_depth=D, num_chains=R,
                        num_init_samples=65536 if D == 8 else 32768,
                        mala=True)
    key = jax.random.PRNGKey(0)
    print(f'torus: depth={D}, chains={R}, film={scene.width}x{scene.height}',
          file=sys.stderr)
    results = {'depth': D, 'chains': R}
    only = set(filter(None, os.environ.get('PROF_ONLY', '').split(',')))
    want = lambda name: not only or name in only

    from langevin_mcmc_tpu.integrators import mlt
    from langevin_mcmc_tpu.mcmc import chain as chain_mod
    from langevin_mcmc_tpu.path import replay

    t0 = time.time()
    b, length_dist, banked = mlt.bootstrap(scene, opts, key, chunk=4096)
    results['bootstrap_s'] = round(time.time() - t0, 1)
    print(f"bootstrap: {results['bootstrap_s']} s", file=sys.stderr)
    state = mlt.attach_cache(banked, opts)
    cs = state.state

    # frozen replay grad
    def grad_once(k, rec):
        g = replay.path_grad(scene, opts, rec)
        # fold the grad back into a record field so iterations chain
        return rec.replace_time(rec.time + 0.0 * g[:, 0]) \
            if hasattr(rec, 'replace_time') else \
            jax.tree_util.tree_map(lambda x: x, rec)
    # simpler: time K grads of perturbed pss offsets.
    # NOTE the carry-dependent time shift: with a loop-invariant rec, XLA
    # hoists the whole gradient out of the scan and the "per-iteration"
    # number is off by 8x (observed: 15 ms "per pass" vs ~120 ms real).
    import dataclasses as _dc2

    def grad_loop(rec):
        def body(c, i):
            r = _dc2.replace(rec, time=rec.time + c * 1e-20)
            g = replay.path_grad(scene, opts, r)
            return c + jnp.sum(g) * 1e-20, ()
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
        return c
    if want('grad'):
        dt, _ = timeit(jax.jit(grad_loop), cs.rec)
        results['frozen_grad_ms'] = round(dt * 1e3 / 8, 2)
        print(f"frozen grad: {results['frozen_grad_ms']} ms", file=sys.stderr)

    # perturb replay
    def perturb_step(k, rec):
        k1, k2 = jax.random.split(k)
        off = jax.random.normal(k1, (R, 2 * D)) * opts.perturb_std_dev
        noise = chain_mod._perturb_noise(k2, R, D, opts)
        new_rec, res = replay.replay_path(scene, opts, rec, off, noise,
                                          mode='perturb')
        return new_rec
    if want('perturb'):
        results['perturb_replay_ms'] = round(loop_ms(perturb_step, cs.rec, 8),
                                             2)
        print(f"perturb replay: {results['perturb_replay_ms']} ms",
              file=sys.stderr)

    # NOTE: the fold-back must consume the proposal or XLA dead-code
    # eliminates the whole body (observed: a st->st where collapsed and the
    # "step" measured an empty loop)
    import dataclasses as _dc

    def fold(st, prop, a):
        return _dc.replace(
            st, ss_score=st.ss_score + 1e-20 * (a + prop['ss']),
            rec=jax.tree.map(
                lambda cur, p: cur + 0 * p if cur.dtype.kind == 'f' else cur,
                st.rec, prop['rec']))

    # full MALA small step (no cache)
    def small(k, st):
        prop, a = chain_mod.small_step_mala(scene, opts, k, st, cache=None)
        return fold(st, prop, a)
    if want('small'):
        results['mala_small_ms'] = round(loop_ms(small, cs, 8), 2)
        print(f"MALA small step: {results['mala_small_ms']} ms",
              file=sys.stderr)

    # MALA small step with the global cache attached (production path)
    cache = state.cache
    if cache is not None and want('smallcache'):
        def small_c(k, st):
            prop, a = chain_mod.small_step_mala(scene, opts, k, st,
                                                cache=cache)
            return fold(st, prop, a)
        results['mala_small_cache_ms'] = round(loop_ms(small_c, cs, 8), 2)
        print(f"MALA small step (cache): {results['mala_small_cache_ms']} ms",
              file=sys.stderr)

    # sparse large step at K lanes
    K = max(int(R * opts.large_step_probability * 1.3) + 1, 8)
    csK = jax.tree.map(lambda x: x[:K] if getattr(x, 'ndim', 0) >= 1 else x,
                       cs)
    def large(k, st):
        prop, a = chain_mod.large_step(scene, opts, k, st)
        return fold(st, prop, a)
    if want('large'):
        results['large_step_K_ms'] = round(loop_ms(large, csK, 8), 2)
        print(f"sparse large step (K={K}): {results['large_step_K_ms']} ms",
              file=sys.stderr)

    # optional decomposition pieces for the full step (compile-heavy; each
    # is another full multi-step program):
    #   PROF_FULL_ISO=1     -> full step with the ISO small kernel (no
    #                          gradient passes): full - fulliso ~ grad cost
    #   PROF_NO_SPLAT=1     -> full step without the film splat
    #                          (via LMC_PROF_NO_SPLAT)
    def time_full(step_fn, state0, film0, banked0, n_inner):
        keys2 = jax.random.split(jax.random.PRNGKey(77), 8)
        st2, f2, _ = step_fn(keys2[0], state0, film0, banked0)
        np.asarray(f2)
        st2, f2, _ = step_fn(keys2[1], st2, f2, banked0)
        np.asarray(f2)
        t0 = time.time()
        for i in range(2, 6):
            st2, f2, _ = step_fn(keys2[i], st2, f2, banked0)
        np.asarray(f2)
        return (time.time() - t0) / (4 * n_inner) * 1e3

    if os.environ.get('PROF_FULL_ISO'):
        opts_iso = opts.replace(mala=False, h2mc=False)
        step_i = jax.jit(mlt.make_mlt_multi_step(
            scene, opts_iso, b, opts.large_step_probability, 16,
            length_dist=length_dist))
        state_i = mlt.attach_cache(banked, opts_iso)
        film0 = jnp.zeros((scene.height, scene.width, 3))
        results['full_iso_ms'] = round(
            time_full(step_i, state_i, film0, banked, 16), 2)
        print(f"full step (iso small): {results['full_iso_ms']} ms",
              file=sys.stderr)

    if os.environ.get('PROF_NO_SPLAT'):
        step_n = jax.jit(mlt.make_mlt_multi_step(
            scene, opts, b, opts.large_step_probability, 16,
            length_dist=length_dist, no_splat=True))
        film0 = jnp.zeros((scene.height, scene.width, 3))
        results['full_nosplat_ms'] = round(
            time_full(step_n, state, film0, banked, 16), 2)
        print(f"full step (no splat): {results['full_nosplat_ms']} ms",
              file=sys.stderr)

    # full fused multi-step
    if not want('full'):
        print(json.dumps(results))
        return
    n_inner = 16
    step = jax.jit(mlt.make_mlt_multi_step(scene, opts, b,
                                           opts.large_step_probability,
                                           n_inner,
                                           length_dist=length_dist))
    film = jnp.zeros((scene.height, scene.width, 3))
    # host keys: device-array slices between dispatches abort the tunnel
    keys = np.asarray(jax.random.split(key, 8))
    st, f, _ = step(keys[0], state, film, banked)
    np.asarray(f)
    st, f, _ = step(keys[1], st, f, banked)
    np.asarray(f)
    t0 = time.time()
    n_outer = 4
    nds = []
    for i in range(2, 2 + n_outer):
        st, f, nd = step(keys[i], st, f, banked)
        nds.append(nd)
    np.asarray(f)  # real D2H sync
    dt = (time.time() - t0) / (n_outer * n_inner)
    assert sum(int(x) for x in nds) == n_outer * n_inner
    results['full_step_ms'] = round(dt * 1e3, 2)
    results['proposals_per_s'] = round(R / dt)
    print(f"full step: {dt*1e3:.2f} ms -> {R/dt:.0f} prop/s",
          file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
