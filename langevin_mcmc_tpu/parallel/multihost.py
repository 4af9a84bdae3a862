"""Multi-host scale-out: distributed bootstrap + render driver.

The reference is a single 32-core machine; its only cross-thread state is
the film (AtomicFloat splats), the bootstrap reduction (one mutex), and
the per-dim cache mutexes (SURVEY §2.3). The TPU-native multi-host layout:

  * one global 1-D mesh over every device of every process; chains are
    data-parallel across it (`parallel.mesh.shard_chains`) under an
    explicit jax.shard_map step (parallel/shardmap_step.py) whose
    per-device program is local by construction;
  * the film is a stack of per-device partials (ONE cross-device reduce
    at the end of the run); the global PSS cache is per-device with a
    periodic jitted merge — both ride ICI/DCN only where the reference
    used shared-memory atomics, and never per step;
  * the bootstrap normalization b and the path-length histogram are exact
    global averages (process_allgather of per-host partial sums — the
    reference's mutex-guarded reduction, mlt.h:85-95);
  * chain seeds are drawn per host from the host's local sample pool
    (the reference equal-spaced-resamples one global pool, mlt.h:107-148;
    per-host pools with numInitSamples >> numChains per host draw from
    the same lsScore-proportional distribution — documented deviation,
    removes an all-to-all of full path records at startup).

Run one process per host with:
  python -m langevin_mcmc_tpu ... --coordinator host0:1234 \
      --num-processes N --process-id i
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """jax.distributed.initialize wrapper; no-op when single-process.

    On the CPU backend the client only becomes multi-process aware with a
    cross-process collectives implementation selected (gloo ships in
    jaxlib); must be configured before the backend is instantiated."""
    if num_processes is None or num_processes <= 1:
        return False
    import os
    platforms = jax.config.jax_platforms or os.environ.get('JAX_PLATFORMS',
                                                           '')
    if platforms == 'cpu':
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_sum(x):
    """Sum a host-local numpy value across processes (exact)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(jnp.asarray(x))
    return np.asarray(gathered).sum(0)


def bootstrap_multihost(scene, opts, key, chunk=4096):
    """MLTInit across hosts: exact global (b, lengthDist), per-host seeds.

    Each process runs the standard bootstrap over its own
    num_init_samples/process_count slice with a process-folded key, then
    the normalization and length histogram are all-reduced. Returns
    (b_global, length_dist_global, local BankedState of
    opts.num_chains/process_count chains)."""
    from ..integrators import mlt
    from ..utils.distribution import Distribution1D

    nproc = jax.process_count()
    pid = jax.process_index()
    local_opts = opts.replace(
        num_init_samples=max(opts.num_init_samples // nproc, 1),
        num_chains=max(opts.num_chains // nproc, 1))
    local_key = jax.random.fold_in(key, pid)
    b_local, length_dist_local, banked = mlt.bootstrap(
        scene, local_opts, local_key, chunk=chunk)

    n_local = local_opts.num_init_samples
    sum_b = global_sum(np.asarray(b_local * n_local, np.float64))
    n_total = global_sum(np.asarray(n_local, np.float64))
    b_global = float(sum_b / n_total)
    hist_local = np.asarray(length_dist_local.func, np.float64) * n_local
    hist_global = global_sum(hist_local)
    length_dist = Distribution1D(
        hist_global / max(hist_global.sum(), 1e-30))
    return b_global, length_dist, banked


def render_mlt_multihost(scene, opts, key, spp=None, num_steps=None,
                         chunk=4096, progress=False):
    """Multi-host MCMC render: global mesh, chains sharded across all
    devices of all processes, film replicated (scatter-adds psum across
    the mesh under jit). Single-process callers get the single-host path
    with mesh sharding over local devices."""
    from ..integrators import mlt
    from .mesh import make_chain_mesh, shard_chains, replicate
    from jax.sharding import NamedSharding, PartitionSpec as P

    spp = opts.spp if spp is None else spp
    mesh = make_chain_mesh()
    k_boot, k_direct, k_loop = jax.random.split(key, 3)
    b, length_dist, banked = bootstrap_multihost(scene, opts, k_boot,
                                                 chunk=chunk)
    C_local = banked.state.ls_score.shape[0]
    C_global = C_local * jax.process_count()
    npix = scene.width * scene.height
    if num_steps is None:
        num_steps = max(spp * npix // C_global, 1)

    # the step sees GLOBAL shapes: chains from every process are one
    # sharded array (jax.make_array_from_process_local_data in shard_chains)
    local_opts = opts.replace(num_chains=C_global)
    n_dev = int(np.prod(mesh.devices.shape))
    assert C_global % n_dev == 0, (
        f'global chains {C_global} must divide the device count {n_dev} '
        f'(pick num_chains as a multiple of devices-per-host)')
    from .shardmap_step import (make_sharded_multi_step, stack_cache,
                                make_cache_merger)
    with mesh:
        banked = shard_chains(mesh, banked)
        init_banked = banked
        banked = mlt.attach_cache(banked, local_opts)
        merger = None
        if banked.cache is not None:
            # per-device caches + periodic merge (shardmap_step docstring:
            # statistically equivalent to the reference's order-agnostic
            # per-dim mutex pushes)
            merger = make_cache_merger(mesh, jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape),
                banked.cache))
            prev_count = jnp.zeros_like(banked.cache.count)
            banked = dataclasses.replace(
                banked, cache=stack_cache(mesh, banked.cache, n_dev))
        # per-device partial films, co-sharded with the chains: every
        # splat stays device-local; ONE cross-device reduce at the end
        film = jax.device_put(
            jnp.zeros((n_dev, scene.height, scene.width, 3)),
            NamedSharding(mesh, P('chains')))
        ls_prob1 = opts.large_step_probability
        scale = 1.0 if opts.h2mc else opts.large_step_prob_scale
        ls_prob2 = min(ls_prob1 * scale, 1.0)
        # fused multi-step (VERDICT r3 item 5): n_inner chain iterations
        # per host dispatch — the ~25 ms/dispatch tunnel overhead is paid
        # once per n_inner steps, same as the single-host driver. The
        # phase switch moves to a fused-call boundary (within n_inner of
        # the nominal point; the reference's two-phase lsProb switch is a
        # heuristic fraction, mlt.cpp:48-52)
        n_inner = max(1, min(16, num_steps))
        step1 = make_sharded_multi_step(
            mesh, scene, local_opts, b, ls_prob1, n_inner,
            length_dist=length_dist, banked_example=banked)
        step2 = step1 if ls_prob2 == ls_prob1 else \
            make_sharded_multi_step(
                mesh, scene, local_opts, b, ls_prob2, n_inner,
                length_dist=length_dist, banked_example=banked)
        phase_switch = int(num_steps * opts.ls_ratio)
        MERGE_EVERY = 4                       # outer dispatches
        done = 0
        outer = 0
        # host-resident keys, pre-split: a device-array op (like
        # jax.random.split) between dispatches reliably aborts the
        # tunneled TPU backend (r4 bisection; ADVICE r4)
        n_outer_max = -(-num_steps // n_inner)
        keys = np.asarray(jax.random.split(k_loop, n_outer_max))
        while done < num_steps:
            step = step1 if done <= phase_switch else step2
            banked, film, nd = step(keys[outer], banked, film, init_banked)
            nd = int(nd)
            if nd < n_inner:
                # the on-device counter increments only while chain state
                # stays finite — a shortfall means NaN state, and looping
                # on would spin forever (ADVICE r4)
                raise RuntimeError(
                    f'multihost step ran {nd}/{n_inner} fused iterations '
                    f'— non-finite chain state')
            done += nd
            outer += 1
            if merger is not None and outer % MERGE_EVERY == 0:
                new_cache, prev_count = merger(banked.cache, prev_count)
                banked = dataclasses.replace(banked, cache=new_cache)
            if progress:
                print(f'mlt step {done}/{num_steps}', flush=True)
        film = jnp.sum(film, 0)  # the one cross-device film reduce
        jax.block_until_ready(film)

    effective_spp = done * C_global / npix
    indirect = film / effective_spp
    from ..integrators.pathtrace import render_direct
    direct = render_direct(scene, local_opts, k_direct, chunk=chunk) \
        if opts.direct_spp > 0 else jnp.zeros_like(indirect)
    return direct + indirect, b
