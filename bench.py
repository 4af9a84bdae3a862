#!/usr/bin/env python3
"""Benchmark: MCMC proposals/s/chip on the torus scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the 32-core CPU reference renders torus with
spp budget 245 at 1024x768 in 44.69 s  =>  245*1024*768/44.69 = 4.31M
proposals/s. vs_baseline = ours / reference (higher is better).
"""

import json
import sys
import time

BASELINE_PROPOSALS_PER_S = 245 * 1024 * 768 / 44.69


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from langevin_mcmc_tpu.utils.compilecache import enable as enable_cache
    enable_cache()

    from langevin_mcmc_tpu.scene.parse import parse_scene
    from langevin_mcmc_tpu.path import trace
    from langevin_mcmc_tpu.integrators import mlt

    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml',
                                 film_wh=(256, 192))
    # TPU-scale wavefront: the VPU sweep is latency-bound below ~16k rays
    opts = opts.replace(max_depth=4, num_chains=16384,
                        num_init_samples=32768, mala=True)
    key = jax.random.PRNGKey(0)

    # --- bootstrap (also warms the generator compile) ---
    t0 = time.time()
    b, length_dist, banked = mlt.bootstrap(scene, opts, key, chunk=2048)
    boot_t = time.time() - t0

    # --- steady-state MCMC step rate (cache attached: the production MALA
    # path queries/pushes the global PSS cache every step) ---
    step = jax.jit(mlt.make_mlt_step(scene, opts, b,
                                     opts.large_step_probability,
                                     length_dist=length_dist))
    film = jnp.zeros((scene.height, scene.width, 3))
    keys = jax.random.split(key, 40)
    init_banked = banked
    state = mlt.attach_cache(banked, opts)
    t0 = time.time()
    state, film = step(keys[0], state, film, init_banked)
    jax.block_until_ready(film)
    # second warmup: guards the measurement against any silent recompile
    # from aval drift on the state round-trip
    state, film = step(keys[1], state, film, init_banked)
    jax.block_until_ready(film)
    compile_t = time.time() - t0

    n_steps = 20
    t0 = time.time()
    for i in range(2, 2 + n_steps):
        state, film = step(keys[i], state, film, init_banked)
    jax.block_until_ready(film)
    dt = (time.time() - t0) / n_steps
    proposals_per_s = opts.num_chains / dt

    print(json.dumps({
        'metric': 'mcmc_proposals_per_s_per_chip',
        'value': round(proposals_per_s, 1),
        'unit': 'proposals/s',
        'vs_baseline': round(proposals_per_s / BASELINE_PROPOSALS_PER_S, 5),
        'detail': {
            'scene': 'torus (MALA, maxDepth=4, 16384 chains)',
            'step_ms': round(dt * 1000, 2),
            'bootstrap_s': round(boot_t, 1),
            'step_compile_s': round(compile_t, 1),
            'baseline': '32-core CPU reference: 4.31M proposals/s',
        },
    }))


if __name__ == '__main__':
    try:
        main()
    except Exception as e:  # emit a parseable failure line
        print(json.dumps({'metric': 'mcmc_proposals_per_s_per_chip',
                          'value': 0.0, 'unit': 'proposals/s',
                          'vs_baseline': 0.0,
                          'error': f'{type(e).__name__}: {e}'}))
        sys.exit(1)
