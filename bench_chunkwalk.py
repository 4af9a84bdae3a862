#!/usr/bin/env python3
"""Chunk-walk kernel tuning probe (r5): per-dispatch cost vs (RAY_BLOCK,
TRI_CHUNK) at the MCMC step's real shapes.

The traced step spends ~163 ms/iter in the replay walk's [131072]-ray
closest-hit dispatches (profiles/PROFILE_r05.md). Rays here mimic the
steady state: origins on scene surfaces, cosine-hemisphere directions,
with an ALIVE fraction knob (later walk steps are mostly dead rays).

usage: LMC_CW_RAY_BLOCK=128 LMC_CW_TRI_CHUNK=64 python bench_chunkwalk.py
Prints one JSON line per (rays, alive_frac).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from langevin_mcmc_tpu.utils.compilecache import enable
enable()
from langevin_mcmc_tpu.scene.parse import parse_scene
from langevin_mcmc_tpu.ops import chunkwalk


def make_rays(scene, n, alive_frac, seed=0):
    rng = np.random.default_rng(seed)
    tp = np.asarray(scene.tri_p)[0]                     # [T, 3, 3]
    T = tp.shape[0]
    tri = rng.integers(0, T, n)
    b1 = rng.uniform(0, 1, n); b2 = rng.uniform(0, 1, n)
    flip = b1 + b2 > 1
    b1 = np.where(flip, 1 - b1, b1); b2 = np.where(flip, 1 - b2, b2)
    p = tp[tri]
    org = (p[:, 0] * (1 - b1 - b2)[:, None] + p[:, 1] * b1[:, None]
           + p[:, 2] * b2[:, None])
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    alive = rng.uniform(0, 1, n) < alive_frac
    min_t = np.full(n, 1e-4, np.float32)
    max_t = np.where(alive, np.inf, 0.0).astype(np.float32)
    return (jnp.asarray(org.astype(np.float32)),
            jnp.asarray(d.astype(np.float32)),
            jnp.asarray(min_t), jnp.asarray(max_t))


def main():
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml')
    cfg = dict(ray_block=chunkwalk.RAY_BLOCK, tri_chunk=chunkwalk.TRI_CHUNK)
    time_zero = jnp.zeros(())

    for n in (131072, 4352):
        for alive in (1.0, 0.3):
            org, d, mn, mx = make_rays(scene, n, alive)
            tz = jnp.zeros((n,))

            @jax.jit
            def many(org, d, mn, mx):
                def body(c, _):
                    o = org + c * 1e-20
                    hit, tid, t, u, v = chunkwalk.intersect_chunkwalk(
                        scene, o, d, tz, mn, mx)
                    return c + jnp.sum(t) * 1e-20, ()
                c, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
                return c

            out = jax.block_until_ready(many(org, d, mn, mx))
            t0 = time.time()
            out = jax.block_until_ready(many(org, d, mn, mx))
            dt = (time.time() - t0) / 8
            print(json.dumps(dict(
                **cfg, rays=n, alive=alive, ms_per_dispatch=round(dt * 1e3, 3),
                ns_per_ray=round(dt / n * 1e9, 1))), flush=True)


if __name__ == '__main__':
    main()
