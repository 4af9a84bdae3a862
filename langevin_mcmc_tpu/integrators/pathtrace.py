"""Plain Monte Carlo integrators: path tracing and the direct pass.

Replaces the reference's tile-parallel PathTrace (src/pathtrace.cpp:14-78)
and DirectLighting (src/direct.cpp:4-54): instead of 16x16 tiles over a
thread pool, whole pixel wavefronts are traced per jit step and splatted
with scatter-adds.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.film import splat
from ..path import trace


def _chunk_pixels(scene, chunk_ids):
    x = chunk_ids % scene.width
    y = chunk_ids // scene.width
    return jnp.stack([x, y], -1).astype(jnp.int32)


def render_mc(scene, opts, key, spp=None, bidirectional=None, min_depth=None,
              max_depth=None, chunk=16384):
    """Path-trace the image (PathTrace, pathtrace.cpp:14-78).

    Returns film [H, W, 3] averaged over spp.
    """
    spp = opts.spp if spp is None else spp
    bidirectional = opts.bidirectional if bidirectional is None else bidirectional
    min_depth = opts.min_depth if min_depth is None else min_depth
    max_depth = opts.max_depth if max_depth is None else max_depth
    npix = scene.width * scene.height
    nchunk = -(-npix // chunk)
    gen = trace.generate_path_bidir if bidirectional else trace.generate_path_uni

    def chunk_body(film, kv):
        key_i, chunk_start = kv
        # chunk_start is a traced array: a python int would bake a new
        # constant and recompile every chunk
        ids = chunk_start + jnp.arange(chunk)
        ids = jnp.minimum(ids, npix - 1)
        valid_px = (chunk_start + jnp.arange(chunk)) < npix
        pix = _chunk_pixels(scene, ids)
        tape = trace.draw_tape(key_i, (chunk,), opts.max_depth)
        out = gen(scene, opts, tape, pixel=pix, min_depth=min_depth,
                  max_depth=max_depth)
        rec, con = out[0], out[1]
        flat, s_tags, t_tags = con.flatten()
        # drop tiny contributions (pathtrace.cpp:61-63)
        keep = (flat['ls_score'] > 1e-10) & valid_px[:, None]
        contrib = jnp.where(keep[..., None], flat['contrib'], 0.0) / spp
        return splat(film, flat['screen_pos'].reshape(-1, 2),
                     contrib.reshape(-1, 3)), None

    # Chunks are fused FUSE-at-a-time into one lax.scan dispatch: a
    # sustained stream of thousands of short per-chunk dispatches ABORTS
    # the tunneled TPU backend ~8-9 min in (and per-dispatch overhead is
    # ~25 ms on this platform anyway) — but so does a single over-long
    # dispatch (a 64 x 16384-lane fused scan, ~30 s+, aborts immediately;
    # ~15 s dispatches are reliable). Target ~50k lane-chunks per
    # dispatch (~2-5 s at the measured generation cost); empirically
    # chunk=4096 with FUSE<=12 is solid on this tunnel while
    # chunk=16384 fused programs abort.
    FUSE = max(1, 49152 // chunk)

    # NO donate_argnums on the film: buffer donation reliably ABORTS the
    # tunneled TPU backend on the second dispatch of a donated program
    # (r4 bisection; this was the r3 "GT loop aborts while probes pass"
    # mystery — the probes did not donate). The per-dispatch film copy is
    # 9 MB — noise next to the ~0.5 s dispatch overhead.
    @jax.jit
    def fused(keys_slice, starts, film):
        film, _ = jax.lax.scan(chunk_body, film, (keys_slice, starts))
        return film

    film = jnp.zeros((scene.height, scene.width, 3))
    total = spp * nchunk
    padded = -(-total // FUSE) * FUSE
    # keys/starts live on the HOST and are transferred per dispatch:
    # feeding the dispatch stream from slices of a device-resident array
    # reliably ABORTS the tunneled TPU backend on the second dispatch
    # (r4 bisection — slicing enqueues a tiny device program between the
    # big fused ones). A [FUSE, 2] uint32 transfer per call is free.
    keys = np.asarray(jax.random.split(key, padded))
    # tail chunks are padded with chunk_start = npix: every lane fails the
    # valid_px test, so they contribute exactly zero — one compiled
    # program covers every dispatch (no separate tail-slice compile)
    starts = np.asarray(
        [(i % nchunk) * chunk for i in range(total)]
        + [npix] * (padded - total), dtype=np.int32)
    import os
    import time
    verbose = os.environ.get('LMC_MC_VERBOSE')
    for k in range(0, padded, FUSE):
        t0 = time.time()
        film = fused(keys[k:k + FUSE], starts[k:k + FUSE], film)
        jax.block_until_ready(film)
        if verbose:
            print(f'  mc dispatch {k // FUSE + 1}/{padded // FUSE}: '
                  f'{time.time() - t0:.2f}s', flush=True)
    return film


def render_direct(scene, opts, key, chunk=16384):
    """Direct-lighting pass: unidirectional, depths <= 2, direct_spp samples
    (DirectLighting, direct.cpp:4-54). Returns the per-spp-averaged buffer."""
    if opts.min_depth > 2 or opts.max_depth < 1:
        return jnp.zeros((scene.height, scene.width, 3))
    return render_mc(scene, opts, key, spp=opts.direct_spp,
                     bidirectional=False,
                     min_depth=min(opts.min_depth, 2),
                     max_depth=min(opts.max_depth, 2), chunk=chunk)
