#!/usr/bin/env python3
"""Equal-time relMSE benchmark vs the reference renderer's committed
equal-time renders (BASELINE.md).

For each scene this renders with the same MCMC configuration for the same
wall-clock budget the 32-core CPU reference used, then scores both images
against a converged ground truth (our validated plain-MC integrator at high
spp, cached on disk after the first run):

    relMSE(img, gt) = mean( (img - gt)^2 / (gt^2 + eps) )

Prints ONE JSON line per scene:
  {"metric": "equal_time_relmse_<scene>", "value": ours,
   "reference": ref, "vs_baseline": ref/ours}    (higher is better)

Usage:
  python bench_relmse.py [--scene torus|veachdoor|all] [--gt-spp N]
                         [--budget-scale F] [--film-scale F]
"""

import argparse
import json
import os
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.bench_cache')

SCENES = {
    'torus': dict(xml='/root/reference/scenes/torus/lmc.xml',
                  ref_exr='/root/reference/scenes/torus/'
                          'lmc_timeuse_44.689152s.exr',
                  budget_s=44.689152),
    'veachdoor': dict(xml='/root/reference/scenes/veachdoor/lmc.xml',
                      ref_exr='/root/reference/scenes/veachdoor/'
                              'lmc_timeuse_30.236183s.exr',
                      budget_s=30.236183),
    # H2MC equal-time rows (VERDICT r4 item 4c): the reference commits
    # equal-time H2MC renders for both scenes
    'torus_h2mc': dict(xml='/root/reference/scenes/torus/h2mc.xml',
                       ref_exr='/root/reference/scenes/torus/'
                               'h2mc_timeuse_45.381592s.exr',
                       budget_s=45.381592, gt_of='torus'),
    'veachdoor_h2mc': dict(xml='/root/reference/scenes/veachdoor/h2mc.xml',
                           ref_exr='/root/reference/scenes/veachdoor/'
                                   'h2mc_timeuse_32.686382s.exr',
                           budget_s=32.686382, gt_of='veachdoor'),
}


def rel_mse(img, gt, eps=1e-2):
    import numpy as np
    d = img - gt
    return float(np.mean(d * d / (gt * gt + eps)))


def rel_mse_clamped(img, gt, q=0.999, eps=1e-2):
    """Firefly-robust companion: both images clamped at the GT's q-quantile
    (per channel) before scoring — raw relMSE on a noisy GT is dominated by
    outlier pixels (VERDICT r4 weak #4)."""
    import numpy as np
    hi = np.quantile(gt.reshape(-1, 3), q, axis=0)
    return rel_mse(np.minimum(img, hi), np.minimum(gt, hi), eps)


def ground_truth(name, scene, opts, gt_spp, film_wh, chunk):
    """MC ground truth, rendered in spp slices with on-disk progress so an
    aborted TPU session resumes instead of restarting (the tunneled
    backend has been observed to ABORT long dispatch streams)."""
    import numpy as np
    import jax
    from langevin_mcmc_tpu.integrators.pathtrace import render_mc

    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = f'{name}_gt_{film_wh[0]}x{film_wh[1]}_{gt_spp}spp_d{opts.max_depth}'
    path = os.path.join(CACHE_DIR, f'{tag}.npz')
    part_path = os.path.join(CACHE_DIR, f'{tag}_partial.npz')
    if os.path.exists(path):
        return np.load(path)['gt']
    acc = None
    done = 0
    if os.path.exists(part_path):
        p = np.load(part_path)
        acc, done = p['acc'], int(p['done'])
        print(f'resuming {name} ground truth at {done}/{gt_spp} spp',
              flush=True)
    else:
        print(f'rendering {name} ground truth ({gt_spp} spp)...', flush=True)
    t0 = time.time()
    # small slices: the tunneled TPU backend aborts sustained dispatch
    # streams unpredictably (r3 log); 4-spp slices persist progress every
    # ~30 s so retries resume instead of restarting
    SLICE = 4
    gt_opts = opts.replace(integrator='mc')
    while done < gt_spp:
        n = min(SLICE, gt_spp - done)
        film = render_mc(scene, gt_opts.replace(spp=n),
                         jax.random.fold_in(jax.random.PRNGKey(9), done),
                         spp=n, chunk=chunk)
        sl = np.asarray(jax.block_until_ready(film)) * n
        acc = sl if acc is None else acc + sl
        done += n
        np.savez(part_path, acc=acc, done=done)
        print(f'gt {name}: {done}/{gt_spp} spp', flush=True)
    gt = acc / gt_spp
    print(f'gt done in {time.time() - t0:.0f}s', flush=True)
    np.savez_compressed(path, gt=gt)
    os.remove(part_path)
    return gt


def run_scene(name, cfg, args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from langevin_mcmc_tpu.scene.parse import parse_scene
    from langevin_mcmc_tpu.integrators import mlt
    from langevin_mcmc_tpu.integrators.pathtrace import render_direct
    from langevin_mcmc_tpu.utils.image_io import read_image

    film_wh = None
    if args.film_scale != 1.0:
        ref = read_image(cfg['ref_exr'])
        film_wh = (int(ref.shape[1] * args.film_scale),
                   int(ref.shape[0] * args.film_scale))
    scene, opts, _ = parse_scene(cfg['xml'], film_wh=film_wh)
    # our throughput-optimal chain count (the reference's numChains=128
    # suits a 32-core CPU; the TPU wavefront wants ~16k lanes) — same
    # wall-clock budget, each side's own best configuration
    opts = opts.replace(num_chains=args.num_chains or 16384)
    if args.max_depth:
        opts = opts.replace(max_depth=args.max_depth)
    chunk = args.chunk

    ref_img = read_image(cfg['ref_exr'])
    if film_wh is not None:
        # average-pool the reference down to the benchmark resolution
        sy = ref_img.shape[0] // scene.height
        sx = ref_img.shape[1] // scene.width
        ref_img = ref_img[:scene.height * sy, :scene.width * sx].reshape(
            scene.height, sy, scene.width, sx, 3).mean((1, 3))

    gt = ground_truth(cfg.get('gt_of', name), scene, opts, args.gt_spp,
                      (scene.width, scene.height), chunk)

    budget = cfg['budget_s'] * args.budget_scale
    key = jax.random.PRNGKey(0)
    k_boot, k_direct, k_loop = jax.random.split(key, 3)

    # --- timed region: the chain loop ONLY. The reference's published
    # "timeuse" starts its timer AFTER DirectLighting and MLTInit
    # (mlt.cpp: Tick(timer) right before the chain ParallelFor), so
    # bootstrap + direct lighting are excluded on both sides; compile time
    # is excluded by warmup (the XLA analogue of the cached .so). ---
    C = opts.num_chains
    npix = scene.width * scene.height

    b, length_dist, banked = mlt.bootstrap(scene, opts, k_boot, chunk=chunk)
    import sys as _sys
    print(f'{name} lengthDist: '
          + ' '.join(f'{v:.4f}' for v in np.asarray(length_dist.func)),
          file=_sys.stderr, flush=True)
    ls_prob1 = opts.large_step_probability
    scale = 1.0 if opts.h2mc else opts.large_step_prob_scale
    ls_prob2 = min(ls_prob1 * scale, 1.0)
    n_inner = args.n_inner
    step1 = jax.jit(mlt.make_mlt_multi_step(scene, opts, b, ls_prob1,
                                            n_inner,
                                            length_dist=length_dist))
    step2 = step1 if ls_prob2 == ls_prob1 else \
        jax.jit(mlt.make_mlt_multi_step(scene, opts, b, ls_prob2, n_inner,
                                        length_dist=length_dist))
    init_banked = banked
    banked = mlt.attach_cache(banked, opts)
    film0 = jnp.zeros((scene.height, scene.width, 3))
    direct = render_direct(scene, opts, k_direct, chunk=chunk) \
        if opts.direct_spp > 0 else film0
    # warmup compiles (2 calls each: guards against aval-drift recompiles)
    w_banked, w_film, _ = step1(jax.random.PRNGKey(1), banked, film0,
                                init_banked)
    w_banked, w_film, _ = step1(jax.random.PRNGKey(2), w_banked, w_film,
                                init_banked)
    w_banked, w_film, _ = step2(jax.random.PRNGKey(3), w_banked, w_film,
                                init_banked)
    jax.block_until_ready((w_film, direct))

    # timed chain loop (n_inner chain iterations per dispatch). Keys are
    # pre-materialized on the HOST: any op on an existing device array
    # (split/slice) between dispatches aborts the tunneled backend
    # (r4 bisection, see pathtrace.render_mc)
    film = film0
    nominal_steps = max(int(opts.spp) * npix // C, 1)
    phase_switch = int(nominal_steps * opts.ls_ratio)
    loop_keys = np.asarray(jax.random.split(k_loop, 65536))
    steps = 0
    i = 0
    dt_est = 0.0
    t0 = time.time()
    while True:
        # honest budget: stop when the NEXT dispatch would overrun (the
        # old always-dispatch-while-time-remains loop overshot the torus
        # budget 14% and kept the extra splats — VERDICT r4 weak #3)
        if steps > 0 and (time.time() - t0) + dt_est > budget:
            break
        step = step1 if steps <= phase_switch else step2
        td = time.time()
        banked, film, nd = step(loop_keys[i], banked, film, init_banked)
        i += 1
        # on-device counter -> host: real sync + proof the scan executed
        steps += int(nd)
        dt_est = max(dt_est * 0.5, time.time() - td)
    elapsed = time.time() - t0
    assert steps > 0 and np.isfinite(float(np.asarray(film).sum()))

    spp_eff = steps * C / npix
    img = np.asarray(direct + film / max(spp_eff, 1e-9))

    ours = rel_mse(img, gt)
    ref = rel_mse(ref_img, gt)
    ours_cl = rel_mse_clamped(img, gt)
    ref_cl = rel_mse_clamped(ref_img, gt)
    out = {
        'metric': f'equal_time_relmse_{name}',
        'value': ours,
        'unit': 'relMSE (lower better)',
        'reference': ref,
        'vs_baseline': ref / ours if ours > 0 else float('inf'),
        'value_clamp999': ours_cl,
        'reference_clamp999': ref_cl,
        'vs_baseline_clamp999': ref_cl / ours_cl if ours_cl > 0
                                else float('inf'),
        'budget_s': round(budget, 2),
        'elapsed_s': round(elapsed, 2),
        'steps': steps,
        'spp_effective': round(spp_eff, 2),
        'film': [scene.width, scene.height],
        'gt_spp': args.gt_spp,
        'film_scale': args.film_scale,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    from langevin_mcmc_tpu.utils.compilecache import enable as enable_cache
    enable_cache()
    p = argparse.ArgumentParser()
    p.add_argument('--scene', default='torus',
                   choices=['torus', 'veachdoor', 'torus_h2mc',
                            'veachdoor_h2mc', 'all'])
    p.add_argument('--gt-spp', type=int, default=1024)
    p.add_argument('--budget-scale', type=float, default=1.0,
                   help='scale the wall-clock budget (debugging)')
    p.add_argument('--film-scale', type=float, default=1.0)
    p.add_argument('--num-chains', type=int, default=0)
    p.add_argument('--max-depth', type=int, default=0)
    p.add_argument('--chunk', type=int, default=8192)
    p.add_argument('--n-inner', type=int, default=16,
                   help='chain iterations fused per device dispatch')
    args = p.parse_args()
    names = ['torus', 'veachdoor'] if args.scene == 'all' else [args.scene]
    for n in names:
        run_scene(n, SCENES[n], args)


if __name__ == '__main__':
    main()
