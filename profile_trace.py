#!/usr/bin/env python3
"""On-device XLA profiler trace of the MCMC step (VERDICT r4 item 1).

Captures a jax.profiler trace (works on the axon platform; produces a
Chrome trace.json.gz) around one warm dispatch of each requested piece and
parses it into an op census: events per call, total device-busy time, and
the top ops by accumulated duration. This replaces wall-clock inference —
three rounds of optimization theories (bandwidth-bound r3, kernel-count r4,
depth cohorts) were built on wall clocks and two measured exactly 0.

Pieces (TRACE_ONLY=comma list): grad, perturb, step (full MLT multi-step).
Config matches bench.py's headline exactly so the XLA programs ride the
persistent compile cache. Output: .bench_cache/trace_<piece>.json summary +
stderr table; the raw trace dirs stay in /tmp (100s of MB).
"""
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from langevin_mcmc_tpu.utils.compilecache import enable as enable_cache
enable_cache()

from langevin_mcmc_tpu.scene.parse import parse_scene


def parse_trace(trace_dir):
    """Aggregate device-side complete events from the newest trace.json.gz."""
    cand = []
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith('trace.json.gz'):
                cand.append(os.path.join(root, f))
    path = max(cand, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    events = data['traceEvents'] if isinstance(data, dict) else data
    # map pid -> process name to find device lanes
    pid_name = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_name[e['pid']] = e['args'].get('name', '')
    dev_pids = {p for p, n in pid_name.items()
                if 'TPU' in n or 'device' in n.lower() or 'Axon' in n}
    agg = defaultdict(lambda: [0, 0.0])
    t_min, t_max = float('inf'), 0.0
    n_events = 0
    busy = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
            continue
        name = e.get('name', '?')
        dur = float(e.get('dur', 0.0))
        ts = float(e.get('ts', 0.0))
        a = agg[name]
        a[0] += 1
        a[1] += dur
        n_events += 1
        busy += dur
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)
    span = (t_max - t_min) if n_events else 0.0
    # group fusion.N -> fusion etc. for a by-kind census, and bucket the
    # per-event durations (the question is tail-of-tiny-kernels vs few-big)
    kind = defaultdict(lambda: [0, 0.0])
    buckets = defaultdict(lambda: [0, 0.0])
    for k, v in agg.items():
        base = k.split('.')[0]
        kind[base][0] += v[0]
        kind[base][1] += v[1]
        per = v[1] / max(v[0], 1)
        b = ('<5us' if per < 5 else '5-20us' if per < 20 else
             '20-100us' if per < 100 else '100us-1ms' if per < 1000
             else '>1ms')
        buckets[b][0] += v[0]
        buckets[b][1] += v[1]
    top = sorted(agg.items(), key=lambda kv: -kv[1][1])
    return dict(
        trace_file=path,
        device_pids={p: pid_name.get(p, '') for p in dev_pids},
        n_device_events=n_events,
        device_busy_ms=round(busy / 1e3, 2),
        device_span_ms=round(span / 1e3, 2),
        by_kind=sorted(
            [dict(kind=k, count=v[0], total_ms=round(v[1] / 1e3, 2))
             for k, v in kind.items()], key=lambda d: -d['total_ms'])[:20],
        dur_buckets={k: dict(count=v[0], total_ms=round(v[1] / 1e3, 2))
                     for k, v in buckets.items()},
        top_ops=[dict(name=k[:120], count=v[0],
                      total_ms=round(v[1] / 1e3, 3))
                 for k, v in top[:40]],
    )


def hlo_census(jitted, *args, tag='mod'):
    """Opcode census of the optimized HLO: top-level instructions of the
    entry (and while-body) computations ≈ one device kernel each."""
    import re
    txt = jitted.lower(*args).compile().as_text()
    # computations: split on "\n}" blocks starting with name {
    ops = defaultdict(int)
    fused = False
    in_comp = None
    fusion_sizes = []
    cur_fusion = 0
    for line in txt.splitlines():
        m = re.match(r'^(%?[\w\.\-]+)\s.*\{$', line)
        if m:
            in_comp = m.group(1)
            fused = 'fused_computation' in in_comp or 'region' in in_comp
            if fused:
                cur_fusion = 0
            continue
        if line.startswith('}'):
            if fused and cur_fusion:
                fusion_sizes.append(cur_fusion)
            in_comp = None
            continue
        ls = line.strip()
        m2 = re.match(r'^(?:ROOT\s+)?%?[\w\.\-]+\s*=\s*[\w\[\],\{\}\d\s]*\s'
                      r'([a-z][\w\-]*)\(', ls)
        if not m2:
            continue
        opc = m2.group(1)
        if fused:
            cur_fusion += 1
        else:
            ops[opc] += 1
    total = sum(ops.values())
    import numpy as _np
    fs = _np.array(fusion_sizes) if fusion_sizes else _np.array([0])
    out = dict(piece=tag, top_level_ops=total,
               by_opcode=sorted(ops.items(), key=lambda kv: -kv[1])[:25],
               n_fusion_computations=len(fusion_sizes),
               fusion_size_mean=round(float(fs.mean()), 1),
               fusion_size_max=int(fs.max()))
    print(f"HLO census [{tag}]: {total} top-level ops; "
          f"{out['by_opcode'][:12]}; fusion interior mean "
          f"{out['fusion_size_mean']} max {out['fusion_size_max']}",
          file=sys.stderr)
    with open(f'.bench_cache/hlo_{tag}.json', 'w') as f:
        json.dump(out, f, indent=1)
    return out


def capture(tag, fn, *args):
    """Warm fn twice, then trace one call. Returns (summary, wall_ms)."""
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    tdir = f'/tmp/lmctrace_{tag}'
    jax.profiler.start_trace(tdir)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    wall = (time.time() - t0) * 1e3
    jax.profiler.stop_trace()
    summary = parse_trace(tdir)
    summary['wall_ms'] = round(wall, 2)
    summary['piece'] = tag
    return summary


def report(s):
    os.makedirs('.bench_cache', exist_ok=True)
    with open(f'.bench_cache/trace_{s["piece"]}.json', 'w') as f:
        json.dump(s, f, indent=1)
    print(f"\n=== {s['piece']}: wall {s['wall_ms']} ms, "
          f"{s['n_device_events']} device events, "
          f"busy {s['device_busy_ms']} ms, span {s['device_span_ms']} ms",
          file=sys.stderr)
    print(f"  by kind: {s['by_kind'][:10]}", file=sys.stderr)
    print(f"  dur buckets: {s['dur_buckets']}", file=sys.stderr)
    for t in s['top_ops'][:15]:
        print(f"  {t['total_ms']:10.3f} ms  x{t['count']:<6} {t['name']}",
              file=sys.stderr)


def main():
    D = int(os.environ.get('PROF_DEPTH', '8'))
    R = int(os.environ.get('PROF_RAYS', '65536'))
    only = set(filter(None, os.environ.get(
        'TRACE_ONLY', 'grad,perturb,step').split(',')))
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml')
    opts = opts.replace(max_depth=D, num_chains=R, num_init_samples=65536,
                        mala=True)
    key = jax.random.PRNGKey(0)

    from langevin_mcmc_tpu.integrators import mlt
    from langevin_mcmc_tpu.mcmc import chain as chain_mod
    from langevin_mcmc_tpu.path import replay

    t0 = time.time()
    b, length_dist, banked = mlt.bootstrap(scene, opts, key, chunk=4096)
    print(f'bootstrap: {time.time()-t0:.1f} s', file=sys.stderr)
    state = mlt.attach_cache(banked, opts)
    cs = state.state

    if 'grad' in only:
        # one frozen-grad pass over all lanes (the piece that cost 310 ms
        # in the r4 wall-clock profile)
        @jax.jit
        def grad_once(rec):
            return replay.path_grad(scene, opts, rec)
        if os.environ.get('TRACE_HLO'):
            hlo_census(jax.jit(lambda rec: replay.path_grad(
                scene, opts, rec)), cs.rec, tag='grad')
        report(capture('grad', grad_once, cs.rec))

    if 'gradbake' in only:
        # the production shape post-surgery: bake prepass outside the
        # traced call, gather-free grad inside
        bk = jax.jit(lambda rec: replay.bake_frozen(scene, opts, rec))(
            cs.rec)
        bk = jax.block_until_ready(bk)

        @jax.jit
        def grad_baked(rec, b):
            return replay.path_grad(scene, opts, rec, bake=b)
        report(capture('gradbake', grad_baked, cs.rec, bk))

        @jax.jit
        def bake_only(rec):
            return replay.bake_frozen(scene, opts, rec)
        report(capture('bakepass', bake_only, cs.rec))

    if 'perturb' in only:
        import dataclasses as _dc

        @jax.jit
        def perturb_once(k, rec):
            k1, k2 = jax.random.split(k)
            off = jax.random.normal(k1, (R, 2 * D)) * opts.perturb_std_dev
            noise = chain_mod._perturb_noise(k2, R, D, opts)
            new_rec, res = replay.replay_path(scene, opts, rec, off, noise,
                                              mode='perturb')
            return new_rec, res['ss_score']
        report(capture('perturb', perturb_once, jax.random.PRNGKey(3),
                       cs.rec))

    if 'step' in only:
        n_inner = int(os.environ.get('TRACE_INNER', '2'))
        step = jax.jit(mlt.make_mlt_multi_step(
            scene, opts, b, opts.large_step_probability, n_inner,
            length_dist=length_dist))
        film = jnp.zeros((scene.height, scene.width, 3))
        keys = np.asarray(jax.random.split(key, 4))

        def run(k):
            st, f, nd = step(k, state, film, banked)
            return f
        s = capture('step', run, keys[0])
        s['n_inner'] = n_inner
        s['per_iter_wall_ms'] = round(s['wall_ms'] / n_inner, 2)
        report(s)


if __name__ == '__main__':
    main()
