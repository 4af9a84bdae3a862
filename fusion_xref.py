#!/usr/bin/env python3
"""Join the profiler trace with HLO source metadata: time by Python line.

Reads .bench_cache/trace_<piece>.json (written by profile_trace.py), re-parses
its raw trace file for the FULL per-kernel-name durations, then maps each
kernel name to its HLO instruction's source_file:source_line + op_name
metadata from the already-dumped /tmp/hlo_<piece>.txt. Prints time grouped
by source line and by op_name scope — the trusted what-costs-what table.

usage: python fusion_xref.py <piece: grad|perturb|step> [hlo_path]
"""
import gzip
import json
import re
import sys
from collections import defaultdict


def trace_totals(path):
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    events = data['traceEvents'] if isinstance(data, dict) else data
    pid_name = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_name[e['pid']] = e['args'].get('name', '')
    dev_pids = {p for p, n in pid_name.items()
                if 'TPU' in n or 'device' in n.lower() or 'Axon' in n}
    agg = defaultdict(lambda: [0, 0.0])
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
            continue
        a = agg[e.get('name', '?')]
        a[0] += 1
        a[1] += float(e.get('dur', 0.0))
    return agg


def hlo_meta(path):
    """kernel name -> (source_file:line, op_name tail, out shape)."""
    meta = {}
    inst_re = re.compile(
        r'^\s*(?:ROOT\s+)?%([\w\.\-]+)\s*=\s*(\S+)\s+([a-z][\w\-]*)\(')
    with open(path) as f:
        for line in f:
            m = inst_re.match(line)
            if not m:
                continue
            name, shape, opc = m.groups()
            sf = re.search(r'source_file="([^"]+)"', line)
            sl = re.search(r'source_line=(\d+)', line)
            on = re.search(r'op_name="([^"]+)"', line)
            src = (f"{sf.group(1).split('/')[-1]}:{sl.group(1)}"
                   if sf and sl else '?')
            opn = on.group(1) if on else ''
            meta[name] = (src, opn, shape, opc)
    return meta


def main():
    piece = sys.argv[1] if len(sys.argv) > 1 else 'grad'
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else f'/tmp/hlo_{piece}.txt'
    with open(f'.bench_cache/trace_{piece}.json') as f:
        summary = json.load(f)
    agg = trace_totals(summary['trace_file'])
    meta = hlo_meta(hlo_path)

    by_src = defaultdict(lambda: [0, 0.0])
    by_opname = defaultdict(lambda: [0, 0.0])
    by_opcode = defaultdict(lambda: [0, 0.0])
    unmatched = [0, 0.0]
    rows = []
    for name, (cnt, dur) in agg.items():
        if name.startswith('jit_'):
            continue  # whole-module parent event, double-counts children
        m = meta.get(name)
        if m is None:
            unmatched[0] += cnt
            unmatched[1] += dur
            continue
        src, opn, shape, opc = m
        by_src[src][0] += cnt
        by_src[src][1] += dur
        # scope = last two op_name path elements (e.g. transpose(jvp(...))/gather)
        scope = '/'.join(opn.split('/')[-2:])[:90]
        by_opname[scope][0] += cnt
        by_opname[scope][1] += dur
        by_opcode[opc][0] += cnt
        by_opcode[opc][1] += dur
        rows.append(dict(kernel=name, ms=round(dur / 1e3, 3), count=cnt,
                         src=src, op=scope, shape=shape[:60]))

    rows.sort(key=lambda r: -r['ms'])
    out = dict(
        piece=piece,
        unmatched=dict(count=unmatched[0],
                       total_ms=round(unmatched[1] / 1e3, 2)),
        by_source_line=sorted(
            [dict(src=k, count=v[0], total_ms=round(v[1] / 1e3, 2))
             for k, v in by_src.items()],
            key=lambda d: -d['total_ms'])[:40],
        by_op_scope=sorted(
            [dict(op=k, count=v[0], total_ms=round(v[1] / 1e3, 2))
             for k, v in by_opname.items()],
            key=lambda d: -d['total_ms'])[:40],
        by_opcode=sorted(
            [dict(op=k, count=v[0], total_ms=round(v[1] / 1e3, 2))
             for k, v in by_opcode.items()],
            key=lambda d: -d['total_ms'])[:20],
        top_kernels=rows[:30],
    )
    with open(f'.bench_cache/xref_{piece}.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(f"== {piece}: unmatched {out['unmatched']}")
    print("\n-- time by source line --")
    for d in out['by_source_line'][:25]:
        print(f"  {d['total_ms']:9.2f} ms  x{d['count']:<6} {d['src']}")
    print("\n-- time by op scope --")
    for d in out['by_op_scope'][:20]:
        print(f"  {d['total_ms']:9.2f} ms  x{d['count']:<6} {d['op']}")
    print("\n-- time by opcode --")
    for d in out['by_opcode'][:15]:
        print(f"  {d['total_ms']:9.2f} ms  x{d['count']:<6} {d['op']}")


if __name__ == '__main__':
    main()
