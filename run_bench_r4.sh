#!/bin/bash
# Round-4 bench: the overdue H2MC row FIRST (BENCH_SKIP_HEADLINE avoids
# the 65536-chain MALA compile set), then the headline MALA row (also
# warms the compile cache for the driver's end-of-round bench.py run).
cd /root/repo
for attempt in 1 2; do
  echo "=== h2mc attempt $attempt $(date -u +%H:%M:%S) ===" >&2
  if BENCH_H2MC=1 BENCH_SKIP_HEADLINE=1 timeout 3000 python bench.py \
      > .bench_cache/bench_h2mc.out 2> .bench_cache/bench_h2mc.err; then
    grep -o '{.*}' .bench_cache/bench_h2mc.out | tail -1 \
      > .bench_cache/bench_h2mc.json
    break
  fi
  tail -5 .bench_cache/bench_h2mc.err >&2
  sleep 30
done
for attempt in 1 2; do
  echo "=== headline attempt $attempt $(date -u +%H:%M:%S) ===" >&2
  if timeout 3000 python bench.py \
      > .bench_cache/bench_headline.out 2> .bench_cache/bench_headline.err; then
    grep -o '{.*}' .bench_cache/bench_headline.out | tail -1 \
      > .bench_cache/bench_headline.json
    break
  fi
  tail -5 .bench_cache/bench_headline.err >&2
  sleep 30
done
echo "BENCH RUNNER DONE $(date -u)" >&2
