#!/bin/bash
# Round-4 bench: headline MALA row + H2MC row (BENCH_H2MC=1), retried.
# Run AFTER the torus relMSE row so the chip is free; warms the compile
# cache the driver's end-of-round bench.py run will reuse.
cd /root/repo
for attempt in 1 2 3; do
  echo "=== bench attempt $attempt $(date -u +%H:%M:%S) ===" >&2
  if BENCH_H2MC=1 timeout 4500 python bench.py \
      > .bench_cache/bench_r4.out 2> .bench_cache/bench_r4.err; then
    grep -o '{.*}' .bench_cache/bench_r4.out | tail -1 > BENCH_NOTES_r04.json
    break
  fi
  tail -5 .bench_cache/bench_r4.err >&2
  sleep 60
done
echo "BENCH RUNNER DONE $(date -u)" >&2
