#!/bin/bash
# Round-4 deliverable #1: equal-time relMSE rows, torus + veachdoor.
# Resumable (4-spp GT slices persist on disk); retry with cool-downs on
# tunneled-TPU failures. Per-scene GT spp: torus 512, veachdoor 256
# (wall-clock budget — GT spp is recorded in the JSON row).
cd /root/repo
mkdir -p .bench_cache
for scene in torus veachdoor; do
  gtspp=512; [ "$scene" = veachdoor ] && gtspp=128
  out=.bench_cache/relmse_${scene}.json
  [ -s "$out" ] && continue
  for attempt in $(seq 1 12); do
    echo "=== $scene attempt $attempt $(date -u +%H:%M:%S) ===" >&2
    if timeout 7200 python bench_relmse.py --scene $scene --chunk 4096 \
        --gt-spp $gtspp \
        > .bench_cache/relmse_${scene}.out 2> .bench_cache/relmse_${scene}.err; then
      grep -o '{.*}' .bench_cache/relmse_${scene}.out | tail -1 > "$out"
      [ -s "$out" ] && break
    fi
    echo "--- attempt $attempt failed; tail of err:" >&2
    tail -5 .bench_cache/relmse_${scene}.err >&2
    sleep 60
  done
done
echo "RELMSE RUNNER DONE $(date -u)" >&2
