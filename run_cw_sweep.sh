#!/bin/bash
# Chunk-walk kernel variants at the step's real ray shapes. Ordered by
# information value: (1) VMEM-resident vs DMA at the default tile sizes,
# then (2) tile-size variants on whichever is faster. Each combo is a
# fresh process (kernel constants are module-level). Run ONLY when no
# other TPU process is active.
cd /root/repo
out=.bench_cache/cw_sweep.jsonl
touch "$out"
combo() {  # $1 rb, $2 tc, $3 vmem_bytes, $4 tag
  grep -q "\"tag\": \"$4\"" "$out" 2>/dev/null && return 0
  echo "=== $4 (rb=$1 tc=$2 vmem=$3) $(date -u +%H:%M:%S) ===" >&2
  LMC_CW_RAY_BLOCK=$1 LMC_CW_TRI_CHUNK=$2 LMC_CW_VMEM_BYTES=$3 \
    timeout 1200 python bench_chunkwalk.py 2>.bench_cache/cw_sweep.err \
    | sed "s/^{/{\"tag\": \"$4\", /" >> "$out" \
    || { echo "combo $4 failed:" >&2; tail -3 .bench_cache/cw_sweep.err >&2; }
}
combo 256 128 6291456 res_256_128
combo 256 128 0       dma_256_128
combo 128 128 6291456 res_128_128
combo 512 128 6291456 res_512_128
combo 256 256 6291456 res_256_256
combo 256 64  6291456 res_256_64
echo "CW SWEEP DONE $(date -u)" >&2
