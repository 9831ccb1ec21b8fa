#!/bin/sh
# Training-throughput frontier scan (batch, groups, remat) on the real chip.
# Each non-default config compiles a fresh program through the remote-compile
# tunnel (~10-15 min); results append as JSON lines to $OUT.
# The shipped flagship point (batch 8, groups 2, remat none) is the cached
# 19.62 img/s/chip baseline from BENCH_r03.json.
OUT=${OUT:-/tmp/frontier_scan.jsonl}
: > "$OUT"
for cfg in "none 12 3" "block 12 3" "block 16 4" "convs 12 3" "convs 16 4"; do
  set -- $cfg
  echo "=== remat=$1 batch=$2 groups=$3 ===" >&2
  if timeout 2400 python bench.py --mode step --remat "$1" \
       --batch "$2" --groups "$3" --iters 10 >> "$OUT" 2>/tmp/frontier_err.log
  then :; else
    echo "{\"remat\": \"$1\", \"batch\": $2, \"groups\": $3, \"error\": \"$(tail -1 /tmp/frontier_err.log | tr '\"' "'" | cut -c1-200)\"}" >> "$OUT"
  fi
done
echo "frontier scan done" >&2
