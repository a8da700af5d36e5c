#!/bin/bash
# Round-3 adaptive-compute lever validation at the reference 2^20 budget
# (docs/PERFORMANCE.md "Open levers"): serial A/B of the visible-compact
# render and the sample-prefix ladder on an otherwise idle chip.
#
# Usage: bash scripts/bench_levers.sh [arch] [budget_log2] [outdir]
# Set REN_PROFILE_CKPT=<checkpoint.npz> in the calling env to profile
# the SHARP regime (a trained field; e.g. logs/train/tpu-sphere-full/
# version_0/checkpoints/epoch=39-step=40000.npz for tensorf) — the
# visible-compact lever only pays off there.
# Each combo is one fresh process (one compile each; the persistent
# compile cache dedups recompiles across reruns).  Timings land in
# <outdir>/levers_<arch>_<combo>.log; grep 'step' for the totals.
set -u
cd "$(dirname "$0")/.."
ARCH="${1:-ngp}"
BUDGET="${2:-20}"
OUT="${3:-/tmp/levers_$ARCH}"
mkdir -p "$OUT"

run() { # name env...
  local name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  env "$@" timeout 2400 python scripts/profile_hotpath.py "$ARCH" "$BUDGET" \
    > "$OUT/levers_${ARCH}_${name}.log" 2>&1
  tail -8 "$OUT/levers_${ARCH}_${name}.log"
}

run baseline        REN_VISIBLE_COMPACT=0 REN_SAMPLE_BUCKETS=1
run viscompact      REN_VISIBLE_COMPACT=1 REN_SAMPLE_BUCKETS=1
run vis_buckets4    REN_VISIBLE_COMPACT=1 REN_SAMPLE_BUCKETS=4
run vis_buckets4_bf16 REN_VISIBLE_COMPACT=1 REN_SAMPLE_BUCKETS=4 REN_BF16_TABLES=1
