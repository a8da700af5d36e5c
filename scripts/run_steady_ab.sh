#!/bin/bash
# Round-4 steady-regime adaptive-lever A/B (VERDICT r3 #3): profile the
# four lever combos from a genuinely SHARP checkpoint (the round-3 bench
# restored a step-300 fog-regime checkpoint, which invalidated its
# steady signal — docs/ROADMAP.md round-4 #1).
#
# Usage: REN_AB_CKPT=<ckpt.npz> bash scripts/run_steady_ab.sh [arch] [budget] [outdir]
# Defaults to the ngp prefix run's last.npz (always-newest via
# checkpoint.save_last) at the reference 2^20 budget with the run's
# 32768-ray capacity.
set -u
cd "$(dirname "$0")/.."
ARCH="${1:-ngp}"
BUDGET="${2:-20}"
OUT="${3:-/tmp/steady_ab_$ARCH}"
CKPT="${REN_AB_CKPT:-logs/train/ngp-64-r4/version_0/checkpoints/last.npz}"
mkdir -p "$OUT"

run() { # name env...
  local name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  env REN_PROFILE_CKPT="$CKPT" REN_PROF_CAP=32768 "$@" \
    timeout 2400 python scripts/profile_hotpath.py "$ARCH" "$BUDGET" \
    > "$OUT/ab_${ARCH}_${name}.log" 2>&1
  grep -E "steady batch|marched total|visible total|viscompact|march_fwd|field_f.b|render|train_step" \
    "$OUT/ab_${ARCH}_${name}.log" | tail -10
}

run baseline    REN_VISIBLE_COMPACT=0 REN_SAMPLE_BUCKETS=1
run ladder4     REN_VISIBLE_COMPACT=0 REN_SAMPLE_BUCKETS=4
run viscompact  REN_VISIBLE_COMPACT=1 REN_SAMPLE_BUCKETS=1
run both        REN_VISIBLE_COMPACT=1 REN_SAMPLE_BUCKETS=4
