#!/usr/bin/env bash
# Round-open hygiene: stage + commit any driver artifacts left untracked
# or modified by the previous round's judge/driver run (BENCH_r*.json,
# CORRECTNESS_r*.json, refreshed baselines, VERDICT/ADVICE). Run this
# FIRST each round so the artifacts land in history even if the round
# is later interrupted. Idempotent: commits nothing when clean.
set -euo pipefail
cd "$(dirname "$0")/.."

files=(BENCH_r*.json CORRECTNESS_r*.json BENCH_BASELINE_*.json \
       BENCH_SCALED.json COPYCHECK.json LEAKCHECK.json VERDICT.md ADVICE.md)
changed=0
for f in "${files[@]}"; do
  if [ -e "$f" ] && ! git diff --quiet -- "$f" 2>/dev/null; then changed=1; fi
  if [ -e "$f" ] && [ -n "$(git status --porcelain -- "$f")" ]; then changed=1; fi
done
if [ "$changed" = "1" ]; then
  git add "${files[@]}" 2>/dev/null || true
  git commit -m "round open: commit driver artifacts from previous round" \
    || echo "round_open: nothing staged to commit"
else
  echo "round_open: artifacts already committed"
fi
