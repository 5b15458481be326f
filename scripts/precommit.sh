#!/usr/bin/env bash
# Pre-commit guard: the repo must never be committed uncompiled.
# Round 6 ended with an undefined symbol at HEAD and zeroed the whole
# round's correctness + bench signal; this makes that impossible.
#
# Usage: scripts/precommit.sh [--test]
#   (no args)  sbt Test/compile  — main + test sources must compile
#   --test     additionally runs the full scalatest suite
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch Test/compile
if [[ "${1:-}" == "--test" ]]; then
  sbt -batch test
fi
echo "precommit: OK"
