#!/bin/sh
# One-entrypoint round battery (SURVEY.md §5): a round cannot ship with
# a sweep silently skipped. Order mirrors the per-round discipline:
#
#   1. full pytest suite at sf0.001 (oracle mirror + properties + plans)
#   2. empty-input robustness sweep (every registered query on zero-row
#      tables; exits nonzero on any crash)
#   3. scaling curves with the superlinear gate (g10 > 14 fails: 10x
#      rows should cost ~<=10x above the floor; the margin absorbs the
#      measured noise of this box)
#   4. pre-freeze driver-scale mirror of the _CHECK_PRIORITY window
#      (sf0.01 — the external gate scale)
#   5. registry-wide physical-plan audit (zero CartesianProduct; no
#      BNLJ growth beyond the adjudicated baseline — the scale-killer
#      sweep, plan compilation only)
#
# Run from anywhere:  sh scripts/ci.sh
# Takes ~30-35 min end to end on the local[32] box.
set -e
cd "$(dirname "$0")/.."

echo "=== [1/5] full suite (sf0.001) ==="
python -m pytest tests/ -x -q

echo "=== [2/5] empty-input sweep ==="
python scripts/empty_input_sweep.py

echo "=== [3/5] scaling curves (superlinear gate) ==="
python scripts/scaling_curves.py --fail-over 14

echo "=== [4/5] pre-freeze mirror at the driver gate scale (sf0.01) ==="
sh scripts/prefreeze_mirror.sh

echo "=== [5/5] registry-wide plan audit (scale-killer sweep) ==="
python scripts/plan_audit.py

echo "ci.sh: ALL GREEN"
