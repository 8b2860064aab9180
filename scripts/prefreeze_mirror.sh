#!/bin/sh
# Pre-freeze discipline (registry.py _CHECK_PRIORITY contract): before a
# round's priority window is committed, prove every name in it against
# the DuckDB oracle at the DRIVER'S gate scale (sf0.01), not just the
# default sf0.001 suite. Usage:  sh scripts/prefreeze_mirror.sh
set -e
cd "$(dirname "$0")/.."
# -k is substring matching, so prefix collisions select a superset of
# the window (e.g. q_agg_approx also picks q_agg_approx_quantile) —
# harmless: proving more than the window is never wrong.
NAMES=$(python - <<'EOF'
from sigma_rx7_spark.registry import _CHECK_PRIORITY
print(" or ".join(_CHECK_PRIORITY))
EOF
)
exec env SIGMA_TEST_SF_DIR=/root/testdata/sf0.01 \
    python -m pytest tests/test_oracle_mirror.py -q -k "$NAMES"
