#!/bin/bash
# Fresh-session-survivable test suite (VERDICT r4 #4).
#
# Two consecutive judge sessions segfaulted inside JAX's persistent
# compilation-cache machinery (read path once, write path once) when
# the FULL suite ran in one long pytest process (~40-70 min in, during
# test_tvl1.py compiles) — while test_tvl1.py alone passes in under a
# minute.  The crash tracks accumulated single-process state, not any
# test: process boundaries bound it.  This script is the documented
# command sequence; each group is a fresh interpreter, all groups share
# /tmp/jax_cache (conftest.py enables it), and a failure stops the run.
#
#   bash scripts/run_suite.sh            # full suite, 3 processes
#   bash scripts/run_suite.sh -m 'not slow'   # skip full-res interpret cases
#
# Measured on this host (see CLAUDE.md "Test-suite cost tiers").
set -e
cd "$(dirname "$0")/.."

t0=$SECONDS
# Group 1: everything except the two heaviest compile groups.
python -m pytest tests/ -q -p no:cacheprovider \
    --ignore=tests/test_tvl1.py --ignore=tests/test_fused_driver.py \
    --ignore=tests/test_pallas_interpret.py "$@"
echo "== group 1 done at ${SECONDS}s"
# Group 2: TV-L1 (the file both judge-session crashes died in).
python -m pytest tests/test_tvl1.py -q -p no:cacheprovider "$@"
echo "== group 2 (tvl1) done at ${SECONDS}s"
# Group 3: interpret-mode Pallas + full fused-driver differentials.
python -m pytest tests/test_fused_driver.py tests/test_pallas_interpret.py \
    -q -p no:cacheprovider "$@"
echo "== group 3 (fused/interpret) done at ${SECONDS}s"
echo "SUITE GREEN in $((SECONDS - t0))s"
