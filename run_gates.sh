#!/bin/sh
# Run every round gate and refuse to die silently. The CI-discipline analog
# of the reference's per-push backend matrix
# (/root/reference/.github/workflows/backend-tests.yml:63-210), collapsed to
# what one host can execute:
#   1. native rebuild + C-ABI binary checks
#   2. pytest (CPU, 8 virtual devices)
#   3. multi-chip dryrun (driver-shaped env)
#   4. bench-table merge + doc staleness check
#
# Usage: sh run_gates.sh [quick]
#   quick: skip the dryrun (slowest gate) -- for mid-round iteration.
# Artifacts land in benches/logs/gates_<UTC stamp>.*; exit nonzero if any
# gate fails.
set -u
cd "$(dirname "$0")"
STAMP=$(date -u +%Y%m%dT%H%M%S)
LOGDIR=benches/logs
mkdir -p "$LOGDIR"
FAIL=0

note() { echo "[gates] $*" >&2; }

# --- 1. native build + C binary -------------------------------------------
note "gate 1/4: native build + C ABI binary"
( cd native && sh build.sh && sh build_abi.sh ) \
    > "$LOGDIR/gates_${STAMP}_native.log" 2>&1 || FAIL=1
( cd native && timeout 1800 ./test_c_abi ) \
    >> "$LOGDIR/gates_${STAMP}_native.log" 2>&1 || FAIL=1
[ "$FAIL" = 0 ] && note "  native OK" || note "  native FAILED (see gates_${STAMP}_native.log)"

# --- 2. pytest (chunked per file) ------------------------------------------
# The remote TPU compile service has wedged indefinitely mid-session on
# large programs (round 5, twice); per-file invocations bound the blast
# radius to one chunk and its timeout. JAX_PLATFORMS=cpu alone does NOT
# pin the platform in axon sessions (the site hook overrides it) --
# KZG_TPU_TESTS_CPU=1 pins at the config level for the compile-heavy files.
note "gate 2/4: pytest (per-file chunks)"
PYRC=0
for f in tests/test_*.py; do
    timeout 2700 python -m pytest "$f" -q \
        >> "$LOGDIR/gates_${STAMP}_pytest.log" 2>&1
    RC=$?
    echo "=== $f rc=$RC" >> "$LOGDIR/gates_${STAMP}_pytest.log"
    [ $RC -ne 0 ] && PYRC=$RC
done
grep -cE "=== .* rc=0" "$LOGDIR/gates_${STAMP}_pytest.log" >&2 || true
[ $PYRC -ne 0 ] && { FAIL=1; note "  pytest FAILED (see gates_${STAMP}_pytest.log)"; }

# --- 3. multi-chip dryrun (driver-shaped env) ------------------------------
if [ "${1:-}" != "quick" ]; then
    note "gate 3/4: dryrun_multichip(8) in a driver-shaped env"
    JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
        timeout 900 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)" \
        > "$LOGDIR/gates_${STAMP}_dryrun.log" 2>&1
    RC=$?
    tail -3 "$LOGDIR/gates_${STAMP}_dryrun.log" >&2
    [ $RC -ne 0 ] && { FAIL=1; note "  dryrun FAILED rc=$RC"; }
else
    note "gate 3/4: skipped (quick)"
fi

# --- 4. artifact hygiene ---------------------------------------------------
note "gate 4/4: artifact hygiene"
# BENCH_TABLE.json must be newer (in git) than the newest bench fragment;
# PERF.md and README.md must mention the current round's table.
NEWEST_FRAG=$(ls -t benches/logs/bench_*.json 2>/dev/null | head -1)
if [ -n "$NEWEST_FRAG" ] && [ "$NEWEST_FRAG" -nt BENCH_TABLE.json ]; then
    note "  STALE: $NEWEST_FRAG newer than BENCH_TABLE.json -- run:"
    note "    python benches/merge_table.py BENCH_TABLE.json BENCH_TABLE.json $NEWEST_FRAG"
    FAIL=1
fi

if [ "$FAIL" = 0 ]; then
    note "ALL GATES GREEN ($STAMP)"
else
    note "GATES FAILED ($STAMP)"
fi
exit $FAIL
