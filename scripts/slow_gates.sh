#!/bin/bash
# Per-round Slow-gate runner: executes EVERY graft.Slow-tagged test —
# the engine's heaviest standing guarantees (full TEASER CBF golden,
# 2M-window bulk-layout exactness, over-cap distributed-BPE parity,
# 1M-doc packing invariants, 100k-doc span excision, distributed
# Shotgun fallback parity) — and appends a dated record to
# SLOW_RUNS.md so each round carries a committed proof that the
# guarantees still hold on current code (they are excluded from the
# default `sbt test` by build.sbt's `-l graft.Slow`).
#
# Usage: scripts/slow_gates.sh [round-label]
set -o pipefail
cd "$(dirname "$0")/.."
LABEL=${1:-adhoc}
# `test` (not a hardcoded suite list): the tag filter selects every
# graft.Slow-tagged test wherever it lives, so a new Slow gate can
# never be silently excluded from the record
LOG=$(mktemp /tmp/slow_gates_XXXXXX.log)
sbt -batch \
  'set Test/testOptions := Seq(Tests.Argument(TestFrameworks.ScalaTest, "-n", "graft.Slow"))' \
  test 2>&1 | tee "$LOG"
RC=${PIPESTATUS[0]}
SUMMARY=$(grep -E "^\[info\] Tests: succeeded" "$LOG" | tail -1 | sed 's/^\[info\] //')
[ -z "$SUMMARY" ] && SUMMARY="(no ScalaTest summary line — see log)"
STATUS=$([ "$RC" -eq 0 ] && echo GREEN || echo RED)
{
  echo "- $(date -u +%Y-%m-%dT%H:%M:%SZ) [$LABEL] $STATUS rc=$RC @ $(git rev-parse --short HEAD) — $SUMMARY"
} >> SLOW_RUNS.md
echo "recorded: $(tail -1 SLOW_RUNS.md)"
exit "$RC"
