#!/usr/bin/env bash
# Test tiers (VERDICT r3 item 9).  Run from the repo root on a QUIET host
# (concurrent jobs on this 1-core image roughly double wall times).
#
#   ./ci.sh fast   — `pytest -m "not slow"` smoke+core tier; target <10 min.
#                    Use while iterating (pre-push).
#   ./ci.sh full   — the whole pyramid incl. slow end-to-end tests; ~40 min.
#                    This is the pre-commit gate for engine-numerics changes
#                    and the only tier that counts as "the suite ran green".
#
# Every green FULL run appends a line to .ci_runs.log (commit, wall, date)
# so "when did the whole pyramid last pass" has a recorded answer
# (CLAUDE.md quotes the latest line).
set -u
tier="${1:-fast}"
shift || true
case "$tier" in
  fast) marker=(-m "not slow") ;;
  full) marker=() ;;
  *) echo "usage: ./ci.sh [fast|full] [extra pytest args]" >&2; exit 2 ;;
esac
start=$(date +%s)
python -m pytest tests/ -q "${marker[@]}" "$@"
rc=$?
wall=$(( $(date +%s) - start ))
echo "tier=$tier rc=$rc wall=${wall}s"
if [[ "$tier" == full && $rc -eq 0 ]]; then
  echo "$(date -u +%FT%TZ) commit=$(git rev-parse --short HEAD) wall=${wall}s green" >> .ci_runs.log
fi
exit $rc
