#!/usr/bin/env bash
# Round-close artifact gate (VERDICT r10 item 9): accuracy artifacts must
# never be OLDER than the code they certify. Regenerates recall_report.json
# from the current build, then enforces mtime ordering: every certifying
# artifact must postdate the newest file in src/main. regime_boundary.json
# is expensive (~6 min) so staleness there is a loud warning with the
# regeneration command, not an auto-run.
#
# Usage: tools/round_close.sh   (run AFTER the last code change of a round)
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" sbt -batch \
  "runMain graft.RecallReport /root/testdata/sf0.01 recall_report.json" \
  | grep -E "\[recall\]|all_pass" || true

python3 - <<'EOF'
import json, os, sys
newest_src, newest_f = max(
    (os.path.getmtime(os.path.join(r, f)), os.path.join(r, f))
    for r, _, fs in os.walk('src/main') for f in fs)
problems = []
rr = json.load(open('recall_report.json'))
if not rr.get('all_pass', False):
    problems.append('recall_report.json is not all_pass')
if os.path.getmtime('recall_report.json') < newest_src:
    problems.append(f'recall_report.json predates {newest_f}')
if os.path.getmtime('regime_boundary.json') < newest_src:
    print(f'WARN regime_boundary.json predates {newest_f} - regenerate with '
          f'"sbt -batch \'runMain graft.RegimeBoundary\'" if mining/ANN/graph '
          f'code changed this round')
if problems:
    print('GATE FAIL:')
    for p in problems: print('  ' + p)
    sys.exit(1)
print('GATE OK: recall_report.json fresh (newest src: %s) and all_pass' % newest_f)
EOF
