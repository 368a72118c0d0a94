#!/usr/bin/env bash
# The merge gate, as one command. Run before every commit that touches
# an operator or catalog query:
#   1. full-catalog Spark-vs-DuckDB oracle verify at sf0.01
#   2. physical-plan audit regenerated into PLANS.md (the plan-audit
#      pytest fails any query missing from it, so this CANNOT be skipped
#      when adding queries)
#   3. SURVEY.md §2 status block regenerated from the catalog/bench/
#      CORRECTNESS_FULL counts (stale-claim findings can't recur)
#   4. pytest (includes tests/test_plan_audit_gate.py)
set -euo pipefail
cd "$(dirname "$0")/.."

python tools/verify_oracle.py /root/testdata/sf0.01 --json CORRECTNESS_FULL.json
python tools/explain_audit.py /root/testdata/sf0.01 > PLANS.md
python tools/render_survey_status.py
python -m pytest tests/ -x -q
