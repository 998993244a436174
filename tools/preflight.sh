#!/usr/bin/env bash
# End-of-round preflight gate (r7 verdict #4).
#
# Round 6 shipped an empty CORRECTNESS json and an rc=1 BENCH because the
# tree at round end did not compile the Verify/Bench mains. This script
# makes that structurally impossible to miss: a round MUST end with a
# green preflight, which
#   1. compiles main + test sources,
#   2. runs graft.Verify end-to-end at sf0.001 and checks it produced a
#      non-empty oracle_sql.json plus one parquet result dir per query,
#   3. runs graft.Bench on a 1-query subset and checks it emits a
#      parseable JSON line with a non-negative total,
#   4. writes PREFLIGHT.json (the stamp: git sha, timestamps, counts)
#      at the repo root — commit it as the round's last commit.
#
# Usage: tools/preflight.sh   (from the repo root; exits non-zero on any
# failure, and then PREFLIGHT.json is NOT written)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_SMOKE=${SF_SMOKE:-/root/testdata/sf0.001}
OUT=$(mktemp -d /tmp/graft-preflight.XXXXXX)
trap 'rm -rf "$OUT"' EXIT

echo "[preflight] 1/3 compile (main + test)"
sbt -batch compile Test/compile > "$OUT/compile.log" 2>&1 || {
  echo "[preflight] FAIL: compile — tail of log:"; tail -20 "$OUT/compile.log"; exit 1; }

echo "[preflight] 2/3 Verify at $SF_SMOKE"
sbt -batch "runMain graft.Verify $SF_SMOKE $OUT/verify" \
  > "$OUT/verify.log" 2>&1 || {
  echo "[preflight] FAIL: Verify exited non-zero — tail of log:";
  tail -20 "$OUT/verify.log"; exit 1; }
[ -s "$OUT/verify/oracle_sql.json" ] || {
  echo "[preflight] FAIL: oracle_sql.json missing or empty"; exit 1; }
python3 - "$OUT/verify" <<'EOF' || exit 1
import json, sys, glob, os
out = sys.argv[1]
oracle = json.load(open(f"{out}/oracle_sql.json"))
assert len(oracle) > 0, "oracle_sql.json parsed but has no entries"
qdirs = [d for d in glob.glob(f"{out}/*/") ]
missing = [d for d in qdirs if not glob.glob(f"{d}/*.parquet")]
assert not missing, f"query dirs with no parquet output: {missing}"
assert len(qdirs) > 0, "Verify produced zero query result dirs"
print(f"[preflight]   verify ok: {len(qdirs)} query outputs, "
      f"{len(oracle)} oracle entries")
EOF
# every query the contract claims must have produced output — a query
# that THREW inside Verify leaves no dir and must fail the preflight
python3 - "$OUT/verify" <<'EOF' || exit 1
import sys, glob, os, re
out = sys.argv[1]
produced = {os.path.basename(d.rstrip('/')) for d in glob.glob(f"{out}/*/")}
src = open("src/main/scala/graft/SparkEntry.scala").read()
queries_block = src.split("def queries")[1].split("def benchQueries")[0]
declared = set(re.findall(r'"([a-z0-9_]+)"\s*->', queries_block))
missing = sorted(declared - produced)
assert not missing, f"queries declared but produced no output: {missing}"
print(f"[preflight]   all {len(declared)} declared queries produced output")
EOF

# Output-dtype audit (r9 verdict #2): eval_auc/eval_auc_by were
# cell-exact locally but hash-red on the driver board because their
# OUTPUT carried a decimal128(38,0) column — the driver's hash compare
# serializes decimals differently from DuckDB's. Queries may use any
# type INTERNALLY, but result schemas must stay inside the proven-safe
# set (every r9-green query emits only these). Anything else (decimal,
# struct, list, binary, interval, ...) fails here unless allowlisted.
echo "[preflight] 2b/3 output-dtype audit"
python3 - "$OUT/verify" <<'EOF' || exit 1
import sys, glob, os, re
import pyarrow.parquet as pq
out = sys.argv[1]
SAFE = re.compile(r'^(bool|int8|int16|int32|int64|float|double|string'
                  r'|large_string|date32\[day\]|timestamp\[[a-z]+\])$')
ALLOW = {}  # (query, column) -> reason, for deliberate exceptions
bad = []
for d in sorted(glob.glob(f"{out}/*/")):
    q = os.path.basename(d.rstrip('/'))
    fs = glob.glob(d + "*.parquet")
    if not fs:
        continue
    for f in pq.read_schema(fs[0]):
        if not SAFE.match(str(f.type)) and (q, f.name) not in ALLOW:
            bad.append(f"{q}.{f.name}: {f.type}")
assert not bad, ("non-hash-safe output column types (cast them in the "
                 "driver query, keep the wide type internal): "
                 + ", ".join(bad))
print("[preflight]   dtype audit ok: all result columns hash-safe")
EOF

echo "[preflight] 3/3 Bench smoke (1 query, $SF_SMOKE)"
SPARK_GRAFT_SF_DIR="$SF_SMOKE" SPARK_GRAFT_CPUS=4 \
SPARK_GRAFT_BENCH_QUERIES=q1_agg \
  sbt -batch "runMain graft.Bench" > "$OUT/bench.log" 2>&1 || {
  echo "[preflight] FAIL: Bench exited non-zero — tail of log:";
  tail -20 "$OUT/bench.log"; exit 1; }
BENCH_LINE=$(grep -o '{"metric".*}' "$OUT/bench.log" | tail -1)
python3 - "$BENCH_LINE" <<'EOF' || exit 1
import json, sys
b = json.loads(sys.argv[1])
assert b.get("value", -1) >= 0, f"bench total is negative: {b}"
assert not b.get("errors"), f"bench smoke query errored: {b['errors']}"
print(f"[preflight]   bench ok: total={b['value']:.2f}s")
EOF

GIT_SHA=$(git rev-parse HEAD)
N_Q=$(ls -d "$OUT"/verify/*/ | wc -l)
cat > PREFLIGHT.json <<EOF
{
  "git_sha": "$GIT_SHA",
  "utc": "$(date -u +%FT%TZ)",
  "verify_query_outputs": $N_Q,
  "bench_smoke": $BENCH_LINE
}
EOF
echo "[preflight] OK — stamp written to PREFLIGHT.json (commit it)"
