#!/bin/bash
# FMGWS / native-stateful streaming stress sweep -> SCALE.md §r12.
# Each line: op keys eventsPerKey files provider
set -u
OUT=${1:-/tmp/stress_sweep.log}
: > "$OUT"
run() {
  echo "=== $* ===" >> "$OUT"
  SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.tools.StreamStress $*" 2>&1 \
    | grep "STRESS" >> "$OUT"
}
# key-cardinality ladder, default vs RocksDB (verdict item 1)
run rolling 100000 8 4 default
run rolling 100000 8 4 rocksdb
run rolling 1000000 8 4 default
run rolling 1000000 8 4 rocksdb
run asof 100000 8 4 default
run asof 100000 8 4 rocksdb
run asof 1000000 8 4 default
run asof 1000000 8 4 rocksdb
run asof_composite 1000000 8 4 default
run gapfill 1000000 8 4 default
run gapfill 1000000 8 4 rocksdb
run transitions 1000000 8 4 default
run transitions 1000000 8 4 rocksdb
# native window/session state paths at 1M keys
run tumbling 1000000 8 4 default
run tumbling 1000000 8 4 rocksdb
run sessions 1000000 8 4 default
run sessions 1000000 8 4 rocksdb
# long-horizon replays (verdict item 4): 24 micro-batches, growing
# session state / rolling pendings maintained across a long run
run rolling 100000 48 24 default
run tumbling 100000 48 24 default
run sessions 100000 48 24 default
run sessions 100000 48 24 rocksdb
echo DONE >> "$OUT"
