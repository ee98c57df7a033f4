#!/bin/bash
# round-3 perf matrix: optimizer byte cuts + batch re-sweep on the real chip
cd /root/repo
LOG=/root/repo/scripts/r3/bench_matrix.log
: > $LOG
run() {
  echo "=== $* ===" >> $LOG
  env "$@" python bench.py >> $LOG 2>&1
  echo "" >> $LOG
}
run BENCH_NU_FACTORED=1 BENCH_PARAM_MIRROR=0 BENCH_BATCH=3
run BENCH_NU_FACTORED=0 BENCH_PARAM_MIRROR=1 BENCH_BATCH=3
run BENCH_NU_FACTORED=1 BENCH_PARAM_MIRROR=1 BENCH_BATCH=3
run BENCH_NU_FACTORED=1 BENCH_PARAM_MIRROR=1 BENCH_BATCH=4
run BENCH_NU_FACTORED=1 BENCH_PARAM_MIRROR=1 BENCH_BATCH=6
echo DONE >> $LOG
