#!/bin/bash
# Round-3 bench sweep: batch sizes and XLA flag probes, sequential (one relay).
cd /root/repo
echo "=== B=3 steps=16 (timing variance check) ==="
BENCH_STEPS=16 timeout 590 python bench.py 2>/dev/null
echo "=== B=2 ==="
BENCH_BATCH=2 timeout 590 python bench.py 2>/dev/null
echo "=== B=4 ==="
BENCH_BATCH=4 timeout 590 python bench.py 2>/dev/null
echo "=== B=3 + latency hiding scheduler off (probe) ==="
LIBTPU_INIT_ARGS="" XLA_FLAGS="--xla_latency_hiding_scheduler_rerun=2" timeout 590 python bench.py 2>/dev/null
echo "=== B=3 + aggressive fusion flags ==="
XLA_FLAGS="--xla_tpu_rwb_fusion=true --xla_tpu_enable_dot_strength_reduction=true" timeout 590 python bench.py 2>/dev/null
echo "=== done ==="
