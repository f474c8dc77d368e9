#!/bin/bash
# Round-3 TPU re-measurement checklist (run when the axon tunnel is back).
# Each step appends to /tmp/tpu_r3_results.log; steps are independent so a
# tunnel drop mid-script loses only the current step.
#
# Context: the banded boundary solver (ops/banded.py, boundary_solver
# "banded"/"auto") landed while the tunnel was down. CPU interleaved
# measurement at the COUPLED_r03 headline config (n_parts=120, n_b=952,
# bw=11): banded 9.3x the CG path per batch (docs/TUNING.md). If any of
# that carries to the v5e, the coupled headline moves well past the
# >2,000 solves/sec round-3 target.
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_r3_results.log
echo "=== $(date) tpu_remeasure_r3 start" >> "$LOG"

# 0. Tunnel sanity (fail fast).
timeout 240 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform != 'cpu'" >> "$LOG" 2>&1 || { echo "TUNNEL DOWN" >> "$LOG"; exit 1; }

# 1. Coupled sweep with the banded + auto boundary at the headline config.
#    (Warm cache: the first run pays tunnel compile; keep reps modest.)
timeout 3600 python benches/coupled_bench.py --copies 256 --reps 3 \
  --n-parts 120 --boundary banded >> "$LOG" 2>&1
timeout 1800 python benches/coupled_bench.py --copies 256 --reps 3 \
  --n-parts 120 --boundary cg >> "$LOG" 2>&1
timeout 1800 python benches/coupled_bench.py --copies 256 --reps 3 \
  --n-parts 120 --boundary auto >> "$LOG" 2>&1

# 2. TPU latency rows: the decomposed single-solve path (BlockProgram)
#    landed after LATENCY_r03's TPU rows were measured; massive[200|600]
#    should drop from 69-139ms sync toward the ~34ms tunnel floor.
timeout 3600 python benches/solver_bench.py --latency --iters 30 --json \
  >> "$LOG" 2>&1

# 3. bench.py sanity (headline fused-kernel number still reproduces).
timeout 3600 python bench.py >> "$LOG" 2>&1

echo "=== $(date) tpu_remeasure_r3 done" >> "$LOG"
