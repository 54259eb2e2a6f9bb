#!/bin/bash
# Round-3 TPU follow-up measurements (the tunnel went down mid-round).
# Run ONE AT A TIME on a live chip; probe first. Each line prints one
# JSON record — append the interesting ones to BENCH_LADDER_r03.jsonl
# and refresh CLAUDE.md's measured notes.
set -e

echo "== probe (must print in ~seconds; if it hangs, STOP) =="
timeout 120 python -c "
import jax, jax.numpy as jnp
from dpot_tpu.utils.profiling import fence
print('TPU alive:', fence(jnp.ones((4,4)) @ jnp.ones((4,4))))"

echo "== headline control (reference-exact M B=8) =="
timeout 580 python bench.py

echo "== bf16 FIRST-moment A/B (mu-only after the r3 numerics fix —"
echo "   the earlier 56.9 steps/s was a both-moments build) =="
timeout 580 env DPOT_BENCH_ENTRY=m8_bf16mom python bench.py

echo "== fused multi-step dispatch on the dispatch-bound presets =="
timeout 580 env DPOT_BENCH_ENTRY=ti8_scan8 python bench.py
timeout 580 env DPOT_BENCH_ENTRY=s8_scan4 python bench.py

echo "== H-scale with the memory levers (grad_accum x bf16-mu) =="
timeout 580 env DPOT_BENCH_PRESET=H DPOT_BENCH_BATCH=4 DPOT_BENCH_REMAT=1 \
    DPOT_BENCH_MOM=bfloat16 DPOT_BENCH_ACCUM=2 python bench.py

echo "== full ladder refresh (only on a quiet host; ~20 min) =="
echo "   DPOT_BENCH_LADDER=1 python bench.py > BENCH_LADDER_r03.jsonl"
