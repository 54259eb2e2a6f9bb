#!/bin/bash
# Round-4 TPU measurement plan (the tunnel was down through most of r3 and
# the start of r4). Run ONE AT A TIME on a live chip; probe first.
# Supersedes tools/r3_tpu_followup.sh.
set -e

echo "== probe (must print in seconds; if it hangs, STOP — outage mode) =="
timeout 120 python -c "
import jax, jax.numpy as jnp
from dpot_tpu.utils.profiling import fence
print('TPU alive:', fence(jnp.ones((4,4)) @ jnp.ones((4,4))))"

echo "== 1. headline control (reference-exact M B=8) =="
timeout 580 python bench.py

echo "== 2. the three r3 levers (VERDICT item 1) =="
timeout 580 env DPOT_BENCH_ENTRY=m8_bf16mom python bench.py
timeout 580 env DPOT_BENCH_ENTRY=ti8_scan8 python bench.py
timeout 580 env DPOT_BENCH_ENTRY=s8_scan4 python bench.py

echo "== 3. profile the 14ms fwd+bwd at M (VERDICT item 2) =="
timeout 580 python tools/profile_step.py M 8

echo "== 4. H-scale sweep (VERDICT item 9) =="
timeout 580 env DPOT_BENCH_ENTRY=h_best python bench.py

echo "== 5. full ladder refresh (quiet host; ~25 min) =="
echo "   DPOT_BENCH_LADDER=1 python bench.py > BENCH_LADDER_r04.jsonl"
