#!/bin/bash
# Round-5 chip session: probe, intv/lane/knob sweep, component budget.
# Run from repo root; logs to .bench/r5_session.log.  Each step has its
# own timeout; failures don't stop the agenda.
cd "$(dirname "$0")/.."
LOG=.bench/r5_session.log
export JAX_COMPILATION_CACHE_DIR=$PWD/.jaxcache
stamp() { date +%H:%M:%S; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }

say "=== r5 session start"
if ! timeout 180 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128,128))
print('PROBE_OK', d[0].platform, float((x@x).sum()))
" 2>&1 | tee -a "$LOG" | grep -q PROBE_OK; then
  say "tunnel DOWN - exiting"
  exit 3
fi
say "tunnel UP"

say "=== sweep_r5 (intv x lanes x knobs, fresh process each)"
timeout 14400 python scripts/sweep_r5.py 2>&1 | tee -a "$LOG"

say "=== component budget at intv=64 (B=1024)"
IBWA_DEV_INTV=64 timeout 3600 python scripts/profile_step.py --mode budget \
  2>&1 | tee -a "$LOG"
mv .bench/profile_budget.json .bench/profile_budget_intv64.json 2>/dev/null

say "=== lane profile at intv=64"
IBWA_DEV_INTV=64 timeout 3600 python scripts/profile_step.py --mode lanes \
  --lanes 256 1024 2048 4096 2>&1 | tee -a "$LOG"
mv .bench/profile_lanes.json .bench/profile_lanes_intv64.json 2>/dev/null

say "=== r5 session done"
