#!/bin/bash
# Round-5 measurement agenda, tunnel-drop tolerant.  Each item is
# idempotent/resumable; the loop probes before every item and sleeps
# through downtime.  Logs to .bench/r5_agenda.log.
cd "$(dirname "$0")/.."
LOG=.bench/r5_agenda.log
export JAX_COMPILATION_CACHE_DIR=$PWD/.jaxcache
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  timeout 180 python -c "
import jax
assert jax.default_backend() != 'cpu'
import jax.numpy as jnp
(jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()
print('UP')" 2>/dev/null | grep -q UP
}

wait_up() {
  for i in $(seq 1 40); do
    if probe; then return 0; fi
    say "tunnel down (probe $i) - sleeping 240s"
    sleep 240
  done
  return 1
}

say "=== r5 agenda start"
wait_up || { say "tunnel never came up - giving up"; exit 3; }
say "tunnel UP - sweep"
timeout 7200 python scripts/sweep_r5.py 2>&1 | tee -a "$LOG"

wait_up || exit 3
say "=== engine step-cost capture (stats)"
timeout 1800 python scripts/ab_stage.py stats 2>&1 | tee -a "$LOG"

wait_up || exit 3
say "=== bwasw device A/B"
timeout 3600 python scripts/ab_stage.py bwasw 2>&1 | tee -a "$LOG"

wait_up || exit 3
say "=== sampe device-walk A/B"
timeout 3600 python scripts/ab_stage.py sampe 2>&1 | tee -a "$LOG"

say "=== r5 agenda done"
