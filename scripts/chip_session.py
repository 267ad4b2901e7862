"""Run the full on-chip measurement agenda the moment the axon tunnel is
back, in priority order, one FRESH PROCESS per step (in-process A/B of
compiled variants is invalid on axon — resident executables slow each
other ~25%).

Agenda (each step under its own timeout, failures logged + skipped):
  0. fast probe — exit immediately if the tunnel is still down
  1. bench.py            -> headline hybrid + device_only + stage ratios
  2. sweep_dimer.py      -> DIMER_UNROLL x ITER_CAP grid (includes the
                            no-dimer control), fresh process per config
  3. sweep_lanes.py      -> DEV_BATCH grid (if present)

Every line of child output is appended to .bench/chip_session.log with
timestamps; step JSON artifacts land in .bench/ as usual.

Usage: python scripts/chip_session.py [--probe-timeout SECS]
"""

from __future__ import annotations

import datetime
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
LOG = REPO / ".bench" / "chip_session.log"


def log(msg: str) -> None:
    stamp = datetime.datetime.now().strftime("%H:%M:%S")
    line = f"[{stamp}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as fh:
        fh.write(line + "\n")


def probe(timeout_s: int) -> bool:
    """True iff jax can reach the device and run a matmul."""
    code = (
        "import faulthandler; faulthandler.dump_traceback_later(%d, exit=True)\n"
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "x = jnp.ones((128, 128))\n"
        "print('PROBE_OK', d[0].platform, float((x @ x).sum()))\n"
        % max(timeout_s - 5, 5))
    try:
        r = subprocess.run([sys.executable, "-u", "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    return "PROBE_OK" in r.stdout


def run_step(name: str, cmd: list[str], timeout_s: int) -> None:
    log(f"=== {name}: {' '.join(cmd)} (timeout {timeout_s}s)")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))
    t0 = time.perf_counter()
    try:
        p = subprocess.Popen(cmd, cwd=REPO, env=env, text=True,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT)
        assert p.stdout is not None
        deadline = t0 + timeout_s
        for line in p.stdout:
            log(f"  {line.rstrip()}")
            if time.perf_counter() > deadline:
                p.kill()
                log(f"=== {name}: TIMEOUT after {timeout_s}s (killed)")
                return
        rc = p.wait(timeout=max(deadline - time.perf_counter(), 10))
        log(f"=== {name}: rc={rc} in {time.perf_counter() - t0:.0f}s")
    except Exception as e:  # noqa: BLE001 — keep the agenda moving
        log(f"=== {name}: ERROR {e!r}")


def main() -> None:
    probe_timeout = 120
    if "--probe-timeout" in sys.argv:
        probe_timeout = int(sys.argv[sys.argv.index("--probe-timeout") + 1])
    LOG.parent.mkdir(exist_ok=True)
    log("chip session start")
    if not probe(probe_timeout):
        log("tunnel DOWN (probe hung) — exiting")
        sys.exit(3)
    log("tunnel UP")
    py = sys.executable
    # 1. headline bench (first chip compile of the dimer engine may take
    #    several minutes; the cache makes later steps cheap)
    run_step("bench", [py, "bench.py"], 5400)
    # 2. dimer sweep (8 configs, fresh process each)
    run_step("sweep_dimer", [py, "scripts/sweep_dimer.py"], 10800)
    # 3. lane sweep if the script exists
    if (REPO / "scripts" / "sweep_lanes.py").exists():
        run_step("sweep_lanes", [py, "scripts/sweep_lanes.py"], 7200)
    log("chip session done")


if __name__ == "__main__":
    main()
