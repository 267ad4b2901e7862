"""Round-5 device-only sweep: occ block interval x lanes x capacity knobs.

One FRESH PROCESS per config (in-process A/B of compiled variants is
invalid on axon: resident executables slow each other ~25%).  Each child
times end-to-end device-only align_batch (IBWA_HOST_FRAC=0) on the rep1
bench corpus, best of 3 after a warm-up pass, and prints one JSON line;
the parent appends to .bench/sweep_r5.json after every config so partial
sessions still leave data.

Agenda (VERDICT r4 items 1 + 5): the 32 B (intv=64) and 24 B (intv=32)
row layouts vs the 48 B disk layout, the DEV_BATCH scale-up the round-5
lane profile points at (per-lane step cost still falling at B=2048), and
the ACAP / ITER_CAP re-sweep under the occ1-default engine.

Usage:  python scripts/sweep_r5.py            # default prioritized grid
        python scripts/sweep_r5.py --child '{"intv":64,"dev_batch":2048,...}'
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
FA = str(REPO / ".bench" / "genome_rep1.fa")
FQ = str(REPO / ".bench" / "reads_rep1.fq")
OUT = REPO / ".bench" / "sweep_r5.json"

DEFAULTS = dict(intv=64, dev_batch=1024, persist_n=2048, acap=256,
                iter_cap=384)

# prioritized: interval A/B first, then lane scale at the small-row
# layout (the ceiling model says fixed per-step cost amortizes over B),
# then capacity knobs at the best (intv, B) seen so far
GRID = [
    dict(intv=128),
    dict(intv=64),
    dict(intv=32),
    dict(intv=64, dev_batch=4096, persist_n=8192),
    dict(intv=64, dev_batch=8192, persist_n=16384),
    dict(intv=64, dev_batch=2048, persist_n=4096),
    dict(intv=32, dev_batch=4096, persist_n=8192),
    dict(intv=64, dev_batch=4096, persist_n=8192, iter_cap=512),
    dict(intv=64, dev_batch=4096, persist_n=8192, acap=192),
    dict(intv=64, dev_batch=4096, persist_n=8192, iter_cap=256),
]

CHILD_TIMEOUT = 1200  # healthy configs finish in ~3-5 min; a child stuck
                      # in PJRT init (wedged tunnel) must not eat the hour


def _tunnel_up() -> bool:
    """Cheap subprocess probe — the PJRT client init hangs forever on a
    wedged tunnel, so never probe in-process."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() != 'cpu'; "
             "import jax.numpy as jnp; (jnp.ones((8,8)) @ jnp.ones((8,8))"
             ").block_until_ready(); print('UP')"],
            capture_output=True, text=True, timeout=180)
        return "UP" in r.stdout
    except Exception:
        return False


def child(cfg: dict) -> None:
    sys.path.insert(0, str(REPO))
    os.environ["IBWA_DEV_INTV"] = str(cfg["intv"])
    from ibwa_tpu.align import engine_jax
    from ibwa_tpu.align.opts import GapOpt
    from ibwa_tpu.fm.fmindex import FmIndex
    from ibwa_tpu.index.builder import load_index
    from ibwa_tpu.io.reads import load_reads

    engine_jax.DEV_BATCH = cfg["dev_batch"]
    engine_jax.PERSIST_N = cfg["persist_n"]
    engine_jax.ACAP = cfg["acap"]
    engine_jax.ITER_CAP = cfg["iter_cap"]
    fms = (FmIndex(load_index(FA, 0)), FmIndex(load_index(FA, 1)))
    reads = load_reads(FQ)
    seqs = [r.seq for r in reads]
    rseqs = [r.rseq for r in reads]
    opt = GapOpt()
    eng = engine_jax.JaxAlnEngine(fms)
    eng.host_frac = 0.0
    eng.align_batch(seqs, rseqs, opt)  # compile + warm
    best = 1e18
    fb = 0
    for _ in range(3):
        f0 = eng.stats["fallback_reads"]
        t0 = time.perf_counter()
        eng.align_batch(seqs, rseqs, opt)
        dt = time.perf_counter() - t0
        if dt < best:
            best, fb = dt, eng.stats["fallback_reads"] - f0
    print(json.dumps({
        **cfg, "reads_per_s": round(len(seqs) / best, 1),
        "seconds": round(best, 3), "fallback_reads": fb,
        "backend": __import__("jax").default_backend(),
    }))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child({**DEFAULTS, **json.loads(sys.argv[2])})
        return
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))
    results = []
    if OUT.exists():
        try:
            results = json.loads(OUT.read_text())
        except json.JSONDecodeError:
            results = []
    done = {json.dumps({**DEFAULTS, **{k: r[k] for k in DEFAULTS}},
                       sort_keys=True)
            for r in results if "reads_per_s" in r}
    for g in GRID:
        cfg = {**DEFAULTS, **g}
        if json.dumps(cfg, sort_keys=True) in done:
            print(f"skip (done): {g}", flush=True)
            continue
        if not _tunnel_up():
            print("tunnel DOWN - waiting 300s", flush=True)
            time.sleep(300)
            if not _tunnel_up():
                print("tunnel still down - stopping sweep (rerun resumes)",
                      flush=True)
                return
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--child", json.dumps(g)],
                env=env, capture_output=True, text=True,
                timeout=CHILD_TIMEOUT)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {**cfg, "error": r.stderr[-300:]}
        except subprocess.TimeoutExpired:
            rec = {**cfg, "error": f"child timeout {CHILD_TIMEOUT}s "
                   "(wedged tunnel or pathological config)"}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
