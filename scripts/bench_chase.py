"""Microbenchmark: dependent row-gather chains — the aln engine's hot op.

The aln device engine is a dependent pointer chase: each step's occ-row
address is the previous step's result.  Round 4 (ROUND4.md §1-2) showed
two things that this tool embodies:

  * TIMING on this rig must (a) force an `np.asarray` readback inside
    the timed region (`jax.block_until_ready` does not reliably block
    under the axon tunnel) and (b) report MARGINAL cost, Δwall/Δsteps
    between two step counts, because every dispatch pays a ~25-30 ms
    tunnel round trip that single-dispatch timings misread as per-step
    cost.  Both are defaults here.
  * The measured per-row gather cost FALLS ~2.4x at small lane counts
    (8.6 ns/row at B=128-256 vs 21 ns/row at B=1024) — dependent-gather
    latency pipelines across lanes with a per-op concurrency knee.

VERDICT r4 item 1 asks whether splitting B total lanes into W
independent WAVES buys that small-B discount back at full scale.  Two
shapes of the idea are measured:

  A. xla:       one B-row gather per step                  (status quo)
  B. xla-mw:    W serial Bw-row gathers per step — pure-XLA waves; wins
                iff gather cost is sub-linear in rows below the knee
  C. pallas:    per-lane async-copy issue loop, single wave (r4 shape:
                every copy waited before compute — unpipelined)
  D. pallas-mw: W waves double-buffered in ONE kernel — wave w's copies
                fly while waves w+1..W-1 compute + issue (the design
                VERDICT r4 item 1 specifies)

Each wave's chain stays dependent (step t+1's address needs step t's
row); waves are mutually independent — exactly the engine's situation
if its lanes were partitioned.

Run: python scripts/bench_chase.py [--rows N] [--steps S] [--delta D]
     [--lanes B ...] [--waves W ...] [--roww W] [--xla-only]
     [--no-marginal]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWW = 128  # default; --roww overrides (DMA needs 128; XLA gathers take any)


def make_table(n_rows: int, roww: int, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = rng.integers(0, n_rows, size=(n_rows, roww), dtype=np.uint32)
    return t


# ---------------------------------------------------------------- A: XLA
@functools.partial(jax.jit, static_argnames=("steps", "n_rows"))
def chase_xla(table, idx0, steps: int, n_rows: int):
    def body(c):
        it, idx, acc = c
        row = table[idx]                       # [B, roww] dynamic gather
        nxt = ((row[:, 0] ^ it.astype(jnp.uint32))
               % jnp.uint32(n_rows)).astype(jnp.int32)
        return it + 1, nxt, acc ^ row[:, 1].astype(jnp.int32)

    def cond(c):
        return c[0] < steps

    _, idx, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx0, jnp.zeros_like(idx0)))
    return idx, acc


# ------------------------------------------------- B: XLA multi-wave
@functools.partial(jax.jit, static_argnames=("steps", "n_rows", "waves"))
def chase_xla_mw(table, idx0, steps: int, n_rows: int, waves: int):
    """W serial Bw-row gathers per step instead of one B-row gather.

    optimization_barrier keeps XLA from re-fusing the wave gathers into
    one; execution is still serial (TPU has one compute stream) — the
    question is purely whether SUM_w T(Bw) < T(B) thanks to the small-B
    per-row discount."""
    B = idx0.shape[0]
    Bw = B // waves

    def body(c):
        it, idx, acc = c
        itv = it.astype(jnp.uint32)
        outs_i, outs_a = [], []
        for w in range(waves):
            iw = jax.lax.optimization_barrier(idx[w * Bw:(w + 1) * Bw])
            row = table[iw]
            nxt = ((row[:, 0] ^ itv) % jnp.uint32(n_rows)).astype(jnp.int32)
            outs_i.append(nxt)
            outs_a.append(row[:, 1].astype(jnp.int32))
        return (it + 1, jnp.concatenate(outs_i),
                acc ^ jnp.concatenate(outs_a))

    def cond(c):
        return c[0] < steps

    _, idx, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx0, jnp.zeros_like(idx0)))
    return idx, acc


# ------------------------------------------------------------- C: pallas
def _chase_kernel(steps: int, n_rows: int, unroll: int,
                  idx_ref, table_ref, oidx_ref, oacc_ref,
                  rows_vmem, sem):
    B = idx_ref.shape[0]
    oidx_ref[:] = idx_ref[:]
    oacc_ref[:] = jnp.zeros_like(idx_ref[:])

    def step(it, _):
        # issue B per-lane row fetches (scalar loop over lanes)
        def issue(lane, _):
            i = oidx_ref[lane, 0]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(i, 1), :],
                rows_vmem.at[pl.ds(lane, 1), :],
                sem,
            ).start()
            return 0

        if unroll <= 1:
            jax.lax.fori_loop(0, B, issue, 0)
        else:
            def issue_u(g, _):
                for j in range(unroll):
                    issue(g * unroll + j, 0)
                return 0
            jax.lax.fori_loop(0, B // unroll, issue_u, 0)

        # aggregate wait: one reconstructed descriptor per copy
        def drain(lane, _):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1), :],
                rows_vmem.at[pl.ds(lane, 1), :],
                sem,
            ).wait()
            return 0
        jax.lax.fori_loop(0, B, drain, 0)

        rows = rows_vmem[:].astype(jnp.uint32)
        itv = jnp.uint32(it)
        nxt = ((rows[:, 0:1] ^ itv) % jnp.uint32(n_rows)).astype(jnp.int32)
        oidx_ref[:] = nxt
        oacc_ref[:] = oacc_ref[:] ^ rows[:, 1:2].astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, steps, step, 0)


@functools.partial(jax.jit, static_argnames=("steps", "n_rows", "unroll"))
def chase_pallas(table, idx0, steps: int, n_rows: int, unroll: int = 1):
    B = idx0.shape[0]
    kern = functools.partial(_chase_kernel, steps, n_rows, unroll)
    oidx, oacc = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # idx0
            pl.BlockSpec(memory_space=pltpu.ANY),    # table stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, ROWW), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() == "cpu",
    )(idx0.reshape(B, 1), table)
    return oidx[:, 0], oacc[:, 0]


# -------------------------------------------- D: pallas multi-wave
def _chase_mw_kernel(steps: int, n_rows: int, waves: int,
                     idx_ref, table_ref, oidx_ref, oacc_ref,
                     rows_vmem, sems):
    """Double-buffered wave pipeline in one kernel.

    rows_vmem: [W, Bw, roww]; sems: DMA semaphore array [W] (one per
    wave so waits are wave-scoped).  Wave w's step-t copies are issued
    before wave w is next processed; between issue(w,t) and wait(w,t)
    the scalar core issues and the VPU computes the OTHER W-1 waves —
    the HBM latency of a wave's Bw dependent fetches overlaps the rest
    of the pipeline instead of serializing with it."""
    B = idx_ref.shape[0]
    Bw = B // waves
    oidx_ref[:] = idx_ref[:]
    oacc_ref[:] = jnp.zeros_like(idx_ref[:])

    def issue(w):
        def one(lane, _):
            i = oidx_ref[w * Bw + lane, 0]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(i, 1), :],
                rows_vmem.at[w, pl.ds(lane, 1), :],
                sems.at[w],
            ).start()
            return 0
        jax.lax.fori_loop(0, Bw, one, 0)

    def wait(w):
        def one(lane, _):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1), :],
                rows_vmem.at[w, pl.ds(lane, 1), :],
                sems.at[w],
            ).wait()
            return 0
        jax.lax.fori_loop(0, Bw, one, 0)

    # prologue: every wave's step-0 fetches go up front
    for w in range(waves):
        issue(w)

    def step(it, _):
        itv = jnp.uint32(it)
        for w in range(waves):
            wait(w)
            rows = rows_vmem[w].astype(jnp.uint32)
            nxt = ((rows[:, 0:1] ^ itv)
                   % jnp.uint32(n_rows)).astype(jnp.int32)
            oidx_ref[w * Bw:(w + 1) * Bw] = nxt
            oacc_ref[w * Bw:(w + 1) * Bw] = (
                oacc_ref[w * Bw:(w + 1) * Bw] ^ rows[:, 1:2].astype(jnp.int32))
            issue(w)   # next step's fetch: in flight while other waves run
        return 0

    jax.lax.fori_loop(0, steps, step, 0)
    # epilogue: drain the last issued round (DMAs must complete before
    # the kernel returns; results are deliberately unused)
    for w in range(waves):
        wait(w)


@functools.partial(jax.jit, static_argnames=("steps", "n_rows", "waves"))
def chase_pallas_mw(table, idx0, steps: int, n_rows: int, waves: int):
    B = idx0.shape[0]
    Bw = B // waves
    kern = functools.partial(_chase_mw_kernel, steps, n_rows, waves)
    oidx, oacc = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((waves, Bw, ROWW), jnp.uint32),
            pltpu.SemaphoreType.DMA((waves,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() == "cpu",
    )(idx0.reshape(B, 1), table)
    return oidx[:, 0], oacc[:, 0]


# ------------------------------------------------------------- timing
def time_readback(fn, reps=3):
    """Best-of wall with a FORCED np.asarray readback inside the timed
    region (ROUND4.md §1 finding 2: block_until_ready does not reliably
    block under axon)."""
    np.asarray(fn()[1])  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn()[1])
        best = min(best, time.perf_counter() - t0)
    return best


def time_marginal(make_fn, s1: int, s2: int, reps=3):
    """Marginal per-step cost: Δwall/Δsteps between two step counts of
    the same program shape (ROUND4.md §1 finding 1: single-dispatch
    walls are dominated by the ~25-30 ms tunnel round trip)."""
    t1 = time_readback(make_fn(s1), reps)
    t2 = time_readback(make_fn(s2), reps)
    return (t2 - t1) / (s2 - s1), t1, t2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--delta", type=int, default=2048,
                    help="extra steps for the marginal measurement")
    ap.add_argument("--lanes", type=int, nargs="*", default=[256, 1024])
    ap.add_argument("--waves", type=int, nargs="*", default=[4])
    ap.add_argument("--roww", type=int, default=ROWW)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--xla-only", action="store_true")
    ap.add_argument("--no-marginal", action="store_true",
                    help="single-dispatch timing (tunnel-dominated; only "
                         "for local-chip rigs)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", flush=True)
    table = jnp.asarray(make_table(args.rows, args.roww))
    S, D = args.steps, args.delta
    results = []

    def report(name, B, make_fn, check_fn):
        try:
            if args.no_marginal:
                t = time_readback(make_fn(S), args.reps)
                per = t / S
            else:
                per, t1, t2 = time_marginal(make_fn, S, S + D, args.reps)
            ref = np.asarray(chase_xla(table,
                                       idx0, S, args.rows)[1])
            got = np.asarray(check_fn()[1])
            ok = bool(np.array_equal(got, ref))
            rec = {"variant": name, "lanes": B,
                   "us_per_step": round(per * 1e6, 3),
                   "ns_per_row": round(per / B * 1e9, 2),
                   "parity": ok}
            print(f"B={B:5d} {name:12s}: {per*1e6:8.2f} us/step  "
                  f"{per/B*1e9:6.2f} ns/row  "
                  f"{'OK' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:
            rec = {"variant": name, "lanes": B,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"B={B:5d} {name:12s}: FAILED {rec['error']}", flush=True)
        results.append(rec)

    for B in args.lanes:
        idx0 = jnp.asarray(np.random.default_rng(1).integers(
            0, args.rows, B, dtype=np.int32))

        report("xla", B,
               lambda s: (lambda: chase_xla(table, idx0, s, args.rows)),
               lambda: chase_xla(table, idx0, S, args.rows))
        for W in args.waves:
            if B % W:
                continue
            report(f"xla-mw{W}", B,
                   lambda s, W=W: (lambda: chase_xla_mw(
                       table, idx0, s, args.rows, W)),
                   lambda W=W: chase_xla_mw(table, idx0, S, args.rows, W))
        if args.xla_only:
            continue
        if args.roww != ROWW:
            print(f"  (pallas variants need --roww {ROWW}; skipping)",
                  flush=True)
            continue
        report("pallas", B,
               lambda s: (lambda: chase_pallas(table, idx0, s, args.rows)),
               lambda: chase_pallas(table, idx0, S, args.rows))
        for W in args.waves:
            if B % W:
                continue
            report(f"pallas-mw{W}", B,
                   lambda s, W=W: (lambda: chase_pallas_mw(
                       table, idx0, s, args.rows, W)),
                   lambda W=W: chase_pallas_mw(table, idx0, S, args.rows, W))

    if args.json:
        out = REPO / ".bench" / "chase.json"
        out.parent.mkdir(exist_ok=True)
        out.write_text(json.dumps(results, indent=1))
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
