"""Microbenchmark: dependent row-gather chains — XLA vs in-kernel DMA.

The aln device engine is a dependent pointer chase: each step's occ-row
address is the previous step's result.  PERF_CEILING.md's ~35us/op floor
is the per-XLA-op cost of a dynamic-index gather inside a while_loop;
VERDICT r3 item 1 asks whether a persistent Pallas kernel that issues
per-lane async HBM copies beats that floor.  This measures exactly that
on a blocks-table-shaped workload (u32 rows of 12 words = 48 B):

  A. xla:    lax.while_loop, one table[idx] gather per step        (status quo)
  B. pallas: ONE kernel runs the whole chain; per step a scalar
             fori_loop issues B make_async_copy row fetches        (mega-kernel)
  C. pallas-batch: like B but the issue loop is unrolled UNROLL-way
     so several DMAs are in flight per wait batch                   (issue-rate probe)

Each reports per-step wall at several lane counts.  If B/C land well
under A, the mega-kernel is worth building; if they land at/above A,
the XLA gather already sits at the DMA-issue-rate wall and the win must
come from fewer serial rounds + more lanes instead.

Run: python scripts/bench_chase.py [--rows N] [--steps S]
"""

from __future__ import annotations

import argparse
import functools
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
        row = table[idx]                       # [B, 12] dynamic gather
        nxt = ((row[:, 0] ^ it.astype(jnp.uint32))
               % jnp.uint32(n_rows)).astype(jnp.int32)
        return it + 1, nxt, acc ^ row[:, 1].astype(jnp.int32)

    def cond(c):
        return c[0] < steps

    _, idx, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx0, jnp.zeros_like(idx0)))
    return idx, acc


# ------------------------------------------------------------- B: pallas
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


def timeit(fn, reps=3):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--lanes", type=int, nargs="*",
                    default=[256, 1024, 4096])
    ap.add_argument("--roww", type=int, default=ROWW)
    ap.add_argument("--xla-only", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", flush=True)
    table = jnp.asarray(make_table(args.rows, args.roww))
    S = args.steps

    for B in args.lanes:
        idx0 = jnp.asarray(
            np.random.default_rng(1).integers(0, args.rows, B, dtype=np.int32))

        tx = timeit(lambda: chase_xla(table, idx0, S, args.rows))
        print(f"B={B:5d}  xla      : {tx/S*1e6:8.1f} us/step "
              f"({tx*1e3:.1f} ms total)", flush=True)
        ref = np.asarray(chase_xla(table, idx0, S, args.rows)[1])

        if args.xla_only:
            continue
        for unroll in (1, 4, 8):
            try:
                tp = timeit(lambda: chase_pallas(table, idx0, S, args.rows,
                                                 unroll))
                got = np.asarray(chase_pallas(table, idx0, S, args.rows,
                                              unroll)[1])
                ok = "OK " if np.array_equal(got, ref) else "MISMATCH"
                print(f"B={B:5d}  pallas u{unroll}: {tp/S*1e6:8.1f} us/step "
                      f"({tp*1e3:.1f} ms total) {ok}", flush=True)
            except Exception as e:
                print(f"B={B:5d}  pallas u{unroll}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
