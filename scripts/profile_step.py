"""Per-step component budget of the device search engine (VERDICT r4 #2).

Three modes:

  --mode budget   (default) marginal Δwall/Δsteps of a fixed-step search
                  harness, full vs each component stubbed out via
                  EngineConfig.profile_skips — the difference is that
                  component's per-step cost.  Timing protocol per
                  ROUND4.md §1: forced np.asarray readback inside the
                  timed region, marginal over two step counts.
  --mode lanes    the same full-step marginal cost at several lane
                  counts B (feeds the DEV_BATCH choice + ceiling doc).
  --mode hlo      xprof HLO self-times of one traced run (if the axon
                  backend supports device tracing; budget mode needs
                  nothing but timers).

The harness runs `_search_step` in a fori_loop from the real initial
state on the bench corpus (no early exit, no lane reloads), in NONSTOP
mode with a wide diff budget so lanes stay active (address streams keep
varying) across the whole measured window; iter_cap is disabled for the
same reason.  Stubbed steps are semantically wrong by design — this
never touches production paths (profile_skips defaults to ()).

Usage: python scripts/profile_step.py [--mode budget|lanes|hlo]
         [--lanes B ...] [--s1 N] [--s2 N] [--reps R] [--acap N]
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

from ibwa_tpu.align import engine_jax
from ibwa_tpu.align.opts import GapOpt, BWA_MODE_NONSTOP
from ibwa_tpu.fm.device import DeviceFmPair, build_device_pair
from ibwa_tpu.fm.fmindex import FmIndex
from ibwa_tpu.index.builder import load_index
from ibwa_tpu.io.reads import load_reads

FA = str(REPO / ".bench" / "genome_rep1.fa")
FQ = str(REPO / ".bench" / "reads_rep1.fq")

# components stubbable via EngineConfig.profile_skips; the remainder
# after subtracting all of them is "children construction + elementwise
# logic + loop/op-launch overhead"
COMPONENTS = ["occ4", "eunroll", "meta", "shadow", "stack", "hits"]


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("seq_len", "n_blk", "n_steps"))
def run_fixed(cfg, blocks, L2, l2diff, primary, seqs, lens, md, hs, ssq,
              bad, seq_len: int, n_blk: int, n_steps: int):
    fm = DeviceFmPair(blocks, L2, l2diff, primary, None, seq_len, n_blk,
                      None, (blocks.shape[1] - 4) << 4)
    st = engine_jax._init_state(cfg, fm, seqs, lens, md, hs, ssq, bad)

    def body(i, s):
        return engine_jax._search_step(cfg, fm, seqs, s)

    st = jax.lax.fori_loop(0, n_steps, body, st)
    # checksum over every carried leaf so no component is DCE'd
    tot = jnp.zeros((), jnp.uint32)
    for x in jax.tree_util.tree_leaves(st):
        tot = tot + jnp.sum(x.astype(jnp.uint32))
    return tot


def prep(B: int, acap: int):
    """Real reads from the bench corpus packed for the fixed-step
    harness (same packing as JaxAlnEngine.align_batch)."""
    fms = (FmIndex(load_index(FA, 0)), FmIndex(load_index(FA, 1)))
    dfm = build_device_pair(fms[0], fms[1], dimer=False)
    reads = load_reads(FQ)
    # NONSTOP + wide budget: lanes keep popping for the whole window
    opt = GapOpt(mode=GapOpt().mode | BWA_MODE_NONSTOP,
                 max_top2=0x7FFFFFFF)
    n = min(B, len(reads))
    seqs = [reads[i % n].seq for i in range(B)]
    rseqs = [reads[i % n].rseq for i in range(B)]
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    L = int(max(8, (lens.max() + 7) // 8 * 8))
    md = np.full(B, 4, dtype=np.int32)   # wide budget, deep search
    sq = np.full((B, 2, L), 4, dtype=np.uint8)
    for b in range(B):
        sq[b, 0, :lens[b]] = seqs[b]
        sq[b, 1, :lens[b]] = rseqs[b]
    SL = min(opt.seed_len, L)
    hs = lens > opt.seed_len
    ssq = np.full((B, 2, SL), 4, dtype=np.uint8)
    for b in range(B):
        if hs[b]:
            ssq[b, 0] = sq[b, 0, lens[b] - SL:lens[b]]
            ssq[b, 1] = sq[b, 1, lens[b] - SL:lens[b]]
    bad = np.zeros(B, dtype=bool)
    base_cfg = engine_jax.make_config(L, 4, opt, seq_len=dfm.seq_len)
    import dataclasses
    base_cfg = dataclasses.replace(base_cfg, acap=acap,
                                   iter_cap=0x7FFFFFFF)
    args = (dfm.blocks, dfm.L2, dfm.l2diff, dfm.primary,
            jnp.asarray(sq), jnp.asarray(lens), jnp.asarray(md),
            jnp.asarray(hs), jnp.asarray(ssq), jnp.asarray(bad))
    return base_cfg, dfm, args


def time_readback(fn, reps: int):
    np.asarray(fn())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(cfg, dfm, args, s1, s2, reps):
    f = lambda s: (lambda: run_fixed(cfg, *args, seq_len=dfm.seq_len,
                                     n_blk=dfm.n_blk, n_steps=s))
    t1 = time_readback(f(s1), reps)
    t2 = time_readback(f(s2), reps)
    return (t2 - t1) / (s2 - s1)


def mode_budget(a):
    import dataclasses
    B = a.lanes[0]
    cfg, dfm, args = prep(B, a.acap)
    out = {"lanes": B, "acap": a.acap, "s1": a.s1, "s2": a.s2}
    full = marginal(cfg, dfm, args, a.s1, a.s2, a.reps)
    out["full_us"] = round(full * 1e6, 2)
    print(f"B={B} full: {full*1e6:9.2f} us/step", flush=True)
    rows = []
    for comp in COMPONENTS:
        c2 = dataclasses.replace(cfg, profile_skips=(comp,))
        t = marginal(c2, dfm, args, a.s1, a.s2, a.reps)
        d = full - t
        rows.append({"component": comp, "us": round(d * 1e6, 2),
                     "without_us": round(t * 1e6, 2)})
        print(f"B={B} -{comp:8s}: {t*1e6:9.2f} us/step  "
              f"-> {comp} costs {d*1e6:7.2f} us ({100*d/full:5.1f}%)",
              flush=True)
    c_all = dataclasses.replace(cfg, profile_skips=tuple(COMPONENTS))
    t_min = marginal(c_all, dfm, args, a.s1, a.s2, a.reps)
    rows.append({"component": "remainder(children+elementwise+loop)",
                 "us": round(t_min * 1e6, 2)})
    print(f"B={B} -ALL     : {t_min*1e6:9.2f} us/step (children + "
          f"elementwise + loop overhead)", flush=True)
    out["components"] = rows
    _write(out, "profile_budget.json")


def mode_budget_add(a):
    """Additive budget: start from every component stubbed and enable one
    at a time — isolates each component's standalone cost (the
    subtractive mode measures cost-in-context; the difference between
    the two is scheduling/serialization cross-terms)."""
    import dataclasses
    B = a.lanes[0]
    cfg, dfm, args = prep(B, a.acap)
    out = {"lanes": B, "acap": a.acap, "s1": a.s1, "s2": a.s2}
    base_skips = tuple(COMPONENTS)
    c0 = dataclasses.replace(cfg, profile_skips=base_skips)
    base = marginal(c0, dfm, args, a.s1, a.s2, a.reps)
    out["base_us"] = round(base * 1e6, 2)
    print(f"B={B} base(all stubbed): {base*1e6:9.2f} us/step", flush=True)
    rows = []
    for comp in COMPONENTS:
        skips = tuple(c for c in COMPONENTS if c != comp)
        c2 = dataclasses.replace(cfg, profile_skips=skips)
        t = marginal(c2, dfm, args, a.s1, a.s2, a.reps)
        d = t - base
        rows.append({"component": comp, "us": round(d * 1e6, 2),
                     "with_only_us": round(t * 1e6, 2)})
        print(f"B={B} +{comp:8s}: {t*1e6:9.2f} us/step  "
              f"-> {comp} alone costs {d*1e6:7.2f} us", flush=True)
    full = marginal(cfg, dfm, args, a.s1, a.s2, a.reps)
    out["full_us"] = round(full * 1e6, 2)
    print(f"B={B} full    : {full*1e6:9.2f} us/step", flush=True)
    out["components"] = rows
    _write(out, "profile_budget_add.json")


def mode_lanes(a):
    recs = []
    for B in a.lanes:
        cfg, dfm, args = prep(B, a.acap)
        t = marginal(cfg, dfm, args, a.s1, a.s2, a.reps)
        rec = {"lanes": B, "us_per_step": round(t * 1e6, 2),
               "ns_per_lane_step": round(t / B * 1e9, 2)}
        print(f"B={B:5d}: {t*1e6:9.2f} us/step  "
              f"{t/B*1e9:7.2f} ns/lane-step", flush=True)
        recs.append(rec)
    _write(recs, "profile_lanes.json")


def mode_hlo(a):
    import glob
    B = a.lanes[0]
    cfg, dfm, args = prep(B, a.acap)
    f = lambda: run_fixed(cfg, *args, seq_len=dfm.seq_len,
                          n_blk=dfm.n_blk, n_steps=a.s1)
    np.asarray(f())  # compile + warm
    tdir = f"/tmp/prof_lanes{B}"
    with jax.profiler.trace(tdir):
        np.asarray(f())
    from xprof.convert import raw_to_tool_data
    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        files, "hlo_stats", {"tqx": "out:json"})
    rows = json.loads(data)["rows"]
    tot = sum(r["c"][5]["v"] for r in rows)
    rows.sort(key=lambda r: -r["c"][5]["v"])
    print(f"B={B}  total self-time {tot/1e6:.1f}ms  (steps={a.s1})")
    for r in rows[:40]:
        c = r["c"]
        print(f"{c[5]['v']/1e3:9.1f}us {100*c[5]['v']/tot:5.1f}%  "
              f"{str(c[2]['v'])[:60]:60s} {str(c[9]['v'])[:70]}")


def _write(obj, name):
    out = REPO / ".bench" / name
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(obj, indent=1))
    print(f"wrote {out}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="budget",
                    choices=["budget", "budget-add", "lanes", "hlo"])
    ap.add_argument("--lanes", type=int, nargs="*",
                    default=[1024])
    ap.add_argument("--s1", type=int, default=256)
    ap.add_argument("--s2", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--acap", type=int, default=engine_jax.ACAP)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; the axon "
                         "sitecustomize overrides JAX_PLATFORMS)")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
        engine_jax.PALLAS_STACK = False
    print(f"backend: {jax.default_backend()}", flush=True)
    {"budget": mode_budget, "budget-add": mode_budget_add,
     "lanes": mode_lanes, "hlo": mode_hlo}[a.mode](a)


if __name__ == "__main__":
    main()
