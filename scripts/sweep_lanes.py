"""Sweep persistent-lane count (DEV_BATCH) for the aln device engine.

Times the device dispatch only (hits decode + native fallback excluded)
on the bench workload (.bench genome + reads).  Usage:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_lanes.py 1024 2048 4096 8192
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ibwa_tpu.align import engine_jax
from ibwa_tpu.align.opts import GapOpt, cal_maxdiff
from ibwa_tpu.fm.fmindex import FmIndex
from ibwa_tpu.index.builder import load_index
from ibwa_tpu.io.reads import load_reads

FA = "/root/repo/.bench/genome.fa"
FQ = "/root/repo/.bench/reads.fq"


def prep():
    fms = (FmIndex(load_index(FA, 0)), FmIndex(load_index(FA, 1)))
    reads = load_reads(FQ)
    seqs = [r.seq for r in reads]
    rseqs = [r.rseq for r in reads]
    opt = GapOpt()
    eng = engine_jax.JaxAlnEngine(fms)

    n_reads = len(seqs)
    max_len = max(len(s) for s in seqs)
    batch_opt = dataclasses.replace(opt)
    batch_opt.max_diff = cal_maxdiff(max_len, thres=opt.fnr)
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    md = np.array([cal_maxdiff(int(n), thres=opt.fnr) for n in lens],
                  dtype=np.int32)
    L = int(max(8, (max_len + 7) // 8 * 8))
    cfg = eng._config(L, int(md.max()), batch_opt)
    SL = cfg.SL
    PB = 1024
    while PB < n_reads:
        PB *= 2
    sq = np.full((PB, 2, L), 4, dtype=np.uint8)
    ssq = np.full((PB, 2, SL), 4, dtype=np.uint8)
    hs = np.zeros(PB, dtype=bool)
    bad = np.ones(PB, dtype=bool)
    p_lens = np.ones(PB, dtype=np.int32)
    p_md = np.zeros(PB, dtype=np.int32)
    p_lens[:n_reads] = lens
    p_md[:n_reads] = md
    for b in range(n_reads):
        s, r = seqs[b], rseqs[b]
        n = len(s)
        sq[b, 0, :n] = s
        sq[b, 1, :n] = r
        if n > opt.seed_len:
            hs[b] = True
            ssq[b, 0] = s[n - SL:n]
            ssq[b, 1] = r[n - SL:n]
        bad[b] = int((s > 3).sum()) > int(md[b])
    args = (jnp.asarray(sq), jnp.asarray(p_lens), jnp.asarray(p_md),
            jnp.asarray(hs), jnp.asarray(ssq), jnp.asarray(bad))
    return eng, cfg, args, n_reads


def main():
    lanes = [int(x) for x in sys.argv[1:]] or [1024, 2048, 4096, 8192]
    eng, cfg, args, n_reads = prep()
    dfm = eng.dfm
    for B in lanes:
        f = lambda: engine_jax._run_search_persistent(
            cfg, dfm.blocks, dfm.L2, dfm.l2diff, dfm.primary, *args,
            seq_len=dfm.seq_len, n_blk=dfm.n_blk, n_lanes=B)
        out = f()
        jax.block_until_ready(out)
        n_hits, fb, it = out[1], np.asarray(out[2]), int(out[3])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = f()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        nfb = int(fb.sum())
        print(f"lanes={B:6d}  {n_reads/best:8.0f} reads/s  "
              f"best={best:.3f}s  iters={it}  fb={nfb} "
              f"({100.0*nfb/n_reads:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
