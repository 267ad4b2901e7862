"""Benchmark: `aln` throughput (reads/s/chip) vs the reference binary.

Prints ONE JSON line:
  {"metric": "aln_reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": ratio_vs_reference_one_core}

The workload mirrors the reference's headline metric (bwa.1:479-482):
short-read gapped alignment against an indexed genome, default options.
Baseline = the reference ibwa binary, single thread, same genome/reads on
this host (built from /root/reference on first run, then cached).
"""

from __future__ import annotations

import json
import os
import pathlib
import random
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
# persistent XLA compile cache: the engine configs take minutes to
# compile; reuse across bench invocations
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))
WORK = REPO / ".bench"
GENOME_LEN = 32_000_000   # chr20-scale (BASELINE.json configs 3-4)
N_READS = 16384
READ_LEN = 100


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr)


def ensure_inputs() -> tuple[pathlib.Path, pathlib.Path]:
    WORK.mkdir(exist_ok=True)
    fa = WORK / "genome.fa"
    fq = WORK / "reads.fq"
    if fa.exists() and fq.exists() and (WORK / "genome.fa.bwt").exists():
        return fa, fq
    rng = random.Random(20260816)
    log(f"generating {GENOME_LEN/1e6:.0f} Mbp genome + {N_READS} reads")
    seq = "".join(rng.choice("ACGT") for _ in range(GENOME_LEN))
    with open(fa, "w") as f:
        f.write(">bench_chr\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    with open(fq, "w") as f:
        for i in range(N_READS):
            pos = rng.randrange(0, GENOME_LEN - READ_LEN)
            s = list(seq[pos:pos + READ_LEN])
            for j in range(len(s)):
                if rng.random() < 0.01:
                    s[j] = rng.choice("ACGT")
            if rng.random() < 0.5:
                s = [comp[c] for c in reversed(s)]
            f.write(f"@r{i}\n{''.join(s)}\n+\n{'I' * READ_LEN}\n")
    log("indexing (ours)")
    from ibwa_tpu.index.builder import bwa_index
    bwa_index(str(fa))
    return fa, fq


def build_oracle() -> pathlib.Path | None:
    binary = REPO / ".refsrc" / "ibwa"
    if binary.exists():
        return binary
    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        return None
    dst = REPO / ".refsrc"
    dst.mkdir(exist_ok=True)
    try:
        subprocess.run(f"cp -r {ref}/* {dst}/", shell=True, check=True)
        subprocess.run(["chmod", "-R", "u+w", str(dst)], check=True)
        subprocess.run(
            "sed -e 's/@FULL_VERSION@/0.5.9-ibwa/'"
            " -e 's/@CMAKE_BUILD_TYPE@/Release/' version.h.in > version.h",
            shell=True, cwd=dst, check=True)
        subprocess.run(["make", "CFLAGS=-g -Wall -O2 -fgnu89-inline", "-j8"],
                       cwd=dst, capture_output=True)
        for f in ["bwaremap", "translate_cigar", "filter_alignments"]:
            subprocess.run(["g++", "-c", "-O2", "-DHAVE_PTHREAD", f"{f}.cpp",
                            "-o", f"{f}.o"], cwd=dst, check=True)
        for f in ["bwapair", "bwasw", "byteorder"]:
            subprocess.run(["gcc", "-c", "-O2", "-fgnu89-inline",
                            "-DHAVE_PTHREAD", f"{f}.c", "-o", f"{f}.o"],
                           cwd=dst, check=True)
        subprocess.run(
            "g++ -O2 *.o -o ibwa -lm -lz -lpthread -Lbwt_gen -lbwtgen",
            shell=True, cwd=dst, capture_output=True)
    except Exception as e:  # pragma: no cover
        log(f"oracle build failed: {e}")
        return None
    return binary if binary.exists() else None


def baseline_reads_per_s(fa: pathlib.Path, fq: pathlib.Path) -> float | None:
    cache = WORK / "baseline.json"
    if cache.exists():
        return json.loads(cache.read_text())["reads_per_s"]
    binary = build_oracle()
    if binary is None:
        return None
    if not (WORK / "genome_ref.fa.bwt").exists():
        ref_fa = WORK / "genome_ref.fa"
        ref_fa.write_bytes(fa.read_bytes())
        log("indexing (reference)")
        subprocess.run([str(binary), "index", str(ref_fa)], check=True,
                       capture_output=True)
    log("timing reference aln (1 thread)")
    t0 = time.perf_counter()
    subprocess.run([str(binary), "aln", "-t", "1",
                    str(WORK / "genome_ref.fa"), str(fq)],
                   check=True, capture_output=True)
    dt = time.perf_counter() - t0
    rps = N_READS / dt
    cache.write_text(json.dumps({"reads_per_s": rps, "seconds": dt}))
    return rps


def main() -> None:
    fa, fq = ensure_inputs()

    from ibwa_tpu.align.engine_jax import JaxAlnEngine
    from ibwa_tpu.align.opts import GapOpt
    from ibwa_tpu.fm.fmindex import FmIndex
    from ibwa_tpu.index.builder import load_index
    from ibwa_tpu.io.reads import load_reads

    opt = GapOpt()
    log("loading index + reads")
    fms = (FmIndex(load_index(str(fa), 0)), FmIndex(load_index(str(fa), 1)))
    reads = load_reads(str(fq))
    seqs = [r.seq for r in reads]
    rseqs = [r.rseq for r in reads]
    eng = JaxAlnEngine(fms)

    log("warmup/compile")
    # warm the exact dispatch bucket the timed run uses (shapes are static)
    eng.align_batch(seqs, rseqs, opt)

    log(f"timing {len(seqs)} reads")
    t0 = time.perf_counter()
    eng.align_batch(seqs, rseqs, opt)
    dt = time.perf_counter() - t0
    rps = len(seqs) / dt
    log(f"ours: {rps:.0f} reads/s ({dt:.2f}s), stats={eng.stats}")

    base = baseline_reads_per_s(fa, fq)
    vs = rps / base if base else None
    if base:
        log(f"reference 1-core: {base:.0f} reads/s -> {vs:.2f}x")
    print(json.dumps({
        "metric": "aln_reads_per_s_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
