"""Parity: vectorized device engine vs the host emulator (the semantic
oracle, itself differential-tested against the reference binary)."""

import random

import numpy as np
import pytest

from ibwa_tpu.align import engine_jax, engine_ref
from ibwa_tpu.align.opts import GapOpt, BWA_MODE_NONSTOP
from ibwa_tpu.fm.fmindex import FmIndex
from ibwa_tpu.index import builder


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ejax")
    rng = random.Random(4242)
    seq = "".join(rng.choice("ACGT") for _ in range(40000))
    fa = tmp / "g.fa"
    with open(fa, "w") as f:
        f.write(">c1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    builder.bwa_index(str(fa))
    fms = (FmIndex(builder.load_index(str(fa), 0)),
           FmIndex(builder.load_index(str(fa), 1)))
    return fms, seq


def _make_reads(seq, n=40, read_len=80, seed=7):
    rng = random.Random(seed)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    nt4 = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    seqs, rseqs = [], []
    for i in range(n):
        pos = rng.randrange(0, len(seq) - read_len - 10)
        s = list(seq[pos:pos + read_len + 8])
        r = rng.random()
        if r < 0.3:
            d = rng.randrange(15, 60)
            del s[d:d + rng.randrange(1, 4)]
        elif r < 0.6:
            p = rng.randrange(15, 60)
            s = s[:p] + [rng.choice("ACGT")
                         for _ in range(rng.randrange(1, 4))] + s[p:]
        s = s[:read_len]
        for j in range(len(s)):
            if rng.random() < 0.02:
                s[j] = rng.choice("ACGT")
        if rng.random() < 0.05:
            s[rng.randrange(len(s))] = "N"
        if rng.random() < 0.5:
            s = [comp.get(c, "N") for c in reversed(s)]
        codes = np.array([nt4[c] for c in s], dtype=np.uint8)
        rc = codes.copy()
        mask = rc < 4
        rc[mask] = 3 - rc[mask]
        seqs.append(codes[::-1].copy())   # stored reversed (bwaseqio.c:189)
        rseqs.append(rc[::-1].copy())
    return seqs, rseqs


CASES = {
    "default": GapOpt(),
    "exact": GapOpt(max_diff=0, fnr=-1.0),
    "gappy": GapOpt(max_gapo=2, max_gape=5, max_diff=6, fnr=-1.0,
                    mode=GapOpt().mode & ~0x01),
    "seeded": GapOpt(seed_len=20, max_seed_diff=1),
    "nonstop": GapOpt(mode=GapOpt().mode | BWA_MODE_NONSTOP,
                      max_top2=0x7FFFFFFF),
}


@pytest.mark.parametrize("case", list(CASES))
def test_device_engine_parity(small_index, case, monkeypatch):
    fms, seq = small_index
    opt = CASES[case]
    seqs, rseqs = _make_reads(seq)
    ref = engine_ref.align_batch(fms, seqs, rseqs, opt)
    # disable the heavy-tail step cap: this test asserts the pure-device
    # path (capacity fallbacks only) matches the oracle on its own
    monkeypatch.setattr(engine_jax, "ITER_CAP", 1 << 30)
    eng = engine_jax.JaxAlnEngine(fms)
    got = eng.align_batch(seqs, rseqs, opt)
    assert len(got) == len(ref)
    for i, (g, r) in enumerate(zip(got, ref)):
        assert g == r, f"read {i}: {g} != {r}"
    # the device path must do nearly all the work itself
    assert eng.stats["fallback_reads"] <= len(seqs) // 10


def test_chunked_pipeline_parity(small_index, monkeypatch):
    """Multi-chunk dispatch (PERSIST_N < n_reads) must merge chunk
    results and background-fallback futures back in read order."""
    fms, seq = small_index
    opt = CASES["default"]
    seqs, rseqs = _make_reads(seq)
    ref = engine_ref.align_batch(fms, seqs, rseqs, opt)
    monkeypatch.setattr(engine_jax, "ITER_CAP", 1 << 30)  # reuse compile
    monkeypatch.setattr(engine_jax, "PERSIST_N", 16)      # 40 reads -> 3 chunks
    got = engine_jax.JaxAlnEngine(fms).align_batch(seqs, rseqs, opt)
    assert got == ref


def test_fixed_full_host_share(small_index, monkeypatch):
    """An explicit IBWA_HOST_FRAC is a FIXED share: 1.0 routes the whole
    batch (any size) to the native search, the controller must not adapt
    it, and the hits must match the oracle (cpu-fallback bench mode)."""
    fms, seq = small_index
    opt = CASES["default"]
    seqs, rseqs = _make_reads(seq)
    ref = engine_ref.align_batch(fms, seqs, rseqs, opt)
    monkeypatch.setenv("IBWA_HOST_FRAC", "1.0")
    eng = engine_jax.JaxAlnEngine(fms)
    assert eng._frac_fixed and eng.host_frac == 1.0
    got = eng.align_batch(seqs, rseqs, opt)
    assert got == ref
    assert eng.host_frac == 1.0          # controller did not adapt
    assert eng.stats["host_reads"] == len(seqs)
    assert eng.stats["device_reads"] == 0


def test_variable_lengths(small_index):
    fms, seq = small_index
    rng = random.Random(1)
    nt4 = {"A": 0, "C": 1, "G": 2, "T": 3}
    seqs, rseqs = [], []
    for ln in [36, 50, 75, 100, 120, 36, 64]:
        pos = rng.randrange(0, len(seq) - 130)
        codes = np.array([nt4[c] for c in seq[pos:pos + ln]], dtype=np.uint8)
        seqs.append(codes[::-1].copy())
        rseqs.append((3 - codes)[::-1].copy())
    opt = GapOpt()
    ref = engine_ref.align_batch(fms, seqs, rseqs, opt)
    got = engine_jax.JaxAlnEngine(fms).align_batch(seqs, rseqs, opt)
    assert got == ref
