"""The 2-mer occ table (fm/device.py::occ2): unit correctness against a
brute-force dimer count, and device-engine parity with the table disabled
(same hits either way; the dimer path only changes how many bases an
E pop consumes, bwt.c:235-250 semantics preserved)."""

import random

import numpy as np
import pytest

from ibwa_tpu.align import engine_jax, engine_ref
from ibwa_tpu.align.opts import GapOpt
from ibwa_tpu.fm.device import build_device_pair, occ2
from ibwa_tpu.fm.fmindex import FmIndex
from ibwa_tpu.index import builder


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dimer")
    rng = random.Random(99)
    seq = "".join(rng.choice("ACGT") for _ in range(5000))
    fa = tmp / "g.fa"
    with open(fa, "w") as f:
        f.write(">c1\n" + seq + "\n")
    builder.bwa_index(str(fa))
    fms = (FmIndex(builder.load_index(str(fa), 0)),
           FmIndex(builder.load_index(str(fa), 1)))
    return fms, seq


def _brute_dimer_counts(fm: FmIndex):
    """(b1, b2) per full BWT row via the scalar occ API: b1 = bwt char,
    b2 = char two before (None at sentinel-adjacent rows)."""
    n = fm.seq_len
    # reconstruct bwt codes (full row space) from the packed words
    flatw = np.ascontiguousarray(fm.words).reshape(-1)
    shifts = ((15 - np.arange(16, dtype=np.uint32)) * 2).astype(np.uint32)
    codes = ((flatw[:, None] >> shifts[None, :]) & 3).astype(
        np.uint8).reshape(-1)[:n]
    prim = fm.primary
    b1 = np.full(n + 1, -1, dtype=np.int8)
    b1[np.arange(n + 1) != prim] = codes
    L2 = fm.L2.astype(np.int64)
    lf = np.zeros(n + 1, dtype=np.int64)
    for c in range(4):
        rows = np.flatnonzero(b1 == c)
        lf[rows] = L2[c] + 1 + np.arange(len(rows))
    b2 = np.full(n + 1, -1, dtype=np.int8)
    mask = b1 >= 0
    b2[mask] = b1[lf[mask]]
    return b1, b2


def test_occ2_matches_bruteforce(idx):
    fms, _ = idx
    import jax.numpy as jnp
    dfm = build_device_pair(fms[0], fms[1], dimer=True)
    assert dfm.dimer is not None
    for strand, fm in enumerate(fms):
        b1, b2 = _brute_dimer_counts(fm)
        n = fm.seq_len
        rng = np.random.default_rng(strand)
        ks = np.concatenate([
            rng.integers(0, n, 200),
            np.array([0, 1, n - 1, n, fm.primary,
                      max(fm.primary - 1, 0), 0xFFFFFFFF]),
        ]).astype(np.uint32)
        ds = rng.integers(0, 16, len(ks)).astype(np.uint32)
        got = np.asarray(occ2(dfm, jnp.full(len(ks), strand, jnp.uint32),
                              jnp.asarray(ks), jnp.asarray(ds)))
        for k, d, g in zip(ks, ds, got):
            c1, c2 = int(d) & 3, (int(d) >> 2) & 3
            if k == 0xFFFFFFFF:
                want = 0
            else:
                kk = min(int(k), n)
                want = int(((b1[:kk + 1] == c1)
                            & (b2[:kk + 1] == c2)).sum())
            assert g == want, (strand, int(k), int(d), int(g), want)


def test_engine_parity_dimer_off(idx, monkeypatch):
    """Hits must be identical with the dimer table force-disabled."""
    fms, seq = idx
    rng = random.Random(3)
    nt4 = {"A": 0, "C": 1, "G": 2, "T": 3}
    seqs, rseqs = [], []
    for _ in range(24):
        pos = rng.randrange(0, len(seq) - 60)
        s = list(seq[pos:pos + 48])
        for j in range(len(s)):
            if rng.random() < 0.03:
                s[j] = rng.choice("ACGTN")
        codes = np.array([nt4.get(c, 4) for c in s], dtype=np.uint8)
        rc = codes.copy()
        m = rc < 4
        rc[m] = 3 - rc[m]
        seqs.append(codes[::-1].copy())
        rseqs.append(rc[::-1].copy())
    opt = GapOpt()
    ref = engine_ref.align_batch(fms, seqs, rseqs, opt)
    monkeypatch.setattr(engine_jax, "ITER_CAP", 1 << 30)
    # dimer is opt-in as of round 4 (slower on chip, kept for parity)
    monkeypatch.setenv("IBWA_DIMER", "1")
    got_dimer = engine_jax.JaxAlnEngine(fms).align_batch(seqs, rseqs, opt)
    monkeypatch.setenv("IBWA_NO_DIMER", "1")
    got_plain = engine_jax.JaxAlnEngine(fms).align_batch(seqs, rseqs, opt)
    assert got_dimer == ref
    assert got_plain == ref
