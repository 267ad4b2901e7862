"""Index construction: byte-parity of every artifact vs the reference binary,
plus property tests of the FM-index building blocks."""

import hashlib
import subprocess

import numpy as np
import pytest

from ibwa_tpu import native
from ibwa_tpu.index import builder, formats

from conftest import make_genome

EXTS = [".pac", ".rpac", ".ann", ".amb", ".bwt", ".rbwt", ".sa", ".rsa"]


def _md5(p):
    return hashlib.md5(open(p, "rb").read()).hexdigest()


@pytest.mark.parametrize("case", ["plain", "multi_n", "odd"])
def test_artifact_parity(tmp_path, oracle, case):
    contigs = {
        "plain": [("chr1", "a genome", 30000, 0.0)],
        "multi_n": [("ctgA", "first", 20001, 0.003), ("ctgB", "", 10007, 0.01),
                    ("ctgC", "x", 513, 0.0)],
        "odd": [("s", "", 255, 0.0)],
    }[case]
    fa_ref = tmp_path / "ref.fa"
    make_genome(str(fa_ref), contigs, seed=hash(case) % 2**31)
    fa_ours = tmp_path / "ours.fa"
    fa_ours.write_bytes(fa_ref.read_bytes())

    subprocess.run([oracle, "index", str(fa_ref)], check=True,
                   capture_output=True)
    builder.bwa_index(str(fa_ours))

    for ext in EXTS:
        assert _md5(str(fa_ours) + ext) == _md5(str(fa_ref) + ext), ext


def test_sais_sorts_suffixes():
    rng = np.random.RandomState(0)
    text = rng.randint(0, 4, size=500).astype(np.uint8)
    sa = native.sais(text, 4)
    suffixes = [bytes(text[i:]) for i in range(len(text))]
    expected = sorted(range(len(text)), key=lambda i: suffixes[i])
    np.testing.assert_array_equal(sa, expected)


def test_bwt_matches_naive():
    rng = np.random.RandomState(1)
    text = rng.randint(0, 4, size=300).astype(np.uint8)
    bwt, primary = native.bwt_inplace(text)
    # naive: rotations of text + sentinel (sentinel smallest)
    n = len(text)
    order = sorted(range(n + 1), key=lambda i: bytes(text[i:]))  # [n]=empty
    full_order = order  # empty suffix sorts first since it is a prefix of all
    naive_bwt = []
    naive_primary = None
    for row, suf in enumerate(full_order):
        if suf == 0:
            naive_primary = row
        else:
            naive_bwt.append(text[suf - 1])
    # row for the sentinel: suffix n (empty) maps to T[n-1]
    assert primary == naive_primary
    np.testing.assert_array_equal(bwt, naive_bwt)


def test_occ_matches_naive_scan():
    rng = np.random.RandomState(2)
    codes = rng.randint(0, 4, size=1000).astype(np.uint8)
    idx = builder.build_bwt_index(codes.copy(), sa_intv=32)
    bwt, primary = native.bwt_inplace(codes.copy())
    for k in [0, 1, 15, 16, 127, 128, 129, 500, 999, len(codes)]:
        for c in range(4):
            got = native.occ(idx.interleaved, idx.primary, idx.L2,
                             idx.seq_len, k, c)
            kk = k - 1 if k >= primary else k
            if k == idx.seq_len:
                expect = int(idx.L2[c + 1] - idx.L2[c])
            else:
                expect = int(np.sum(bwt[:kk + 1] == c))
            assert got == expect, (k, c)


def test_sampled_sa_matches_full_sa():
    rng = np.random.RandomState(3)
    codes = rng.randint(0, 4, size=777).astype(np.uint8)
    idx = builder.build_bwt_index(codes.copy(), sa_intv=32)
    full_sa = native.sais(codes, 4)
    # full SA including empty suffix at row 0
    full = np.concatenate([[len(codes)], full_sa])
    for j in range(1, idx.n_sa):
        assert idx.sa[j] == full[j * 32], j
    # sa_lookup reconstructs arbitrary entries
    ks = np.arange(1, len(codes), 13, dtype=np.uint32)
    got = native.sa_lookup(idx.interleaved, idx.primary, idx.L2, idx.seq_len,
                           32, idx.sa, ks)
    np.testing.assert_array_equal(got, full[ks])


def test_read_back_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    codes = rng.randint(0, 4, size=2049).astype(np.uint8)
    idx = builder.build_bwt_index(codes.copy())
    formats.write_bwt(str(tmp_path / "x.bwt"), idx)
    formats.write_sa(str(tmp_path / "x.sa"), idx)
    idx2 = formats.read_bwt(str(tmp_path / "x.bwt"))
    formats.read_sa(str(tmp_path / "x.sa"), idx2)
    assert idx2.primary == idx.primary
    assert idx2.seq_len == idx.seq_len
    np.testing.assert_array_equal(idx2.interleaved, idx.interleaved)
    np.testing.assert_array_equal(idx2.sa, idx.sa)
    # pac roundtrip
    formats.write_pac(str(tmp_path / "x.pac"), codes)
    np.testing.assert_array_equal(formats.read_pac(str(tmp_path / "x.pac")),
                                  codes)


def test_frugal_bwt_matches_sais(tmp_path, monkeypatch):
    """The bounded-memory packed-text builder (sais_frugal.cpp, the >2 Gbp
    `index -a bwtsw` replacement) produces byte-identical artifacts."""
    import filecmp
    rng = np.random.RandomState(77)

    def write_fa(path, contigs):
        with open(path, "w") as f:
            for name, seq in contigs:
                f.write(f">{name}\n{seq}\n")

    bases = np.array(list("ACGT"))
    seq1 = "".join(bases[rng.randint(0, 4, 40011)])
    seq2 = ("".join(bases[rng.randint(0, 4, 503)])
            + "N" * 7 + "".join(bases[rng.randint(0, 4, 9000)]))
    fa1, fa2 = tmp_path / "a.fa", tmp_path / "b.fa"
    write_fa(fa1, [("c1", seq1), ("c2", seq2)])
    write_fa(fa2, [("c1", seq1), ("c2", seq2)])
    builder.bwa_index(str(fa1))
    monkeypatch.setenv("IBWA_FRUGAL_MIN", "1")
    builder.bwa_index(str(fa2))
    for ext in ("pac", "rpac", "ann", "amb", "bwt", "rbwt", "sa", "rsa"):
        assert filecmp.cmp(f"{fa1}.{ext}", f"{fa2}.{ext}",
                           shallow=False), ext

    # direct property check: packed path == unpacked SA-IS on both strands
    codes = rng.randint(0, 4, 5000).astype(np.uint8)
    pac = builder._pack_codes(codes)
    for reverse in (False, True):
        src = codes[::-1].copy() if reverse else codes.copy()
        bwt_u, prim_u = native.bwt_inplace(src)
        bwt_p, prim_p = native.bwt_packed(pac, len(codes), reverse=reverse)
        unp = np.zeros(len(codes), np.uint8)
        idx = np.arange(len(codes))
        unp = (bwt_p[idx >> 2] >> (((~idx) & 3) << 1)).astype(np.uint8) & 3
        assert prim_p == prim_u
        np.testing.assert_array_equal(unp, bwt_u)
