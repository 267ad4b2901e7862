"""Differential tests: bwasw long-read SAM output vs the reference."""

import io
import random
import subprocess

import pytest

from ibwa_tpu.bwasw.aux import bsw2_aln
from ibwa_tpu.bwasw.core import Bsw2Opt
from ibwa_tpu.index import builder

from conftest import make_genome


@pytest.fixture(scope="module")
def long_case(tmp_path_factory, oracle):
    tmp = tmp_path_factory.mktemp("bwasw")
    fa = tmp / "g.fa"
    genome = make_genome(str(fa), [("lr1", "", 45000, 0.001),
                                   ("lr2", "", 15000, 0.0)], seed=616)
    fa_ref = tmp / "g_ref.fa"
    fa_ref.write_bytes(fa.read_bytes())
    subprocess.run([oracle, "index", str(fa_ref)], check=True,
                   capture_output=True)
    builder.bwa_index(str(fa))

    rng = random.Random(99)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    fq = tmp / "long.fq"
    with open(fq, "w") as f:
        for i in range(20):
            ctg = rng.choice(list(genome))
            src = genome[ctg]
            ln = rng.randrange(250, 700)
            pos = rng.randrange(0, len(src) - ln)
            out = []
            for ch in src[pos:pos + ln]:
                r = rng.random()
                if r < 0.012:
                    continue
                out.append(ch if rng.random() > 0.02
                           else rng.choice("ACGT"))
                if r > 0.988:
                    out.append(rng.choice("ACGT"))
            s = "".join(out)
            if rng.random() < 0.5:
                s = "".join(comp[c] for c in reversed(s))
            if rng.random() < 0.1:  # occasional N
                p = rng.randrange(len(s))
                s = s[:p] + "N" + s[p + 1:]
            f.write(f"@L{i}\n{s}\n+\n{'I' * len(s)}\n")
    return tmp, fa, fa_ref, fq


CASES = {
    "default": ([], Bsw2Opt()),
    "z10": (["-z", "10"], Bsw2Opt(z=10)),
    "pacbioish": (["-b", "5", "-q", "2", "-r", "1", "-z", "4"],
                  Bsw2Opt(b=5, q=2, r=1, z=4)),
    "hardclip": (["-H"], Bsw2Opt(hard_clip=1)),
}


@pytest.mark.parametrize("case", list(CASES))
def test_bwasw_parity(long_case, oracle, case):
    tmp, fa, fa_ref, fq = long_case
    flags, opt = CASES[case]
    ref_sam = subprocess.run(
        [oracle, "bwasw"] + flags + [str(fa_ref), str(fq)],
        check=True, capture_output=True).stdout.decode()
    opt.t *= opt.a
    opt.coef *= opt.a
    out = io.StringIO()
    bsw2_aln(opt, str(fa), str(fq), out=out)
    assert out.getvalue() == ref_sam


def test_bwasw_parity_pure_py(long_case, oracle, monkeypatch):
    """Keep the Python core (core.py::bsw2_core) executable: it is the
    documented semantic source of truth for native bsw2.cpp."""
    monkeypatch.setenv("IBWA_PURE_PY", "1")
    tmp, fa, fa_ref, fq = long_case
    ref_sam = subprocess.run(
        [oracle, "bwasw", str(fa_ref), str(fq)],
        check=True, capture_output=True).stdout.decode()
    opt = Bsw2Opt()
    opt.t *= opt.a
    opt.coef *= opt.a
    out = io.StringIO()
    bsw2_aln(opt, str(fa), str(fq), out=out)
    assert out.getvalue() == ref_sam
