"""Differential tests for SOLiD color-space support: index -c, aln -c,
samse and sampe over color reads."""

import io
import random
import subprocess

import pytest

from ibwa_tpu.align.opts import GapOpt, BWA_MODE_COMPREAD
from ibwa_tpu.align.pipeline import aln_to_stream
from ibwa_tpu.index import builder
from ibwa_tpu.index.builder import NST_COLOR_SPACE_TABLE
from ibwa_tpu.sam.bwase import sai2sam_se
from ibwa_tpu.sam.sampe import PeOpt, sai2sam_pe

from conftest import make_genome

NT = {"A": 0, "C": 1, "G": 2, "T": 3}


def _colors(seq: str) -> list[int]:
    out = []
    for a, b in zip(seq, seq[1:]):
        out.append(NST_COLOR_SPACE_TABLE[(1 << NT[a]) | (1 << NT[b])])
    return out


@pytest.fixture(scope="module")
def cs_case(tmp_path_factory, oracle):
    tmp = tmp_path_factory.mktemp("cspace")
    fa = tmp / "g.fa"
    genome = make_genome(str(fa), [("csA", "x", 40000, 0.001),
                                   ("csB", "", 15000, 0.0)], seed=777)
    fa_ref = tmp / "g_ref.fa"
    fa_ref.write_bytes(fa.read_bytes())
    subprocess.run([oracle, "index", "-c", str(fa_ref)], check=True,
                   capture_output=True)
    builder.bwa_index(str(fa), color=True)

    # paired color reads (solid2fastq letters: 0123 -> ACGT)
    rng = random.Random(5)
    f1 = tmp / "cs_1.fq"
    f2 = tmp / "cs_2.fq"
    with open(f1, "w") as o1, open(f2, "w") as o2:
        for i in range(160):
            name = "csA" if rng.random() < 0.7 else "csB"
            src = genome[name]
            isize = max(140, int(rng.gauss(220, 20)))
            pos = rng.randrange(1, len(src) - isize - 2)
            while "N" in src[pos - 1:pos + isize + 1]:
                pos = rng.randrange(1, len(src) - isize - 2)
            frag = src[pos:pos + isize]
            cols = _colors(frag)
            c1 = cols[:50]
            c2 = cols[-50:][::-1]  # reverse strand: colors reverse
            mk = lambda cs: "".join(
                "ACGT"[c] if rng.random() > 0.015
                else rng.choice("ACGT") for c in cs)
            if rng.random() < 0.5:
                c1, c2 = c2, c1
            o1.write(f"@c{i}/1\n{mk(c1)}\n+\n{'I' * 50}\n")
            o2.write(f"@c{i}/2\n{mk(c2)}\n+\n{'I' * 50}\n")
    return tmp, fa, fa_ref, (str(f1), str(f2))


def test_cs_index_parity(cs_case):
    tmp, fa, fa_ref, fqs = cs_case
    for ext in ["pac", "rpac", "ann", "amb", "bwt", "rbwt", "sa", "rsa",
                "nt.pac", "nt.ann", "nt.amb"]:
        ours = (str(fa) + "." + ext)
        ref = (str(fa_ref) + "." + ext)
        assert open(ours, "rb").read() == open(ref, "rb").read(), ext


def test_cs_aln_samse_parity(cs_case, oracle):
    tmp, fa, fa_ref, fqs = cs_case
    ref_sai = subprocess.run(
        [oracle, "aln", "-c", str(fa_ref), fqs[0]],
        check=True, capture_output=True).stdout
    opt = GapOpt(mode=GapOpt().mode & ~BWA_MODE_COMPREAD)
    buf = io.BytesIO()
    aln_to_stream(str(fa), fqs[0], opt, buf, engine="jax")
    assert buf.getvalue() == ref_sai
    sai_path = tmp / "cs.sai"
    sai_path.write_bytes(ref_sai)

    ref_sam = subprocess.run(
        [oracle, "samse", str(fa_ref), str(sai_path), fqs[0]],
        check=True, capture_output=True).stdout.decode()
    out = io.StringIO()
    sai2sam_se(str(fa), str(sai_path), fqs[0], out=out)
    ours = [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]
    refs = [l for l in ref_sam.split("\n") if not l.startswith("@PG")]
    assert len(ours) == len(refs)
    for i, (a, b) in enumerate(zip(ours, refs)):
        assert a == b, f"line {i}:\nours: {a}\nref:  {b}"


def test_cs_sampe_parity(cs_case, oracle):
    tmp, fa, fa_ref, fqs = cs_case
    opt = GapOpt(mode=GapOpt().mode & ~BWA_MODE_COMPREAD)
    sais = []
    for e, fq in enumerate(fqs):
        ref_sai = tmp / f"pe{e}.sai"
        ref_sai.write_bytes(subprocess.run(
            [oracle, "aln", "-c", str(fa_ref), fq],
            check=True, capture_output=True).stdout)
        buf = io.BytesIO()
        aln_to_stream(str(fa), fq, opt, buf, engine="jax")
        assert buf.getvalue() == ref_sai.read_bytes(), f"sai end {e}"
        sais.append(str(ref_sai))
    ref_sam = subprocess.run(
        [oracle, "sampe", "-R", str(fa_ref), sais[0], sais[1],
         fqs[0], fqs[1]],
        check=True, capture_output=True).stdout.decode()
    out = io.StringIO()
    sai2sam_pe([str(fa)], [(sais[0], sais[1])], fqs[0], fqs[1],
               PeOpt(remapping=1), out=out)
    ours = [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]
    refs = [l for l in ref_sam.split("\n") if not l.startswith("@PG")]
    assert len(ours) == len(refs)
    for i, (a, b) in enumerate(zip(ours, refs)):
        assert a == b, f"line {i}:\nours: {a}\nref:  {b}"
