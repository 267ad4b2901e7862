"""Differential tests: sampe SAM output vs the reference binary."""

import io
import subprocess

import pytest

from ibwa_tpu.align.opts import GapOpt
from ibwa_tpu.align.pipeline import aln_to_stream
from ibwa_tpu.index import builder
from ibwa_tpu.sam.sampe import PeOpt, sai2sam_pe

from conftest import make_genome, simulate_reads


@pytest.fixture(scope="module")
def pe_case(tmp_path_factory, oracle):
    tmp = tmp_path_factory.mktemp("sampe")
    fa = tmp / "g.fa"
    genome = make_genome(str(fa), [("chr1", "c", 60000, 0.001),
                                   ("chr2", "", 25000, 0.0)], seed=909)
    fa_ref = tmp / "g_ref.fa"
    fa_ref.write_bytes(fa.read_bytes())
    subprocess.run([oracle, "index", str(fa_ref)], check=True,
                   capture_output=True)
    builder.bwa_index(str(fa))
    fqs = simulate_reads(str(tmp / "pe"), genome, 250, read_len=90,
                         err=0.015, seed=77, paired=True, isize_mean=280,
                         isize_sd=35)
    return tmp, fa, fa_ref, fqs


CASES = {
    # (aln flags, aln GapOpt, sampe oracle flags, PeOpt)
    "default": ([], GapOpt(), ["-R"], PeOpt(remapping=1)),
    "no_remap_quirk": ([], GapOpt(), [], PeOpt()),  # everything unmapped
    "no_sw": ([], GapOpt(), ["-R", "-s"], PeOpt(remapping=1, is_sw=0)),
    "gappy": (["-o", "2", "-e", "4"],
              GapOpt(max_gapo=2, max_gape=4, mode=GapOpt().mode & ~0x01),
              ["-R"], PeOpt(remapping=1)),
    "multi": ([], GapOpt(), ["-R", "-n", "8", "-N", "20"],
              PeOpt(remapping=1, n_multi=8, N_multi=20)),
    "isize": ([], GapOpt(), ["-R", "-a", "350"],
              PeOpt(remapping=1, max_isize=350)),
}


@pytest.mark.parametrize("case", list(CASES))
def test_sampe_parity(pe_case, oracle, case):
    tmp, fa, fa_ref, fqs = pe_case
    aln_flags, opt, pe_flags, popt = CASES[case]
    sais = []
    for e, fq in enumerate(fqs):
        ref_sai = tmp / f"{case}.{e}.sai"
        ref_sai.write_bytes(subprocess.run(
            [oracle, "aln"] + aln_flags + [str(fa_ref), fq],
            check=True, capture_output=True).stdout)
        buf = io.BytesIO()
        aln_to_stream(str(fa), fq, opt, buf, engine="jax")
        assert buf.getvalue() == ref_sai.read_bytes(), f".sai end {e}"
        sais.append(str(ref_sai))

    ref_sam = subprocess.run(
        [oracle, "sampe"] + pe_flags + [str(fa_ref), sais[0], sais[1],
                                        fqs[0], fqs[1]],
        check=True, capture_output=True).stdout.decode()
    out = io.StringIO()
    sai2sam_pe([str(fa)], [(sais[0], sais[1])], fqs[0], fqs[1], popt,
               out=out)
    ours = [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]
    refs = [l for l in ref_sam.split("\n") if not l.startswith("@PG")]
    assert ours == refs


def test_sampe_parity_pure_py(pe_case, oracle, monkeypatch):
    """Keep the Python oracle path (IBWA_PURE_PY=1) executable: it is the
    documented semantic source of truth for native pe_stage.cpp."""
    monkeypatch.setenv("IBWA_PURE_PY", "1")
    tmp, fa, fa_ref, fqs = pe_case
    sais = []
    for e, fq in enumerate(fqs):
        ref_sai = tmp / f"purepy.{e}.sai"
        ref_sai.write_bytes(subprocess.run(
            [oracle, "aln", str(fa_ref), fq],
            check=True, capture_output=True).stdout)
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
    assert ours == refs
