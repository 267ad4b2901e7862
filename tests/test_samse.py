"""Differential tests: samse SAM output vs the reference binary."""

import io
import subprocess

import pytest

from ibwa_tpu.align.opts import GapOpt
from ibwa_tpu.align.pipeline import aln_to_stream
from ibwa_tpu.index import builder
from ibwa_tpu.sam.bwase import sai2sam_se

from conftest import make_genome, simulate_reads


@pytest.fixture(scope="module")
def se_case(tmp_path_factory, oracle):
    tmp = tmp_path_factory.mktemp("samse")
    fa = tmp / "g.fa"
    genome = make_genome(str(fa), [("ctg1", "test", 50000, 0.001),
                                   ("ctg2", "", 20000, 0.0)], seed=2024)
    fa_ref = tmp / "g_ref.fa"
    fa_ref.write_bytes(fa.read_bytes())
    subprocess.run([oracle, "index", str(fa_ref)], check=True,
                   capture_output=True)
    builder.bwa_index(str(fa))
    fq = tmp / "r.fq"
    simulate_reads(str(fq), genome, 120, read_len=80, err=0.02, seed=55)
    # inject quality gradients so -q trimming triggers
    lines = fq.read_text().split("\n")
    for i in range(3, len(lines), 8):  # every other read's qual line
        q = lines[i]
        if q:
            lines[i] = q[: len(q) // 2] + "#" * (len(q) - len(q) // 2)
    fq.write_text("\n".join(lines))
    return tmp, fa, fa_ref, fq


CASES = {
    "default": ([], [], GapOpt()),
    "gappy": (["-o", "2", "-e", "4"], [],
              GapOpt(max_gapo=2, max_gape=4, mode=GapOpt().mode & ~0x01)),
    "trimmed": (["-q", "20"], [], GapOpt(trim_qual=20)),
    "multi": ([], ["-n", "10"], GapOpt()),
    "rg": ([], ["-r", "@RG\\tID:lane1\\tSM:s1"], GapOpt()),
}


@pytest.mark.parametrize("case", list(CASES))
def test_samse_parity(se_case, oracle, case):
    tmp, fa, fa_ref, fq = se_case
    aln_flags, se_flags, opt = CASES[case]
    ref_sai = tmp / f"{case}.ref.sai"
    ref_sai.write_bytes(subprocess.run(
        [oracle, "aln"] + aln_flags + [str(fa_ref), str(fq)],
        check=True, capture_output=True).stdout)
    ref_sam = subprocess.run(
        [oracle, "samse"] + se_flags + [str(fa_ref), str(ref_sai), str(fq)],
        check=True, capture_output=True).stdout.decode()

    # ours: full pipeline (jax aln -> samse)
    sai_buf = io.BytesIO()
    aln_to_stream(str(fa), str(fq), opt, sai_buf, engine="jax")
    our_sai = tmp / f"{case}.our.sai"
    our_sai.write_bytes(sai_buf.getvalue())
    assert sai_buf.getvalue() == ref_sai.read_bytes(), ".sai mismatch"

    out = io.StringIO()
    n_occ = 3
    rg_line = rg_id = None
    if "-n" in se_flags:
        n_occ = int(se_flags[se_flags.index("-n") + 1])
    if "-r" in se_flags:
        from ibwa_tpu.sam.bwase import parse_rg
        rg_line, rg_id = parse_rg(se_flags[se_flags.index("-r") + 1])
    sai2sam_se(str(fa), str(our_sai), str(fq), n_occ=n_occ, out=out,
               rg_line=rg_line, rg_id=rg_id)
    ours = [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]
    refs = [l for l in ref_sam.split("\n") if not l.startswith("@PG")]
    assert ours == refs


def test_samse_parity_pure_py(se_case, oracle, monkeypatch):
    """Keep the Python oracle path (IBWA_PURE_PY=1) executable: it is the
    documented semantic source of truth for the native samse stage."""
    monkeypatch.setenv("IBWA_PURE_PY", "1")
    tmp, fa, fa_ref, fq = se_case
    ref_sai = tmp / "purepy.ref.sai"
    ref_sai.write_bytes(subprocess.run(
        [oracle, "aln", str(fa_ref), str(fq)],
        check=True, capture_output=True).stdout)
    ref_sam = subprocess.run(
        [oracle, "samse", str(fa_ref), str(ref_sai), str(fq)],
        check=True, capture_output=True).stdout.decode()
    out = io.StringIO()
    sai2sam_se(str(fa), str(ref_sai), str(fq), out=out)
    ours = [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]
    refs = [l for l in ref_sam.split("\n") if not l.startswith("@PG")]
    assert ours == refs
