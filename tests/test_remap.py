"""Differential tests for the iBWA multi-reference remap layer:
sampe -R with a primary reference + an alternate reference whose contigs
carry .remap CIGARs back onto the primary."""

import io
import random
import subprocess

import pytest

from ibwa_tpu.align.opts import GapOpt
from ibwa_tpu.align.pipeline import aln_to_stream
from ibwa_tpu.index import builder
from ibwa_tpu.sam.sampe import PeOpt, sai2sam_pe

from conftest import make_genome


def _write_fa(path, contigs):
    with open(path, "w") as f:
        for name, seq in contigs:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")


def _make_alt(primary, start, edits, rng):
    """Carve an alt contig out of primary[start:...] applying `edits`
    (list of (kind, at, len)); returns (alt_seq, cigar_str, stop_0based)."""
    alt = []
    cig = []
    pos = start

    def push(op, ln):
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    for kind, m_len, e_len in edits:
        seg = primary[pos:pos + m_len]
        alt.append(seg)
        push("M", m_len)
        pos += m_len
        if kind == "del":
            push("D", e_len)
            pos += e_len
        elif kind == "ins":
            ins = "".join(rng.choice("ACGT") for _ in range(e_len))
            alt.append(ins)
            push("I", e_len)
        elif kind == "snp":
            base = primary[pos]
            alt.append(rng.choice([c for c in "ACGT" if c != base]))
            push("M", 1)
            pos += 1
    return "".join(alt), "".join(f"{l}{o}" for o, l in cig), pos


@pytest.fixture(scope="module")
def remap_case(tmp_path_factory, oracle):
    tmp = tmp_path_factory.mktemp("remap")
    rng = random.Random(31337)
    pfa = tmp / "p.fa"
    genome = make_genome(str(pfa), [("chr1", "primary", 50000, 0.0),
                                    ("chr2", "", 20000, 0.0)], seed=4321)
    chr1, chr2 = genome["chr1"], genome["chr2"]

    alt1, cig1, stop1 = _make_alt(chr1, 10000, [
        ("snp", 400, 0), ("del", 350, 3), ("ins", 500, 4),
        ("snp", 300, 0), ("del", 450, 2), ("ins", 600, 1),
        ("snp", 200, 0)], rng)
    alt2 = chr2[5000:6800]  # exact copy
    afa = tmp / "alt.fa"
    _write_fa(str(afa), [("alt1", alt1), ("alt2", alt2)])
    with open(str(afa) + ".remap", "w") as f:
        f.write(f">r1-chr1|{10000 + 1}|{stop1}\n")
        for i in range(0, len(cig1), 60):
            f.write(cig1[i:i + 60] + "\n")
        f.write(">r2-chr2|exact|0\n")

    # oracle copies
    pfa_ref = tmp / "p_ref.fa"
    afa_ref = tmp / "alt_ref.fa"
    pfa_ref.write_bytes(pfa.read_bytes())
    afa_ref.write_bytes(afa.read_bytes())
    (tmp / "alt_ref.fa.remap").write_bytes(
        (tmp / "alt.fa.remap").read_bytes())
    for fa in (pfa_ref, afa_ref):
        subprocess.run([oracle, "index", str(fa)], check=True,
                       capture_output=True)
    builder.bwa_index(str(pfa))
    builder.bwa_index(str(afa))

    # paired reads from primary AND alt haplotypes
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = lambda s: "".join(comp[c] for c in reversed(s))
    f1 = tmp / "r_1.fq"
    f2 = tmp / "r_2.fq"
    sources = [chr1, chr2, alt1, alt1, alt2]
    with open(f1, "w") as o1, open(f2, "w") as o2:
        for i in range(240):
            src = sources[i % len(sources)]
            isize = max(160, int(rng.gauss(260, 25)))
            pos = rng.randrange(0, len(src) - isize)
            frag = src[pos:pos + isize]
            r1, r2 = frag[:75], rc(frag[-75:])
            r1 = "".join(c if rng.random() > 0.01 else rng.choice("ACGT")
                         for c in r1)
            r2 = "".join(c if rng.random() > 0.01 else rng.choice("ACGT")
                         for c in r2)
            if rng.random() < 0.5:
                r1, r2 = r2, r1
            o1.write(f"@pr{i}/1\n{r1}\n+\n{'I' * 75}\n")
            o2.write(f"@pr{i}/2\n{r2}\n+\n{'I' * 75}\n")
    return tmp, (pfa, afa), (pfa_ref, afa_ref), (str(f1), str(f2))


def test_sampe_remap_parity(remap_case, oracle):
    tmp, ours_fa, ref_fa, fqs = remap_case
    opt = GapOpt()
    sais = {}
    for fa, rfa, tag in [(ours_fa[0], ref_fa[0], "p"),
                         (ours_fa[1], ref_fa[1], "a")]:
        for e, fq in enumerate(fqs):
            ref_sai = tmp / f"{tag}{e}.sai"
            ref_sai.write_bytes(subprocess.run(
                [oracle, "aln", str(rfa), fq], check=True,
                capture_output=True).stdout)
            buf = io.BytesIO()
            aln_to_stream(str(fa), fq, opt, buf, engine="jax")
            assert buf.getvalue() == ref_sai.read_bytes(), f"sai {tag}{e}"
            sais[(tag, e)] = str(ref_sai)

    ref_sam = subprocess.run(
        [oracle, "sampe", "-R", str(ref_fa[0]), sais[("p", 0)],
         sais[("p", 1)], fqs[0], fqs[1], str(ref_fa[1]), sais[("a", 0)],
         sais[("a", 1)]],
        check=True, capture_output=True).stdout.decode()
    out = io.StringIO()
    sai2sam_pe([str(ours_fa[0]), str(ours_fa[1])],
               [(sais[("p", 0)], sais[("p", 1)]),
                (sais[("a", 0)], sais[("a", 1)])],
               fqs[0], fqs[1], PeOpt(remapping=1), out=out)
    ours = [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]
    refs = [l for l in ref_sam.split("\n") if not l.startswith("@PG")]
    assert len(ours) == len(refs)
    for i, (a, b) in enumerate(zip(ours, refs)):
        assert a == b, f"line {i}:\nours: {a}\nref:  {b}"


def test_sampe_remap_parity_pure_py(remap_case, oracle, monkeypatch):
    """Multi-db remap through the Python oracle path (IBWA_PURE_PY=1)."""
    monkeypatch.setenv("IBWA_PURE_PY", "1")
    tmp, ours_fa, ref_fa, fqs = remap_case
    sais = {}
    for rfa, tag in [(ref_fa[0], "p"), (ref_fa[1], "a")]:
        for e, fq in enumerate(fqs):
            ref_sai = tmp / f"purepy.{tag}{e}.sai"
            ref_sai.write_bytes(subprocess.run(
                [oracle, "aln", str(rfa), fq], check=True,
                capture_output=True).stdout)
            sais[(tag, e)] = str(ref_sai)
    ref_sam = subprocess.run(
        [oracle, "sampe", "-R", str(ref_fa[0]), sais[("p", 0)],
         sais[("p", 1)], fqs[0], fqs[1], str(ref_fa[1]), sais[("a", 0)],
         sais[("a", 1)]],
        check=True, capture_output=True).stdout.decode()
    out = io.StringIO()
    sai2sam_pe([str(ours_fa[0]), str(ours_fa[1])],
               [(sais[("p", 0)], sais[("p", 1)]),
                (sais[("a", 0)], sais[("a", 1)])],
               fqs[0], fqs[1], PeOpt(remapping=1), out=out)
    ours = [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]
    refs = [l for l in ref_sam.split("\n") if not l.startswith("@PG")]
    assert ours == refs
