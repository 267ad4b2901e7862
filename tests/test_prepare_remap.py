"""prepare-remap (parse/prepare-grch37.pl equivalent): GRC release tree →
.remap + flanked .fa, validated against hand-computed expectations and the
consuming remap parser."""

import gzip
import os
import random

import pytest

from ibwa_tpu.sam.remap import load_remap
from ibwa_tpu.tools import prepare_remap as pr


def _write_gz_fasta(path, records):
    with gzip.open(path, "wt") as f:
        for header, seq in records:
            f.write(header + "\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")


def _stub_locus(root):
    """A minimal ALT_REF_LOCI dir with no alignments (pl requires 9)."""
    os.makedirs(f"{root}/alt_scaffolds/FASTA")
    os.makedirs(f"{root}/alt_scaffolds/alignments")
    _write_gz_fasta(f"{root}/alt_scaffolds/FASTA/stub.fa.gz",
                    [(">gi|9|gb|GL999999.1|", "ACGT" * 10)])
    with open(f"{root}/alt_scaffolds/alt_scaffold_placement.txt", "w") as f:
        f.write(pr._PLACEMENT_HEADER + "\n")


def _make_tree(tmp_path, alt_seq, par_seq, asn_text, placement_row,
               alt_acc="GL000001.1", gi="1234"):
    src = tmp_path / "src"
    rel = src / "GRCh37"
    prim = rel / "Primary_Assembly" / "assembled_chromosomes"
    os.makedirs(prim)
    with open(prim / "chr2acc", "w") as f:
        f.write("#chr\tacc\n1\tCM000663.1\n")
    os.makedirs(rel / "special_requests")
    _write_gz_fasta(rel / "special_requests" / "GRCh37-lite.fa.gz",
                    [(">CM000663.1 chromosome 1", par_seq)])
    for n in range(2, 10):
        _stub_locus(str(rel / f"ALT_REF_LOCI_{n}"))
    loc = rel / "ALT_REF_LOCI_1" / "alt_scaffolds"
    os.makedirs(loc / "FASTA")
    os.makedirs(loc / "alignments")
    _write_gz_fasta(loc / "FASTA" / "alt.scaf.fa.gz",
                    [(f">gi|{gi}|gb|{alt_acc}| alt scaffold", alt_seq)])
    with open(loc / "alignments" / f"{alt_acc}_CM000663.1.asn", "w") as f:
        f.write(asn_text)
    with open(loc / "alignments" / f"{alt_acc}_CM000663.1.gff", "w") as f:
        f.write("##gff-version 3\n")
    with open(loc / "alt_scaffold_placement.txt", "w") as f:
        f.write(pr._PLACEMENT_HEADER + "\n")
        f.write(placement_row + "\n")
    return str(src)


def _placement(ori, alt_acc="GL000001.1"):
    return "\t".join([
        "ALT_REF_LOCI_1", "GRCh37", "HSCHR1_1", alt_acc, "CHR", "1",
        "CM000663.1", "REGION1", ori, "1", "930", "5001", "5900", "0", "0"])


_ASN_TMPL = """Seq-align ::= {{
  type partial,
  score {{ {{ id str "pct_identity", value real {{ 99, 10, -1 }} }},
          {{ id str "num_ident", value int 900 }} }},
  dim 2,
  segs denseg {{
    dim 2, numseg {numseg},
    ids {{ gi 1234, gi 5678 }},
    starts {{ {starts} }},
    lens {{ {lens} }},
    strands {{ {strands} }}
  }}
}}
"""


def _rand_seq(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_positive_with_insertion(tmp_path):
    """M500 I30 M400 on the + strand: flanks fold into the outer Ms."""
    par = _rand_seq(8000, 1)
    # alt = par[5000:5500] + 30 novel bases + par[5500:5900]
    alt = par[5000:5500] + _rand_seq(30, 2) + par[5500:5900]
    asn = _ASN_TMPL.format(
        numseg=3,
        starts="0, 5000, 500, -1, 530, 5500",
        lens="500, 30, 400",
        strands="plus, plus, plus, plus, plus, plus")
    src = _make_tree(tmp_path, alt, par, asn, _placement("+"))
    dest = str(tmp_path / "out")
    pr.prepare(src, dest, flank=150)

    remap = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.remap").read().splitlines()
    assert remap == [">gi_1234_gb_GL000001.1_0-1|4851|6050",
                     "650M30I550M"]

    fa = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.fa").read().splitlines()
    assert fa[0] == ">gi_1234_gb_GL000001.1_0 alt scaffold"
    assert "".join(fa[1:]) == par[4850:5000] + alt + par[5900:6050]

    # the consuming parser accepts the generated record
    rec = load_remap(f"{dest}/GRCh37_ALT_REF_LOCI_1")[0]
    assert rec.target == "1" and not rec.exact
    assert rec.cigar == [(650, "M"), (30, "I"), (550, "M")]


def test_negative_orientation(tmp_path):
    """minus/plus strands + ori '-': alt slice is reverse-complemented."""
    par = _rand_seq(8000, 3)
    ins = _rand_seq(30, 4)
    forward = par[5000:5500] + ins + par[5500:5900]
    alt = pr.rev_complement(forward)
    # alt coordinates are on the stored (reverse) strand: seg i of the
    # forward walk sits at alt_len - fwd_stop
    asn = _ASN_TMPL.format(
        numseg=3,
        starts="430, 5000, 400, -1, 0, 5500",
        lens="500, 30, 400",
        strands="minus, plus, minus, plus, minus, plus")
    src = _make_tree(tmp_path, alt, par, asn, _placement("-"))
    dest = str(tmp_path / "out")
    pr.prepare(src, dest, flank=150)

    remap = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.remap").read().splitlines()
    assert remap == [">gi_1234_gb_GL000001.1_0-1|4851|6050",
                     "650M30I550M"]
    fa = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.fa").read().splitlines()
    assert "".join(fa[1:]) == par[4850:5000] + forward + par[5900:6050]


def test_all_n_insertion_splits_record(tmp_path):
    """An all-N insertion excises the gap: two remap records result
    (pl:708-755)."""
    par = _rand_seq(9000, 5)
    alt = par[5000:5500] + "N" * 100 + par[5700:6100]
    # the N gap on the alt is paired with a D gap on the parent
    asn = _ASN_TMPL.format(
        numseg=4,
        starts="0, 5000, 500, -1, -1, 5500, 600, 5700",
        lens="500, 100, 200, 400",
        strands="plus, plus, plus, plus, plus, plus, plus, plus")
    src = _make_tree(tmp_path, alt, par, asn, _placement("+"))
    dest = str(tmp_path / "out")
    pr.prepare(src, dest, flank=50)

    remap = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.remap").read().splitlines()
    assert remap == [
        ">gi_1234_gb_GL000001.1_0-1|4951|5550", "600M",
        ">gi_1234_gb_GL000001.1_1-1|5651|6150", "500M",
    ]
    fa = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.fa").read().split(">")
    recs = [r.splitlines() for r in fa if r]
    assert "".join(recs[0][1:]) == par[4950:5550]
    assert "".join(recs[1][1:]) == par[5650:6150]
    maps = load_remap(f"{dest}/GRCh37_ALT_REF_LOCI_1")
    assert len(maps) == 2 and maps[1].start in (5650, 5651)


def test_flank_clamped_at_contig_edges(tmp_path):
    """Flank longer than the upstream sequence clamps to position 1."""
    par = _rand_seq(1200, 6)
    alt = par[40:940]
    asn = _ASN_TMPL.format(
        numseg=1, starts="0, 40", lens="900",
        strands="plus, plus")
    src = _make_tree(tmp_path, alt, par, asn, "\t".join([
        "ALT_REF_LOCI_1", "GRCh37", "HSCHR1_1", "GL000001.1", "CHR", "1",
        "CM000663.1", "REGION1", "+", "1", "900", "41", "940", "0", "0"]))
    dest = str(tmp_path / "out")
    pr.prepare(src, dest, flank=150)

    remap = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.remap").read().splitlines()
    # pre-flank truncated to 40, post-flank to 1200-940=260 -> full 150
    assert remap == [">gi_1234_gb_GL000001.1_0-1|1|1090", "1090M"]
    fa = open(f"{dest}/GRCh37_ALT_REF_LOCI_1.fa").read().splitlines()
    assert "".join(fa[1:]) == par[0:1090]


def test_asn_parser_disc_and_scores():
    asn = """Seq-align ::= {
      type disc,
      segs disc {
        { type partial, dim 2,
          segs denseg { dim 2, numseg 1, ids { gi 1, gi 2 },
                        starts { 0, 100 }, lens { 50 },
                        strands { plus, plus } } },
        { type partial, dim 2,
          segs denseg { dim 2, numseg 1, ids { gi 1, gi 2 },
                        starts { 60, 160 }, lens { 40 },
                        strands { plus, plus } } }
      }
    }"""
    sa = pr.parse_asn(asn)
    segs = pr.get_seg_list(sa)
    assert len(segs) == 2
    assert segs[0]["starts"] == [[0, 100]]
    assert segs[1]["lens"] == [40]


def test_rejects_bad_tree(tmp_path):
    os.makedirs(tmp_path / "src" / "GRCh37")
    with pytest.raises(ValueError, match="9 ALT_REF_LOCI"):
        pr.prepare(str(tmp_path / "src"), str(tmp_path / "out"),
                   lite=os.devnull)
