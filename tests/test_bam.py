"""Differential test: BAM input to aln (-b / -1 / -2 flag filtering)."""

import gzip
import io
import random
import struct
import subprocess

import pytest

from ibwa_tpu.align.opts import (GapOpt, BWA_MODE_BAM, BWA_MODE_BAM_READ1)
from ibwa_tpu.align.pipeline import aln_to_stream
from ibwa_tpu.index import builder

from conftest import make_genome

NT16 = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def write_bam(path, records):
    """records: (name, flag, seq_str, qual_str) — minimal BAM writer."""
    buf = io.BytesIO()
    buf.write(b"BAM\x01")
    text = b"@HD\tVN:1.0\n"
    buf.write(struct.pack("<i", len(text)))
    buf.write(text)
    buf.write(struct.pack("<i", 0))  # n_ref
    for name, flag, seq, qual in records:
        qname = name.encode() + b"\x00"
        packed = bytearray((len(seq) + 1) // 2)
        for i, ch in enumerate(seq):
            code = NT16[ch]
            packed[i // 2] |= code << 4 if i % 2 == 0 else code
        q = bytes(ord(c) - 33 for c in qual)
        body = struct.pack("<iiIIiiii", -1, -1,
                           (4680 << 16) | (0 << 8) | len(qname),
                           (flag << 16) | 0, len(seq), -1, -1, 0)
        body += qname + bytes(packed) + q
        buf.write(struct.pack("<i", len(body)))
        buf.write(body)
    with gzip.open(path, "wb") as f:
        f.write(buf.getvalue())


@pytest.fixture(scope="module")
def bam_case(tmp_path_factory, oracle):
    tmp = tmp_path_factory.mktemp("bam")
    fa = tmp / "g.fa"
    genome = make_genome(str(fa), [("bchr", "", 30000, 0.0)], seed=121)
    fa_ref = tmp / "g_ref.fa"
    fa_ref.write_bytes(fa.read_bytes())
    subprocess.run([oracle, "index", str(fa_ref)], check=True,
                   capture_output=True)
    builder.bwa_index(str(fa))
    rng = random.Random(8)
    seq = genome["bchr"]
    records = []
    for i in range(60):
        pos = rng.randrange(0, len(seq) - 80)
        s = "".join(c if rng.random() > 0.02 else rng.choice("ACGT")
                    for c in seq[pos:pos + 75])
        flag = 0x40 if i % 2 == 0 else 0x80  # read1 / read2
        if rng.random() < 0.5:  # store reverse-complemented + FREVERSE
            s = "".join(COMP[c] for c in reversed(s))
            flag |= 0x10
        records.append((f"b{i}", flag | 0x1, s, "I" * len(s)))
    bam = tmp / "r.bam"
    write_bam(str(bam), records)
    return tmp, fa, fa_ref, bam


@pytest.mark.parametrize("flags,mode_extra", [
    (["-b"], 0),
    (["-b", "-1"], BWA_MODE_BAM_READ1),
])
def test_bam_aln_parity(bam_case, oracle, flags, mode_extra):
    tmp, fa, fa_ref, bam = bam_case
    ref_sai = subprocess.run(
        [oracle, "aln"] + flags + [str(fa_ref), str(bam)],
        check=True, capture_output=True).stdout
    opt = GapOpt(mode=GapOpt().mode | BWA_MODE_BAM | mode_extra)
    buf = io.BytesIO()
    aln_to_stream(str(fa), str(bam), opt, buf, engine="native")
    assert buf.getvalue() == ref_sai
