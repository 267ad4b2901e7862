"""Input converters matching the reference's helper scripts:
qualfa2fq.pl (FASTA+qual -> FASTQ) and solid2fastq.pl (SOLiD
csfasta+qual -> color FASTQ pairs)."""

from __future__ import annotations

import gzip
import sys
from typing import TextIO


def _open(path: str):
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def _fasta_records(f):
    name, lines = None, []
    for line in f:
        line = line.rstrip("\n")
        if line.startswith(">") or line.startswith("#"):
            if line.startswith("#"):
                continue
            if name is not None:
                yield name, lines
            name = line[1:]
            lines = []
        else:
            lines.append(line)
    if name is not None:
        yield name, lines


def qualfa2fq(fa_path: str, qual_path: str, out: TextIO = sys.stdout
              ) -> None:
    """qualfa2fq.pl: merge a FASTA and its numeric .qual into FASTQ."""
    with _open(fa_path) as fs, _open(qual_path) as fq:
        for (name, seq_lines), (_, q_lines) in zip(_fasta_records(fs),
                                                   _fasta_records(fq)):
            seq = "".join(seq_lines)
            quals = " ".join(q_lines).split()
            q = "".join(chr(int(v) + 33) for v in quals)
            out.write(f"@{name}\n{seq}\n+\n")
            for i in range(0, len(q), 60):
                out.write(q[i:i + 60] + "\n")


_CS2LETTER = str.maketrans("0123.", "ACGTN")


def solid2fastq(prefix_in: str, prefix_out: str) -> None:
    """solid2fastq.pl: SOLiD F3/R3 csfasta+qual -> color FASTQ pairs.

    Reads <prefix_in>{F3,R3}.csfasta + .qual, writes
    <prefix_out>.read{1,2}.fastq.gz and <prefix_out>.single.fastq.gz;
    the primer base and first color are dropped, colors become ACGTN."""
    pools: dict[str, tuple[str, str]] = {}
    singles = []
    outs = [gzip.open(f"{prefix_out}.read{i}.fastq.gz", "wt")
            for i in (1, 2)]
    single = gzip.open(f"{prefix_out}.single.fastq.gz", "wt")
    for end, tag in ((0, "F3"), (1, "R3")):
        try:
            fs = _open(f"{prefix_in}{tag}.csfasta")
            fq = _open(f"{prefix_in}{tag}_QV.qual")
        except FileNotFoundError:
            continue
        with fs, fq:
            for (name, seq_lines), (_, q_lines) in zip(
                    _fasta_records(fs), _fasta_records(fq)):
                base = name.rsplit("_", 1)[0]
                seq = "".join(seq_lines)[2:].translate(_CS2LETTER)
                quals = " ".join(q_lines).split()[1:]
                q = "".join(chr(min(int(v), 93) + 33) for v in quals)
                rec = f"@{base}/{end + 1}\n{seq}\n+\n{q}\n"
                other = pools.pop(base, None)
                if other is None:
                    pools[base] = (rec, str(end))
                else:
                    first, fe = other
                    if fe == "0":
                        outs[0].write(first)
                        outs[1].write(rec)
                    else:
                        outs[0].write(rec)
                        outs[1].write(first)
    for rec, _ in pools.values():
        singles.append(rec)
    for rec in singles:
        single.write(rec)
    for o in outs:
        o.close()
    single.close()
