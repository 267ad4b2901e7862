"""Command-line interface mirroring the reference binary's subcommands.

Usage: python -m ibwa_tpu <command> [options]
"""

from __future__ import annotations

import argparse
import sys


def cmd_index(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="ibwa-tpu index")
    ap.add_argument("fasta", help="input FASTA")
    ap.add_argument("-p", "--prefix", default=None,
                    help="index prefix [fasta path]")
    args = ap.parse_args(argv)
    from .index.builder import bwa_index
    bwa_index(args.fasta, args.prefix)
    return 0


def cmd_aln(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="ibwa-tpu aln")
    ap.add_argument("prefix")
    ap.add_argument("fastq")
    ap.add_argument("-n", default=None,
                    help="max #diff (int) or missing prob (float)")
    ap.add_argument("-o", type=int, default=None, help="max gap opens")
    ap.add_argument("-e", type=int, default=-1, help="max gap extensions")
    ap.add_argument("-i", type=int, default=None, help="indel end skip")
    ap.add_argument("-d", type=int, default=None, help="max del occ")
    ap.add_argument("-l", type=int, default=None, help="seed length")
    ap.add_argument("-k", type=int, default=None, help="max seed diff")
    ap.add_argument("-m", type=int, default=None, help="max entries")
    ap.add_argument("-M", type=int, default=None, help="mismatch penalty")
    ap.add_argument("-O", type=int, default=None, help="gap open penalty")
    ap.add_argument("-E", type=int, default=None, help="gap extend penalty")
    ap.add_argument("-R", type=int, default=None, help="max equally-best")
    ap.add_argument("-q", type=int, default=None, help="trim quality")
    ap.add_argument("-N", action="store_true", help="non-iterative mode")
    ap.add_argument("-f", default=None, help="output file [stdout]")
    ap.add_argument("--engine", default="jax", choices=["jax", "ref"])
    args = ap.parse_args(argv)

    from .align.opts import GapOpt, BWA_MODE_GAPE, BWA_MODE_NONSTOP
    from .align.pipeline import aln_to_stream
    opt = GapOpt()
    if args.n is not None:
        if "." in args.n:
            opt.fnr, opt.max_diff = float(args.n), -1
        else:
            opt.max_diff, opt.fnr = int(args.n), -1.0
    if args.o is not None:
        opt.max_gapo = args.o
    if args.e > 0:
        opt.max_gape = args.e
        opt.mode &= ~BWA_MODE_GAPE
    for flag, attr in [("i", "indel_end_skip"), ("d", "max_del_occ"),
                       ("l", "seed_len"), ("k", "max_seed_diff"),
                       ("m", "max_entries"), ("M", "s_mm"), ("O", "s_gapo"),
                       ("E", "s_gape"), ("R", "max_top2"), ("q", "trim_qual")]:
        v = getattr(args, flag)
        if v is not None:
            setattr(opt, attr, v)
    if args.N:
        opt.mode |= BWA_MODE_NONSTOP
        opt.max_top2 = 0x7FFFFFFF
    out = open(args.f, "wb") if args.f else sys.stdout.buffer
    try:
        aln_to_stream(args.prefix, args.fastq, opt, out, engine=args.engine)
    finally:
        if args.f:
            out.close()
    return 0


COMMANDS = {
    "index": cmd_index,
    "aln": cmd_aln,
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("ibwa-tpu — TPU-native iterative read aligner", file=sys.stderr)
        print(f"commands: {', '.join(COMMANDS)}", file=sys.stderr)
        return 1
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"[ibwa-tpu] unrecognized command '{cmd}'", file=sys.stderr)
        return 1
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
