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


COMMANDS = {
    "index": cmd_index,
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
