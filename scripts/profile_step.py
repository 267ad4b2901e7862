"""Profile the persistent search loop: per-HLO self-times via xprof.

Usage: python scripts/profile_step.py [n_lanes] [max_iters]
"""

from __future__ import annotations

import glob
import json
import sys

import jax

from ibwa_tpu.align import engine_jax

sys.path.insert(0, "/root/repo/scripts")
from sweep_lanes import prep  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    engine_jax.MAX_ITERS = cap  # bound the while loop for a short trace
    jax.clear_caches()
    eng, cfg, args, n_reads = prep()
    dfm = eng.dfm

    def f():
        return engine_jax._run_search_persistent(
            cfg, dfm.blocks, dfm.L2, dfm.l2diff, dfm.primary, *args,
            seq_len=dfm.seq_len, n_blk=dfm.n_blk, n_lanes=B)

    jax.block_until_ready(f())  # compile
    tdir = f"/tmp/prof_lanes{B}"
    with jax.profiler.trace(tdir):
        jax.block_until_ready(f())

    from xprof.convert import raw_to_tool_data
    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        files, "hlo_stats", {"tqx": "out:json"})
    rows = json.loads(data)["rows"]
    tot = sum(r["c"][5]["v"] for r in rows)
    rows.sort(key=lambda r: -r["c"][5]["v"])
    print(f"B={B}  total self-time {tot/1e6:.1f}ms  (cap={cap})")
    for r in rows[:28]:
        c = r["c"]
        print(f"{c[5]['v']/1e3:9.1f}us {100*c[5]['v']/tot:5.1f}%  "
              f"{str(c[2]['v'])[:60]:60s} {str(c[9]['v'])[:70]}")


if __name__ == "__main__":
    main()
