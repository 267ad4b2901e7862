"""End-to-end parity of the device-extension bwasw path.

IBWA_BSW_DEVICE=1 routes the staged native driver's batched seed
extensions through the JAX kernel (ops/dp.py via bwasw/dp_glue.py);
the SAM text must be byte-identical to the host scalar path, and the
staged driver itself must be byte-identical to the sequential one.
"""

import io
import os

import numpy as np
import pytest

from conftest import make_genome

from ibwa_tpu.index import builder


@pytest.fixture(scope="module")
def bwasw_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bswdev")
    fa = tmp / "g.fa"
    genome = make_genome(fa, [("c1", "", 60000, 0.0), ("c2", "", 25000, 0.0)],
                         seed=77)
    builder.bwa_index(str(fa))
    # long reads with errors + indels; a couple with Ns so the staged
    # driver's amb segmentation is exercised
    rng = np.random.default_rng(5)
    items = list(genome.items())
    comp = str.maketrans("ACGTN", "TGCAN")
    fq = tmp / "long.fq"
    with open(fq, "w") as f:
        for i in range(60):
            name, s = items[rng.integers(0, len(items))]
            L = int(rng.integers(200, 900))
            p = int(rng.integers(0, len(s) - L))
            r = list(s[p:p + L])
            for _ in range(L // 40):
                r[rng.integers(0, len(r))] = "ACGT"[rng.integers(0, 4)]
            if rng.random() < 0.5 and len(r) > 30:
                q = int(rng.integers(10, len(r) - 10))
                if rng.random() < 0.5:
                    del r[q:q + int(rng.integers(1, 6))]
                else:
                    r[q:q] = ["ACGT"[rng.integers(0, 4)]
                              for _ in range(int(rng.integers(1, 6)))]
            if i % 17 == 0:
                r[int(rng.integers(0, len(r)))] = "N"
            rs = "".join(r)
            if rng.random() < 0.5:
                rs = rs.translate(comp)[::-1]
            f.write(f"@L{i}\n{rs}\n+\n{'I' * len(rs)}\n")
    return str(fa), str(fq)


def _run(fa, fq, env):
    from ibwa_tpu.bwasw.aux import Bsw2Opt, bsw2_aln
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        buf = io.StringIO()
        bsw2_aln(Bsw2Opt(), fa, fq, out=buf)
        return buf.getvalue()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        from ibwa_tpu.bwasw import dp_glue
        dp_glue.uninstall()


def test_staged_equals_sequential(bwasw_corpus):
    fa, fq = bwasw_corpus
    seq = _run(fa, fq, {"IBWA_BSW2_STAGED": "0"})
    staged = _run(fa, fq, {"IBWA_BSW2_STAGED": "1"})
    assert staged == seq


def test_device_extensions_byte_exact(bwasw_corpus):
    fa, fq = bwasw_corpus
    host = _run(fa, fq, {"IBWA_BSW2_STAGED": "1"})
    dev = _run(fa, fq, {"IBWA_BSW2_STAGED": "1", "IBWA_BSW_DEVICE": "1",
                        "IBWA_EXT_DEV_MIN": "1"})
    assert dev == host
