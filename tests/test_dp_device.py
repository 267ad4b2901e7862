"""Parity of the batched device DP kernels vs the native scalar kernels.

The device kernels (ibwa_tpu/ops/dp.py) transcribe the reference's
stdaln.c recurrences with closed-form in-row gap chains; these tests pin
them value-equal to the native C++ twins (core.cpp) — the same kernels
the byte-parity SAM suites already pin to the reference binary — across
random job shapes including the adaptive-band and stale-cell edge cases.
"""

import numpy as np
import pytest

from ibwa_tpu import native
from ibwa_tpu.ops import dp


def _matrix(a=1, b=3):
    m = np.full(25, -b, dtype=np.int32)
    for i in range(4):
        m[i * 5 + i] = a
    return m


def _rand_jobs(rng, n, tmax, qmax, related_frac=0.7):
    """Random extension jobs; `related` jobs embed a mutated copy of the
    query in the target so extensions actually run deep."""
    targets, queries = [], []
    for _ in range(n):
        lt = int(rng.integers(1, tmax))
        lq = int(rng.integers(1, qmax))
        t = rng.integers(0, 4, lt).astype(np.uint8)
        if rng.random() < related_frac and lt > 4:
            q = t[:min(lq, lt)].copy()
            nmut = rng.integers(0, max(len(q) // 8, 1) + 1)
            for _ in range(nmut):
                p = rng.integers(0, len(q))
                q[p] = rng.integers(0, 4)
            # occasional indel so gap paths engage
            if rng.random() < 0.4 and len(q) > 10:
                p = int(rng.integers(2, len(q) - 2))
                q = np.delete(q, p)
        else:
            q = rng.integers(0, 4, lq).astype(np.uint8)
        targets.append(t)
        queries.append(q.astype(np.uint8))
    return targets, queries


@pytest.mark.parametrize("seed,tmax,qmax,band", [
    (1, 60, 40, 8),
    (2, 300, 200, 50),
    (3, 1500, 1100, 50),
    (4, 25, 90, 33),     # query longer than target
])
def test_extend_batch_matches_native(seed, tmax, qmax, band):
    rng = np.random.default_rng(seed)
    n = 40
    targets, queries = _rand_jobs(rng, n, tmax, qmax)
    mat = _matrix()
    g0 = rng.integers(1, 100, n).astype(np.int32)
    bands = np.full(n, band, dtype=np.int32)
    # a few jobs with tighter per-job bands (opt.bw = min(bw, k))
    bands[::5] = rng.integers(1, band + 1, len(bands[::5]))
    got = dp.extend_batch(targets, queries, g0, bands, mat,
                          gap_open=5, gap_ext=2)
    for i in range(n):
        want = native.extend_aln(targets[i], queries[i], 5, 2,
                                 int(bands[i]), mat.reshape(5, 5),
                                 int(g0[i]))
        assert tuple(got[i]) == want, (
            f"job {i}: got {tuple(got[i])} want {want} "
            f"(lt={len(targets[i])} lq={len(queries[i])} "
            f"band={bands[i]} g0={g0[i]})")


def test_extend_batch_bwasw_shapes():
    """Shapes as bsw2_extend_left/rght produce them: G0 from prior hit
    score, the left side's reversed query, zero-length edges."""
    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 8000).astype(np.uint8)
    targets, queries, g0s = [], [], []
    for _ in range(30):
        lq = int(rng.integers(60, 900))
        p = int(rng.integers(0, len(genome) - lq))
        q = genome[p:p + lq].copy()
        for _ in range(lq // 30):
            q[rng.integers(0, lq)] = rng.integers(0, 4)
        lt = int(rng.integers(0, min(p + lq // 2, 2000) + 1))
        t = genome[max(p - lt, 0):p][::-1].copy()  # leftward window
        targets.append(np.ascontiguousarray(t))
        queries.append(np.ascontiguousarray(q[::-1]))
        g0s.append(int(rng.integers(1, lq)))
    mat = _matrix()
    g0 = np.array(g0s, dtype=np.int32)
    bands = np.full(len(targets), 50, dtype=np.int32)
    got = dp.extend_batch(targets, queries, g0, bands, mat, 5, 2)
    for i in range(len(targets)):
        want = ((-1, 0, 0) if not len(targets[i]) or not len(queries[i])
                else native.extend_aln(targets[i], queries[i], 5, 2, 50,
                                       mat.reshape(5, 5), int(g0[i])))
        assert tuple(got[i]) == want, f"job {i}"
