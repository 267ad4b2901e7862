"""rand48 parity: scalar class, NumPy bulk, and native C++ streams must all
match glibc exactly (values captured from a srand48/lrand48/drand48 C run)."""

import numpy as np

from ibwa_tpu import native
from ibwa_tpu.rng import Rand48

GLIBC_LRAND48_SEED11 = [1609868485, 1074594562, 470884846, 2128573038,
                        960673312]
GLIBC_DRAND48_SEED42 = [0.74452500006100664, 0.34270147871890799,
                        0.11108528244416149, 0.42233895798830901,
                        0.08111117117831057]


def test_scalar_lrand48_matches_glibc():
    r = Rand48(11)
    assert [r.lrand48() for _ in range(5)] == GLIBC_LRAND48_SEED11


def test_scalar_drand48_matches_glibc():
    r = Rand48(42)
    got = [r.drand48() for _ in range(5)]
    assert got == GLIBC_DRAND48_SEED42  # exact float equality


def test_numpy_bulk_matches_scalar():
    r1, r2 = Rand48(123), Rand48(123)
    bulk = r1.lrand48_array(1000)
    scalar = np.array([r2.lrand48() for _ in range(1000)], dtype=np.uint64)
    np.testing.assert_array_equal(bulk, scalar)
    assert r1.x == r2.x  # state advanced identically


def test_numpy_bulk_drand48():
    r1, r2 = Rand48(7), Rand48(7)
    bulk = r1.drand48_array(257)
    scalar = np.array([r2.drand48() for _ in range(257)])
    np.testing.assert_array_equal(bulk, scalar)


def test_native_streams_match_scalar():
    r = Rand48(11)
    vals, state = native.lrand48_stream(r.x, 5)
    assert list(vals) == GLIBC_LRAND48_SEED11
    r2 = Rand48(11)
    for _ in range(5):
        r2.lrand48()
    assert state == r2.x

    r = Rand48(42)
    dvals, _ = native.drand48_stream(r.x, 5)
    assert list(dvals) == GLIBC_DRAND48_SEED42
