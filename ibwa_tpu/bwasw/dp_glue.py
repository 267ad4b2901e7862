"""Wires the device DP kernels into the native bwasw driver.

`install()` registers a ctypes callback with bsw2.cpp's staged extension
hook (`ibwa_bsw2_set_extend_fn`): each batch of seed-extension jobs the
C++ driver collects across a read chunk is routed to the batched JAX
kernel (ops/dp.py::extend_jobs), with oversize / rescale-prone jobs and
empty edges falling back to the host scalar kernel — results are
value-identical either way (tests/test_dp_device.py pins the kernel;
tests/test_bwasw_device.py pins the end-to-end SAM text).

Opt-in via IBWA_BSW_DEVICE=1 (aux.py checks at driver start): a device
round trip only pays off with a real accelerator; the CPU-jax path
exists for parity tests.
"""

from __future__ import annotations

import ctypes

import numpy as np

EXT_FN_T = ctypes.CFUNCTYPE(
    None, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32))

_CB = None  # keep the CFUNCTYPE object alive while installed


def _callback(n, tgt_blob, tgt_off, qry_blob, qry_off, g0, band,
              gap_open, gap_ext, mat, out):
    from .. import native
    from ..ops import dp

    toff = np.ctypeslib.as_array(tgt_off, ((n + 1),))
    qoff = np.ctypeslib.as_array(qry_off, ((n + 1),))
    tb = (np.ctypeslib.as_array(tgt_blob, (int(toff[-1]),))
          if toff[-1] else np.zeros(0, np.uint8))
    qb = (np.ctypeslib.as_array(qry_blob, (int(qoff[-1]),))
          if qoff[-1] else np.zeros(0, np.uint8))
    g0a = np.ctypeslib.as_array(g0, (n,))
    ba = np.ctypeslib.as_array(band, (n,))
    m = np.ctypeslib.as_array(mat, (25,)).copy()
    o = np.ctypeslib.as_array(out, (n, 3))
    targets = [tb[toff[i]:toff[i + 1]] for i in range(n)]
    queries = [qb[qoff[i]:qoff[i + 1]] for i in range(n)]
    res, host_idx = dp.extend_jobs(targets, queries, g0a, ba, m,
                                   int(gap_open), int(gap_ext))
    for i in host_idx:
        res[i] = native.extend_aln(targets[i], queries[i], int(gap_open),
                                   int(gap_ext), int(ba[i]),
                                   m.reshape(5, 5), int(g0a[i]))
    o[:] = res


def install() -> None:
    """Register the device extension backend with the native driver."""
    global _CB
    from .. import native
    lib = native.load()
    lib.ibwa_bsw2_set_extend_fn.argtypes = [ctypes.c_void_p]
    lib.ibwa_bsw2_set_extend_fn.restype = None
    _CB = EXT_FN_T(_callback)
    lib.ibwa_bsw2_set_extend_fn(ctypes.cast(_CB, ctypes.c_void_p))


def uninstall() -> None:
    global _CB
    from .. import native
    lib = native.load()
    lib.ibwa_bsw2_set_extend_fn.argtypes = [ctypes.c_void_p]
    lib.ibwa_bsw2_set_extend_fn.restype = None
    lib.ibwa_bsw2_set_extend_fn(None)
    _CB = None
