"""Batched SA-resolution LF walks on the device.

The SAM stages resolve SA rows to text coordinates by walking LF until a
sampled row: `while k % sa_intv: ++add; k = LF(k)` (reference bwt_sa,
bwt.c:61-79; host twin `sa_walk`, native/src/pe_stage.cpp:66-81).  On the
repeat bench corpus sampe spends ~40% of its wall in these walks — ~2.2M
independent 0..31-step pointer chases, embarrassingly parallel across
rows and a perfect lane workload for the chip while the host core runs
the stages around it.

One walk step per lane is ONE fused row gather: the 48-byte interleaved
block row yields both the BWT code at the row and its occ count
(the host's fused lf_step.h does the same on one core).  The kernel runs
a while_loop that retires lanes as they hit sampled rows; the final
sampled-array lookup (a host-resident table) happens in numpy.

Used by sam/pe_native.py to prefill the native stage's SA-interval cache
(pe_stage.cpp::cached_walk) so compute_coords never walks on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .device import DeviceFmPair, _gather_block

U32 = jnp.uint32


def _lf_step(fm: DeviceFmPair, strand, k):
    """One LF step per lane: k -> L2[c] + occ_incl(c, k) with c = code at
    row k; k == primary -> 0 (matches lf_step.h:39-72 / bwt_invPsi).

    strand, k: uint32[N].  One row gather + VPU popcounts.
    """
    prim = fm.primary[strand]
    is_prim = k == prim
    ka = k - (k > prim).astype(U32)
    ka = jnp.minimum(ka, jnp.uint32(max(fm.seq_len - 1, 0)))
    ck, w, nw, nb = _gather_block(fm, strand, ka)

    # code at the row: select word nw, shift by the in-word offset
    off = ka & jnp.uint32(fm.intv - 1)
    widx = jnp.arange(fm.wpb, dtype=jnp.int32)
    word = jnp.zeros_like(k)
    for j in range(fm.wpb):
        word = word | jnp.where(nw == j, w[..., j], 0)
    c = (word >> (((~off) & jnp.uint32(0xF)) << 1)) & 3

    # inclusive occ of c up to ka (same popcount scheme as occ1)
    pat = (jnp.uint32(0x55555555) * c)[..., None]
    x = w ^ pat
    t = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555)
    shift = (jnp.uint32(16) - nb) * 2
    pm = (~((jnp.uint32(1) << shift) - 1))[..., None]
    full = widx < nw[..., None]
    part = widx == nw[..., None]
    sel = jnp.where(full, t, 0) | jnp.where(part, t & pm, 0)
    pc = jax.lax.population_count(sel)
    cnt = jnp.zeros_like(c)
    for j in range(4):
        cnt = cnt + jnp.where(c == j, ck[..., j], 0)
    for j in range(fm.wpb):
        cnt = cnt + pc[..., j]

    lc = jnp.zeros_like(c)
    for j in range(4):
        lc = lc + jnp.where(c == j, fm.L2[j], 0)
    return jnp.where(is_prim, jnp.uint32(0), lc + cnt)


@functools.partial(jax.jit, static_argnames=("seq_len", "n_blk",
                                             "intv_mask", "blk_intv"))
def _lf_walk(blocks, L2, l2diff, primary, strand, k0,
             seq_len: int, n_blk: int, intv_mask: int, blk_intv: int = 128):
    """Walk each lane to its nearest sampled row.

    Returns (add uint32[N] = steps taken, kfin uint32[N] = sampled row).
    Callers do `sa = add + sampled_sa[kfin >> log2(intv)]` on the host.
    """
    fm = DeviceFmPair(blocks, L2, l2diff, primary, None, seq_len, n_blk,
                      None, blk_intv)
    mask = jnp.uint32(intv_mask)

    def cond(st):
        k, add, active = st
        return jnp.any(active)

    def body(st):
        k, add, active = st
        k2 = _lf_step(fm, strand, k)
        k = jnp.where(active, k2, k)
        add = add + active.astype(U32)
        active = active & ((k & mask) != 0)
        return k, add, active

    k0 = k0.astype(U32)
    st = (k0, jnp.zeros_like(k0), (k0 & mask) != 0)
    k, add, _ = jax.lax.while_loop(cond, body, st)
    return add, k


WALK_LANES = 131072  # rows per dispatch; env IBWA_WALK_LANES overrides


class DeviceWalker:
    """Device-resident LF walker for one (fwd, rev) index pair.

    Strand convention matches fm.device: 0 = forward index, 1 = reverse.
    """

    def __init__(self, fwd, rev, put=None):
        import os
        from .device import build_device_pair
        self.fm = build_device_pair(fwd, rev, dimer=False) if put is None \
            else build_device_pair(fwd, rev, put=put, dimer=False)
        self.sa_intv = int(fwd.sa_intv)
        assert self.sa_intv == int(rev.sa_intv)
        self.shift = self.sa_intv.bit_length() - 1
        if (1 << self.shift) != self.sa_intv:
            raise ValueError("device walker needs power-of-two sa_intv")
        self.sampled = (fwd.sa, rev.sa)  # host-resident sampled arrays
        self.lanes = int(os.environ.get("IBWA_WALK_LANES", WALK_LANES))

    def resolve(self, strand: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """SA values for (strand, row) pairs; bit-equal to host sa_walk."""
        n = len(rows)
        out = np.empty(n, dtype=np.uint32)
        B = self.lanes
        fm = self.fm
        pending = []
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            ks = np.zeros(B, dtype=np.uint32)
            ss = np.zeros(B, dtype=np.uint32)
            ks[:hi - lo] = rows[lo:hi]
            ss[:hi - lo] = strand[lo:hi]
            add, kfin = _lf_walk(fm.blocks, fm.L2, fm.l2diff, fm.primary,
                                 jnp.asarray(ss), jnp.asarray(ks),
                                 seq_len=fm.seq_len, n_blk=fm.n_blk,
                                 intv_mask=self.sa_intv - 1,
                                 blk_intv=fm.intv)
            pending.append((lo, hi, add, kfin))
        for lo, hi, add, kfin in pending:
            addn = np.asarray(add)[:hi - lo].astype(np.uint32)
            kn = np.asarray(kfin)[:hi - lo]
            s = strand[lo:hi]
            base = np.where(
                s == 0,
                self.sampled[0][(kn >> self.shift)],
                self.sampled[1][(kn >> self.shift)]).astype(np.uint32)
            out[lo:hi] = addn + base
        return out
