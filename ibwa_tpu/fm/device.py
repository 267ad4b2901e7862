"""Device-resident FM-index + batched occ kernels (the #1 hot op).

The reference's interleaved layout (bwt.h:56-63) is re-laid-out as a
structure of arrays per strand, stacked so both strands live in one pair of
device buffers:

    ckpt:  uint32[2 * (n_blk + 1), 4]   occ checkpoints before each block
    words: uint32[2 * n_blk, 8]         2-bit packed BWT text

A batched occ query (bwt_occ / bwt_occ4, bwt.c:90-214) is a row gather of
one checkpoint + up to 8 text words followed by a masked popcount — pure
VPU work that XLA vectorizes over the whole query batch.  All interval
arithmetic is uint32, matching the reference's bwtint_t; k == 0xFFFFFFFF
plays the role of (bwtint_t)(-1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .fmindex import FmIndex

OCC_INTV = 128
NEG1 = 0xFFFFFFFF


@dataclasses.dataclass
class DeviceFmPair:
    """Both strands' FM-indexes as device arrays (fwd = strand 0).

    blocks packs each 128-base block's 4 occ checkpoints + 8 text words
    into ONE row (the reference's interleaved layout, bwt.h:56-63) so an
    occ query is a single 48-byte row gather."""

    blocks: jax.Array   # uint32[2*n_blk, 12]: 4 ckpt words + 8 text words
    L2: jax.Array       # uint32[5] (identical for both strands)
    l2diff: jax.Array   # uint32[4] = L2[1:5] - L2[0:4]
    primary: jax.Array  # uint32[2]
    seq_len: int        # static
    n_blk: int          # static
    # sharded-index mode (>HBM genomes): the 2*n_blk rows of `blocks` are
    # split contiguously over this mesh axis; every row gather becomes a
    # masked local gather + a psum over the axis (see _gather_block)
    shard_axis: str | None = None   # static

    def tree_flatten(self):
        return ((self.blocks, self.L2, self.l2diff, self.primary),
                (self.seq_len, self.n_blk, self.shard_axis))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    DeviceFmPair, DeviceFmPair.tree_flatten, DeviceFmPair.tree_unflatten)


def build_device_pair(fwd: FmIndex, rev: FmIndex,
                      put=jnp.asarray) -> DeviceFmPair:
    assert fwd.seq_len == rev.seq_len
    n_blk = (fwd.seq_len + OCC_INTV - 1) // OCC_INTV
    blocks = np.empty((2 * n_blk, 12), dtype=np.uint32)
    blocks[:n_blk, :4] = fwd.ckpt[:n_blk]
    blocks[:n_blk, 4:] = fwd.words
    blocks[n_blk:, :4] = rev.ckpt[:n_blk]
    blocks[n_blk:, 4:] = rev.words
    l2 = fwd.L2.astype(np.uint32)
    return DeviceFmPair(
        blocks=put(blocks),
        L2=put(l2),
        l2diff=put((l2[1:5] - l2[0:4]).astype(np.uint32)),
        primary=put(np.array([fwd.primary, rev.primary], dtype=np.uint32)),
        seq_len=fwd.seq_len,
        n_blk=n_blk,
    )


def _gather_block(fm: DeviceFmPair, strand, k):
    """Common block gather: returns (ck[..,4], w[..,8], nw, nb) for queries
    already adjusted for the primary sentinel and clamped in range."""
    blk = (k >> 7).astype(jnp.uint32)
    blk = jnp.minimum(blk, jnp.uint32(fm.n_blk - 1))
    off = k & jnp.uint32(127)
    flat = strand * jnp.uint32(fm.n_blk) + blk
    if fm.shard_axis is None:
        row = fm.blocks[flat]                              # [..., 12]
    else:
        # sharded-index mode: rows are split contiguously over the mesh
        # axis; fetch what this shard owns, zero elsewhere, and psum the
        # one-hot rows over ICI ([...,12] u32 per query — bandwidth-cheap)
        n_local = fm.blocks.shape[0]
        lo = (jax.lax.axis_index(fm.shard_axis).astype(jnp.uint32)
              * jnp.uint32(n_local))
        loc = flat - lo
        owned = loc < jnp.uint32(n_local)   # u32 wrap puts out-of-range high
        safe = jnp.minimum(loc, jnp.uint32(n_local - 1)).astype(jnp.int32)
        row = jnp.where(owned[..., None], fm.blocks[safe], jnp.uint32(0))
        row = jax.lax.psum(row, fm.shard_axis)
    ck = row[..., :4]
    w = row[..., 4:]
    nw = (off >> 4).astype(jnp.int32)       # number of fully-counted words
    nb = ((off & 15) + 1).astype(jnp.uint32)  # bases counted in word nw
    return ck, w, nw, nb


def _partial_mask(nb):
    """Keep the top nb 2-bit fields of a word (bwt.c:109: the
    ~((1<<((15-(k&15)+1)<<1))-1) trick with nb = (k&15)+1)."""
    shift = (jnp.uint32(16) - nb) * 2
    return ~((jnp.uint32(1) << shift) - 1)


def occ4(fm: DeviceFmPair, strand, k):
    """Batched bwt_occ4 (bwt.c:139-175): counts of each base in B0[0..k].

    strand, k: uint32[...]; returns uint32[..., 4].
    k == NEG1 -> 0; k == seq_len -> L2[c+1]-L2[c].
    """
    k = k.astype(jnp.uint32)
    is_neg = k == jnp.uint32(NEG1)
    is_full = k == jnp.uint32(fm.seq_len)
    prim = fm.primary[strand]
    kk = k - (k >= prim).astype(jnp.uint32)
    kk = jnp.minimum(kk, jnp.uint32(max(fm.seq_len - 1, 0)))
    ck, w, nw, nb = _gather_block(fm, strand, kk)

    pats = jnp.uint32(0x55555555) * jnp.arange(4, dtype=jnp.uint32)
    x = w[..., None, :] ^ pats[..., :, None]           # [..., 4, 8]
    t = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555)
    widx = jnp.arange(8, dtype=jnp.int32)
    full = widx < nw[..., None, None]
    part = widx == nw[..., None, None]
    pm = _partial_mask(nb)[..., None, None]
    sel = jnp.where(full, t, 0) | jnp.where(part, t & pm, 0)
    pc = jax.lax.population_count(sel)
    # unrolled lane sum: a tiny trailing-axis reduce lowers to a slow
    # cross-lane reduction on TPU, elementwise adds do not
    cnt = ck
    for j in range(8):
        cnt = cnt + pc[..., j]
    cnt = jnp.where(is_neg[..., None], 0, cnt)
    cnt = jnp.where(is_full[..., None], fm.l2diff, cnt)
    return cnt


def occ1(fm: DeviceFmPair, strand, k, c):
    """Batched bwt_occ (bwt.c:90-113) for one base code per lane."""
    k = k.astype(jnp.uint32)
    c = c.astype(jnp.uint32)
    is_neg = k == jnp.uint32(NEG1)
    is_full = k == jnp.uint32(fm.seq_len)
    prim = fm.primary[strand]
    kk = k - (k >= prim).astype(jnp.uint32)
    kk = jnp.minimum(kk, jnp.uint32(max(fm.seq_len - 1, 0)))
    ck, w, nw, nb = _gather_block(fm, strand, kk)

    pat = (jnp.uint32(0x55555555) * c)[..., None]
    x = w ^ pat
    t = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555)
    widx = jnp.arange(8, dtype=jnp.int32)
    full = widx < nw[..., None]
    part = widx == nw[..., None]
    pm = _partial_mask(nb)[..., None]
    sel = jnp.where(full, t, 0) | jnp.where(part, t & pm, 0)
    pc = jax.lax.population_count(sel)
    # select ck[c] arithmetically + unrolled lane sum (see occ4)
    cnt = jnp.zeros_like(c)
    for j in range(4):
        cnt = cnt + jnp.where(c == j, ck[..., j], 0)
    for j in range(8):
        cnt = cnt + pc[..., j]
    cnt = jnp.where(is_neg, 0, cnt)
    lc = jnp.zeros_like(c)
    for j in range(4):
        lc = lc + jnp.where(c == j, fm.l2diff[j], 0)
    cnt = jnp.where(is_full, lc, cnt)
    return cnt
