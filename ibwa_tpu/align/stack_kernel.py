"""Pallas kernel: fused per-read stack update for the aln search engine.

One search step's stack mutations — pop invalidation, free-slot ranking
and up to 10 child pushes across the five [B, ACAP] state planes — cost
~470us/step as separate XLA scatters/gathers (each one drags a full-plane
copy).  This kernel does all of it in a single VMEM pass per plane tile
with no dynamic indexing at all: free slots are identified by comparing
against the key sentinel, ranked with a log-step lane cumsum, and each
child writes through a rank-match mask.  Slot CHOICE does not affect the
search semantics (only the priority key does), so replacing the
reference's free-list discipline with rank order is behavior-neutral.

The planes are aliased in place (input_output_aliases), so the pass is
read-once/write-once per plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = 0x7FFFFFFF
NCH = 16          # children padded to a lane-friendly width (10 used)
ROWS = 64         # rows per grid tile (10 planes + temporaries in VMEM)


def _lane_cumsum(x, width: int):
    """Inclusive cumsum along the last axis via log-step rolls."""
    c = x
    sh = 1
    while sh < width:
        r = pltpu.roll(c, sh, 1)
        mask = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1) >= sh
        c = c + jnp.where(mask, r, 0)
        sh <<= 1
    return c


def _kernel(slot0_ref, act_ref, cv_ref, ofs_ref, kv_ref,
            ck_ref, cl_ref, cm1_ref, cm2_ref,
            key_ref, sk_ref, sl_ref, sm1_ref, sm2_ref,
            okey_ref, osk_ref, osl_ref, osm1_ref, osm2_ref,
            ovf_ref, npush_ref,
            pslot_ref, pkey_ref, pk_ref, pl_ref, pm1_ref, pm2_ref):
    key = key_ref[:]
    acap = key.shape[1]
    li = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    act = act_ref[:]                     # [R, 1] int32
    slot0 = slot0_ref[:]                 # [R, 1] int32

    # pop invalidation (gap_pop frees the popped slot)
    key = jnp.where((li == slot0) & (act > 0), INT32_MAX, key)

    free = (key == INT32_MAX).astype(jnp.int32)
    rank = _lane_cumsum(free, acap)      # inclusive rank of each free slot
    total_free = rank[:, acap - 1:acap]  # [R, 1]

    sk = sk_ref[:]
    sl = sl_ref[:]
    sm1 = sm1_ref[:]
    sm2 = sm2_ref[:]
    ovf = jnp.zeros(act.shape, jnp.int32)
    npush = jnp.zeros(act.shape, jnp.int32)
    freeb = free > 0
    for j in range(10):
        cvj = cv_ref[:, j:j + 1]         # [R, 1]
        ofsj = ofs_ref[:, j:j + 1]
        fits = ofsj < total_free
        ovf = ovf | (cvj & jnp.where(fits, 0, 1))
        place = cvj > 0
        m = freeb & (rank - 1 == ofsj) & place & fits
        key = jnp.where(m, kv_ref[:, j:j + 1], key)
        sk = jnp.where(m, ck_ref[:, j:j + 1], sk)
        sl = jnp.where(m, cl_ref[:, j:j + 1], sl)
        sm1 = jnp.where(m, cm1_ref[:, j:j + 1], sm1)
        sm2 = jnp.where(m, cm2_ref[:, j:j + 1], sm2)
        npush = npush + (cvj & jnp.where(fits, 1, 0))

    okey_ref[:] = key
    osk_ref[:] = sk
    osl_ref[:] = sl
    osm1_ref[:] = sm1
    osm2_ref[:] = sm2
    ovf_ref[:] = ovf
    npush_ref[:] = npush

    # fused pop for the NEXT step: per-row argmin of the updated key
    # plane + the entry words at that slot, all while the planes are
    # still in VMEM (saves an argmin + five [B]-row gathers per step)
    minv = jnp.min(key, axis=1, keepdims=True)
    ismin = (key == minv).astype(jnp.int32)
    sel = (ismin > 0) & (_lane_cumsum(ismin, acap) == 1)  # first match
    pslot_ref[:] = jnp.sum(jnp.where(sel, li, 0), axis=1, keepdims=True)
    pkey_ref[:] = minv

    def onehot_u32(v):
        # unsigned reductions are unsupported in Mosaic: bitcast through
        # int32 (exact — exactly one non-zero term survives the mask)
        vi = jax.lax.bitcast_convert_type(v, jnp.int32)
        s = jnp.sum(jnp.where(sel, vi, 0), axis=1, keepdims=True)
        return jax.lax.bitcast_convert_type(s, jnp.uint32)

    pk_ref[:] = onehot_u32(sk)
    pl_ref[:] = onehot_u32(sl)
    pm1_ref[:] = onehot_u32(sm1)
    pm2_ref[:] = onehot_u32(sm2)


@functools.partial(jax.jit, static_argnames=("acap",))
def stack_update(slot0, act, cv, ofs, kv, ck, cl, cm1, cm2,
                 key, sk, sl, sm1, sm2, acap: int):
    """Apply one step's pop-free + pushes to the five state planes.

    slot0/act: [B] popped slot + active mask; cv/ofs/kv/ck/cl/cm1/cm2:
    [B, 10] child descriptors (valid, exclusive push rank, priority key,
    field words).  Returns (key, sk, sl, sm1, sm2, ovf[B], npush[B]).
    """
    B = slot0.shape[0]
    rows = min(ROWS, B)
    if B % rows:
        raise ValueError(
            f"stack_update: lane count B={B} must be a multiple of {rows} "
            f"(trailing rows would silently never be processed)")
    grid = (B // rows,)

    def pad(x):
        out = jnp.zeros((B, NCH), x.dtype)
        return out.at[:, :10].set(x)

    col = lambda v, dt: v.astype(dt).reshape(B, 1)
    plane = lambda: pl.BlockSpec((rows, acap), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    colspec = lambda: pl.BlockSpec((rows, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    chspec = lambda: pl.BlockSpec((rows, NCH), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[colspec(), colspec(), chspec(), chspec(), chspec(),
                  chspec(), chspec(), chspec(), chspec(),
                  plane(), plane(), plane(), plane(), plane()],
        out_specs=[plane(), plane(), plane(), plane(), plane(),
                   colspec(), colspec(),
                   colspec(), colspec(), colspec(), colspec(), colspec(),
                   colspec()],
        out_shape=[
            jax.ShapeDtypeStruct((B, acap), jnp.int32),
            jax.ShapeDtypeStruct((B, acap), jnp.uint32),
            jax.ShapeDtypeStruct((B, acap), jnp.uint32),
            jax.ShapeDtypeStruct((B, acap), jnp.uint32),
            jax.ShapeDtypeStruct((B, acap), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.uint32),
        ],
        input_output_aliases={9: 0, 10: 1, 11: 2, 12: 3, 13: 4},
    )(col(slot0, jnp.int32), col(act, jnp.int32),
      pad(cv.astype(jnp.int32)), pad(ofs.astype(jnp.int32)),
      pad(kv.astype(jnp.int32)),
      pad(ck), pad(cl), pad(cm1), pad(cm2),
      key, sk, sl, sm1, sm2)
    (key2, sk2, sl2, sm12, sm22, ovf, npush,
     p_slot, p_key, p_k, p_l, p_m1, p_m2) = out
    return (key2, sk2, sl2, sm12, sm22, ovf[:, 0] > 0, npush[:, 0],
            p_slot[:, 0], p_key[:, 0], p_k[:, 0], p_l[:, 0], p_m1[:, 0],
            p_m2[:, 0])


def stack_update_xla(slot0, act, cv, ofs, kv, ck, cl, cm1, cm2,
                     key, sk, sl, sm1, sm2, acap: int):
    """Pure-XLA reference of stack_update (used on CPU + for testing)."""
    B = slot0.shape[0]
    li = jnp.arange(acap, dtype=jnp.int32)[None, :]
    key = jnp.where((li == slot0[:, None]) & act[:, None], INT32_MAX, key)
    free = (key == INT32_MAX)
    rank = jnp.cumsum(free.astype(jnp.int32), axis=1)
    total_free = rank[:, -1:]
    cvb = cv
    fits = ofs < total_free
    ovf = (cvb & ~fits).any(axis=1)
    npush = (cvb & fits).sum(axis=1)
    for j in range(10):
        m = (free & (rank - 1 == ofs[:, j:j + 1]) & cvb[:, j:j + 1]
             & fits[:, j:j + 1])
        key = jnp.where(m, kv[:, j:j + 1], key)
        sk = jnp.where(m, ck[:, j:j + 1], sk)
        sl = jnp.where(m, cl[:, j:j + 1], sl)
        sm1 = jnp.where(m, cm1[:, j:j + 1], sm1)
        sm2 = jnp.where(m, cm2[:, j:j + 1], sm2)
    rows = jnp.arange(B)
    pslot = jnp.argmin(key, axis=1).astype(jnp.int32)
    return (key, sk, sl, sm1, sm2, ovf, npush,
            pslot, key[rows, pslot], sk[rows, pslot], sl[rows, pslot],
            sm1[rows, pslot], sm2[rows, pslot])
