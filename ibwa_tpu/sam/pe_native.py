"""ctypes glue for the native sampe per-read stage (pe_stage.cpp).

The Python sampe module (sam/sampe.py) remains the orchestrator and the
semantic reference; this wrapper swaps its per-read inner loops — SE
selection, PE candidate expansion, pairing sweep and XA selection — for
the compiled implementations, mirroring how the reference runs them as
threaded C (bwape.c:238-297).  Set IBWA_PURE_PY=1 to force the Python
path (used to cross-check parity).
"""

from __future__ import annotations

import ctypes

import numpy as np

from .. import native
from .bwase import Multi, TYPE_REPEAT, TYPE_UNIQUE
from .remap import RemapRecord

_RM_CODE = {"M": 0, "X": 1, "=": 2, "N": 3, "D": 4, "I": 5}

_sigs_done = False


def _lib():
    global _sigs_done
    lib = native.load()
    if _sigs_done:
        return lib
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ibwa_pe_new.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.ibwa_pe_new.restype = ctypes.c_void_p
    lib.ibwa_pe_free.argtypes = [ctypes.c_void_p]
    lib.ibwa_pe_add_db.argtypes = [
        ctypes.c_void_p, u32p, ctypes.c_uint32, u32p, ctypes.c_uint32,
        u32p, ctypes.c_uint32, ctypes.c_uint32, u32p, u32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, i64p, i32p,
        ctypes.c_int32, ctypes.c_int32, i32p, u8p, i64p, i64p,
        i64p, i32p, u8p, i32p]
    lib.ibwa_pe_set_sai.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, i32p, u32p,
        ctypes.c_int64]
    lib.ibwa_pe_se_stage.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, i32p, i32p, i32p, u64p, i64p, i32p]
    lib.ibwa_pe_pe_stage.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, i32p, i32p, i32p,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        u64p, i64p, i32p, ctypes.c_int32, i32p, i64p, i32p]
    lib.ibwa_pe_pe_stage.restype = ctypes.c_int64
    lib.ibwa_sai_scan.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                  i32p, u32p]
    lib.ibwa_sai_scan.restype = ctypes.c_int64
    lib.ibwa_se_stage.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, u64p, i64p, i32p,
        ctypes.c_int32, i32p, i64p, i32p]
    _sigs_done = True
    return lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


# i64 per-end-read fields (pe_stage.cpp enum): pos, rpos, sa, c1, c2
NF64 = 5
# i32 fields: type, strand, nmm, ngapo, ngape, score, mapQ, seQ, dbidx,
#             rseqid, rident, extra_flag
NF32 = 12


class PeNative:
    """One sampe run's native context: db tables + per-batch sai groups."""

    def __init__(self, dbs, popt, gopt):
        self._lib = _lib()
        self._keep = []  # keep every passed array alive
        self._ctx = self._lib.ibwa_pe_new(int(popt.remapping),
                                          int(gopt.s_mm))
        self._dbs = dbs
        for db in dbs.dbs:
            self._add_db(db)

    def _add_db(self, db) -> None:
        fmf = db.load_fm(0)
        fmr = db.load_fm(1)
        keep = self._keep
        itl_f = np.ascontiguousarray(fmf._interleaved, dtype=np.uint32)
        itl_r = np.ascontiguousarray(fmr._interleaved, dtype=np.uint32)
        l2 = np.ascontiguousarray(fmf.L2, dtype=np.uint32)
        sa_f = np.ascontiguousarray(fmf.sa, dtype=np.uint32)
        sa_r = np.ascontiguousarray(fmr.sa, dtype=np.uint32)
        ann_off = np.array([a.offset for a in db.bns.anns], dtype=np.int64)
        ann_len = np.array([a.length for a in db.bns.anns], dtype=np.int32)
        keep += [itl_f, itl_r, l2, sa_f, sa_r, ann_off, ann_len]

        has_remap = db.remap is not None
        if has_remap:
            n_rm = max(db.remap.keys()) + 1 if db.remap else 0
            rm_target = np.full(n_rm, -1, dtype=np.int32)
            rm_exact = np.zeros(n_rm, dtype=np.uint8)
            rm_start = np.zeros(n_rm, dtype=np.int64)
            rm_stop = np.zeros(n_rm, dtype=np.int64)
            rm_begin = np.zeros(n_rm, dtype=np.int64)
            rm_cnt = np.zeros(n_rm, dtype=np.int32)
            ops_all: list[int] = []
            lens_all: list[int] = []
            target_bns = self._dbs.dbs[0].bns
            name_idx = {a.name: i for i, a in enumerate(target_bns.anns)}
            for seqid in range(n_rm):
                m: RemapRecord | None = db.remap.get(seqid)
                if m is None:
                    continue  # missing id -> C++ fatal if ever touched
                ti = name_idx.get(m.target, -1)
                rm_target[seqid] = ti
                rm_exact[seqid] = 1 if m.exact else 0
                rm_start[seqid] = m.start
                rm_stop[seqid] = m.stop
                rm_begin[seqid] = len(ops_all)
                runs = m.cigar or []
                rm_cnt[seqid] = len(runs)
                for ln, op in runs:
                    ops_all.append(_RM_CODE.get(op, 6))
                    lens_all.append(ln)
            rm_ops = np.array(ops_all, dtype=np.uint8)
            rm_lens = np.array(lens_all, dtype=np.int32)
        else:
            n_rm = 0
            rm_target = np.zeros(0, dtype=np.int32)
            rm_exact = np.zeros(0, dtype=np.uint8)
            rm_start = np.zeros(0, dtype=np.int64)
            rm_stop = np.zeros(0, dtype=np.int64)
            rm_begin = np.zeros(0, dtype=np.int64)
            rm_cnt = np.zeros(0, dtype=np.int32)
            rm_ops = np.zeros(0, dtype=np.uint8)
            rm_lens = np.zeros(0, dtype=np.int32)
        keep += [rm_target, rm_exact, rm_start, rm_stop, rm_begin, rm_cnt,
                 rm_ops, rm_lens]

        u32 = ctypes.c_uint32
        self._lib.ibwa_pe_add_db(
            self._ctx, _ptr(itl_f, u32), fmf.primary, _ptr(itl_r, u32),
            fmr.primary, _ptr(l2, u32), fmf.seq_len, fmf.sa_intv,
            _ptr(sa_f, u32), _ptr(sa_r, u32),
            db.offset, db.bns.l_pac, len(db.bns.anns),
            _ptr(ann_off, ctypes.c_int64), _ptr(ann_len, ctypes.c_int32),
            1 if has_remap else 0, n_rm,
            _ptr(rm_target, ctypes.c_int32), _ptr(rm_exact, ctypes.c_uint8),
            _ptr(rm_start, ctypes.c_int64), _ptr(rm_stop, ctypes.c_int64),
            _ptr(rm_begin, ctypes.c_int64), _ptr(rm_cnt, ctypes.c_int32),
            _ptr(rm_ops, ctypes.c_uint8), _ptr(rm_lens, ctypes.c_int32))

    def set_sai_batch(self, end: int, dbidx: int, counts: np.ndarray,
                      recs: np.ndarray, n_reads: int) -> None:
        counts = np.ascontiguousarray(counts, dtype=np.int32)
        recs = np.ascontiguousarray(recs, dtype=np.uint32)
        # replace previous batch's keepalive for this slot
        self._batch_keep = getattr(self, "_batch_keep", {})
        self._batch_keep[(end, dbidx)] = (counts, recs)
        self._lib.ibwa_pe_set_sai(self._ctx, end, dbidx,
                                  _ptr(counts, ctypes.c_int32),
                                  _ptr(recs, ctypes.c_uint32), n_reads)

    def se_stage(self, seqs, max_diffs: np.ndarray, rng) -> None:
        """Run the serial SE selection for the batch; updates `seqs`
        (tuple of two AlnSeq lists) and the Rand48 state in place."""
        n = len(seqs[0])
        lens, fulls, i64, i32 = _pack_state(seqs)
        md = np.ascontiguousarray(max_diffs, dtype=np.int32)
        st = np.array([rng.x], dtype=np.uint64)
        self._lib.ibwa_pe_se_stage(
            self._ctx, n, _ptr(lens, ctypes.c_int32),
            _ptr(fulls, ctypes.c_int32), _ptr(md, ctypes.c_int32),
            _ptr(st, ctypes.c_uint64), _ptr(i64, ctypes.c_int64),
            _ptr(i32, ctypes.c_int32))
        rng.x = int(st[0])
        _unpack_state(seqs, i64, i32)

    def pe_stage(self, seqs, max_diffs: np.ndarray, ii, popt, rng) -> int:
        n = len(seqs[0])
        lens, fulls, i64, i32 = _pack_state(seqs)
        md = np.ascontiguousarray(max_diffs, dtype=np.int32)
        st = np.array([rng.x], dtype=np.uint64)
        cap = max(popt.n_multi, popt.N_multi, 1)
        mc = np.zeros(2 * n, dtype=np.int32)
        mpos = np.zeros(2 * n * cap, dtype=np.int64)
        mmeta = np.zeros(2 * n * cap * 4, dtype=np.int32)
        cnt_chg = self._lib.ibwa_pe_pe_stage(
            self._ctx, n, _ptr(lens, ctypes.c_int32),
            _ptr(fulls, ctypes.c_int32), _ptr(md, ctypes.c_int32),
            float(ii.avg), float(ii.std), int(ii.low), int(ii.high),
            int(ii.high_bayesian), int(popt.max_isize),
            int(popt.n_multi), int(popt.N_multi),
            _ptr(st, ctypes.c_uint64), _ptr(i64, ctypes.c_int64),
            _ptr(i32, ctypes.c_int32), cap, _ptr(mc, ctypes.c_int32),
            _ptr(mpos, ctypes.c_int64), _ptr(mmeta, ctypes.c_int32))
        rng.x = int(st[0])
        _unpack_state(seqs, i64, i32)
        for i in range(n):
            for j in range(2):
                e = 2 * i + j
                s = seqs[j][i]
                s.multi = []
                for t in range(int(mc[e])):
                    b = (e * cap + t)
                    s.multi.append(Multi(
                        pos=int(mpos[b]), gap=int(mmeta[b * 4 + 0]),
                        mm=int(mmeta[b * 4 + 1]),
                        strand=int(mmeta[b * 4 + 2]),
                        dbidx=int(mmeta[b * 4 + 3])))
        return int(cnt_chg)

    def se_select(self, seqs, n_occ: int, rng) -> None:
        """samse selection (bwa_aln2seq_core) for a batch whose groups
        were registered via set_sai_batch(0, 0, ...).  Sets exactly the
        fields the Python aln2seq_core sets; positions stay SA indexes
        (cal_pac_pos resolves them, including multi hits)."""
        n = len(seqs)
        i64 = np.zeros(n * NF64, dtype=np.int64)
        i32 = np.zeros(n * NF32, dtype=np.int32)
        st = np.array([rng.x], dtype=np.uint64)
        cap = max(n_occ, 1)
        mc = np.zeros(n, dtype=np.int32)
        mpos = np.zeros(n * cap, dtype=np.int64)
        mmeta = np.zeros(n * cap * 4, dtype=np.int32)
        self._lib.ibwa_se_stage(
            self._ctx, n, n_occ, _ptr(st, ctypes.c_uint64),
            _ptr(i64, ctypes.c_int64), _ptr(i32, ctypes.c_int32), cap,
            _ptr(mc, ctypes.c_int32), _ptr(mpos, ctypes.c_int64),
            _ptr(mmeta, ctypes.c_int32))
        rng.x = int(st[0])
        v64 = i64.tolist()
        v32 = i32.tolist()
        mcl = mc.tolist()
        for i, s in enumerate(seqs):
            o = i * NF64
            s.sa, s.c1, s.c2 = v64[o + 2], v64[o + 3], v64[o + 4]
            o = i * NF32
            s.type = v32[o + 0]
            s.strand = v32[o + 1]
            s.n_mm = v32[o + 2]
            s.n_gapo = v32[o + 3]
            s.n_gape = v32[o + 4]
            s.score = v32[o + 5]
            s.multi = [Multi(pos=int(mpos[i * cap + t]),
                             gap=int(mmeta[(i * cap + t) * 4 + 0]),
                             mm=int(mmeta[(i * cap + t) * 4 + 1]),
                             strand=int(mmeta[(i * cap + t) * 4 + 2]))
                       for t in range(mcl[i])]

    def __del__(self):
        try:
            self._lib.ibwa_pe_free(self._ctx)
        except Exception:
            pass


def _pack_state(seqs):
    """AlnSeq fields -> flat arrays; built via Python lists (a numpy
    scalar store per field costs ~10x a list append at 600k reads)."""
    n = len(seqs[0])
    lens_l, fulls_l, i64_l, i32_l = [], [], [], []
    for i in range(n):
        for j in range(2):
            s = seqs[j][i]
            lens_l.append(s.len)
            fulls_l.append(s.read.full_len)
            i64_l += (s.pos, s.remapped_pos, s.sa, s.c1, s.c2)
            i32_l += (s.type, s.strand, s.n_mm, s.n_gapo, s.n_gape,
                      s.score, s.mapQ, s.seQ, s.dbidx, s.remapped_seqid,
                      s.remap_identical, s.extra_flag)
    return (np.array(lens_l, dtype=np.int32),
            np.array(fulls_l, dtype=np.int32),
            np.array(i64_l, dtype=np.int64),
            np.array(i32_l, dtype=np.int32))


def _unpack_state(seqs, i64, i32):
    n = len(seqs[0])
    v64 = i64.tolist()
    v32 = i32.tolist()
    for i in range(n):
        for j in range(2):
            e = 2 * i + j
            s = seqs[j][i]
            o = e * NF64
            (s.pos, s.remapped_pos, s.sa, s.c1, s.c2) = v64[o:o + NF64]
            o = e * NF32
            (s.type, s.strand, s.n_mm, s.n_gapo, s.n_gape, s.score,
             s.mapQ, s.seQ, s.dbidx, s.remapped_seqid, s.remap_identical,
             s.extra_flag) = v32[o:o + NF32]
            if s.type == 0:  # unmapped: clear cigar like unmap_read
                s.cigar = None


def scan_sai_batch(blob: bytes, n_reads: int
                   ) -> tuple[np.ndarray, np.ndarray, int]:
    """Parse n_reads .sai records from blob via the native scanner.

    Returns (counts[n], recs[tot,4] u32, bytes_consumed)."""
    lib = _lib()
    buf = np.frombuffer(blob, dtype=np.uint8)
    counts = np.zeros(n_reads, dtype=np.int32)
    cap = max(len(blob) // 16 + 1, 1)
    recs = np.empty((cap, 4), dtype=np.uint32)
    used = lib.ibwa_sai_scan(_ptr(buf, ctypes.c_uint8), len(blob), n_reads,
                             _ptr(counts, ctypes.c_int32),
                             _ptr(recs, ctypes.c_uint32))
    if used < 0:
        raise ValueError("truncated .sai stream")
    tot = int(counts.sum())
    return counts, recs[:tot].copy(), int(used)
