// Native BWA-SW core: the DP over (prefix-DAG of the read's BWT) x
// (prefix-trie of the genome FM-index) with the Z-best beam heuristic.
//
// Port of ibwa_tpu/bwasw/core.py (itself the byte-parity port of the
// reference's bwtsw2_core.c:429-594) — the reference runs this as
// threaded C; the Python version is kept as the test oracle.  The driver
// (chaining, extensions, CIGAR, SAM) stays in ibwa_tpu/bwasw/aux.py.
//
// Reference parity anchors:
//   bsw2_connectivity        bwtsw2_core.c:87-120
//   fill_cell                bwtsw2_core.c:401-413
//   cut_tail                 bwtsw2_core.c:122-145
//   remove_duplicate         bwtsw2_core.c:147-172
//   merge/pending machinery  bwtsw2_core.c:174-193, 546-580
//   save_hits/narrow_hits    bwtsw2_core.c:211-258
//   bsw2_resolve_duphits     bwtsw2_core.c:261-327
//   bwt_lite construction    bwt_lite.c:9-54

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t MINUS_INF = -0x3FFFFFFF;
constexpr double MASK_LEVEL = 0.90;

// ---------------------------------------------------------------------------
// genome FM-index occ4 + SA walk (interleaved layout; see core.cpp)
// ---------------------------------------------------------------------------

struct Itl {
  const uint32_t* data;
  uint32_t primary;
  uint32_t l2[5];
  uint32_t seq_len;
  uint32_t sa_intv;
  const uint32_t* sampled_sa;
};

static uint32_t cnt_prefix(uint32_t word, int c, int nbases) {
  uint32_t t = word ^ (0x55555555u * (uint32_t)c);
  t = ~t;
  t &= t >> 1;
  t &= 0x55555555u;
  if (nbases < 16) t &= ~((1u << ((16 - nbases) * 2)) - 1u);
  return (uint32_t)__builtin_popcount(t);
}

static void fm_occ4(const Itl& b, uint32_t k, int64_t out[4]) {
  if (k == 0xFFFFFFFFu) {
    out[0] = out[1] = out[2] = out[3] = 0;
    return;
  }
  if (k == b.seq_len) {
    for (int c = 0; c < 4; ++c) out[c] = b.l2[c + 1] - b.l2[c];
    return;
  }
  if (k >= b.primary) --k;
  const uint32_t* blk = b.data + (k / 128) * 12;
  const uint32_t* w = blk + 4;
  uint32_t base0 = (k / 128) * 128;
  uint32_t full_words = (k - base0) / 16;
  for (int c = 0; c < 4; ++c) {
    uint32_t n = blk[c];
    for (uint32_t j = 0; j < full_words; ++j) n += cnt_prefix(w[j], c, 16);
    n += cnt_prefix(w[full_words], c, (int)(k % 16) + 1);
    out[c] = n;
  }
}

// paired occ4 at (k, l) sharing the block scan when both land in one
// 128-base block (the reference's bwt_2occ4 trick, bwt.c:177-214);
// results are exactly fm_occ4(k) and fm_occ4(l)
static void fm_2occ4(const Itl& b, uint32_t k, uint32_t l, int64_t ck[4],
                     int64_t cl[4]) {
  uint32_t k2 = k, l2 = l;
  if (k2 != 0xFFFFFFFFu && k2 != b.seq_len && k2 >= b.primary) --k2;
  if (l2 != 0xFFFFFFFFu && l2 != b.seq_len && l2 >= b.primary) --l2;
  if (k == 0xFFFFFFFFu || k == b.seq_len || l == 0xFFFFFFFFu ||
      l == b.seq_len || (k2 / 128) != (l2 / 128)) {
    fm_occ4(b, k, ck);
    fm_occ4(b, l, cl);
    return;
  }
  const uint32_t* blk = b.data + (k2 / 128) * 12;
  const uint32_t* w = blk + 4;
  uint32_t base0 = (k2 / 128) * 128;
  uint32_t fw_k = (k2 - base0) / 16, fw_l = (l2 - base0) / 16;
  for (int c = 0; c < 4; ++c) {
    uint32_t n = blk[c];
    uint32_t j = 0;
    for (; j < fw_k; ++j) n += cnt_prefix(w[j], c, 16);
    uint32_t nk = n + cnt_prefix(w[fw_k], c, (int)(k2 % 16) + 1);
    for (; j < fw_l; ++j) n += cnt_prefix(w[j], c, 16);
    ck[c] = nk;
    cl[c] = n + cnt_prefix(w[fw_l], c, (int)(l2 % 16) + 1);
  }
}

static uint32_t fm_occ1(const Itl& b, uint32_t k, int c) {
  if (k == 0xFFFFFFFFu) return 0;
  if (k == b.seq_len) return b.l2[c + 1] - b.l2[c];
  if (k >= b.primary) --k;
  const uint32_t* blk = b.data + (k / 128) * 12;
  const uint32_t* w = blk + 4;
  uint32_t base0 = (k / 128) * 128;
  uint32_t full_words = (k - base0) / 16;
  uint32_t n = blk[c];
  for (uint32_t j = 0; j < full_words; ++j) n += cnt_prefix(w[j], c, 16);
  n += cnt_prefix(w[full_words], c, (int)(k % 16) + 1);
  return n;
}

static inline int fm_code_at(const Itl& b, uint32_t k) {
  const uint32_t* blk = b.data + (k / 128) * 12 + 4;
  uint32_t word = blk[(k % 128) / 16];
  return (int)((word >> (((~k) & 0xF) << 1)) & 3u);
}

static uint32_t fm_inv_psi(const Itl& b, uint32_t k) {
  if (k == b.primary) return 0;
  int c = (k < b.primary) ? fm_code_at(b, k) : fm_code_at(b, k - 1);
  return b.l2[c] + fm_occ1(b, k, c);
}

static uint32_t fm_sa(const Itl& b, uint32_t k) {
  uint32_t add = 0;
  while (k % b.sa_intv != 0) {
    ++add;
    k = fm_inv_psi(b, k);
  }
  return add + b.sampled_sa[k / b.sa_intv];
}

// ---------------------------------------------------------------------------
// bwt_lite of the read (bwt_lite.c:9-54; mirror of bwasw/bwtl.py)
// ---------------------------------------------------------------------------

extern "C" int32_t ibwa_sais(const uint8_t*, int32_t*, int32_t, int32_t);

struct Bwtl {
  int32_t seq_len;
  int32_t primary;
  std::vector<int32_t> sa;        // [n+1], sa[0] = n
  std::vector<uint8_t> bwt;       // sentinel-removed, length n
  std::vector<int32_t> cum[4];    // cum[c][i] = #{j < i : bwt[j]==c}
  int64_t L2[5];

  void build(const uint8_t* seq, int32_t n) {
    seq_len = n;
    sa.assign(n + 1, 0);
    sa[0] = n;
    if (n) ibwa_sais(seq, sa.data() + 1, n, 4);
    bwt.clear();
    bwt.reserve(n);
    primary = 0;
    for (int32_t i = 0; i <= n; ++i) {
      if (sa[i] == 0) {
        primary = i;
      } else {
        bwt.push_back(seq[sa[i] - 1]);
      }
    }
    for (int c = 0; c < 4; ++c) {
      cum[c].assign(n + 1, 0);
      for (int32_t i = 0; i < n; ++i)
        cum[c][i + 1] = cum[c][i] + (bwt[i] == c ? 1 : 0);
    }
    L2[0] = 0;
    for (int c = 0; c < 4; ++c) L2[c + 1] = L2[c] + cum[c][n];
  }

  void occ4(int64_t k, int64_t out[4]) const {
    // bwtl_occ4 (bwt_lite.c:69-83); mirror of bwtl.py::occ4
    if (k == -1 || k == (int64_t)0xFFFFFFFFLL) {
      out[0] = out[1] = out[2] = out[3] = 0;
      return;
    }
    if (k >= primary) --k;
    int64_t idx = (k < seq_len - 1 ? k : seq_len - 1) + 1;
    for (int c = 0; c < 4; ++c) out[c] = cum[c][idx];
  }
};

// ---------------------------------------------------------------------------
// cells / entries (bsw2cell_t, bsw2entry_t)
// ---------------------------------------------------------------------------

struct Cell {
  // 32-bit fields as in the reference's bsw2cell_t: half the struct size
  // halves the cell-array memory traffic of the hot fill loop
  uint32_t qk = 0, ql = 0;
  int32_t I = MINUS_INF, D = MINUS_INF, G = MINUS_INF;
  int32_t pj = 0;
  int32_t qlen = 0, tlen = 0;
  int32_t ppos = -1, upos = -1;
  int32_t cpos[4] = {-1, -1, -1, -1};
};

struct Entry {
  int64_t tk = 0, tl = 0;
  std::vector<Cell> cells;
};

struct Hit {
  int64_t k = 0, l = 0;
  int32_t flag = 0, n_seeds = 0;
  int32_t len = 0;
  int64_t G = 0, G2 = 0;
  int32_t beg = 0, end = 0;
};

static void heapadjust(int i, int n, int64_t* h) {
  int64_t tmp = h[i];
  int k = (i << 1) + 1;
  while (k < n) {
    if (k != n - 1 && h[k] < h[k + 1]) ++k;
    if (h[k] < tmp) break;
    h[i] = h[k];
    i = k;
    k = (i << 1) + 1;
  }
  h[i] = tmp;
}

// cut_tail (bwtsw2_core.c:122-145)
static void cut_tail(Entry& u, int T) {
  if ((int)u.cells.size() <= T) return;
  std::vector<int64_t> a;
  for (const Cell& c : u.cells)
    if (c.ql && c.G > 0) a.push_back(-c.G);
  if ((int)a.size() <= T) return;
  std::sort(a.begin(), a.end());
  int64_t x = -a[T];
  int n = 0;
  for (Cell& p : u.cells) {
    if (p.G == x) ++n;
    if (p.G < x || (p.G == x && n >= T)) {
      p.qk = p.ql = 0;
      p.G = 0;
      if (p.ppos >= 0) u.cells[p.ppos].cpos[p.pj] = -1;
    }
  }
}

// remove_duplicate (bwtsw2_core.c:147-172)
static void remove_duplicate(Entry& u) {
  std::unordered_map<uint64_t, std::pair<int, int64_t>> seen;  // -> idx, G
  for (int i = 0; i < (int)u.cells.size(); ++i) {
    Cell& p = u.cells[i];
    if (p.ql == 0) continue;
    uint64_t key = ((uint64_t)p.qk << 32) | (uint64_t)p.ql;
    int j = -1;
    auto it = seen.find(key);
    if (it != seen.end()) {
      if (it->second.second >= p.G) {
        j = i;
      } else {
        j = it->second.first;
        it->second = {i, p.G};
      }
    } else {
      seen.emplace(key, std::make_pair(i, p.G));
    }
    if (j >= 0) {
      Cell& p2 = u.cells[j];
      p2.qk = p2.ql = 0;
      p2.G = 0;
      if (p2.ppos >= 0) u.cells[p2.ppos].cpos[p2.pj] = -3;
    }
  }
}

// merge_entry (bwtsw2_core.c:174-193)
static void merge_entry(Entry& u, Entry& v) {
  int off = (int)u.cells.size();
  for (Cell& p : v.cells) {
    if (p.ppos >= 0) p.ppos += off;
    for (int t = 0; t < 4; ++t)
      if (p.cpos[t] >= 0) p.cpos[t] += off;
  }
  u.cells.insert(u.cells.end(), v.cells.begin(), v.cells.end());
  v.cells.clear();
}

// save_hits (bwtsw2_core.c:211-233): 2 slots per read position
static void save_hits(const Bwtl& bwt, int64_t thres, std::vector<Hit>& hits,
                      const Entry& u) {
  for (const Cell& p : u.cells) {
    if (p.G < thres) continue;
    for (int64_t k = u.tk; k <= u.tl; ++k) {
      int32_t beg = bwt.sa[k];
      int32_t end = beg + p.tlen;
      Hit* q = nullptr;
      if (p.G > hits[beg * 2].G) {
        hits[beg * 2 + 1] = hits[beg * 2];
        q = &hits[beg * 2];
      } else if (p.G > hits[beg * 2 + 1].G) {
        q = &hits[beg * 2 + 1];
      }
      if (q) {
        q->k = p.qk;
        q->l = p.ql;
        q->len = p.qlen;
        q->G = p.G;
        q->beg = beg;
        q->end = end;
        q->G2 = (q->k == q->l) ? 0 : q->G;
        q->flag = q->n_seeds = 0;
      }
    }
  }
}

// save_narrow_hits (bwtsw2_core.c:236-258)
static void save_narrow_hits(const Bwtl& bwtl, Entry& u,
                             std::vector<Hit>& b1, int64_t t, int64_t IS) {
  for (Cell& p : u.cells) {
    if (p.G >= t && (int64_t)p.ql - p.qk + 1 <= IS) {
      Hit h;
      h.k = p.qk;
      h.l = p.ql;
      h.len = p.qlen;
      h.G = p.G;
      h.G2 = 0;
      h.beg = bwtl.sa[u.tk];
      h.end = h.beg + p.tlen;
      h.flag = 0;
      b1.push_back(h);
      p.qk = p.ql = 0;
      p.G = 0;
      if (p.ppos >= 0) u.cells[p.ppos].cpos[p.pj] = -3;
    }
  }
}

// bsw2_resolve_duphits (bwtsw2_core.c:261-327); fm == nullptr skips the
// SA expansion (mirror of core.py::resolve_duphits)
static void resolve_duphits(const Itl* fm, std::vector<Hit>& hits,
                            int64_t IS) {
  if (hits.empty()) return;
  if (fm) {
    std::vector<Hit> nh;
    for (const Hit& p : hits) {
      if (p.l - p.k + 1 <= IS) {
        for (int64_t k = p.k; k <= p.l; ++k) {
          Hit q = p;
          q.k = fm_sa(*fm, (uint32_t)k);
          q.l = 0;
          nh.push_back(q);
        }
      } else if (p.G > 0) {
        Hit q = p;
        q.k = fm_sa(*fm, (uint32_t)p.k);
        q.l = 0;
        q.flag |= 1;
        nh.push_back(q);
      }
    }
    hits.swap(nh);
  }
  std::stable_sort(hits.begin(), hits.end(),
                   [](const Hit& a, const Hit& b) { return a.G > b.G; });
  int n = (int)hits.size();
  int cut = n;
  bool broke = false;
  for (int i = 1; i < n; ++i) {
    Hit& p = hits[i];
    if (p.G == 0) {
      cut = i;
      broke = true;
      break;
    }
    for (int j = 0; j < i; ++j) {
      const Hit& q = hits[j];
      bool compatible = true;
      if (q.G == 0) continue;
      if (p.l == 0 && q.l == 0) {
        int64_t qol = std::min<int64_t>(p.end, q.end) -
                      std::max<int64_t>(p.beg, q.beg);
        if (qol < 0) qol = 0;
        if ((double)qol / (p.end - p.beg) > MASK_LEVEL ||
            (double)qol / (q.end - q.beg) > MASK_LEVEL) {
          int64_t tol = std::min(p.k + p.len, q.k + q.len) -
                        std::max(p.k, q.k);
          if ((double)tol / p.len > MASK_LEVEL ||
              (double)tol / q.len > MASK_LEVEL)
            compatible = false;
        }
      }
      if (!compatible) {
        p.G = 0;
        break;
      }
    }
  }
  if (!broke) cut = n;
  std::vector<Hit> out;
  for (int i = 0; i < cut; ++i)
    if (hits[i].G != 0) out.push_back(hits[i]);
  hits.swap(out);
}

// ---------------------------------------------------------------------------
// bsw2_core (bwtsw2_core.c:429-594; mirror of core.py::bsw2_core)
// ---------------------------------------------------------------------------

struct Opt {
  int64_t a, b, q, r, t, bw, z, IS;
  int64_t qr() const { return q + r; }
};

// entry pool (mirrors the reference's mempool, bwtsw2_core.c:58-84):
// recycled entries keep their cells vector CAPACITY, so the steady state
// runs allocation-free
struct EntryPool {
  std::vector<Entry*> free_, all_;
  Entry* alloc() {
    if (free_.empty()) {
      Entry* e = new Entry();
      all_.push_back(e);
      return e;
    }
    Entry* e = free_.back();
    free_.pop_back();
    e->cells.clear();
    return e;
  }
  void put(Entry* e) { free_.push_back(e); }
  ~EntryPool() {
    for (Entry* e : all_) delete e;
  }
};

static void bsw2_core(const Opt& opt, const Bwtl& target, const Itl& query,
                      std::vector<Hit>& b, std::vector<Hit>& b1,
                      EntryPool& pool) {
  // connectivity prepass (bwtsw2_core.c:87-120)
  std::unordered_map<uint64_t, uint64_t> chash;
  {
    std::vector<std::pair<int64_t, int64_t>> stack;
    stack.push_back({0, target.seq_len});
    while (!stack.empty()) {
      auto [k0, l0] = stack.back();
      stack.pop_back();
      int64_t cntk[4], cntl[4];
      target.occ4(k0 - 1, cntk);
      target.occ4(l0, cntl);
      for (int j = 0; j < 4; ++j) {
        int64_t k = target.L2[j] + cntk[j] + 1;
        int64_t l = target.L2[j] + cntl[j];
        if (k > l) continue;
        uint64_t key = ((uint64_t)k << 32) | (uint64_t)l;
        auto it = chash.find(key);
        if (it == chash.end()) {
          chash.emplace(key, 1);
          stack.push_back({k, l});
        } else {
          it->second += 1;
        }
      }
    }
  }

  int32_t score_mat[4][4];
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j)
      score_mat[i][j] = (i == j) ? opt.a : -opt.b;
  int heap_size = (int)opt.z;
  std::vector<int64_t> heap(heap_size);

  b.assign((size_t)target.seq_len * 2, Hit());
  b1.clear();
  std::vector<Entry*> pending;
  std::vector<Entry*> stack0;

  Entry* root = pool.alloc();
  root->tk = 0;
  root->tl = target.seq_len;
  {
    Cell x0;
    x0.G = 0;
    x0.qk = 0;
    x0.ql = query.seq_len;
    root->cells.push_back(x0);
  }
  stack0.push_back(root);
  int64_t n_pending = 0;

  while (!stack0.empty() || n_pending) {
    Entry* v = stack0.back();
    stack0.pop_back();
    int old_n = (int)v->cells.size();

    for (Cell& p : v->cells) {  // band-width test
      if (p.ql == 0) continue;
      if (p.tlen - p.qlen > opt.bw || p.qlen - p.tlen > opt.bw) {
        p.qk = p.ql = 0;
        if (p.ppos >= 0) v->cells[p.ppos].cpos[p.pj] = -5;
      }
    }

    int64_t tcntk[4], tcntl[4];
    target.occ4(v->tk - 1, tcntk);
    target.occ4(v->tl, tcntl);
    for (int tj = 0; tj < 4; ++tj) {
      int64_t k = target.L2[tj] + tcntk[tj] + 1;
      int64_t l = target.L2[tj] + tcntl[tj];
      if (k > l) continue;
      uint64_t key = ((uint64_t)k << 32) | (uint64_t)l;
      uint64_t& slot = chash[key];
      slot -= 1;
      uint32_t cnt = (uint32_t)(slot & 0xFFFFFFFFu);
      Entry* u = pool.alloc();
      u->tk = k;
      u->tl = l;
      std::fill(heap.begin(), heap.end(), 0);
      const int32_t* csm = score_mat[tj];

      for (int i = 0; i < (int)v->cells.size(); ++i) {
        // NOTE: v->cells may grow during this loop; index, don't iterate
        bool is_added = false;
        if (v->cells[i].ql == 0) continue;
        Cell x;
        x.G = MINUS_INF;
        v->cells[i].upos = x.upos = -1;
        if (v->cells[i].ppos >= 0) {  // parent has been visited
          Cell& par = v->cells[v->cells[i].ppos];
          Cell* c1 = (par.upos >= 0) ? &u->cells[par.upos] : nullptr;
          // fill_cell (bwtsw2_core.c:401-413)
          int64_t G = par.G + csm[v->cells[i].pj];
          if (c1) {
            x.I = (c1->I > c1->G - opt.q) ? c1->I - opt.r
                                          : c1->G - opt.qr();
            if (x.I > G) G = x.I;
          } else {
            x.I = MINUS_INF;
          }
          Cell& p = v->cells[i];
          x.D = (p.D > p.G - opt.q) ? p.D - opt.r : p.G - opt.qr();
          if (x.D > G) G = x.D;
          x.G = G;
          if (G > 0) {
            x.ppos = par.upos;
            p.upos = (int)u->cells.size();
            u->cells.push_back(x);
            if (x.ppos >= 0)
              u->cells[x.ppos].cpos[p.pj] = p.upos;
            is_added = true;
          }
        } else {
          Cell& p = v->cells[i];
          x.D = (p.D > p.G - opt.q) ? p.D - opt.r : p.G - opt.qr();
          if (x.D > 0) {
            x.G = x.D;
            x.I = MINUS_INF;
            x.ppos = -1;
            p.upos = (int)u->cells.size();
            u->cells.push_back(x);
            is_added = true;
          }
        }
        if (is_added) {
          Cell& p = v->cells[i];
          Cell& xs = u->cells[p.upos];
          xs.cpos[0] = xs.cpos[1] = xs.cpos[2] = xs.cpos[3] = -1;
          xs.pj = p.pj;
          xs.qk = p.qk;
          xs.ql = p.ql;
          xs.qlen = p.qlen;
          xs.tlen = p.tlen + 1;
          if (xs.G > -heap[0]) {
            heap[0] = -xs.G;
            heapadjust(0, heap_size, heap.data());
          }
        }
        int64_t xG = is_added ? u->cells[v->cells[i].upos].G : x.G;
        if ((xG > opt.qr() && xG >= -heap[0]) || i < old_n) {
          Cell& p = v->cells[i];
          if (p.cpos[0] == -1 || p.cpos[1] == -1 || p.cpos[2] == -1 ||
              p.cpos[3] == -1) {
            int64_t qcntk[4], qcntl[4];
            fm_2occ4(query, (uint32_t)(p.qk - 1), (uint32_t)p.ql,
                     qcntk, qcntl);
            for (int qj = 0; qj < 4; ++qj) {
              if (v->cells[i].cpos[qj] != -1) continue;
              int64_t k2 = (int64_t)query.l2[qj] + qcntk[qj] + 1;
              int64_t l2 = (int64_t)query.l2[qj] + qcntl[qj];
              if (k2 > l2) {
                v->cells[i].cpos[qj] = -2;
                continue;
              }
              Cell y;
              y.qk = k2;
              y.ql = l2;
              y.pj = qj;
              y.qlen = v->cells[i].qlen + 1;
              y.ppos = i;
              y.tlen = v->cells[i].tlen;
              v->cells[i].cpos[qj] = (int)v->cells.size();
              v->cells.push_back(y);
            }
          }
        }
      }

      if (!u->cells.empty()) save_hits(target, opt.t, b, *u);
      // push u to stack0 or pending (bwtsw2_core.c:546-580)
      uint64_t full = chash[key];
      uint64_t pos = full >> 32;
      if (pos) {
        Entry* w = pending[pos - 1];
        if (!u->cells.empty()) {
          if (w->cells.size() < u->cells.size()) {
            std::swap(pending[pos - 1], u);
            w = pending[pos - 1];
          }
          merge_entry(*w, *u);
        }
        if (cnt == 0) {
          remove_duplicate(*w);
          save_narrow_hits(target, *w, b1, opt.t, opt.IS);
          cut_tail(*w, (int)opt.z);
          stack0.push_back(w);
          pending[pos - 1] = nullptr;
          n_pending -= 1;
        }
        pool.put(u);
      } else if (cnt) {
        if (!u->cells.empty()) {
          n_pending += 1;
          pending.push_back(u);
          chash[key] = ((uint64_t)pending.size() << 32) | cnt;
        } else {
          pool.put(u);
        }
      } else {
        save_narrow_hits(target, *u, b1, opt.t, opt.IS);
        cut_tail(*u, (int)opt.z);
        stack0.push_back(u);
      }
    }
    pool.put(v);
  }
  for (Entry* e : pending)
    if (e) pool.put(e);

  resolve_duphits(&query, b, opt.IS);
  resolve_duphits(&query, b1, opt.IS);
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Runs bwtl construction + bsw2_core + duphit resolution for one read
// strand.  Hit fields are written as 9 x int64 per hit:
//   k, l, flag, n_seeds, len, G, G2, beg, end
// Returns 0 on success, -1 if either list exceeds `cap`.
int32_t ibwa_bsw2_core(
    const uint32_t* itl, uint32_t primary, const uint32_t* l2,
    uint32_t seq_len, uint32_t sa_intv, const uint32_t* sampled_sa,
    const uint8_t* seq, int32_t len,
    int64_t a, int64_t bmm, int64_t q, int64_t r, int64_t t, int64_t bw,
    int64_t z, int64_t IS,
    int64_t* out_b, int32_t* n_b, int64_t* out_b1, int32_t* n_b1,
    int32_t cap) {
  Itl query{itl, primary, {l2[0], l2[1], l2[2], l2[3], l2[4]}, seq_len,
            sa_intv, sampled_sa};
  Bwtl target;
  target.build(seq, len);
  Opt opt{a, bmm, q, r, t, bw, z, IS};
  std::vector<Hit> b, b1;
  static thread_local EntryPool pool;
  bsw2_core(opt, target, query, b, b1, pool);
  if ((int32_t)b.size() > cap || (int32_t)b1.size() > cap) return -1;
  auto emit = [](const std::vector<Hit>& hs, int64_t* out) {
    for (size_t i = 0; i < hs.size(); ++i) {
      const Hit& h = hs[i];
      int64_t* o = out + i * 9;
      o[0] = h.k;
      o[1] = h.l;
      o[2] = h.flag;
      o[3] = h.n_seeds;
      o[4] = h.len;
      o[5] = h.G;
      o[6] = h.G2;
      o[7] = h.beg;
      o[8] = h.end;
    }
  };
  emit(b, out_b);
  emit(b1, out_b1);
  *n_b = (int32_t)b.size();
  *n_b1 = (int32_t)b1.size();
  return 0;
}

}  // extern "C"
