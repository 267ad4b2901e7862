// ibwa_tpu native host library.
//
// Host-side heavy lifting that is inherently sequential or
// pointer-chasing and therefore stays off the TPU:
//   * SA-IS suffix-array construction (index build)
//   * BWT derivation + the sampled-SA inverse-Psi walk
//     (semantics of /root/reference/bwt.c:48-79, re-implemented)
//   * occ(k, c) queries on the interleaved checkpoint layout
//     (layout contract from /root/reference/bwt.h:56-63)
//   * exact rand48 stream generation (libc LCG) for output parity
//
// Everything is exposed with a C ABI and driven from Python via ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// SA-IS: linear-time suffix array by induced sorting (Nong, Zhang & Chan).
// Original implementation; generic over the text accessor so the recursion
// can reuse the same code for the int32 reduced problem.
// ---------------------------------------------------------------------------

template <typename TextT>
struct SaisProblem {
  const TextT* text;
  int32_t n;
  int32_t alphabet;
};

template <typename TextT>
static void compute_buckets(const SaisProblem<TextT>& p, std::vector<int32_t>& bkt,
                            bool tails) {
  std::fill(bkt.begin(), bkt.end(), 0);
  for (int32_t i = 0; i < p.n; ++i) bkt[p.text[i]] += 1;
  int32_t sum = 0;
  for (int32_t c = 0; c < p.alphabet; ++c) {
    sum += bkt[c];
    bkt[c] = tails ? sum : sum - bkt[c];
  }
}

// type array: true = S-type suffix, false = L-type
template <typename TextT>
static void classify(const SaisProblem<TextT>& p, std::vector<bool>& stype) {
  stype.assign(p.n + 1, false);
  stype[p.n] = true;  // empty suffix is S by convention
  if (p.n == 0) return;
  stype[p.n - 1] = false;  // last char > empty suffix
  for (int32_t i = p.n - 2; i >= 0; --i) {
    if (p.text[i] < p.text[i + 1])
      stype[i] = true;
    else if (p.text[i] > p.text[i + 1])
      stype[i] = false;
    else
      stype[i] = stype[i + 1];
  }
}

static inline bool is_lms(const std::vector<bool>& stype, int32_t i) {
  return i > 0 && stype[i] && !stype[i - 1];
}

template <typename TextT>
static void induce(const SaisProblem<TextT>& p, int32_t* sa,
                   const std::vector<bool>& stype, std::vector<int32_t>& bkt) {
  // forward pass: place L-types after their successors
  compute_buckets(p, bkt, /*tails=*/false);
  // virtual sentinel: suffix n-1 precedes the (unstored) empty suffix
  if (p.n > 0 && !stype[p.n - 1]) sa[bkt[p.text[p.n - 1]]++] = p.n - 1;
  for (int32_t i = 0; i < p.n; ++i) {
    int32_t j = sa[i] - 1;
    if (sa[i] > 0 && !stype[j]) sa[bkt[p.text[j]]++] = j;
  }
  // backward pass: place S-types
  compute_buckets(p, bkt, /*tails=*/true);
  for (int32_t i = p.n - 1; i >= 0; --i) {
    int32_t j = sa[i] - 1;
    if (sa[i] > 0 && stype[j]) sa[--bkt[p.text[j]]] = j;
  }
}

template <typename TextT>
static void sais_core(const TextT* text, int32_t* sa, int32_t n, int32_t alphabet) {
  if (n == 0) return;
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  SaisProblem<TextT> p{text, n, alphabet};
  std::vector<bool> stype;
  classify(p, stype);
  std::vector<int32_t> bkt(alphabet);

  // step 1: rough sort — drop LMS suffixes at bucket tails, induce
  std::fill(sa, sa + n, -1);
  compute_buckets(p, bkt, /*tails=*/true);
  for (int32_t i = n - 1; i >= 1; --i)
    if (is_lms(stype, i)) sa[--bkt[text[i]]] = i;
  induce(p, sa, stype, bkt);

  // step 2: name LMS substrings in their sorted order
  int32_t n_lms = 0;
  for (int32_t i = 0; i < n; ++i)
    if (is_lms(stype, sa[i])) sa[n_lms++] = sa[i];
  int32_t* lms_sorted = sa;            // first n_lms slots
  int32_t* names = sa + n_lms;         // rest reused as name buffer
  std::fill(names, sa + n, -1);
  int32_t n_names = 0;
  int32_t prev = -1;
  for (int32_t k = 0; k < n_lms; ++k) {
    int32_t cur = lms_sorted[k];
    bool differ = (prev < 0);
    if (!differ) {
      // compare LMS substrings at prev and cur
      for (int32_t d = 0;; ++d) {
        bool end_p = (prev + d == n) || (d > 0 && is_lms(stype, prev + d));
        bool end_c = (cur + d == n) || (d > 0 && is_lms(stype, cur + d));
        if (end_p && end_c) break;
        if (end_p != end_c || text[prev + d] != text[cur + d]) {
          differ = true;
          break;
        }
      }
    }
    if (differ) {
      ++n_names;
      prev = cur;
    }
    names[cur / 2] = n_names - 1;
  }
  // compact names into the reduced string
  std::vector<int32_t> reduced;
  std::vector<int32_t> lms_pos;
  reduced.reserve(n_lms);
  lms_pos.reserve(n_lms);
  for (int32_t i = 1; i < n; ++i)
    if (is_lms(stype, i)) lms_pos.push_back(i);
  for (int32_t i = 0; i < n - n_lms; ++i)
    if (names[i] >= 0) reduced.push_back(names[i]);
  // note: lms_pos is in text order and so is the compacted name sequence

  // step 3: order LMS suffixes
  std::vector<int32_t> lms_order(n_lms);
  if (n_names < n_lms) {
    std::vector<int32_t> sub_sa(n_lms);
    sais_core<int32_t>(reduced.data(), sub_sa.data(), n_lms, n_names);
    for (int32_t k = 0; k < n_lms; ++k) lms_order[k] = lms_pos[sub_sa[k]];
  } else {
    for (int32_t k = 0; k < n_lms; ++k) lms_order[reduced[k]] = lms_pos[k];
  }

  // step 4: final induce from exactly-sorted LMS suffixes
  std::fill(sa, sa + n, -1);
  compute_buckets(p, bkt, /*tails=*/true);
  for (int32_t k = n_lms - 1; k >= 0; --k) {
    int32_t j = lms_order[k];
    sa[--bkt[text[j]]] = j;
  }
  induce(p, sa, stype, bkt);
}

// ---------------------------------------------------------------------------
// occ on the interleaved BWT layout (checkpoint every 128 bases, 12 words per
// block: 4 cumulative counts + 8 packed text words, base j of a word in bits
// [2*(15-j), 2*(15-j)+1]).
// ---------------------------------------------------------------------------

static inline uint32_t count_code_prefix(uint32_t word, int code, int nbases) {
  // number of occurrences of `code` among the first `nbases` bases of `word`
  if (nbases <= 0) return 0;
  // replicate the 2-bit code across all 16 lanes, then match via ~xor
  uint32_t pat = (uint32_t)code * 0x55555555u;
  uint32_t z = word ^ pat;
  uint32_t t = ~z;
  t &= t >> 1;
  t &= 0x55555555u;
  if (nbases < 16) t &= ~((1u << ((16 - nbases) * 2)) - 1u);
  return (uint32_t)__builtin_popcount(t);
}

struct InterleavedBwt {
  const uint32_t* data;
  uint32_t primary;
  uint32_t l2[5];
  uint32_t seq_len;
};

static uint32_t occ1(const InterleavedBwt& b, uint32_t k, int c) {
  // #\{i <= k : B0[i] == c\}; k == 0xFFFFFFFF means "before the start"
  if (k == 0xFFFFFFFFu) return 0;
  if (k == b.seq_len) return b.l2[c + 1] - b.l2[c];
  if (k >= b.primary) --k;  // the sentinel is not stored
  const uint32_t* blk = b.data + (k / 128) * 12;
  uint32_t n = blk[c];
  const uint32_t* w = blk + 4;
  uint32_t base0 = (k / 128) * 128;
  uint32_t full_words = (k - base0) / 16;  // words fully below k's word
  for (uint32_t j = 0; j < full_words; ++j) n += count_code_prefix(w[j], c, 16);
  n += count_code_prefix(w[full_words], c, (int)(k % 16) + 1);
  return n;
}

static inline int bwt_code_at(const InterleavedBwt& b, uint32_t k) {
  const uint32_t* blk = b.data + (k / 128) * 12 + 4;
  uint32_t word = blk[(k % 128) / 16];
  return (int)((word >> (((~k) & 0xF) << 1)) & 3u);
}

static uint32_t inv_psi(const InterleavedBwt& b, uint32_t k) {
  // LF-mapping step; mirrors the macro contract at reference bwt.h:66-70
  if (k == b.primary) return 0;
  int c = (k < b.primary) ? bwt_code_at(b, k) : bwt_code_at(b, k - 1);
  return b.l2[c] + occ1(b, k, c);
}

// ---------------------------------------------------------------------------
// rand48
// ---------------------------------------------------------------------------

static const uint64_t R48_A = 0x5DEECE66DULL;
static const uint64_t R48_C = 0xBULL;
static const uint64_t R48_MASK = (1ULL << 48) - 1;

}  // namespace

extern "C" {

// Suffix array of text[0..n-1] (values 0..alphabet-1). Returns 0 on success.
int32_t ibwa_sais(const uint8_t* text, int32_t* sa, int32_t n, int32_t alphabet) {
  if (!text || !sa || n < 0) return -1;
  sais_core<uint8_t>(text, sa, n, alphabet);
  return 0;
}

// In-place BWT of text[0..n-1]; output is the sentinel-removed BWT string
// (length n) and the return value is the sentinel row index ("primary").
int32_t ibwa_bwt_inplace(uint8_t* text, int32_t n) {
  if (n <= 0) return n == 0 ? 0 : -1;
  std::vector<int32_t> sa(n);
  sais_core<uint8_t>(text, sa.data(), n, 4);
  // full SA order: [empty suffix] + sa; BWT[i] = text[SA_full[i] - 1]
  std::vector<uint8_t> bwt(n);
  int32_t primary = 0;
  bwt[0] = text[n - 1];
  int32_t out = 1;
  for (int32_t i = 0; i < n; ++i) {
    if (sa[i] == 0) {
      primary = i + 1;  // row of the sentinel in the full matrix
      continue;
    }
    bwt[out++] = text[sa[i] - 1];
  }
  std::memcpy(text, bwt.data(), n);
  return primary;
}

// Sampled suffix array from the interleaved bwt, matching reference
// bwt.c:48-67: walk isa via invPsi for seq_len steps, record every intv-th.
void ibwa_cal_sa(const uint32_t* interleaved, uint32_t primary,
                 const uint32_t* l2, uint32_t seq_len, uint32_t intv,
                 uint32_t* out_sa, uint32_t n_sa) {
  InterleavedBwt b{interleaved, primary, {l2[0], l2[1], l2[2], l2[3], l2[4]},
                   seq_len};
  for (uint32_t i = 0; i < n_sa; ++i) out_sa[i] = 0;
  uint32_t isa = 0, sa = seq_len;
  for (uint32_t i = 0; i < seq_len; ++i) {
    if (isa % intv == 0) out_sa[isa / intv] = sa;
    --sa;
    isa = inv_psi(b, isa);
  }
  if (isa % intv == 0) out_sa[isa / intv] = sa;
  out_sa[0] = 0xFFFFFFFFu;  // sentinel, reference bwt.c:66
}

// Batched SA lookup: for each sa index k, walk until a sampled slot.
void ibwa_sa_lookup(const uint32_t* interleaved, uint32_t primary,
                    const uint32_t* l2, uint32_t seq_len, uint32_t sa_intv,
                    const uint32_t* sampled_sa, const uint32_t* ks, uint32_t n,
                    uint32_t* out) {
  InterleavedBwt b{interleaved, primary, {l2[0], l2[1], l2[2], l2[3], l2[4]},
                   seq_len};
  for (uint32_t i = 0; i < n; ++i) {
    uint32_t k = ks[i], add = 0;
    while (k % sa_intv != 0) {
      ++add;
      k = inv_psi(b, k);
    }
    out[i] = add + sampled_sa[k / sa_intv];
  }
}

uint32_t ibwa_occ(const uint32_t* interleaved, uint32_t primary,
                  const uint32_t* l2, uint32_t seq_len, uint32_t k, int32_t c) {
  InterleavedBwt b{interleaved, primary, {l2[0], l2[1], l2[2], l2[3], l2[4]},
                   seq_len};
  return occ1(b, k, (int)c);
}

// n successive lrand48() draws; *state is the raw 48-bit X (advanced).
void ibwa_lrand48(uint64_t* state, uint64_t n, uint32_t* out) {
  uint64_t x = *state;
  for (uint64_t i = 0; i < n; ++i) {
    x = (R48_A * x + R48_C) & R48_MASK;
    out[i] = (uint32_t)(x >> 17);
  }
  *state = x;
}

void ibwa_drand48(uint64_t* state, uint64_t n, double* out) {
  uint64_t x = *state;
  const double scale = 1.0 / 281474976710656.0;  // 2^-48
  for (uint64_t i = 0; i < n; ++i) {
    x = (R48_A * x + R48_C) & R48_MASK;
    out[i] = (double)x * scale;
  }
  *state = x;
}

}  // extern "C"
