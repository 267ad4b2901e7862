// Native SAM-stage text helpers: the per-read MD/NM walk.
//
// bwa_cal_md1 (bwase.c:243-295) runs for every emitted alignment; the
// Python/numpy version (sam/bwase.py::cal_md1, kept as the oracle) costs
// ~40 us/read — this walk is ~1 us.  The caller extracts the reference
// window once (dbset_extract_sequence semantics, including the l_pac
// truncation) and passes it with its absolute start position.

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {
const char kBase[] = "ACGTN";
}

extern "C" {

// cigar: bwa_cigar_t words (op << 29 | len); ncig == 0 means "no cigar"
// (one M span of read_len).  ref covers [pos, pos + ref_len) of the
// concatenated reference space (already truncated at l_pac).  Returns
// the MD string length written to out (NUL-terminated), or -1 if cap is
// too small; *out_nm receives the NM count.
int64_t ibwa_cal_md(const uint32_t* cigar, int32_t ncig, const uint8_t* ref,
                    int64_t ref_len, int64_t pos, int64_t l_pac,
                    const uint8_t* read, int32_t read_len, char* out,
                    int64_t cap, int32_t* out_nm) {
  int64_t nm = 0;
  int64_t x = pos, y = 0, u = 0;
  int64_t w = 0;
  auto put_num = [&](int64_t v) -> bool {
    char tmp[24];
    int n = snprintf(tmp, sizeof(tmp), "%lld", (long long)v);
    if (w + n + 1 > cap) return false;
    std::memcpy(out + w, tmp, n);
    w += n;
    return true;
  };
  auto span_m = [&](int64_t start_x, int64_t len) -> bool {
    // one M span: ref[start_x - pos .. +len) vs read[y .. y+len)
    const uint8_t* r = ref + (start_x - pos);
    for (int64_t i = 0; i < len; ++i) {
      uint8_t rc = r[i], sc = read[y + i];
      if (rc > 3 || sc > 3 || rc != sc) {
        if (!put_num(u)) return false;
        if (w + 2 > cap) return false;
        out[w++] = kBase[rc > 4 ? 4 : rc];
        u = 0;
        ++nm;
      } else {
        ++u;
      }
    }
    return true;
  };

  if (ncig > 0) {
    for (int32_t ci = 0; ci < ncig; ++ci) {
      uint32_t c = cigar[ci];
      int64_t ln = c & 0x1FFFFFFF;
      int op = c >> 29;
      if (op == 0) {  // M
        int64_t span = l_pac - x;
        if (span > ln) span = ln;
        if (span < 0) span = 0;
        if (span > 0) {
          if (!span_m(x, span)) return -1;
          // note: the Python oracle compares seq[y:y+len(ref)] — len
          // capped by the extraction; y advances by the FULL ln below
        }
        x += ln;
        y += ln;
      } else if (op == 1 || op == 3) {  // I or S
        y += ln;
        if (op == 1) nm += ln;
      } else if (op == 2) {  // D
        if (!put_num(u)) return -1;
        if (w + 1 > cap) return -1;
        out[w++] = '^';
        int64_t span = l_pac - x;
        if (span > ln) span = ln;
        if (span < 0) span = 0;
        for (int64_t i = 0; i < span; ++i) {
          if (w + 1 > cap) return -1;
          uint8_t rc = ref[x - pos + i];
          out[w++] = kBase[rc > 4 ? 4 : rc];
        }
        u = 0;
        x += ln;
        nm += ln;
      }
    }
  } else {
    int64_t span = l_pac - x;
    if (span > read_len) span = read_len;
    if (span < 0) span = 0;
    if (span > 0 && !span_m(x, span)) return -1;
  }
  if (!put_num(u)) return -1;
  if (w + 1 > cap) return -1;
  out[w] = 0;
  *out_nm = (int32_t)nm;
  return w;
}

}  // extern "C"
