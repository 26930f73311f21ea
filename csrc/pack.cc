// Single-pass lattice assembly for the bwtpu index (build-side native
// component, SURVEY.md §2.2).
//
// Given the BWT symbol string (0='$', 1..4=A..T) and the suffix array,
// emits in ONE linear pass over n rows:
//   - the 32-word search records (Occ checkpoints, 2-bit packed BWT,
//     SA-sample mark bits, mark-rank checkpoint; the caller back-fills
//     the next-block mirror words 17..28 with a cheap vector copy),
//   - the sampled-SA value array (text sampling: SA[r] % s == 0),
//   - the 2-bit packed text.
// The NumPy formulation materializes several n-sized intermediates and
// costs ~3-4 s per 11.7 Mbp shard; this pass is memory-bound at ~n
// bytes read + ~n/2 written.
//
// Layout contract must match bwtpu/index.py exactly (tests assert
// equality against the NumPy builder).

#include <cstdint>
#include <cstring>

namespace {
using i32 = int32_t;
using i64 = int64_t;
using u32 = uint32_t;
using u8 = uint8_t;

constexpr i64 BLOCK = 128;
constexpr i64 REC = 32;
constexpr i64 BWT_W0 = 4;
constexpr i64 MARK_W0 = 12;
constexpr i64 MARK_RANK_W = 16;
constexpr i64 NEXT_CK0 = 17;
constexpr i64 NEXT_BWT0 = 21;
}  // namespace

extern "C" {

// bwt_sym: n bytes (0..4, exactly one 0); sa: n int64; text_codes:
// text_len bytes (= n-1). Outputs (caller-allocated, zero-filled):
//   lattice:  (n_blocks+1) * 32 int32
//   ssa:      capacity >= number of sampled rows, int32
//   text_packed: ceil(text_len/16) int32
// Returns the number of sampled rows, or -1 on error.
i64 bwtpu_build_lattice(const u8* bwt_sym, const i64* sa, i64 n,
                        i64 sa_rate, i32* lattice, i32* ssa,
                        const u8* text_codes, i64 text_len,
                        i32* text_packed) {
  if (n <= 0 || sa_rate <= 0) return -1;
  const i64 n_blocks = (n + BLOCK - 1) / BLOCK;
  i64 counts[4] = {0, 0, 0, 0};
  i64 mark_rank = 0;
  i64 n_sampled = 0;

  for (i64 j = 0; j < n_blocks; ++j) {
    i32* rec = lattice + j * REC;
    for (int c = 0; c < 4; ++c) rec[c] = static_cast<i32>(counts[c]);
    rec[MARK_RANK_W] = static_cast<i32>(mark_rank);
    const i64 lo = j * BLOCK;
    const i64 hi = lo + BLOCK < n ? lo + BLOCK : n;
    for (i64 r = lo; r < hi; ++r) {
      const u8 sym = bwt_sym[r];
      const i64 p = r - lo;
      // '$' stored as code 0, not counted (query-time correction).
      const u32 code = sym == 0 ? 0u : static_cast<u32>(sym - 1);
      if (sym != 0) counts[sym - 1]++;
      reinterpret_cast<u32*>(rec + BWT_W0)[p >> 4] |= code << (2 * (p & 15));
      if (sa[r] % sa_rate == 0) {
        reinterpret_cast<u32*>(rec + MARK_W0)[p >> 5] |= 1u << (p & 31);
        ssa[n_sampled++] = static_cast<i32>(sa[r]);
        mark_rank++;
      }
    }
  }
  // terminator row: full-text counts + final mark rank
  i32* term = lattice + n_blocks * REC;
  for (int c = 0; c < 4; ++c) term[c] = static_cast<i32>(counts[c]);
  term[MARK_RANK_W] = static_cast<i32>(mark_rank);

  // next-block mirrors (words 17..20 = ck of j+1, 21..28 = bwt of j+1)
  for (i64 j = 0; j < n_blocks; ++j) {
    i32* rec = lattice + j * REC;
    const i32* nxt = lattice + (j + 1) * REC;
    std::memcpy(rec + NEXT_CK0, nxt, 4 * sizeof(i32));
    if (j + 1 < n_blocks)
      std::memcpy(rec + NEXT_BWT0, nxt + BWT_W0, 8 * sizeof(i32));
  }

  // packed text
  for (i64 p = 0; p < text_len; ++p) {
    reinterpret_cast<u32*>(text_packed)[p >> 4] |=
        static_cast<u32>(text_codes[p]) << (2 * (p & 15));
  }
  return n_sampled;
}

}  // extern "C"
