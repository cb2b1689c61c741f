// Native DP kernels: the host-side hot loops of the engine.
//
// C++ replacements for the reference's JIT/native host kernels:
//  * fuzzy substring edit distance (the numba @njit kernel the reference
//    uses for hotword coarse retrieval, reference rag_fast.py:36-77),
//    including a batched variant over padded candidate matrices;
//  * Needleman-Wunsch char alignment fill+traceback (the 118 ms python DP
//    of nano_ctc.py:141-187) producing per-LLM-char CTC indices.
//
// Exposed with a plain C ABI for ctypes; numpy fallbacks live in
// fun_asr_gguf_tpu/native.py.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Unit-cost fuzzy substring distance: sub (n) inside main (m).
// dp[i][0] = i, dp[0][j] = 0; returns min over final row.
float fuzzy_substring_distance_i32(const int32_t* main_codes, int m,
                                   const int32_t* sub_codes, int n) {
  if (n == 0) return 0.0f;
  if (m == 0) return static_cast<float>(n);
  std::vector<float> prev(m + 1, 0.0f), curr(m + 1, 0.0f);
  for (int i = 1; i <= n; ++i) {
    curr[0] = static_cast<float>(i);
    const int32_t sc = sub_codes[i - 1];
    for (int j = 1; j <= m; ++j) {
      const float cost = (sc == main_codes[j - 1]) ? 0.0f : 1.0f;
      curr[j] = std::min({prev[j] + 1.0f, curr[j - 1] + 1.0f,
                          prev[j - 1] + cost});
    }
    std::swap(prev, curr);
  }
  float best = prev[1];
  for (int j = 2; j <= m; ++j) best = std::min(best, prev[j]);
  return best;
}

// Batched form: subs is [n_subs, max_len] padded with 0; lens gives true
// lengths. Writes one distance per candidate.
void fuzzy_substring_distance_batch(const int32_t* main_codes, int m,
                                    const int32_t* subs, const int32_t* lens,
                                    int n_subs, int max_len,
                                    float* out_dists) {
  for (int c = 0; c < n_subs; ++c) {
    out_dists[c] = fuzzy_substring_distance_i32(
        main_codes, m, subs + static_cast<int64_t>(c) * max_len, lens[c]);
  }
}

// Needleman-Wunsch alignment of ctc chars vs llm chars.
// Inputs are int32 codepoints (already lower-cased by the caller).
// Output: for each llm char, the aligned ctc index or -1.
// Scoring: match +1 / mismatch -1 / gap -1; traceback prefers diag, then
// up (ctc deletion), then left.
void nw_align_i32(const int32_t* ctc, int n_ctc, const int32_t* llm,
                  int n_llm, int32_t* out_align) {
  const int n = n_ctc + 1, mm = n_llm + 1;
  std::vector<float> score(static_cast<size_t>(n) * mm);
  std::vector<int8_t> trace(static_cast<size_t>(n) * mm);
  auto S = [&](int i, int j) -> float& {
    return score[static_cast<size_t>(i) * mm + j];
  };
  auto T = [&](int i, int j) -> int8_t& {
    return trace[static_cast<size_t>(i) * mm + j];
  };
  for (int i = 0; i < n; ++i) S(i, 0) = -static_cast<float>(i);
  for (int j = 0; j < mm; ++j) S(0, j) = -static_cast<float>(j);
  for (int i = 1; i < n; ++i) {
    const int32_t c = ctc[i - 1];
    for (int j = 1; j < mm; ++j) {
      const float sub = (c == llm[j - 1]) ? 1.0f : -1.0f;
      const float d = S(i - 1, j - 1) + sub;
      const float u = S(i - 1, j) - 1.0f;
      const float l = S(i, j - 1) - 1.0f;
      float best = d;
      int8_t t = 1;
      if (u > best) { best = u; t = 2; }
      if (l > best) { best = l; t = 3; }
      // reference tie-breaks: diag first, then up, then left
      if (best == d) t = 1;
      else if (best == u) t = 2;
      S(i, j) = best;
      T(i, j) = t;
    }
  }
  for (int j = 0; j < n_llm; ++j) out_align[j] = -1;
  int i = n - 1, j = mm - 1;
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 && T(i, j) == 1) {
      out_align[j - 1] = i - 1;
      --i; --j;
    } else if (i > 0 && (j == 0 || T(i, j) == 2)) {
      --i;
    } else {
      --j;
    }
  }
}

}  // extern "C"
