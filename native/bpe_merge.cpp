// Native byte-pair-merge hot loop for the tiktoken tokenizer.
//
// The runtime equivalent of the reference's hand-written merge
// (reference: src/inference/tokenize.go:109-176, itself a port of tiktoken's
// Rust lib.rs) — the one host-side loop that runs per prompt piece and is
// worth native code. The rank table is built once per vocabulary
// (bpe_ctx_new) into an open-addressing friendly unordered_map keyed by the
// token bytes; bpe_encode then runs the lowest-rank-first merge exactly like
// tokenizer/bpe.py (the correctness oracle it is tested against).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 bpe_merge.cpp -o libbpe_merge.so
// ABI: plain C, consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t MAX_RANK = 0x7FFFFFFF;

struct BpeCtx {
  std::unordered_map<std::string, int32_t> ranks;
};

int32_t lookup(const BpeCtx* ctx, const char* data, size_t len) {
  auto it = ctx->ranks.find(std::string(data, len));
  return it == ctx->ranks.end() ? MAX_RANK : it->second;
}

}  // namespace

extern "C" {

// tokens: concatenated token bytes; lens[i]: length of token i; ranks[i]: its rank
void* bpe_ctx_new(const uint8_t* tokens, const int32_t* lens,
                  const int32_t* ranks, int32_t n) {
  auto* ctx = new BpeCtx();
  ctx->ranks.reserve(static_cast<size_t>(n) * 2);
  size_t off = 0;
  for (int32_t i = 0; i < n; ++i) {
    ctx->ranks.emplace(
        std::string(reinterpret_cast<const char*>(tokens) + off,
                    static_cast<size_t>(lens[i])),
        ranks[i]);
    off += static_cast<size_t>(lens[i]);
  }
  return ctx;
}

void bpe_ctx_free(void* handle) { delete static_cast<BpeCtx*>(handle); }

// Encode one piece. Returns the number of ids written to out (capacity must
// be >= piece_len), or -1 if any resulting sub-piece is not in the table.
int32_t bpe_encode(const void* handle, const uint8_t* piece_bytes,
                   int32_t piece_len, int32_t* out) {
  const auto* ctx = static_cast<const BpeCtx*>(handle);
  const char* piece = reinterpret_cast<const char*>(piece_bytes);

  // whole-piece fast path
  int32_t whole = lookup(ctx, piece, static_cast<size_t>(piece_len));
  if (whole != MAX_RANK) {
    out[0] = whole;
    return 1;
  }
  if (piece_len == 1) return -1;

  // parts[i] = {byte offset, rank of pair starting at i}; two sentinels
  std::vector<std::pair<int32_t, int32_t>> parts;
  parts.reserve(static_cast<size_t>(piece_len) + 1);
  for (int32_t i = 0; i + 1 < piece_len; ++i) {
    parts.emplace_back(i, lookup(ctx, piece + i, 2));
  }
  parts.emplace_back(piece_len - 1, MAX_RANK);
  parts.emplace_back(piece_len, MAX_RANK);

  auto pair_rank = [&](size_t i) -> int32_t {
    if (i + 3 < parts.size()) {
      return lookup(ctx, piece + parts[i].first,
                    static_cast<size_t>(parts[i + 3].first - parts[i].first));
    }
    return MAX_RANK;
  };

  while (true) {
    int32_t best_rank = MAX_RANK;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      if (parts[i].second < best_rank) {
        best_rank = parts[i].second;
        best_i = i;
      }
    }
    if (best_rank == MAX_RANK) break;
    if (best_i > 0) parts[best_i - 1].second = pair_rank(best_i - 1);
    parts[best_i].second = pair_rank(best_i);
    parts.erase(parts.begin() + static_cast<int64_t>(best_i) + 1);
  }

  int32_t count = 0;
  for (size_t i = 0; i + 1 < parts.size(); ++i) {
    int32_t rank = lookup(ctx, piece + parts[i].first,
                          static_cast<size_t>(parts[i + 1].first - parts[i].first));
    if (rank == MAX_RANK) return -1;
    out[count++] = rank;
  }
  return count;
}

}  // extern "C"
