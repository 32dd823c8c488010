// Native host-side hot paths for nanovllm_tpu.
//
// The device compute path is JAX/XLA/Pallas; these are the HOST runtime's
// per-request hot loops, which sit on the engine's critical path between
// device dispatches:
//   - 64-bit block hashing for the prefix cache (the reference used xxhash,
//     /root/reference/nanovllm/block_manager.go:72-88; this is a clean-room
//     FNV1a-64 with avalanche finalization — any deterministic 64-bit hash
//     serves, it only needs speed and distribution)
//   - the greedy lowest-rank BPE merge loop over token ids (the reference's
//     loop is bpe_tokenizer.go:154-229; Python pays ~O(n^2) interpreter
//     overhead per word on long prompts)
//
// Built as a plain shared library (no pybind11 in this image); loaded from
// Python via ctypes with a pure-Python fallback (nanovllm_tpu/native.py).
//
// Build: make native   (g++ -O2 -shared -fPIC host_ops.cc -o libnvhost.so)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Hashing
// ---------------------------------------------------------------------------

inline uint64_t avalanche(uint64_t h) {
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdULL;
  h ^= h >> 33;
  h *= 0xc4ceb9fe1a85ec53ULL;
  h ^= h >> 33;
  return h;
}

// ---------------------------------------------------------------------------
// BPE
// ---------------------------------------------------------------------------

struct Bpe {
  // (left_id << 32 | right_id) -> (rank << 32 | merged_id)
  std::unordered_map<uint64_t, uint64_t> merges;
};

inline uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

}  // namespace

extern "C" {

// Chained 64-bit hash over (prefix_hash, token_ids) — deterministic across
// processes/hosts (prefix-cache coherence for the multi-host scheduler).
uint64_t nv_hash64(const int32_t* tokens, int32_t n, uint64_t prefix) {
  uint64_t h = 0xcbf29ce484222325ULL ^ avalanche(prefix);
  for (int32_t i = 0; i < n; ++i) {
    h ^= static_cast<uint32_t>(tokens[i]);
    h *= 0x100000001b3ULL;  // FNV-1a prime
  }
  return avalanche(h);
}

void* nv_bpe_new(int32_t n_merges, const int32_t* left, const int32_t* right,
                 const int32_t* merged) {
  Bpe* bpe = new Bpe();
  bpe->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (int32_t r = 0; r < n_merges; ++r) {
    uint64_t val =
        (static_cast<uint64_t>(r) << 32) | static_cast<uint32_t>(merged[r]);
    bpe->merges.emplace(pair_key(left[r], right[r]), val);
  }
  return bpe;
}

void nv_bpe_free(void* handle) { delete static_cast<Bpe*>(handle); }

// Greedy lowest-rank merge over ids (in place in a scratch vector); returns
// the output length written to out (out must have capacity n).
int32_t nv_bpe_apply(void* handle, const int32_t* ids, int32_t n,
                     int32_t* out) {
  Bpe* bpe = static_cast<Bpe*>(handle);
  std::vector<int32_t> word(ids, ids + n);
  while (word.size() > 1) {
    int best_i = -1;
    uint32_t best_rank = 0xffffffffu;
    int32_t best_merged = -1;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = bpe->merges.find(pair_key(word[i], word[i + 1]));
      if (it != bpe->merges.end()) {
        uint32_t rank = static_cast<uint32_t>(it->second >> 32);
        if (rank < best_rank) {
          best_rank = rank;
          best_i = static_cast<int>(i);
          best_merged = static_cast<int32_t>(it->second & 0xffffffffu);
        }
      }
    }
    if (best_i < 0) break;
    word[best_i] = best_merged;
    word.erase(word.begin() + best_i + 1);
  }
  std::memcpy(out, word.data(), word.size() * sizeof(int32_t));
  return static_cast<int32_t>(word.size());
}

}  // extern "C"
