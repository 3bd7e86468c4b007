// Refcounted, hash-addressed KV block allocator (prefix caching).
//
// The memory-management core of the paged-attention runtime: block ids are
// handles into the device-side PagedKVPool (models/llama/paged.py); this
// allocator decides which handle backs which request. Three block states:
//
//   live        refcount > 0 (owned or shared by >= 1 requests)
//   cached-free refcount == 0 but registered under a content hash; its
//               device-side bytes are intact, so a future request whose
//               prompt prefix hashes to it can revive it (a prefix-cache
//               HIT: no prefill compute, no HBM writes for those tokens)
//   free        unhashed and unreferenced; first choice for allocation
//
// Allocation is all-or-nothing and evicts cached-free blocks LRU-first only
// when the free list runs dry, so the prefix cache survives as long as
// memory pressure allows. The Go reference has no cache reuse of any kind —
// one preallocated cache per generation (reference:
// src/model/inferencecontext.go:29-43); this is the production replacement.
//
// Mirrored 1:1 by the pure-Python twin in runtime/block_pool.py; the
// property test in tests/test_paged_prefix.py drives both with the same
// random op stream and asserts identical observable behavior.

#include <cstdint>
#include <cstdlib>
#include <list>
#include <unordered_map>
#include <vector>

namespace {

struct Block {
  int32_t refcount = 0;
  bool has_hash = false;
  uint64_t hash = 0;
  // valid only while cached-free:
  std::list<int32_t>::iterator lru_it{};
  bool in_lru = false;
};

struct Pool {
  std::vector<Block> blocks;            // index 0 reserved (trash), never issued
  std::vector<int32_t> free_list;       // LIFO of unhashed free ids
  std::list<int32_t> cached_lru;        // front = oldest, back = most recent
  std::unordered_map<uint64_t, int32_t> by_hash;
  int64_t lookups = 0, hits = 0, evictions = 0;

  bool valid(int32_t b) const {
    return b > 0 && b < static_cast<int32_t>(blocks.size());
  }

  void drop_hash(int32_t b) {
    Block &blk = blocks[b];
    if (blk.has_hash) {
      by_hash.erase(blk.hash);
      blk.has_hash = false;
    }
  }

  // Pop one allocatable id: free list first, then evict the LRU cached block.
  int32_t pop_one() {
    if (!free_list.empty()) {
      int32_t b = free_list.back();
      free_list.pop_back();
      return b;
    }
    if (!cached_lru.empty()) {
      int32_t b = cached_lru.front();
      cached_lru.pop_front();
      blocks[b].in_lru = false;
      drop_hash(b);
      ++evictions;
      return b;
    }
    return -1;
  }
};

}  // namespace

extern "C" {

void *bp_new(int32_t n_blocks) {
  if (n_blocks < 2) return nullptr;
  Pool *p = new Pool();
  p->blocks.resize(n_blocks);
  p->free_list.reserve(n_blocks - 1);
  // LIFO with high ids pushed first so allocation hands out 1, 2, 3, ...
  for (int32_t b = n_blocks - 1; b >= 1; --b) p->free_list.push_back(b);
  return p;
}

void bp_destroy(void *ctx) { delete static_cast<Pool *>(ctx); }

int32_t bp_available(void *ctx) {
  Pool *p = static_cast<Pool *>(ctx);
  return static_cast<int32_t>(p->free_list.size() + p->cached_lru.size());
}

// All-or-nothing: writes n fresh ids (refcount 1, no hash) into out.
int32_t bp_alloc(void *ctx, int32_t n, int32_t *out) {
  Pool *p = static_cast<Pool *>(ctx);
  if (n < 0 || bp_available(ctx) < n) return -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = p->pop_one();
    p->blocks[b].refcount = 1;
    out[i] = b;
  }
  return 0;
}

// Drop one reference per listed block. Zero-ref hashed blocks become
// cached-free (MRU end of the LRU list); unhashed ones return to the free
// list. Returns -1 if any id is invalid or not live (state unchanged for
// that id), else 0.
int32_t bp_release(void *ctx, const int32_t *ids, int32_t n) {
  Pool *p = static_cast<Pool *>(ctx);
  int32_t rc = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = ids[i];
    if (!p->valid(b) || p->blocks[b].refcount <= 0) {
      rc = -1;
      continue;
    }
    Block &blk = p->blocks[b];
    if (--blk.refcount == 0) {
      if (blk.has_hash) {
        blk.lru_it = p->cached_lru.insert(p->cached_lru.end(), b);
        blk.in_lru = true;
      } else {
        p->free_list.push_back(b);
      }
    }
  }
  return rc;
}

// Prefix-cache probe: returns the block registered under `hash` (bumping its
// refcount, reviving it from cached-free if needed) or -1 on miss.
int32_t bp_lookup(void *ctx, uint64_t hash) {
  Pool *p = static_cast<Pool *>(ctx);
  ++p->lookups;
  auto it = p->by_hash.find(hash);
  if (it == p->by_hash.end()) return -1;
  int32_t b = it->second;
  Block &blk = p->blocks[b];
  if (blk.in_lru) {
    p->cached_lru.erase(blk.lru_it);
    blk.in_lru = false;
  }
  ++blk.refcount;
  ++p->hits;
  return b;
}

// Associate a LIVE block's (fully written) contents with its chain hash.
// No-op if the block already has a hash or the hash is already taken —
// dedupe misses are harmless, double-mapping is not.
int32_t bp_register(void *ctx, uint64_t hash, int32_t block) {
  Pool *p = static_cast<Pool *>(ctx);
  if (!p->valid(block) || p->blocks[block].refcount <= 0) return -1;
  if (p->blocks[block].has_hash || p->by_hash.count(hash)) return 0;
  p->blocks[block].has_hash = true;
  p->blocks[block].hash = hash;
  p->by_hash.emplace(hash, block);
  return 0;
}

int32_t bp_refcount(void *ctx, int32_t block) {
  Pool *p = static_cast<Pool *>(ctx);
  if (!p->valid(block)) return -1;
  return p->blocks[block].refcount;
}

int64_t bp_stat(void *ctx, int32_t which) {
  Pool *p = static_cast<Pool *>(ctx);
  switch (which) {
    case 0: return p->lookups;
    case 1: return p->hits;
    case 2: return p->evictions;
    case 3: return static_cast<int64_t>(p->cached_lru.size());
    default: return -1;
  }
}

}  // extern "C"
