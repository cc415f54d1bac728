// Native KV-block allocator + prefix trie — host-side scheduler hot path.
//
// Reference analog: src/turbomind/engine/ (LogicalBlock/CacheBlockPool,
// PrefixTrie prefix_trie.h — cumulative-hash node identity) and
// src/turbomind/memory/ (ObjectAllocator).  The TPU engine's device work is
// jit-compiled; this native layer keeps the per-step host work (block
// accounting, prefix matching over token hashes) out of the Python interpreter
// at high request rates.  Exposed through a C ABI consumed via ctypes
// (no pybind11 in the image); Python fallback lives in paging/block_manager.py.
//
// Build: cc -O2 -shared -fPIC -o libtpulmd.so block_manager.cc (see build.py).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct BlockManager {
  int64_t num_blocks = 0;
  int64_t block_size = 0;
  std::vector<int64_t> ref_count;
  std::vector<double> access_time;
  std::vector<int64_t> free_list;  // stack, top = back

  explicit BlockManager(int64_t n, int64_t bs) : num_blocks(n), block_size(bs) {
    ref_count.assign(n, 0);
    access_time.assign(n, 0.0);
    free_list.reserve(n);
    // block 0 reserved as the padding block
    for (int64_t b = n - 1; b >= 1; --b) free_list.push_back(b);
    ref_count[0] = 1;
  }
};

// 64-bit mix (splitmix64) for trie key hashing.
static inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

struct TrieNode {
  uint64_t key = 0;        // cumulative hash (parent chained)
  int64_t block = -1;
  TrieNode* parent = nullptr;
  std::unordered_map<uint64_t, TrieNode*> children;
  double access_time = 0;
  std::vector<int32_t> tokens;  // exact tokens — hash-collision guard
};

struct PrefixTrie {
  BlockManager* bm = nullptr;
  int64_t block_size = 0;
  TrieNode root;
  std::unordered_map<uint64_t, TrieNode*> nodes;  // key -> node
  explicit PrefixTrie(BlockManager* m) : bm(m), block_size(m->block_size) {}
  ~PrefixTrie() {
    for (auto& kv : nodes) delete kv.second;
  }
};

static uint64_t chunk_key(uint64_t parent_key, const int32_t* tokens, int64_t n) {
  uint64_t h = mix64(parent_key ^ 0x517cc1b727220a95ull);
  for (int64_t i = 0; i < n; ++i) h = mix64(h ^ (uint64_t)(uint32_t)tokens[i]);
  return h;
}

}  // namespace

extern "C" {

// ---------------- block manager ----------------
void* bm_create(int64_t num_blocks, int64_t block_size) {
  return new BlockManager(num_blocks, block_size);
}
void bm_destroy(void* h) { delete static_cast<BlockManager*>(h); }

int64_t bm_num_free(void* h) {
  return (int64_t)static_cast<BlockManager*>(h)->free_list.size();
}

// allocate n blocks into out; returns 0 on success, -1 if insufficient.
int bm_allocate(void* h, int64_t n, int64_t* out, double now) {
  auto* bm = static_cast<BlockManager*>(h);
  if ((int64_t)bm->free_list.size() < n) return -1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t b = bm->free_list.back();
    bm->free_list.pop_back();
    bm->ref_count[b] = 1;
    bm->access_time[b] = now;
    out[i] = b;
  }
  return 0;
}

// decref blocks; returns number returned to the free list. -1 on double free.
int64_t bm_free(void* h, const int64_t* blocks, int64_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  int64_t freed = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t b = blocks[i];
    if (bm->ref_count[b] <= 0) return -1;
    if (--bm->ref_count[b] == 0) {
      bm->free_list.push_back(b);
      ++freed;
    }
  }
  return freed;
}

int bm_add_ref(void* h, const int64_t* blocks, int64_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  for (int64_t i = 0; i < n; ++i) {
    if (bm->ref_count[blocks[i]] <= 0) return -1;
    ++bm->ref_count[blocks[i]];
  }
  return 0;
}

void bm_touch(void* h, const int64_t* blocks, int64_t n, double now) {
  auto* bm = static_cast<BlockManager*>(h);
  for (int64_t i = 0; i < n; ++i) bm->access_time[blocks[i]] = now;
}

int64_t bm_ref_count(void* h, int64_t block) {
  return static_cast<BlockManager*>(h)->ref_count[block];
}

// ---------------- prefix trie ----------------
void* trie_create(void* bm_handle) {
  return new PrefixTrie(static_cast<BlockManager*>(bm_handle));
}
void trie_destroy(void* h) { delete static_cast<PrefixTrie*>(h); }

// Walk full blocks of `tokens` (len n); adopt up to max_blocks matched blocks.
// Writes matched block ids into out_blocks; returns count of matched blocks.
// Matched blocks get +1 ref and a touch.
int64_t trie_match(void* h, const int32_t* tokens, int64_t n, int64_t max_blocks,
                   int64_t* out_blocks, double now) {
  auto* t = static_cast<PrefixTrie*>(h);
  const int64_t bs = t->block_size;
  int64_t limit = (n - 1) / bs;  // leave >=1 token uncomputed
  if (limit > max_blocks) limit = max_blocks;
  TrieNode* node = &t->root;
  int64_t matched = 0;
  for (int64_t i = 0; i < limit; ++i) {
    uint64_t key = chunk_key(node->key, tokens + i * bs, bs);
    auto it = node->children.find(key);
    if (it == node->children.end()) break;
    TrieNode* child = it->second;
    if ((int64_t)child->tokens.size() != bs ||
        std::memcmp(child->tokens.data(), tokens + i * bs,
                    bs * sizeof(int32_t)) != 0)
      break;  // hash collision — exact-token guard
    child->access_time = now;
    out_blocks[matched++] = child->block;
    node = child;
  }
  if (matched > 0) {
    auto* bm = t->bm;
    for (int64_t i = 0; i < matched; ++i) {
      ++bm->ref_count[out_blocks[i]];
      bm->access_time[out_blocks[i]] = now;
    }
  }
  return matched;
}

// Publish full blocks [start_block, end_block) of `tokens` with physical ids
// `blocks` (the sequence's logical blocks, indexed from 0).  Re-walks from the
// root; returns number of blocks newly inserted, or -1 when the sequence's
// prefix diverged from the trie path (caller stops publishing).
int64_t trie_insert(void* h, const int32_t* tokens, int64_t n,
                    const int64_t* blocks, int64_t num_full, double now) {
  auto* t = static_cast<PrefixTrie*>(h);
  const int64_t bs = t->block_size;
  if (num_full * bs > n) return -1;
  TrieNode* node = &t->root;
  int64_t inserted = 0;
  for (int64_t i = 0; i < num_full; ++i) {
    uint64_t key = chunk_key(node->key, tokens + i * bs, bs);
    auto it = node->children.find(key);
    if (it != node->children.end()) {
      TrieNode* child = it->second;
      if (child->block != blocks[i]) {
        // same prefix cached under a different physical block — stop here
        // (the existing cache entry wins; caller keeps its private copy)
        return inserted;
      }
      child->access_time = now;
      node = child;
      continue;
    }
    auto* child = new TrieNode();
    child->key = key;
    child->block = blocks[i];
    child->parent = node;
    child->access_time = now;
    child->tokens.assign(tokens + i * bs, tokens + (i + 1) * bs);
    node->children.emplace(key, child);
    t->nodes.emplace(key, child);
    ++t->bm->ref_count[blocks[i]];  // trie's own reference
    node = child;
    ++inserted;
  }
  return inserted;
}

// LRU-evict up to `need` leaf blocks whose only reference is the trie's.
// Returns number of blocks freed back to the allocator.
int64_t trie_evict(void* h, int64_t need) {
  auto* t = static_cast<PrefixTrie*>(h);
  auto* bm = t->bm;
  int64_t freed = 0;
  while (freed < need) {
    TrieNode* victim = nullptr;
    for (auto& kv : t->nodes) {
      TrieNode* n = kv.second;
      if (!n->children.empty()) continue;
      if (bm->ref_count[n->block] != 1) continue;
      if (victim == nullptr || n->access_time < victim->access_time) victim = n;
    }
    if (victim == nullptr) break;
    if (victim->parent) victim->parent->children.erase(victim->key);
    t->nodes.erase(victim->key);
    if (--bm->ref_count[victim->block] == 0) {
      bm->free_list.push_back(victim->block);
      ++freed;
    }
    delete victim;
  }
  return freed;
}

int64_t trie_num_nodes(void* h) {
  return (int64_t)static_cast<PrefixTrie*>(h)->nodes.size();
}

}  // extern "C"
