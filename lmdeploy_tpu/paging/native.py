"""ctypes wrappers over the native block manager / prefix trie.

Drop-in replacements for paging.block_manager.BlockManager and
paging.block_trie.BlockTrie (same interface surface the Scheduler uses).
"""
from __future__ import annotations

import ctypes
import time
from typing import List, Optional

import numpy as np

from .._native import get_lib


def native_available() -> bool:
    return get_lib() is not None


class NativeBlockManager:
    """Interface-compatible with paging.block_manager.BlockManager."""

    def __init__(self, num_blocks: int, block_size: int):
        self._lib = get_lib()
        assert self._lib is not None, 'native runtime unavailable'
        self.num_blocks = num_blocks
        self.block_size = block_size
        self._h = self._lib.bm_create(num_blocks, block_size)

    def __del__(self):
        lib = getattr(self, '_lib', None)
        if lib is not None and getattr(self, '_h', None):
            lib.bm_destroy(self._h)
            self._h = None

    # -- queries -----------------------------------------------------------------------
    @property
    def num_free_blocks(self) -> int:
        return self._lib.bm_num_free(self._h)

    def can_allocate(self, num: int) -> bool:
        return self.num_free_blocks >= num

    @property
    def ref_count(self):
        return _RefCountView(self)

    # -- alloc/free --------------------------------------------------------------------
    def allocate(self, num: int) -> List[int]:
        out = (ctypes.c_int64 * num)()
        rc = self._lib.bm_allocate(self._h, num, out, time.time())
        assert rc == 0, f'out of KV blocks: want {num}, have {self.num_free_blocks}'
        return list(out)

    def free(self, blocks: List[int]):
        arr = (ctypes.c_int64 * len(blocks))(*blocks)
        rc = self._lib.bm_free(self._h, arr, len(blocks))
        assert rc >= 0, f'double free among {blocks}'

    def add_ref(self, blocks: List[int]):
        arr = (ctypes.c_int64 * len(blocks))(*blocks)
        rc = self._lib.bm_add_ref(self._h, arr, len(blocks))
        assert rc == 0, f'ref of free block among {blocks}'

    def touch(self, blocks: List[int]):
        arr = (ctypes.c_int64 * len(blocks))(*blocks)
        self._lib.bm_touch(self._h, arr, len(blocks), time.time())

    # -- sequence helpers --------------------------------------------------------------
    def num_required_blocks(self, seq, num_new_tokens: Optional[int] = None) -> int:
        total = seq.num_token_ids if num_new_tokens is None \
            else seq.num_computed_tokens + num_new_tokens
        needed = (total + self.block_size - 1) // self.block_size
        return max(0, needed - len(seq.logical_blocks))

    def allocate_for_seq(self, seq, num_new_tokens: Optional[int] = None) -> bool:
        n = self.num_required_blocks(seq, num_new_tokens)
        if n == 0:
            return True
        if not self.can_allocate(n):
            return False
        seq.logical_blocks.extend(self.allocate(n))
        return True

    def free_seq(self, seq):
        live = [b for b in seq.logical_blocks if b > 0]  # skip window pads
        if live:
            self.free(live)
        seq.logical_blocks = []

    def free_leading(self, seq, count: int) -> int:
        """Sliding-window eviction (see BlockManager.free_leading)."""
        freed = 0
        for i in range(min(count, len(seq.logical_blocks))):
            b = seq.logical_blocks[i]
            if b > 0:
                self.free([b])
                seq.logical_blocks[i] = 0
                freed += 1
        return freed


class _RefCountView:
    """ref_count[i] accessor parity with the numpy-based manager."""

    def __init__(self, bm: NativeBlockManager):
        self._bm = bm

    def __getitem__(self, block: int) -> int:
        return self._bm._lib.bm_ref_count(self._bm._h, int(block))


class NativeBlockTrie:
    """Interface-compatible with paging.block_trie.BlockTrie."""

    def __init__(self, cache_config, block_manager: NativeBlockManager):
        self.block_size = cache_config.block_size
        self.block_manager = block_manager
        self._lib = block_manager._lib
        self._h = self._lib.trie_create(block_manager._h)
        self._seq_shared = {}

    def __del__(self):
        lib = getattr(self, '_lib', None)
        if lib is not None and getattr(self, '_h', None):
            lib.trie_destroy(self._h)
            self._h = None

    def _salted_ids(self, seq) -> 'np.ndarray':
        """Token-id stream with multimodal content digests mixed in.

        The C++ trie hashes raw int32 ids per block; VLM prompts repeat one
        placeholder id per image token, which would alias different images.
        XOR-folding each span's digest (plus the in-span position) into the
        ids makes block identity content-exact without touching the native
        ABI — match and insert both go through this view, so the exact-token
        guard stays consistent.
        """
        ids = np.ascontiguousarray(seq.history_ids, dtype=np.int32)
        spans = getattr(seq, 'mm_digests', None)
        if not spans:
            return ids
        ids = ids.copy()
        for s, e, d in spans:
            e = min(e, len(ids))
            if s >= len(ids):
                continue
            span = np.arange(0, e - s, dtype=np.uint64)
            mix = (np.uint64(d & 0xFFFFFFFFFFFFFFFF) + span) \
                * np.uint64(0x9E3779B97F4A7C15)
            ids[s:e] ^= (mix & np.uint64(0x7FFFFFFF)).astype(np.int32)
        return ids

    def match_prefix(self, seq) -> int:
        assert seq.num_computed_tokens == 0 and not seq.logical_blocks
        ids = self._salted_ids(seq)
        max_blocks = max(len(ids) - 1, 0) // self.block_size
        if max_blocks == 0:
            return 0
        out = (ctypes.c_int64 * max_blocks)()
        n = self._lib.trie_match(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(ids), max_blocks, out, time.time())
        if n == 0:
            return 0
        seq.logical_blocks = list(out[:n])
        seq.num_computed_tokens = n * self.block_size
        self._seq_shared[seq.seq_id] = n
        return seq.num_computed_tokens

    def cache_seq_blocks(self, seq):
        num_full = seq.num_computed_tokens // self.block_size
        if num_full <= self._seq_shared.get(seq.seq_id, 0):
            return
        ids = self._salted_ids(seq)
        blocks = (ctypes.c_int64 * num_full)(*seq.logical_blocks[:num_full])
        self._lib.trie_insert(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(ids), blocks, num_full, time.time())
        self._seq_shared[seq.seq_id] = num_full

    def release_seq(self, seq):
        self._seq_shared.pop(seq.seq_id, None)
        self.block_manager.free_seq(seq)

    def evict(self, need_blocks: int) -> int:
        return self._lib.trie_evict(self._h, need_blocks)

    @property
    def num_cached_blocks(self) -> int:
        return self._lib.trie_num_nodes(self._h)
