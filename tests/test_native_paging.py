"""Native (C++) block manager / prefix trie — parity with the Python implementations."""
import numpy as np
import pytest

from lmdeploy_tpu.paging.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='no C++ toolchain available')


def make_seq(tokens, block_size=16):
    from lmdeploy_tpu.paging.seq import SamplingParams, SchedulerSession
    session = SchedulerSession(1, block_size)
    return session.add_sequence(list(tokens), SamplingParams())


def test_native_alloc_free_refcounts():
    from lmdeploy_tpu.paging.native import NativeBlockManager
    bm = NativeBlockManager(8, 16)
    assert bm.num_free_blocks == 7
    blocks = bm.allocate(3)
    assert len(set(blocks)) == 3 and 0 not in blocks
    bm.add_ref(blocks)
    bm.free(blocks)
    assert bm.num_free_blocks == 4       # still referenced
    bm.free(blocks)
    assert bm.num_free_blocks == 7
    with pytest.raises(AssertionError):
        bm.free(blocks)                  # double free detected


def test_native_seq_allocation():
    from lmdeploy_tpu.paging.native import NativeBlockManager
    bm = NativeBlockManager(8, 16)
    seq = make_seq(range(33))
    assert bm.num_required_blocks(seq) == 3
    assert bm.allocate_for_seq(seq)
    assert len(seq.logical_blocks) == 3
    bm.free_seq(seq)
    assert bm.num_free_blocks == 7


def test_native_trie_match_insert_evict():
    from lmdeploy_tpu.config import CacheConfig
    from lmdeploy_tpu.paging.native import NativeBlockManager, NativeBlockTrie
    bm = NativeBlockManager(32, 16)
    cfg = CacheConfig(block_size=16, num_gpu_blocks=32, enable_prefix_caching=True)
    trie = NativeBlockTrie(cfg, bm)

    seq = make_seq(range(40))            # 2 full blocks + 8 tokens
    assert bm.allocate_for_seq(seq)
    seq.num_computed_tokens = 40
    trie.cache_seq_blocks(seq)
    assert trie.num_cached_blocks == 2

    # identical prefix matches both full blocks
    seq2 = make_seq(range(40))
    matched = trie.match_prefix(seq2)
    assert matched == 32
    assert seq2.logical_blocks == seq.logical_blocks[:2]
    assert bm.ref_count[seq2.logical_blocks[0]] == 3   # seq + trie + seq2

    # divergent prefix does not match
    seq3 = make_seq([99] * 40)
    assert trie.match_prefix(seq3) == 0

    # release both users; evict the cached leaves
    trie.release_seq(seq)
    trie.release_seq(seq2)
    free_before = bm.num_free_blocks
    assert trie.evict(2) == 2
    assert bm.num_free_blocks == free_before + 2
    assert trie.num_cached_blocks == 0


def test_native_scheduler_e2e():
    """Scheduler runs with the native backend and preserves semantics."""
    from lmdeploy_tpu.config import CacheConfig, SchedulerConfig
    from lmdeploy_tpu.paging.scheduler import Scheduler
    from lmdeploy_tpu.paging.seq import MessageStatus, SamplingParams
    cache = CacheConfig(block_size=16, num_gpu_blocks=16,
                        enable_prefix_caching=True)
    sched = Scheduler(SchedulerConfig(max_batch_size=8, max_session_len=512,
                                      max_prefill_token_num=64,
                                      max_prefill_batch=4), cache,
                      use_native=True)
    assert sched.is_native
    sched.add_session(1)
    seq = sched.seq_manager.get_session(1).add_sequence(
        list(range(20)), SamplingParams())
    out = sched.schedule()
    assert out.is_prefill and len(out.prefill_chunks) == 1
    sched.on_prefill_done(out.prefill_chunks[0], 5)
    assert seq.status == MessageStatus.RUNNING
    # prefix reuse: same prompt in a second session matches the first full block
    sched.add_session(2)
    seq2 = sched.seq_manager.get_session(2).add_sequence(
        list(range(20)), SamplingParams())
    out2 = sched.schedule()
    chunk = out2.prefill_chunks[0]
    assert chunk.start == 16 and chunk.length == 4    # 1 block reused
    sched.end_session(1)
    sched.end_session(2)
