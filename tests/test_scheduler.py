"""Scheduler unit tests with tiny configs — no model, no accelerator.

Model: reference tests/pytorch/paging/test_scheduler.py:16-80 (drives state transitions
directly with 4-blocks-of-16 style configs).
"""
import pytest

from lmdeploy_tpu.config import CacheConfig, SchedulerConfig
from lmdeploy_tpu.paging.scheduler import Scheduler
from lmdeploy_tpu.paging.seq import MessageStatus, SamplingParams


def make_scheduler(num_blocks=16, block_size=16, max_batch=8,
                   max_prefill_tokens=64, prefix_caching=False):
    cache = CacheConfig(block_size=block_size, num_gpu_blocks=num_blocks,
                        enable_prefix_caching=prefix_caching)
    sched_cfg = SchedulerConfig(max_batch_size=max_batch, max_session_len=512,
                                max_prefill_token_num=max_prefill_tokens,
                                max_prefill_batch=4)
    return Scheduler(sched_cfg, cache)


def add_seq(sched, session_id, num_tokens):
    sched.add_session(session_id)
    session = sched.seq_manager.get_session(session_id)
    return session.add_sequence(list(range(num_tokens)), SamplingParams())


def run_prefill_to_completion(sched, max_iters=50):
    """Drive prefill chunks until no WAITING seqs remain."""
    for _ in range(max_iters):
        if not sched.waiting:
            return
        out = sched.schedule()
        assert out.is_prefill
        for chunk in out.prefill_chunks:
            sched.on_prefill_done(chunk, next_token=7 if chunk.is_last else None)


def test_prefill_admission():
    sched = make_scheduler()
    seq = add_seq(sched, 1, 20)
    out = sched.schedule()
    assert out.is_prefill
    assert len(out.prefill_chunks) == 1
    chunk = out.prefill_chunks[0]
    assert chunk.start == 0 and chunk.length == 20 and chunk.is_last
    assert len(seq.logical_blocks) == 2
    sched.on_prefill_done(chunk, next_token=5)
    assert seq.status == MessageStatus.RUNNING
    assert seq.num_computed_tokens == 20
    assert seq.output_ids == [5]


def test_chunked_prefill():
    sched = make_scheduler(max_prefill_tokens=16)
    seq = add_seq(sched, 1, 40)   # needs 3 chunks of 16/16/8
    out1 = sched.schedule()
    c1 = out1.prefill_chunks[0]
    assert (c1.start, c1.length, c1.is_last) == (0, 16, False)
    sched.on_prefill_done(c1, None)
    out2 = sched.schedule()
    c2 = out2.prefill_chunks[0]
    assert (c2.start, c2.length, c2.is_last) == (16, 16, False)
    sched.on_prefill_done(c2, None)
    out3 = sched.schedule()
    c3 = out3.prefill_chunks[0]
    assert (c3.start, c3.length, c3.is_last) == (32, 8, True)
    sched.on_prefill_done(c3, 9)
    assert seq.status == MessageStatus.RUNNING
    assert seq.num_computed_tokens == 40


def test_decode_scheduling():
    sched = make_scheduler()
    add_seq(sched, 1, 20)
    add_seq(sched, 2, 10)
    run_prefill_to_completion(sched)
    out = sched.schedule()
    assert not out.is_prefill
    assert len(out.decode_seqs) == 2
    for seq in out.decode_seqs:
        before = seq.num_computed_tokens
        sched.on_decode_done(seq, 3)
        assert seq.num_computed_tokens == before + 1


def test_decode_preemption_on_oom():
    # 8 blocks of 16 => 7 usable. two seqs of 48 tokens (3 blocks each) fill 6.
    sched = make_scheduler(num_blocks=8, max_prefill_tokens=64)
    s1 = add_seq(sched, 1, 47)
    s2 = add_seq(sched, 2, 47)
    run_prefill_to_completion(sched)
    assert len(sched.running) == 2
    # grow both seqs to the block boundary so each needs a new block
    for seq in (s1, s2):
        while seq.num_computed_tokens < 48:
            sched.on_decode_done(seq, 3)
    out = sched.schedule()
    # only one block free: the younger seq must have been preempted
    assert len(out.decode_seqs) == 1
    assert out.decode_seqs[0] is s1
    assert s2.status == MessageStatus.WAITING
    assert s2.num_computed_tokens == 0 and s2.logical_blocks == []


def test_forward_progress_oldest_never_starves():
    sched = make_scheduler(num_blocks=6, max_prefill_tokens=128)
    s1 = add_seq(sched, 1, 30)
    out = sched.schedule()
    sched.on_prefill_done(out.prefill_chunks[0], 1)
    # a huge seq that cannot fit even with s1 evicted stays WAITING
    s2 = add_seq(sched, 2, 100)
    out = sched.schedule()
    # admission failed for s2 (needs 7 blocks, only 5 exist)
    assert out.is_prefill is True and len(out.prefill_chunks) == 0 \
        or not out.is_prefill


def test_end_session_releases_blocks():
    sched = make_scheduler()
    add_seq(sched, 1, 32)
    run_prefill_to_completion(sched)
    free_before = sched.block_manager.num_free_blocks
    sched.end_session(1)
    assert sched.block_manager.num_free_blocks > free_before
    assert not sched.has_unfinished()


def test_stop_and_release():
    sched = make_scheduler()
    seq = add_seq(sched, 1, 20)
    run_prefill_to_completion(sched)
    sched.stop_seq(seq)
    sched.release_stopped()
    assert seq.status == MessageStatus.ENDED
    assert sched.block_manager.num_free_blocks == sched.block_manager.num_blocks - 1
