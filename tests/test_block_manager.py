"""Block manager unit tests (model: reference tests/pytorch/paging/test_block_manager.py)."""
import pytest

from lmdeploy_tpu.paging.block_manager import BlockManager
from lmdeploy_tpu.paging.seq import SamplingParams, SchedulerSession


def make_seq(num_tokens, block_size=16):
    session = SchedulerSession(1, block_size)
    return session.add_sequence(list(range(num_tokens)), SamplingParams())


def test_alloc_free_roundtrip():
    bm = BlockManager(num_blocks=8, block_size=16)
    assert bm.num_free_blocks == 7  # block 0 reserved for padding
    blocks = bm.allocate(3)
    assert len(blocks) == 3 and 0 not in blocks
    assert bm.num_free_blocks == 4
    bm.free(blocks)
    assert bm.num_free_blocks == 7


def test_ref_counting():
    bm = BlockManager(num_blocks=8, block_size=16)
    blocks = bm.allocate(2)
    bm.add_ref(blocks)
    bm.free(blocks)
    assert bm.num_free_blocks == 5  # still referenced
    bm.free(blocks)
    assert bm.num_free_blocks == 7


def test_seq_allocation():
    bm = BlockManager(num_blocks=8, block_size=16)
    seq = make_seq(33)   # needs 3 blocks
    assert bm.num_required_blocks(seq) == 3
    assert bm.allocate_for_seq(seq)
    assert len(seq.logical_blocks) == 3
    # decode growth: 33 tokens + 15 more fit in 3 blocks, 16th needs a 4th
    seq.num_computed_tokens = 33
    assert bm.num_required_blocks(seq, num_new_tokens=15) == 0
    assert bm.num_required_blocks(seq, num_new_tokens=16) == 1


def test_out_of_blocks():
    bm = BlockManager(num_blocks=4, block_size=16)
    seq = make_seq(100)  # needs 7 blocks, only 3 free
    assert not bm.allocate_for_seq(seq)
    assert seq.logical_blocks == []


def test_double_free_asserts():
    bm = BlockManager(num_blocks=8, block_size=16)
    blocks = bm.allocate(1)
    bm.free(blocks)
    with pytest.raises(AssertionError):
        bm.free(blocks)
