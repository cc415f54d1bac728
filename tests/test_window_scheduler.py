"""Sliding-window block eviction + TTFT-aware prefill reordering.

Reference analogs: ``lmdeploy/pytorch/paging/block_manager/window_block_manager.py``
(out-of-window KV blocks freed eagerly) and ``lmdeploy/pytorch/paging/
scheduler.py:85`` (``_PrefillReorderer`` TTFT-optimizing prefill ordering).
"""
import json
import os

import numpy as np
import pytest

from lmdeploy_tpu.config import CacheConfig, SchedulerConfig
from lmdeploy_tpu.messages import QuantPolicy
from lmdeploy_tpu.paging.scheduler import Scheduler
from lmdeploy_tpu.paging.seq import SamplingParams


def make_sched(window=None, num_blocks=32, block_size=16, reorder=False,
               aging=10.0, **sched_kw):
    cache = CacheConfig(block_size=block_size, num_gpu_blocks=num_blocks,
                        num_cpu_blocks=0, quant_policy=QuantPolicy.NONE,
                        enable_prefix_caching=False, window_size=window)
    sched_cfg = SchedulerConfig(max_batch_size=8, max_prefill_token_num=64,
                                prefill_reorder=reorder, prefill_aging_s=aging,
                                **sched_kw)
    # python managers: deterministic ids for assertions
    return Scheduler(sched_cfg, cache, use_native=False)


def add_seq(sched, session_id, n_tokens):
    sched.add_session(session_id)
    session = sched.seq_manager.get_session(session_id)
    return session.add_sequence(list(range(n_tokens)), SamplingParams())


def drive_prefill(sched):
    """Run prefill scheduling rounds to completion, returning admission order."""
    order = []
    for _ in range(32):
        out = sched.schedule()
        if not out.prefill_chunks:
            break
        for ch in out.prefill_chunks:
            if ch.seq not in order:
                order.append(ch.seq)
            sched.on_prefill_done(ch, 1 if ch.is_last else None)
    return order


class TestWindowEviction:

    def test_blocks_freed_beyond_window(self):
        sched = make_sched(window=32, block_size=16)
        seq = add_seq(sched, 1, 40)            # prompt 40 tokens
        drive_prefill(sched)
        free0 = sched.block_manager.num_free_blocks
        # decode far past the window: blocks whose last token <= n-32 die
        for _ in range(40):
            sched.schedule()
            sched.on_decode_done(seq, 7)
        # 80 tokens computed, window 32 -> dead = (80-32+1)//16 = 3 blocks
        assert seq.num_window_freed == 3
        assert seq.logical_blocks[:3] == [0, 0, 0]
        assert all(b > 0 for b in seq.logical_blocks[3:])
        assert sched.block_manager.num_free_blocks > free0 - 3

    def test_prompt_longer_than_window_freed_during_prefill(self):
        sched = make_sched(window=32, block_size=16)
        seq = add_seq(sched, 1, 120)           # chunked prefill (budget 64)
        drive_prefill(sched)
        # 121 computed; dead = (121-32+1)//16 = 5
        assert seq.num_window_freed == 5
        assert seq.logical_blocks[:5] == [0] * 5

    def test_window_capped_steady_state_memory(self):
        """Live blocks stay bounded by ~window/block_size regardless of length."""
        sched = make_sched(window=32, block_size=16, num_blocks=16)
        seq = add_seq(sched, 1, 16)
        drive_prefill(sched)
        for _ in range(400):                  # 400 decode tokens >> 15 blocks
            out = sched.schedule()
            assert seq in out.decode_seqs, 'must never stall: window frees blocks'
            sched.on_decode_done(seq, 7)
        live = sum(1 for b in seq.logical_blocks if b > 0)
        assert live <= (32 // 16) + 2

    def test_preemption_recompute_resets_window_state(self):
        sched = make_sched(window=32, block_size=16)
        seq = add_seq(sched, 1, 80)
        drive_prefill(sched)
        assert seq.num_window_freed > 0
        sched._preempt(seq)
        assert seq.num_window_freed == 0
        assert seq.logical_blocks == []
        # every block returned exactly once: full pool again (minus pad 0)
        assert sched.block_manager.num_free_blocks == 31

    def test_uniform_window_gating_from_model_config(self):
        from lmdeploy_tpu.config import ModelConfig
        mistral = ModelConfig.from_hf_config(
            {'architectures': ['MistralForCausalLM'], 'model_type': 'mistral',
             'hidden_size': 64, 'intermediate_size': 128,
             'num_hidden_layers': 2, 'num_attention_heads': 4,
             'num_key_value_heads': 2, 'vocab_size': 256,
             'sliding_window': 4096})
        assert mistral.window_uniform
        gemma2 = ModelConfig.from_hf_config(
            {'architectures': ['Gemma2ForCausalLM'], 'model_type': 'gemma2',
             'hidden_size': 64, 'intermediate_size': 128,
             'num_hidden_layers': 2, 'num_attention_heads': 4,
             'num_key_value_heads': 2, 'head_dim': 16, 'vocab_size': 256,
             'sliding_window': 4096})
        assert not gemma2.window_uniform
        gpt_oss_like = ModelConfig.from_hf_config(
            {'architectures': ['GptOssForCausalLM'], 'model_type': 'gpt_oss',
             'hidden_size': 64, 'intermediate_size': 128,
             'num_hidden_layers': 2, 'num_attention_heads': 4,
             'num_key_value_heads': 2, 'head_dim': 16, 'vocab_size': 256,
             'sliding_window': 128,
             'layer_types': ['sliding_attention', 'full_attention']})
        assert not gpt_oss_like.window_uniform


class TestPrefillReorder:

    def test_fcfs_by_default_off(self):
        sched = make_sched(reorder=False)
        long = add_seq(sched, 1, 60)
        short = add_seq(sched, 2, 4)
        order = drive_prefill(sched)
        assert order.index(long) < order.index(short)

    def test_shortest_first_when_enabled(self):
        sched = make_sched(reorder=True)
        long = add_seq(sched, 1, 60)
        short = add_seq(sched, 2, 4)
        order = drive_prefill(sched)
        assert order.index(short) < order.index(long)

    def test_aging_promotes_starved_long_request(self):
        sched = make_sched(reorder=True, aging=0.001)   # instant aging
        long = add_seq(sched, 1, 60)
        import time
        time.sleep(0.01)                                # long has waited
        short = add_seq(sched, 2, 4)
        order = drive_prefill(sched)
        # aged long request outranks the fresh short one
        assert order.index(long) < order.index(short)

    def test_mid_prefill_seq_finishes_first(self):
        sched = make_sched(reorder=True, max_prefill_batch=1)
        long = add_seq(sched, 1, 100)                   # needs 2 chunks of 64
        out = sched.schedule()
        assert out.prefill_chunks[0].seq is long
        sched.on_prefill_done(out.prefill_chunks[0], None)
        short = add_seq(sched, 2, 4)
        out = sched.schedule()
        # long is mid-prefill (holds blocks): finish it before admitting short
        assert out.prefill_chunks[0].seq is long
