"""Guided decoding: JSON PDA + end-to-end json_object generation."""
import json

import numpy as np
import pytest

from lmdeploy_tpu.guided import (JsonState, advance_string, is_complete)


def valid(text):
    return advance_string(JsonState(), text) is not None


def complete(text):
    st = advance_string(JsonState(), text)
    return st is not None and is_complete(st)


def test_pda_accepts_valid_json_prefixes():
    for text in ['{', '{"a"', '{"a": 1', '{"a": [1, 2', '[', '[{"x": "y"}',
                 '"hel', '12.5e', 'tru', '{"a": nul', '  {  "k" : ']:
        assert valid(text), text


def test_pda_rejects_invalid():
    for text in ['}', '{,', '{"a" 1', '{"a": 1,,', '[1 2]', 'truthy', '{"a"}',
                 '{1: 2}', '{"a": }', ']']:
        assert not valid(text), text


def test_pda_completion():
    for text in ['{}', '{"a": 1}', '[1, 2, 3]', '"hi"', 'true', 'null',
                 '{"a": {"b": []}}', '42']:
        assert complete(text), text
    for text in ['{', '{"a":', '[1,', '"unterminated', 'tr']:
        assert not complete(text), text


def test_e2e_json_mode(tiny_model_dir):
    """response_format=json_object must yield parseable JSON from random weights."""
    import asyncio
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.tokenizer import Tokenizer

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=160,
                          max_prefill_token_num=64)
    tok = Tokenizer(tiny_model_dir)
    eng = Engine.from_pretrained(tiny_model_dir, cfg, tokenizer=tok)
    try:
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, tok.encode('emit json:'),
                GenerationConfig(max_new_tokens=48, do_sample=True,
                                 temperature=1.0, top_k=0, random_seed=7,
                                 response_format={'type': 'json_object'}))
            await inst.async_end(1)
            return out.token_ids

        loop = asyncio.new_event_loop()
        try:
            ids = loop.run_until_complete(run())
        finally:
            loop.close()
        text = tok.decode(ids)
        # either ended naturally (complete JSON) or hit the length cap mid-value;
        # every prefix must be PDA-valid JSON
        from lmdeploy_tpu.guided import JsonState, advance_string
        assert advance_string(JsonState(), text) is not None, text
        if len(ids) < 48:   # stopped via eos => must be complete JSON
            json.loads(text)
    finally:
        eng.close()
