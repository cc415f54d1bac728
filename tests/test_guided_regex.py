"""Regex-constrained guided decoding (regex_schema response format).

Reference analog: lmdeploy/serve/openai/protocol.py:131-134 +
pytorch/engine/guided_process.py:78 (xgrammar regex compilation).
"""
import numpy as np
import pytest

from conftest import tiny_model_dir  # noqa: F401  (fixture)


class _Tok:
    """Minimal tokenizer stub: token id == index into a fixed string table."""

    def __init__(self, tokens):
        self._tokens = tokens

    def decode(self, ids, **kw):
        return ''.join(self._tokens[i] for i in ids)


def make_guide(pattern, tokens, eos=0):
    from lmdeploy_tpu.guided import JsonGuide
    from lmdeploy_tpu.guided_regex import RegexGuide

    g = RegexGuide.__new__(RegexGuide)
    from lmdeploy_tpu.guided_regex import _NFA, _build, _parse
    g.vocab_size = len(tokens)
    g.eos_token_ids = [eos]
    g.pattern = pattern
    g.nfa = _NFA()
    start, accept = _build(g.nfa, _parse(pattern))
    g.accept = accept
    g.tokens = tokens
    g.frontier = g._closure(frozenset([start]))
    g.dead = False
    return g


def accepts(pattern, text):
    g = make_guide(pattern, [''])
    return bool(g._advance_frontier(g.frontier, text))


def fullmatch(pattern, text):
    g = make_guide(pattern, [''])
    f = g._advance_frontier(g.frontier, text)
    return g.accept in f


class TestRegexSemantics:

    def test_literals_and_classes(self):
        assert fullmatch('abc', 'abc')
        assert not fullmatch('abc', 'ab')
        assert not accepts('abc', 'abd')
        assert fullmatch('[a-c]+', 'abccba')
        assert not accepts('[a-c]+', 'd')
        assert fullmatch('[^0-9]', 'x')
        assert not accepts('[^0-9]', '5')

    def test_escapes(self):
        assert fullmatch(r'\d{3}-\d{4}', '555-0199')
        assert not accepts(r'\d{3}-\d{4}', '55a')
        assert fullmatch(r'\w+\s\w+', 'hello world')
        assert fullmatch(r'a\.b', 'a.b')
        assert not accepts(r'a\.b', 'axb')

    def test_quantifiers(self):
        assert fullmatch('a*', '')
        assert fullmatch('a*', 'aaaa')
        assert fullmatch('a+b?', 'aa')
        assert fullmatch('a+b?', 'aab')
        assert not fullmatch('a+', '')
        assert fullmatch('a{2,3}', 'aa')
        assert fullmatch('a{2,3}', 'aaa')
        assert not fullmatch('a{2,3}', 'a')
        assert not accepts('a{2,3}', 'aaaa')
        assert fullmatch('a{2,}', 'aaaaa')

    def test_alternation_groups(self):
        assert fullmatch('(yes|no)', 'yes')
        assert fullmatch('(yes|no)', 'no')
        assert not accepts('(yes|no)', 'maybe'[0] + 'x')
        assert fullmatch('(?:ab)+', 'abab')
        assert not fullmatch('(?:ab)+', 'aba')
        assert fullmatch('^(a|b)c$', 'ac')

    def test_dot(self):
        assert fullmatch('a.c', 'abc')
        assert not accepts('a.c', 'a\nc')

    def test_errors(self):
        from lmdeploy_tpu.guided_regex import RegexError
        for bad in ('(ab', 'a)', '[ab', '*a', 'a{2,1}'):
            with pytest.raises(RegexError):
                make_guide(bad, [''])


class TestTokenMasks:

    def test_mask_prunes_tokens(self):
        tokens = ['</s>', 'ab', 'cd', 'a', '9', 'abab']
        g = make_guide('(?:ab)+', tokens)
        m = g.allowed_mask()
        assert list(np.nonzero(m)[0]) == [1, 3, 5]   # 'ab', 'a', 'abab'
        assert g.accept_token(1)                      # 'ab'
        m = g.allowed_mask()
        assert m[0]                                   # EOS allowed: complete
        assert m[1] and m[5] and not m[4]

    def test_eos_forced_when_done(self):
        tokens = ['</s>', 'x', 'y']
        g = make_guide('x', tokens)
        assert g.accept_token(1)
        m = g.allowed_mask()
        assert m[0] and not m[1] and not m[2]

    def test_reject_bad_token(self):
        tokens = ['</s>', 'x', 'y']
        g = make_guide('x+', tokens)
        assert not g.accept_token(2)                  # 'y' dies
        assert g.accept_token(1)


def test_e2e_regex_schema(tiny_model_dir):  # noqa: F811
    """response_format=regex_schema forces the pattern from random weights."""
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.guided_regex import RegexGuide
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.tokenizer import Tokenizer

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=160,
                          max_prefill_token_num=64)
    tok = Tokenizer(tiny_model_dir)
    eng = Engine.from_pretrained(tiny_model_dir, cfg, tokenizer=tok)
    pattern = r'(yes|no): \d+'
    try:
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, tok.encode('answer:'),
                GenerationConfig(
                    max_new_tokens=24, do_sample=True, temperature=1.0,
                    random_seed=3,
                    response_format={'type': 'regex_schema',
                                     'regex_schema': pattern}))
            await inst.async_end(1)
            return out.token_ids

        loop = asyncio.new_event_loop()
        try:
            ids = loop.run_until_complete(run())
        finally:
            loop.close()
        text = tok.decode(ids)
        g = RegexGuide(tok, eng.configs.model.vocab_size, [2], pattern)
        assert g._advance_frontier(g.frontier, text), \
            f'regex violated: {text!r}'
        assert text.startswith('yes') or text.startswith('no')
    finally:
        eng.close()


def test_regex_schema_requires_pattern(tiny_model_dir):  # noqa: F811
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.tokenizer import Tokenizer

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=32,
                          max_batch_size=2, session_len=96,
                          max_prefill_token_num=64)
    tok = Tokenizer(tiny_model_dir)
    eng = Engine.from_pretrained(tiny_model_dir, cfg, tokenizer=tok)
    try:
        async def run():
            inst = eng.create_instance()
            with pytest.raises(ValueError, match='regex_schema'):
                await inst.async_infer(
                    1, [5, 6], GenerationConfig(
                        max_new_tokens=4,
                        response_format={'type': 'regex_schema'}))

        loop = asyncio.new_event_loop()
        try:
            loop.run_until_complete(run())
        finally:
            loop.close()
    finally:
        eng.close()
