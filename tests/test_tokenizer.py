"""Incremental detokenization state machine tests."""
import pytest

from lmdeploy_tpu.tokenizer import DetokenizeState, Tokenizer


@pytest.fixture(scope='module')
def tok(tiny_model_dir):
    return Tokenizer(tiny_model_dir)


def test_roundtrip(tok):
    text = 'hello world this is a test'
    ids = tok.encode(text, add_bos=False)
    assert tok.decode(ids) == text


def test_incremental_matches_full(tok):
    text = 'hello world this is a tiny test corpus hello'
    ids = tok.encode(text, add_bos=False)
    state = DetokenizeState()
    pieces = []
    for i in range(1, len(ids) + 1):
        piece, state = tok.detokenize_incrementally(ids[:i], state)
        pieces.append(piece)
    assert ''.join(pieces) == tok.decode(ids)


def test_incremental_never_emits_replacement_char(tok):
    ids = tok.encode('hello world ' * 5, add_bos=False)
    state = DetokenizeState()
    for i in range(1, len(ids) + 1):
        piece, state = tok.detokenize_incrementally(ids[:i], state)
        assert '�' not in piece
