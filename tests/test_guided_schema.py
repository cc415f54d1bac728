"""Schema-constrained guided decoding (json_schema response format)."""
import json

import pytest

from lmdeploy_tpu.guided_schema import SchemaGuide, compile_schema


def machine(schema):
    g = SchemaGuide.__new__(SchemaGuide)
    g.nodes = compile_schema(schema)
    g.frontier = ((('val', 0),),)
    return g


def accepts(schema, text):
    g = machine(schema)
    return bool(g._advance_frontier(g.frontier, text))


def completes(schema, text):
    g = machine(schema)
    g.frontier = g._advance_frontier(g.frontier, text)
    return bool(g.frontier) and g._is_complete()


OBJ = {'type': 'object',
       'properties': {'name': {'type': 'string'},
                      'age': {'type': 'integer'}},
       'required': ['name', 'age']}


class TestObjectSchema:
    def test_full_match(self):
        assert completes(OBJ, '{"name": "bob", "age": 33}')

    def test_prefixes_accepted(self):
        for p in ['{', '{"', '{"name', '{"name":', '{"name": "b',
                  '{"name": "bob", ', '{"name": "bob", "age": 3']:
            assert accepts(OBJ, p), p

    def test_wrong_key_rejected(self):
        assert not accepts(OBJ, '{"nope')
        assert not accepts(OBJ, '{"namex')

    def test_key_order_enforced(self):
        assert not accepts(OBJ, '{"age')

    def test_required_key_cannot_be_skipped(self):
        assert not accepts(OBJ, '{}')
        assert not accepts(OBJ, '{"name": "bob"}')

    def test_wrong_value_type_rejected(self):
        assert not accepts(OBJ, '{"name": 3')
        assert not accepts(OBJ, '{"age": "x"')   # also wrong order
        assert not accepts(OBJ, '{"name": "b", "age": "x"')
        assert not accepts(OBJ, '{"name": "b", "age": 3.5')

    def test_optional_property_skippable(self):
        sch = {'type': 'object',
               'properties': {'a': {'type': 'integer'},
                              'b': {'type': 'string'}},
               'required': ['b']}
        assert completes(sch, '{"b": "x"}')
        assert completes(sch, '{"a": 1, "b": "x"}')
        assert not accepts(sch, '{"a": 1}')


class TestOtherTypes:
    def test_array_items(self):
        sch = {'type': 'array', 'items': {'type': 'integer'}}
        assert completes(sch, '[1, 2, 3]')
        assert completes(sch, '[]')
        assert not accepts(sch, '["a"')

    def test_array_min_max(self):
        sch = {'type': 'array', 'items': {'type': 'integer'},
               'minItems': 2, 'maxItems': 3}
        assert not completes(sch, '[1]')
        assert completes(sch, '[1,2]')
        assert completes(sch, '[1,2,3]')
        assert not accepts(sch, '[1,2,3,')
        assert not accepts(sch, '[]')

    def test_enum(self):
        sch = {'enum': ['red', 'green', 42]}
        assert completes(sch, '"red"')
        assert completes(sch, '"green"')
        assert completes(sch, '42')
        assert not accepts(sch, '"blue"')
        assert accepts(sch, '"gre')

    def test_const_and_boolean_null(self):
        assert completes({'const': {'ok': True}}, '{"ok":true}')
        assert completes({'type': 'boolean'}, 'true')
        assert completes({'type': 'boolean'}, 'false')
        assert completes({'type': 'null'}, 'null')
        assert not accepts({'type': 'boolean'}, 'nul')

    def test_union(self):
        sch = {'anyOf': [{'type': 'integer'}, {'type': 'string'}]}
        assert completes(sch, '7')
        assert completes(sch, '"x"')
        assert not accepts(sch, 'tr')

    def test_nested(self):
        sch = {'type': 'object',
               'properties': {
                   'tags': {'type': 'array', 'items': {'type': 'string'}},
                   'meta': {'type': 'object',
                            'properties': {'id': {'type': 'integer'}},
                            'required': ['id']}},
               'required': ['tags', 'meta']}
        assert completes(sch, '{"tags": ["a", "b"], "meta": {"id": 5}}')
        assert not accepts(sch, '{"tags": [1')
        assert not accepts(sch, '{"tags": [], "meta": {"id": "s"')

    def test_any_fallback(self):
        sch = {'type': 'object',
               'properties': {'x': {}},
               'required': ['x']}
        for v in ['1', '"s"', '[1, {"k": null}]', '{"a": true}']:
            assert completes(sch, '{"x": %s}' % v), v

    def test_number_vs_integer(self):
        assert completes({'type': 'number'}, '3.25')
        assert completes({'type': 'number'}, '-1e5')
        assert completes({'type': 'integer'}, '-12')
        assert not accepts({'type': 'integer'}, '1.')

    def test_string_escapes(self):
        sch = {'type': 'string'}
        assert completes(sch, '"a\\nb"')
        assert not accepts(sch, '"a\\x')


def test_e2e_json_schema(tiny_model_dir):
    """response_format=json_schema must force the declared structure from
    random weights (reference: guided_process.py schema compilation)."""
    import asyncio
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.tokenizer import Tokenizer

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=160,
                          max_prefill_token_num=64)
    tok = Tokenizer(tiny_model_dir)
    eng = Engine.from_pretrained(tiny_model_dir, cfg, tokenizer=tok)
    schema = {'type': 'object',
              'properties': {'ok': {'type': 'boolean'},
                             'n': {'type': 'integer'}},
              'required': ['ok', 'n']}
    try:
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, tok.encode('emit json:'),
                GenerationConfig(
                    max_new_tokens=40, do_sample=True, temperature=1.0,
                    random_seed=11,
                    response_format={'type': 'json_schema',
                                     'json_schema': {'name': 't',
                                                     'schema': schema}}))
            await inst.async_end(1)
            return out.token_ids

        loop = asyncio.new_event_loop()
        try:
            ids = loop.run_until_complete(run())
        finally:
            loop.close()
        text = tok.decode(ids)
        # every emitted prefix must be valid under the schema machine
        g = machine(schema)
        frontier = g._advance_frontier(g.frontier, text)
        assert frontier, f'schema violated: {text!r}'
        # structure is forced: object opens with the first required key
        assert text.lstrip().startswith('{')
        assert '"ok"' in text
    finally:
        eng.close()


def test_json_schema_requires_schema(tiny_model_dir):
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
            with pytest.raises(ValueError, match='json_schema'):
                await inst.async_infer(
                    2, [1, 2, 3],
                    GenerationConfig(max_new_tokens=4,
                                     response_format={'type': 'json_schema'}))
        loop = asyncio.new_event_loop()
        try:
            loop.run_until_complete(run())
        finally:
            loop.close()
    finally:
        eng.close()
