"""Incremental SSE-time tool-call / reasoning parsing.

Reference analog: lmdeploy/serve/parsers/response_parser.py streaming deltas
(VERDICT r3 missing #5: post-hoc parsing cannot emit tool_call delta frames).
"""
import json

import pytest

from lmdeploy_tpu.serve.stream_parser import (REGISTRY, StreamParser,
                                              resolve_parser)


def drive(spec_name, text, step=3, tools=True):
    """Feed text in small chunks; collect events incl. the finish flush."""
    p = StreamParser(REGISTRY[spec_name], tools_enabled=tools)
    events = []
    for i in range(0, len(text), step):
        events += p.push(text[i:i + step])
    events += p.finish()
    return p, events


def collect(events):
    content = ''.join(e[1] for e in events if e[0] == 'content')
    reasoning = ''.join(e[1] for e in events if e[0] == 'reasoning')
    calls = {}
    for e in events:
        if e[0] == 'tool_name':
            calls.setdefault(e[1], {'name': e[3], 'args': ''})
        elif e[0] == 'tool_args':
            calls.setdefault(e[1], {'name': None, 'args': ''})
            calls[e[1]]['args'] += e[2]
    return content, reasoning, calls


@pytest.mark.parametrize('step', [1, 3, 7, 1000])
def test_hermes_tool_call_streams_incrementally(step):
    text = ('I will check.\n<tool_call>\n{"name": "get_weather", "arguments": '
            '{"city": "Paris", "unit": "C"}}\n</tool_call>done')
    p, ev = drive('hermes', text, step=step)
    content, _, calls = collect(ev)
    assert 'I will check.' in content and 'done' in content
    assert '<tool_call>' not in content
    assert calls[0]['name'] == 'get_weather'
    assert json.loads(calls[0]['args']) == {'city': 'Paris', 'unit': 'C'}
    assert p.saw_tool_call
    if step <= 7:
        # arguments must arrive as MULTIPLE incremental frames, not one blob
        arg_frames = [e for e in ev if e[0] == 'tool_args']
        assert len(arg_frames) > 1


def test_hermes_args_frames_precede_block_close():
    """The point of streaming: argument fragments are emitted while the tool
    block is still open (before </tool_call> has been seen)."""
    p = StreamParser(REGISTRY['hermes'])
    ev = p.push('<tool_call>{"name": "f", "arguments": {"x": 1')
    kinds = [e[0] for e in ev]
    assert 'tool_name' in kinds and 'tool_args' in kinds
    ev2 = p.push('}}</tool_call>')
    _, _, calls = collect(ev + ev2 + p.finish())
    assert json.loads(calls[0]['args']) == {'x': 1}


def test_marker_split_across_deltas_never_leaks():
    """A marker split across detokenizer increments must not reach content."""
    for step in (1, 2, 3, 5):
        _, ev = drive('hermes', 'abc<tool_call>{"name":"f","arguments":{}}'
                                '</tool_call>xyz', step=step)
        content, _, calls = collect(ev)
        assert content == 'abcxyz', (step, content)
        assert calls[0]['name'] == 'f'


def test_think_reasoning_streams():
    _, ev = drive('hermes', '<think>step by step</think>The answer is 4.',
                  step=4)
    content, reasoning, _ = collect(ev)
    assert reasoning == 'step by step'
    assert content == 'The answer is 4.'


def test_unterminated_think_flushes_as_reasoning():
    _, ev = drive('hermes', '<think>still going', step=5)
    content, reasoning, _ = collect(ev)
    assert reasoning == 'still going' and content == ''


def test_tools_disabled_passes_markers_through():
    text = '<tool_call>{"name":"f"}</tool_call>'
    _, ev = drive('hermes', text, tools=False)
    content, _, calls = collect(ev)
    assert content == text and not calls


def test_internlm2_action_markers():
    text = ('<|action_start|><|plugin|>{"name": "search", "parameters": '
            '{"q": "tpu"}}<|action_end|>')
    _, ev = drive('internlm2', text, step=6)
    _, _, calls = collect(ev)
    assert calls[0]['name'] == 'search'
    assert json.loads(calls[0]['args']) == {'q': 'tpu'}


def test_qwen3coder_xml_function():
    text = ('<function=run_tests>\n<parameter=path>\ntests/\n</parameter>\n'
            '<parameter=verbose>\ntrue\n</parameter>\n</function>')
    _, ev = drive('qwen3coder', text, step=5)
    _, _, calls = collect(ev)
    assert calls[0]['name'] == 'run_tests'
    assert json.loads(calls[0]['args']) == {'path': 'tests/',
                                            'verbose': 'true'}


def test_glm47_kv_payload():
    text = ('<tool_call>get_time\n<arg_key>tz</arg_key>'
            '<arg_value>UTC</arg_value></tool_call>')
    _, ev = drive('glm47', text, step=4)
    _, _, calls = collect(ev)
    assert calls[0]['name'] == 'get_time'
    assert json.loads(calls[0]['args']) == {'tz': 'UTC'}


def test_harmony_channels_stream():
    text = ('<|channel|>analysis<|message|>let me think<|end|>'
            '<|channel|>commentary to=functions.lookup<|message|>'
            '{"k": "v"}<|call|>'
            '<|channel|>final<|message|>Here you go.<|return|>')
    _, ev = drive('harmony', text, step=6)
    content, reasoning, calls = collect(ev)
    assert reasoning == 'let me think'
    assert content == 'Here you go.'
    assert calls[0]['name'] == 'lookup'
    assert json.loads(calls[0]['args']) == {'k': 'v'}


def test_multiple_tool_calls_get_distinct_indices():
    text = ('<tool_call>{"name":"a","arguments":{}}</tool_call>'
            '<tool_call>{"name":"b","arguments":{"z":2}}</tool_call>')
    _, ev = drive('hermes', text, step=9)
    _, _, calls = collect(ev)
    assert calls[0]['name'] == 'a' and calls[1]['name'] == 'b'
    assert json.loads(calls[1]['args']) == {'z': 2}


def test_resolve_parser_registry():
    assert resolve_parser('GptOssForCausalLM').name == 'harmony'
    assert resolve_parser('InternLM2ForCausalLM').name == 'internlm2'
    assert resolve_parser('NoSuchArch').name == 'hermes'
    assert resolve_parser('LlamaForCausalLM', override='llama3').name == 'llama3'


def test_sse_stream_emits_tool_call_delta_frames(tiny_model_dir):
    """E2E (VERDICT done criterion): drive the REAL server stack — engine,
    detokenizer, stream parser, SSE — and assert tool_call delta frames appear
    in the wire stream.  A regex_schema guide forces the tiny random model to
    emit an exact hermes tool-call block."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from lmdeploy_tpu.messages import TpuEngineConfig
    from lmdeploy_tpu.serve.api_server import create_app
    from lmdeploy_tpu.serve.async_engine import AsyncEngine

    literal = ('<tool_call>\\{"name": "ping", "arguments": \\{"n": 1\\}\\}'
               '</tool_call>')
    loop = asyncio.new_event_loop()
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=96,
                          max_batch_size=4, session_len=768,
                          max_prefill_token_num=256)
    engine = AsyncEngine(tiny_model_dir, backend_config=cfg)
    app = create_app(engine, 'tiny-test')

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post('/v1/chat/completions', json={
                'model': 'tiny-test',
                'messages': [{'role': 'user', 'content': 'call ping'}],
                'max_tokens': 64, 'temperature': 0, 'stream': True,
                'tools': [{'type': 'function',
                           'function': {'name': 'ping', 'parameters': {}}}],
                'response_format': {'type': 'regex_schema',
                                    'regex_schema': literal}})
            assert r.status == 200
            raw = (await r.read()).decode()
        finally:
            await client.close()
        return raw

    try:
        raw = loop.run_until_complete(run())
    finally:
        engine.close()
        loop.close()

    frames = [json.loads(line[6:]) for line in raw.splitlines()
              if line.startswith('data: ') and line != 'data: [DONE]']
    tc_frames = [f for f in frames
                 if f['choices'][0]['delta'].get('tool_calls')]
    assert tc_frames, raw
    name = tc_frames[0]['choices'][0]['delta']['tool_calls'][0]['function']['name']
    assert name == 'ping'
    args = ''.join(
        tc['function'].get('arguments', '')
        for f in tc_frames for tc in f['choices'][0]['delta']['tool_calls'])
    assert json.loads(args) == {'n': 1}
