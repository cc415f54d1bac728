"""Tool-call and reasoning parsers."""
import json

from lmdeploy_tpu.serve.parsers import (format_tools_system, parse_reasoning,
                                        parse_response, parse_tool_calls)


def test_tool_call_extraction():
    text = ('I will check the weather.\n'
            '<tool_call>\n{"name": "get_weather", "arguments": {"city": "Paris"}}'
            '\n</tool_call>')
    remaining, calls = parse_tool_calls(text)
    assert remaining == 'I will check the weather.'
    assert len(calls) == 1
    assert calls[0].name == 'get_weather'
    assert json.loads(calls[0].arguments) == {'city': 'Paris'}
    assert calls[0].id.startswith('call_')


def test_multiple_and_malformed_tool_calls():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>not json</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    remaining, calls = parse_tool_calls(text)
    assert [c.name for c in calls] == ['a', 'b']
    assert 'not json' in remaining        # malformed block left in text


def test_internlm2_action_format():
    text = ('<|action_start|><|plugin|>{"name": "search", "arguments": '
            '{"q": "tpu"}}<|action_end|>')
    _, calls = parse_tool_calls(text)
    assert calls[0].name == 'search'


def test_reasoning_split():
    r, c = parse_reasoning('<think>step 1, step 2</think>The answer is 4.')
    assert r == 'step 1, step 2'
    assert c == 'The answer is 4.'
    # unterminated block = all reasoning (length-capped generation)
    r, c = parse_reasoning('<think>still thinking about')
    assert r == 'still thinking about' and c == ''
    r, c = parse_reasoning('plain answer')
    assert r is None and c == 'plain answer'


def test_full_pipeline():
    text = ('<think>I should call the tool.</think>'
            'Sure. <tool_call>{"name": "f", "arguments": {}}</tool_call>')
    out = parse_response(text)
    assert out['reasoning_content'] == 'I should call the tool.'
    assert out['content'] == 'Sure.'
    assert out['tool_calls'][0]['function']['name'] == 'f'


def test_tools_system_prompt():
    prompt = format_tools_system([
        {'type': 'function',
         'function': {'name': 'get_weather', 'parameters': {}}}])
    assert '<tools>' in prompt and 'get_weather' in prompt
    assert '<tool_call>' in prompt


class TestHarmony:
    def test_analysis_and_final(self):
        from lmdeploy_tpu.serve.parsers import parse_response
        text = ('<|channel|>analysis<|message|>Let me think about it.<|end|>'
                '<|start|>assistant<|channel|>final<|message|>The answer is 4.'
                '<|return|>')
        out = parse_response(text)
        assert out['reasoning_content'] == 'Let me think about it.'
        assert out['content'] == 'The answer is 4.'
        assert out['tool_calls'] is None

    def test_tool_call(self):
        from lmdeploy_tpu.serve.parsers import parse_response
        text = ('<|channel|>analysis<|message|>Need the weather.<|end|>'
                '<|start|>assistant<|channel|>commentary to=functions.get_weather '
                '<|constrain|>json<|message|>{"location": "SF"}<|call|>')
        out = parse_response(text)
        assert out['reasoning_content'] == 'Need the weather.'
        tc = out['tool_calls']
        assert tc and tc[0]['function']['name'] == 'get_weather'
        import json
        assert json.loads(tc[0]['function']['arguments']) == {'location': 'SF'}

    def test_unterminated_final(self):
        from lmdeploy_tpu.serve.parsers import parse_response
        text = '<|channel|>final<|message|>partial answer'
        out = parse_response(text)
        assert out['content'] == 'partial answer'
