"""Chat-template registry tests."""
from lmdeploy_tpu.chat_template import (MODELS, ChatTemplateConfig, best_match_model,
                                        get_chat_template)


def test_registry_has_core_templates():
    for name in ('llama2', 'llama3', 'qwen', 'chatml', 'internlm2', 'base'):
        assert name in MODELS


def test_llama3_messages():
    tmpl = MODELS['llama3']()
    out = tmpl.messages2prompt([
        {'role': 'system', 'content': 'be brief'},
        {'role': 'user', 'content': 'hi'},
    ])
    assert out.startswith('<|begin_of_text|>')
    assert '<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>' in out
    assert out.endswith('<|start_header_id|>assistant<|end_header_id|>\n\n')


def test_chatml_prompt():
    tmpl = MODELS['qwen']()
    out = tmpl.get_prompt('hello')
    assert '<|im_start|>user\nhello<|im_end|>' in out
    assert out.endswith('<|im_start|>assistant\n')


def test_llama2_multi_turn():
    tmpl = MODELS['llama2']()
    out = tmpl.messages2prompt([
        {'role': 'user', 'content': 'a'},
        {'role': 'assistant', 'content': 'b'},
        {'role': 'user', 'content': 'c'},
    ])
    assert out == '[INST] a [/INST] b</s>[INST] c [/INST] '


def test_best_match():
    assert best_match_model('/models/Llama-2-7b-chat-hf') == 'llama2'
    assert best_match_model('Meta-Llama-3-8B-Instruct') == 'llama3'
    assert best_match_model('Qwen2.5-7B-Instruct') == 'qwen'
    assert best_match_model('unknown-model-xyz') is None


def test_config_override():
    cfg = ChatTemplateConfig(model_name='qwen', meta_instruction='custom sys')
    tmpl = cfg.chat_template()
    assert tmpl.meta_instruction == 'custom sys'


def test_openai_content_parts():
    tmpl = MODELS['qwen']()
    out = tmpl.messages2prompt([
        {'role': 'user', 'content': [{'type': 'text', 'text': 'part1 '},
                                     {'type': 'text', 'text': 'part2'}]},
    ])
    assert 'part1 part2' in out


def test_deepseek_v32_family_turns():
    from lmdeploy_tpu.chat_template import MODELS
    t = MODELS['deepseek-v32']()
    msgs = [{'role': 'system', 'content': 'sys'},
            {'role': 'user', 'content': 'hi'},
            {'role': 'assistant', 'content': 'yo'},
            {'role': 'user', 'content': 'more'}]
    p = t.messages2prompt(msgs)
    assert p.startswith('<｜begin▁of▁sentence｜>sys<｜User｜>hi<｜Assistant｜>')
    assert p.endswith('<｜User｜>more<｜Assistant｜></think>')
    assert 'yo<｜end▁of▁sentence｜>' in p
    # thinking mode opens a think span on the LAST user turn only
    p2 = t.messages2prompt(msgs, enable_thinking=True)
    assert p2.endswith('<｜Assistant｜><think>')
    assert p2.count('<think>') == 1
    assert MODELS['deepseek-v4']().messages2prompt('q').startswith(
        '<｜begin▁of▁sentence｜><｜User｜>q<｜Assistant｜>')


def test_deepseek_vl2_template():
    from lmdeploy_tpu.chat_template import MODELS
    t = MODELS['deepseek-vl2']()
    p = t.messages2prompt([{'role': 'user', 'content': 'see'}])
    assert '<|User|>: see' in p and '<|Assistant|>: ' in p
