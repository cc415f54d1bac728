"""OpenAI Responses API (/v1/responses).

Reference analog: ``lmdeeploy/serve/openai/responses/`` (serving.py, streaming.py).
Covers: string or message-array ``input``, ``instructions`` as system prompt,
non-streaming response objects and the SSE event sequence
(response.created / response.output_text.delta / response.completed).
"""
from __future__ import annotations

import json
import time
import uuid
from typing import Any, Dict, List, Optional

from ..messages import GenerationConfig


def _to_messages(body: Dict[str, Any]) -> List[Dict[str, str]]:
    messages: List[Dict[str, str]] = []
    instructions = body.get('instructions')
    if instructions:
        messages.append({'role': 'system', 'content': instructions})
    inp = body.get('input', '')
    if isinstance(inp, str):
        messages.append({'role': 'user', 'content': inp})
    else:
        for item in inp:
            if item.get('type') in (None, 'message'):
                content = item.get('content')
                if isinstance(content, list):
                    content = ''.join(p.get('text', '') for p in content
                                      if p.get('type') in ('input_text',
                                                           'output_text', 'text'))
                messages.append({'role': item.get('role', 'user'),
                                 'content': content})
    return messages


def _gen_config(body: Dict[str, Any]) -> GenerationConfig:
    temp = body.get('temperature', 1.0)
    return GenerationConfig(
        max_new_tokens=body.get('max_output_tokens', 1024),
        do_sample=(temp or 0) > 0,
        temperature=temp if temp is not None else 1.0,
        top_p=body.get('top_p', 1.0),
    )


def _response_object(rid: str, model: str, text: str, status: str,
                     input_tokens: int, output_tokens: int) -> Dict:
    return {
        'id': rid, 'object': 'response', 'created_at': int(time.time()),
        'model': model, 'status': status,
        'output': [{'type': 'message', 'id': f'msg_{uuid.uuid4().hex[:20]}',
                    'role': 'assistant', 'status': status,
                    'content': [{'type': 'output_text', 'text': text,
                                 'annotations': []}]}],
        'output_text': text,
        'usage': {'input_tokens': input_tokens, 'output_tokens': output_tokens,
                  'total_tokens': input_tokens + output_tokens},
    }


def add_responses_routes(app, engine, model_name: str):
    from aiohttp import web

    async def responses(request):
        try:
            body = await request.json()
        except Exception as e:  # noqa: BLE001
            return web.json_response(
                {'error': {'type': 'invalid_request_error', 'message': str(e)}},
                status=400)
        if 'input' not in body:
            return web.json_response(
                {'error': {'type': 'invalid_request_error',
                           'message': 'input is required'}}, status=400)
        messages = _to_messages(body)
        gen_config = _gen_config(body)
        session_id = engine.next_session_id()
        rid = f'resp_{uuid.uuid4().hex[:24]}'

        if body.get('stream'):
            resp = web.StreamResponse(headers={
                'Content-Type': 'text/event-stream', 'Cache-Control': 'no-cache'})
            await resp.prepare(request)

            async def send(event: str, data: Dict):
                await resp.write(f'event: {event}\ndata: '
                                 f'{json.dumps(data)}\n\n'.encode())

            await send('response.created', {
                'type': 'response.created',
                'response': _response_object(rid, model_name, '', 'in_progress',
                                             0, 0)})
            text = ''
            in_tok = out_tok = 0
            async for out in engine.generate(messages, session_id,
                                             gen_config=gen_config):
                if out.response:
                    await send('response.output_text.delta', {
                        'type': 'response.output_text.delta',
                        'delta': out.response})
                text += out.response
                in_tok = out.input_token_len
                out_tok = out.generate_token_len
            await send('response.completed', {
                'type': 'response.completed',
                'response': _response_object(rid, model_name, text, 'completed',
                                             in_tok, out_tok)})
            await resp.write_eof()
            return resp

        text = ''
        in_tok = out_tok = 0
        async for out in engine.generate(messages, session_id,
                                         gen_config=gen_config):
            text += out.response
            in_tok = out.input_token_len
            out_tok = out.generate_token_len
        return web.json_response(
            _response_object(rid, model_name, text, 'completed', in_tok, out_tok))

    app.router.add_post('/v1/responses', responses)
