"""OpenAI-compatible API server (aiohttp).

Reference analog: ``lmdeploy/serve/openai/api_server.py`` (app assembly ``:379-395``)
and ``serve/openai/endpoints/`` (chat_completions ``:205``, completions, generate,
management).  The reference uses FastAPI/uvicorn; this build serves the same wire
format over aiohttp (the HTTP stack available in the TPU image) — request/response
schemas stay pydantic, SSE framing is identical, so OpenAI clients work unchanged.

Endpoints: GET /v1/models, /health, /metrics; POST /v1/chat/completions,
/v1/completions, /generate, /abort_request.
"""
from __future__ import annotations

import asyncio
import json
import os
from typing import Optional

from ..chat_template import ChatTemplateConfig
from ..messages import GenerationConfig, TpuEngineConfig
from .async_engine import AsyncEngine
from .openai_protocol import (ChatCompletionChoice, ChatCompletionRequest,
                              ChatCompletionResponse, ChatCompletionStreamChoice,
                              ChatCompletionStreamResponse, ChatMessage,
                              CompletionChoice, CompletionRequest, CompletionResponse,
                              DeltaMessage, ErrorResponse, GenerateRequest, ModelCard,
                              ModelList, UsageInfo)


def _gen_config_from_chat(req: ChatCompletionRequest) -> GenerationConfig:
    max_new = req.max_completion_tokens or req.max_tokens or 512
    stop = req.stop if isinstance(req.stop, list) else ([req.stop] if req.stop else None)
    return GenerationConfig(
        max_new_tokens=max_new,
        do_sample=(req.temperature or 0) > 0,
        temperature=req.temperature if req.temperature is not None else 0.7,
        top_p=req.top_p or 1.0,
        top_k=req.top_k or 0,
        min_p=req.min_p or 0.0,
        repetition_penalty=req.repetition_penalty or 1.0,
        presence_penalty=req.presence_penalty or 0.0,
        frequency_penalty=req.frequency_penalty or 0.0,
        stop_words=stop,
        random_seed=req.seed,
        skip_special_tokens=bool(req.skip_special_tokens),
        logprobs=(req.top_logprobs or 0) if req.logprobs else None,
        response_format=req.response_format,
    )


def _gen_config_from_completion(req: CompletionRequest) -> GenerationConfig:
    return GenerationConfig(
        max_new_tokens=req.max_tokens or 16,
        do_sample=(req.temperature or 0) > 0,
        temperature=req.temperature if req.temperature is not None else 0.7,
        top_p=req.top_p or 1.0, top_k=req.top_k or 0,
        repetition_penalty=req.repetition_penalty or 1.0,
        presence_penalty=req.presence_penalty or 0.0,
        frequency_penalty=req.frequency_penalty or 0.0,
        stop_words=req.stop if isinstance(req.stop, list)
        else ([req.stop] if req.stop else None),
        random_seed=req.seed,
        logprobs=req.logprobs)


def _chat_logprobs(entries, token_ids, tokenizer):
    """OpenAI chat-completions ``logprobs`` object for these generated tokens.

    ``entries``: per-token dicts {token_id: Logprob} from the engine (chosen
    token at rank 0, requested top-k after).  Reference:
    serve/openai/endpoints/chat_completions.py logprobs assembly.
    """
    content = []
    for tok, entry in zip(token_ids, entries or ()):
        text = tokenizer.decode([tok])
        tops = []
        for tid, lp in sorted(entry.items(),
                              key=lambda kv: (kv[1].rank if kv[1].rank else 0)):
            if tid == tok:
                continue
            t_text = tokenizer.decode([tid])
            tops.append({'token': t_text, 'logprob': lp.logprob,
                         'bytes': list(t_text.encode('utf-8', 'replace'))})
        chosen = entry.get(tok)
        content.append({
            'token': text,
            'logprob': chosen.logprob if chosen else 0.0,
            'bytes': list(text.encode('utf-8', 'replace')),
            'top_logprobs': tops,
        })
    return {'content': content}


def _completion_logprobs(entries, token_ids, tokenizer):
    """Legacy completions-API logprobs object (tokens/token_logprobs arrays)."""
    tokens, token_logprobs, top_logprobs = [], [], []
    for tok, entry in zip(token_ids, entries or ()):
        tokens.append(tokenizer.decode([tok]))
        chosen = entry.get(tok)
        token_logprobs.append(chosen.logprob if chosen else 0.0)
        top_logprobs.append({tokenizer.decode([tid]): lp.logprob
                             for tid, lp in entry.items()})
    return {'tokens': tokens, 'token_logprobs': token_logprobs,
            'top_logprobs': top_logprobs, 'text_offset': []}


def create_app(engine: AsyncEngine, model_name: str, api_key: Optional[str] = None,
               allow_origins: Optional[list] = None,
               max_concurrent_requests: Optional[int] = None):
    from aiohttp import web

    def error_response(msg: str, status: int = 400) -> 'web.Response':
        body = {'error': ErrorResponse(message=msg).model_dump()}
        return web.json_response(body, status=status)

    # concurrency limiter (reference: openai/api_server.py:159
    # ConcurrencyLimitMiddleware — reject with 429 above the cap instead of
    # queueing unboundedly); env fallback mirrors the reference's CLI flag.
    limit = max_concurrent_requests or int(
        os.environ.get('LMDEPLOY_TPU_MAX_CONCURRENT_REQUESTS', '0')) or None
    inflight = {'n': 0}
    _GEN_PATHS = ('/v1/chat/completions', '/v1/completions', '/generate',
                  '/v1/messages', '/v1/responses', '/pooling', '/v1/encode')
    origins = allow_origins if allow_origins is not None else [
        o for o in os.environ.get('LMDEPLOY_TPU_ALLOW_ORIGINS', '').split(',')
        if o]

    def _cors_headers(request):
        origin = request.headers.get('Origin')
        if not origins or origin is None:
            return {}
        if '*' in origins or origin in origins:
            return {'Access-Control-Allow-Origin': origin,
                    'Access-Control-Allow-Methods': 'GET, POST, OPTIONS',
                    'Access-Control-Allow-Headers':
                        'Content-Type, Authorization'}
        return {}

    @web.middleware
    async def auth_middleware(request, handler):
        if request.method == 'OPTIONS':        # CORS preflight
            return web.Response(headers=_cors_headers(request))
        if api_key is not None and request.path.startswith('/v1'):
            auth = request.headers.get('Authorization', '')
            if auth != f'Bearer {api_key}':
                return error_response('invalid api key', 401)
        limited = limit is not None and request.path in _GEN_PATHS
        if limited and inflight['n'] >= limit:
            resp = error_response('too many concurrent requests', 429)
            resp.headers.update(_cors_headers(request))
            return resp
        if limited:
            inflight['n'] += 1
        try:
            resp = await handler(request)
        except ValueError as e:
            # user-input errors raised by the engine (e.g. prompt > session_len)
            resp = error_response(str(e), 400)
        finally:
            if limited:
                inflight['n'] -= 1
        if not getattr(resp, 'prepared', False):   # SSE already sent headers
            resp.headers.update(_cors_headers(request))
        return resp

    async def parse(request, model_cls):
        try:
            return model_cls.model_validate(await request.json()), None
        except Exception as e:  # noqa: BLE001
            return None, error_response(f'invalid request: {e}', 400)

    # -- handlers ----------------------------------------------------------------------
    async def health(request):
        if engine.engine.is_alive():
            return web.json_response({'status': 'ok'})
        return web.json_response({'status': 'dead'}, status=500)

    async def list_models(request):
        return web.json_response(
            ModelList(data=[ModelCard(id=model_name)]).model_dump())

    async def metrics(request):
        m = engine.engine.make_schedule_metrics()
        text = engine.engine.metrics.prometheus_text(extra={
            'num_running': m.num_running,
            'num_waiting': m.num_waiting,
            'cache_usage': round(m.cache_usage, 4),
            'free_blocks': m.num_free_blocks,
            'num_preemptions': engine.engine.scheduler.num_preemptions,
        })
        return web.Response(text=text)

    async def chat_completions(request):
        req, err = await parse(request, ChatCompletionRequest)
        if err:
            return err
        gen_config = _gen_config_from_chat(req)
        session_id = engine.next_session_id()
        messages = req.messages
        if req.tools and isinstance(messages, list):
            from .parsers import format_tools_system
            messages = ([{'role': 'system',
                          'content': format_tools_system(req.tools)}]
                        + list(messages))

        if req.stream:
            # incremental tool-call / reasoning parsing during SSE (reference:
            # serve/parsers/response_parser.py streaming deltas).  The parser
            # turns detokenizer increments into typed frames; tool-call
            # arguments stream as they are generated, not post-hoc at EOS.
            from .stream_parser import StreamParser, resolve_parser
            arch = getattr(getattr(engine.engine, 'configs', None), 'model',
                           None)
            spec = resolve_parser(getattr(arch, 'hf_arch', None),
                                  getattr(engine, 'tool_call_parser', None))
            sparser = StreamParser(spec, tools_enabled=bool(req.tools))

            def frames(events, finish_reason, lp_obj, first):
                """Pack parser events into DeltaMessage SSE frames."""
                deltas = []
                for ev in events:
                    if ev[0] == 'content':
                        deltas.append(DeltaMessage(content=ev[1]))
                    elif ev[0] == 'reasoning':
                        deltas.append(DeltaMessage(reasoning_content=ev[1]))
                    elif ev[0] == 'tool_name':
                        deltas.append(DeltaMessage(tool_calls=[{
                            'index': ev[1], 'id': ev[2], 'type': 'function',
                            'function': {'name': ev[3], 'arguments': ''}}]))
                    elif ev[0] == 'tool_args':
                        deltas.append(DeltaMessage(tool_calls=[{
                            'index': ev[1],
                            'function': {'arguments': ev[2]}}]))
                if not deltas and (finish_reason or first):
                    deltas.append(DeltaMessage())
                if deltas and first:
                    deltas[0].role = 'assistant'
                packed = []
                for i, d in enumerate(deltas):
                    last = i == len(deltas) - 1
                    packed.append(ChatCompletionStreamChoice(
                        delta=d, finish_reason=finish_reason if last else None,
                        logprobs=lp_obj if last else None))
                return packed

            resp = web.StreamResponse(headers={
                'Content-Type': 'text/event-stream',
                'Cache-Control': 'no-cache'})
            await resp.prepare(request)
            rid = None
            first = True

            async def write_choices(choices):
                nonlocal rid
                for choice in choices:
                    chunk = ChatCompletionStreamResponse(model=req.model)
                    rid = rid or chunk.id
                    chunk.id = rid
                    chunk.choices = [choice]
                    await resp.write(
                        f'data: {chunk.model_dump_json()}\n\n'.encode())

            try:
                finish = None
                async for out in engine.generate(messages, session_id,
                                                 gen_config=gen_config):
                    lp_obj = None
                    if req.logprobs and out.logprobs:
                        lp_obj = _chat_logprobs(out.logprobs, out.token_ids,
                                                engine.tokenizer)
                    events = sparser.push(out.response)
                    finish = out.finish_reason
                    if finish is not None:
                        events += sparser.finish()
                        if sparser.saw_tool_call and finish == 'stop':
                            finish = 'tool_calls'
                    choices = frames(events, finish, lp_obj, first)
                    if choices:
                        first = False
                        await write_choices(choices)
            except (ConnectionResetError, asyncio.CancelledError):
                await engine.stop_session(session_id)
                raise
            await resp.write(b'data: [DONE]\n\n')
            await resp.write_eof()
            return resp

        text = ''
        finish_reason = None
        input_len = 0
        gen_len = 0
        all_ids, all_lps = [], []
        async for out in engine.generate(messages, session_id,
                                         gen_config=gen_config):
            text += out.response
            finish_reason = out.finish_reason
            input_len = out.input_token_len
            gen_len = out.generate_token_len
            if req.logprobs and out.logprobs:
                all_ids.extend(out.token_ids)
                all_lps.extend(out.logprobs)
        from .parsers import parse_response
        parsed = parse_response(text, enable_tools=bool(req.tools))
        if parsed['tool_calls']:
            finish_reason = 'tool_calls'
        lp_obj = _chat_logprobs(all_lps, all_ids, engine.tokenizer) \
            if all_lps else None
        body = ChatCompletionResponse(
            model=req.model,
            choices=[ChatCompletionChoice(
                message=ChatMessage(role='assistant', content=parsed['content'],
                                    reasoning_content=parsed['reasoning_content'],
                                    tool_calls=parsed['tool_calls']),
                finish_reason=finish_reason, logprobs=lp_obj)],
            usage=UsageInfo(prompt_tokens=input_len, completion_tokens=gen_len,
                            total_tokens=input_len + gen_len))
        return web.json_response(body.model_dump())

    async def completions(request):
        req, err = await parse(request, CompletionRequest)
        if err:
            return err
        prompts = req.prompt if isinstance(req.prompt, list) else [req.prompt]
        gen_config = _gen_config_from_completion(req)

        if req.stream:
            session_id = engine.next_session_id()
            resp = web.StreamResponse(headers={
                'Content-Type': 'text/event-stream',
                'Cache-Control': 'no-cache'})
            await resp.prepare(request)
            async for out in engine.generate(prompts[0], session_id,
                                             gen_config=gen_config,
                                             do_preprocess=False):
                body = CompletionResponse(model=req.model, choices=[
                    CompletionChoice(text=out.response,
                                     finish_reason=out.finish_reason)])
                await resp.write(f'data: {body.model_dump_json()}\n\n'.encode())
            await resp.write(b'data: [DONE]\n\n')
            await resp.write_eof()
            return resp

        async def one(i, prompt):
            session_id = engine.next_session_id()
            text = ''
            finish_reason = None
            input_len = gen_len = 0
            all_ids, all_lps = [], []
            async for out in engine.generate(prompt, session_id,
                                             gen_config=gen_config,
                                             do_preprocess=False):
                text += out.response
                finish_reason = out.finish_reason
                input_len = out.input_token_len
                gen_len = out.generate_token_len
                if req.logprobs is not None and out.logprobs:
                    all_ids.extend(out.token_ids)
                    all_lps.extend(out.logprobs)
            lp_obj = _completion_logprobs(all_lps, all_ids, engine.tokenizer) \
                if all_lps else None
            return CompletionChoice(index=i, text=text, logprobs=lp_obj,
                                    finish_reason=finish_reason), input_len, gen_len

        results = await asyncio.gather(*[one(i, p) for i, p in enumerate(prompts)])
        usage = UsageInfo()
        choices = []
        for choice, input_len, gen_len in results:
            choices.append(choice)
            usage.prompt_tokens += input_len
            usage.completion_tokens += gen_len
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        body = CompletionResponse(model=req.model, choices=choices, usage=usage)
        return web.json_response(body.model_dump())

    async def generate(request):
        """Token-level generation API (reference: endpoints/generate.py:65)."""
        req, err = await parse(request, GenerateRequest)
        if err:
            return err
        gen_config = GenerationConfig(
            max_new_tokens=req.max_tokens, do_sample=req.do_sample,
            temperature=req.temperature, top_p=req.top_p, top_k=req.top_k,
            stop_token_ids=req.stop_token_ids, ignore_eos=req.ignore_eos)
        session_id = req.session_id or engine.next_session_id()
        if req.input_ids is not None:
            from ..messages import ResponseType
            from ..paging.seq import SamplingParams
            gen_config.validate()
            sampling = SamplingParams.from_gen_config(
                gen_config, engine.engine.model_config.eos_token_id)
            queue = engine.engine.add_message(session_id, req.input_ids, sampling)
            token_ids = []
            while True:
                out = await queue.get()
                token_ids = out.token_ids
                if out.status != ResponseType.SUCCESS:
                    break
            if engine.engine.role != 'prefill':
                engine.engine.end_session(session_id)   # PD: prefill retains KV
            return web.json_response({'token_ids': token_ids,
                                      'num_token': len(token_ids)})
        if req.prompt is None:
            return error_response('prompt or input_ids required')
        text = ''
        async for out in engine.generate(req.prompt, session_id,
                                         gen_config=gen_config, do_preprocess=False):
            text += out.response
        return web.json_response({'text': text})

    async def abort_request(request):
        """Abort one session, or ALL in-flight sessions when no session_id is
        given (reference: stop_all_session epoch bump)."""
        data = await request.json()
        session_id = data.get('session_id')
        if session_id is not None:
            await engine.stop_session(int(session_id))
        else:
            await engine.stop_all_sessions()
        return web.json_response({'status': 'ok'})

    async def distserve_export(request):
        """PD: export a retained session's KV blocks (reference: distserve.py).

        The device gather + serialization run on the ENGINE's device-executor
        thread (reference analog: the dedicated migration loop,
        engine_loop.py:591): migrations interleave between decode steps
        instead of blocking the HTTP event loop — and never touch the cache
        concurrently with a step.
        """
        import asyncio as _asyncio

        from .. import disagg
        session_id = int(request.match_info['session_id'])
        loop = _asyncio.get_running_loop()

        def work():
            payload = disagg.export_session_kv(engine.engine, session_id)
            return disagg.serialize_payload(payload)

        data = await loop.run_in_executor(engine.engine._executor, work)
        if request.query.get('release', '1') == '1':
            disagg.release_exported(engine.engine, session_id)
        return web.Response(body=data,
                            content_type='application/octet-stream')

    async def distserve_import(request):
        """PD: import migrated KV and register the RUNNING sequence (device
        scatter queued on the engine's device thread, overlapping serving)."""
        import asyncio as _asyncio

        from .. import disagg
        from ..paging.seq import SamplingParams
        session_id = int(request.query['session_id'])
        max_new = int(request.query.get('max_new_tokens', '512'))
        blob = await request.read()
        sp = SamplingParams(max_new_tokens=max_new,
                            stop_token_ids=list(engine.engine.model_config
                                                .eos_token_id))
        loop = _asyncio.get_running_loop()
        await loop.run_in_executor(
            engine.engine._executor,
            lambda: disagg.import_session_kv(
                engine.engine, session_id, disagg.deserialize_payload(blob),
                sp))
        return web.json_response({'status': 'ok', 'session_id': session_id})

    async def distserve_prefill(request):
        """PD proxy orchestration, prefill side (reference: proxy.py:669-720
        sends the prefill request with max_tokens=1 + preserve_cache; here the
        'prefill' engine role retains finished sessions' KV by default).

        Body ``{"kind": "chat"|"completion", "request": <OpenAI body>}``.
        Applies the chat template, tokenizes, generates ONE token and returns
        ``{session_id, prompt_len, first_token_ids}`` for the proxy to hand to
        the decode peer, which pulls the KV via /distserve/export.
        """
        data = await request.json()
        kind = data.get('kind', 'chat')
        body = data['request']
        if kind == 'chat':
            req = ChatCompletionRequest(**body)
            gen_config = _gen_config_from_chat(req)
            prompt, do_preprocess = req.messages, True
        else:
            req = CompletionRequest(**body)
            gen_config = _gen_config_from_completion(req)
            if isinstance(req.prompt, list) and len(req.prompt) > 1:
                # one prefill/decode pair serves one prompt; silently serving
                # prompt[0] would drop the rest (the hybrid path serves all)
                return error_response(
                    'multi-prompt completions are not supported in distserve '
                    'mode; send one prompt per request', 400)
            prompt = req.prompt if isinstance(req.prompt, str) else req.prompt[0]
            do_preprocess = False
        gen_config.max_new_tokens = 1
        gen_config.ignore_eos = True           # the decode peer owns stopping
        session_id = engine.next_session_id()
        first_ids: list = []
        prompt_len = 0
        async for out in engine.generate(prompt, session_id,
                                         gen_config=gen_config,
                                         do_preprocess=do_preprocess,
                                         sequence_end=False):
            if out.token_ids:
                first_ids.extend(out.token_ids)
            prompt_len = out.input_token_len
        return web.json_response({'session_id': session_id,
                                  'prompt_len': prompt_len,
                                  'first_token_ids': first_ids})

    async def distserve_decode(request):
        """PD proxy orchestration, decode side: pull the prefill peer's KV over
        DCN, import it, and stream the continuation as a normal OpenAI
        response (so clients of the proxy see plain /v1/* semantics).

        Body ``{"kind", "request", "prefill_url", "remote_session_id",
        "prompt_len", "first_token_ids"}``.  String stop-words hold back via
        token-id conversion only (single-token stops); multi-token string
        stops are a hybrid-mode feature.
        """
        import aiohttp as _aiohttp

        from .. import disagg
        from ..paging.seq import SamplingParams
        from ..tokenizer import DetokenizeState

        data = await request.json()
        kind = data.get('kind', 'chat')
        body = data['request']
        p_url = data['prefill_url'].rstrip('/')
        remote_sid = int(data['remote_session_id'])
        first_ids = [int(t) for t in data.get('first_token_ids', [])]
        if kind == 'chat':
            req = ChatCompletionRequest(**body)
            gen_config = _gen_config_from_chat(req)
            stream = bool(req.stream)
        else:
            req = CompletionRequest(**body)
            gen_config = _gen_config_from_completion(req)
            stream = bool(req.stream)

        timeout = _aiohttp.ClientTimeout(total=300)
        async with _aiohttp.ClientSession(timeout=timeout) as s:
            async with s.get(f'{p_url}/distserve/export/{remote_sid}',
                             params={'release': '1'}) as r:
                if r.status != 200:
                    return error_response(
                        f'prefill peer export failed ({r.status})', 502)
                blob = await r.read()
        payload = disagg.deserialize_payload(blob)

        gen_config.validate()
        gen_config.convert_stop_bad_words_to_ids(engine.tokenizer)
        # chat-template stop words (single-token ids) — the hybrid path merges
        # them inside AsyncEngine.generate; PD decode must match or chats
        # generate past turn boundaries
        for w in engine.stop_words:
            ids = engine.tokenizer.encode(w, add_bos=False,
                                          add_special_tokens=False)
            if len(ids) == 1:
                st = gen_config.stop_token_ids or []
                if ids[0] not in st:
                    gen_config.stop_token_ids = st + [ids[0]]
        eos = list(engine.engine.model_config.eos_token_id)
        sp = SamplingParams.from_gen_config(gen_config, eos)
        sp.max_new_tokens = max(gen_config.max_new_tokens - len(first_ids), 0)
        local_sid = engine.next_session_id()

        model = getattr(req, 'model', None) or model_name
        stop_set = set(eos) | set(sp.stop_token_ids or ())

        async def deltas():
            """Yield (delta_text, n_out, finish_reason) across first token +
            decode-side continuation; incremental detok over output ids."""
            from ..messages import ResponseType
            state = DetokenizeState()
            out_ids = list(first_ids)
            text, state = engine.tokenizer.detokenize_incrementally(
                out_ids, state,
                skip_special_tokens=gen_config.skip_special_tokens)
            if sp.max_new_tokens == 0 or (not gen_config.ignore_eos
                                          and first_ids
                                          and first_ids[-1] in stop_set):
                engine.engine.end_session(local_sid)
                reason = 'stop' if (first_ids and first_ids[-1] in stop_set
                                    and not gen_config.ignore_eos) else 'length'
                yield text, len(out_ids), reason
                return
            import asyncio as _asyncio
            await _asyncio.get_running_loop().run_in_executor(
                engine.engine._executor,
                lambda: disagg.import_session_kv(
                    engine.engine, local_sid, payload, sp))
            queue = engine.engine.continue_session(local_sid)
            if text:
                yield text, len(out_ids), None
            while True:
                out = await queue.get()
                cum = list(first_ids) + list(out.token_ids)
                new_text, state = engine.tokenizer.detokenize_incrementally(
                    cum, state,
                    skip_special_tokens=gen_config.skip_special_tokens)
                if out.status != ResponseType.SUCCESS:
                    # mirror AsyncEngine.generate: the engine strips the
                    # stop/EOS token before emitting, so length is judged by
                    # the output budget, not by peeking at the last token
                    if out.status == ResponseType.FINISH:
                        reason = 'length' if len(out.token_ids) \
                            >= sp.max_new_tokens else 'stop'
                    elif out.status == ResponseType.CANCEL:
                        reason = 'abort'
                    else:
                        reason = 'error'
                    engine.engine.end_session(local_sid)
                    yield new_text, len(cum), reason
                    return
                if new_text:
                    yield new_text, len(cum), None

        prompt_len = int(data.get('prompt_len', 0))
        if stream:
            resp = web.StreamResponse(headers={
                'Content-Type': 'text/event-stream',
                'Cache-Control': 'no-cache'})
            await resp.prepare(request)
            first = True
            async for delta, n_out, reason in deltas():
                if kind == 'chat':
                    chunk = ChatCompletionStreamResponse(model=model)
                    dm = DeltaMessage(content=delta)
                    if first:
                        dm.role = 'assistant'
                        first = False
                    chunk.choices = [ChatCompletionStreamChoice(
                        delta=dm, finish_reason=reason)]
                else:
                    chunk = CompletionResponse(model=model, choices=[
                        CompletionChoice(text=delta, finish_reason=reason)])
                await resp.write(
                    f'data: {chunk.model_dump_json()}\n\n'.encode())
            await resp.write(b'data: [DONE]\n\n')
            await resp.write_eof()
            return resp

        text = ''
        n_out = 0
        finish_reason = None
        async for delta, n, reason in deltas():
            text += delta
            n_out = n
            finish_reason = reason or finish_reason
        usage = UsageInfo(prompt_tokens=prompt_len, completion_tokens=n_out,
                          total_tokens=prompt_len + n_out)
        if kind == 'chat':
            out_body = ChatCompletionResponse(
                model=model,
                choices=[ChatCompletionChoice(
                    message=ChatMessage(role='assistant', content=text),
                    finish_reason=finish_reason)],
                usage=usage)
        else:
            out_body = CompletionResponse(
                model=model, usage=usage,
                choices=[CompletionChoice(text=text,
                                          finish_reason=finish_reason)])
        return web.json_response(out_body.model_dump())

    async def distserve_continue(request):
        """PD: stream the decode continuation of an imported session (SSE of ids)."""
        session_id = int(request.query['session_id'])
        queue = engine.engine.continue_session(session_id)
        resp = web.StreamResponse(headers={'Content-Type': 'text/event-stream'})
        await resp.prepare(request)
        from ..messages import ResponseType
        while True:
            out = await queue.get()
            await resp.write(
                f'data: {json.dumps({"token_ids": out.token_ids})}\n\n'.encode())
            if out.status != ResponseType.SUCCESS:
                break
        engine.engine.end_session(session_id)
        await resp.write(b'data: [DONE]\n\n')
        await resp.write_eof()
        return resp

    async def sleep_ep(request):
        """Release device memory (reference: endpoints/management.py sleep)."""
        level = int(request.query.get('level', '1'))
        try:
            engine.engine.sleep(level)
        except AssertionError as e:
            return error_response(str(e), 409)
        return web.json_response({'status': 'ok'})

    async def wakeup_ep(request):
        engine.engine.wakeup()
        return web.json_response({'status': 'ok'})

    async def pooling(request):
        """Reward-model scoring with an Embeddings-API-shaped input
        (reference: serve/openai/endpoints/auxiliary.py /pooling)."""
        try:
            body = await request.json()
        except Exception as e:  # noqa: BLE001
            return error_response(f'invalid request: {e}', 400)
        inp = body.get('input')
        if isinstance(inp, str):
            input_ids = [engine.tokenizer.encode(inp)]
        elif isinstance(inp, list) and inp:
            if isinstance(inp[0], str):
                input_ids = [engine.tokenizer.encode(p) for p in inp]
            elif isinstance(inp[0], int):
                input_ids = [inp]
            elif isinstance(inp[0], list):
                input_ids = inp
            else:
                return error_response('input list contains an invalid type', 400)
        else:
            return error_response('input must be a string or a list', 400)
        try:
            scores = await engine.async_get_reward_score(input_ids)
        except ValueError as e:
            return error_response(str(e), 400)
        return web.json_response({
            'object': 'list', 'model': model_name,
            'data': [{'object': 'pooling', 'index': i, 'data': s}
                     for i, s in enumerate(scores)],
        })

    async def update_weights(request):
        """Online weight sync (reference: endpoints/management.py
        update_weights): body is an .npz archive keyed by HF tensor names;
        each tensor updates its target leaf in place on device."""
        import io

        import numpy as np
        body = await request.read()
        try:
            arrays = np.load(io.BytesIO(body))
            items = [(k, arrays[k]) for k in arrays.files]
        except Exception as e:  # noqa: BLE001
            return error_response(f'invalid npz payload: {e}', 400)
        applied = engine.engine.model_agent.update_params(items)
        return web.json_response({'status': 'ok', 'applied': applied,
                                  'received': len(items)})

    def _parse_input_ids(body):
        inp = body.get('input')
        if isinstance(inp, str):
            return [engine.tokenizer.encode(inp)]
        if isinstance(inp, list) and inp:
            if isinstance(inp[0], str):
                return [engine.tokenizer.encode(p) for p in inp]
            if isinstance(inp[0], int):
                return [inp]
            if isinstance(inp[0], list):
                return inp
        raise ValueError('input must be a string or a list')

    async def encode(request):
        """Tokenize (reference: endpoints/auxiliary.py /v1/encode)."""
        try:
            body = await request.json()
            ids = _parse_input_ids(body)
        except Exception as e:  # noqa: BLE001
            return error_response(f'invalid request: {e}', 400)
        return web.json_response({
            'input_ids': ids if len(ids) > 1 else ids[0],
            'length': [len(x) for x in ids] if len(ids) > 1 else len(ids[0]),
        })

    async def get_ppl(request):
        """Per-sequence perplexity over given token ids (reference:
        endpoints/auxiliary.py /get_ppl)."""
        try:
            body = await request.json()
            ids = body.get('input_ids') or _parse_input_ids(body)
            if ids and isinstance(ids[0], int):
                ids = [ids]
        except Exception as e:  # noqa: BLE001
            return error_response(f'invalid request: {e}', 400)
        try:
            ppl = await engine.async_get_ppl(ids)
        except ValueError as e:
            return error_response(str(e), 400)
        return web.json_response({'ppl': [float(p) for p in ppl]})

    async def is_sleeping(request):
        return web.json_response(
            {'is_sleeping': bool(getattr(engine.engine, '_sleeping', False))})

    async def init_weights_update_group(request):
        """RL weight-sync group setup (reference: endpoints/management.py).
        The TPU path syncs weights through POST /update_weights (npz over
        HTTP) instead of NCCL broadcast groups, so group setup is a no-op
        acknowledged for API compatibility."""
        return web.json_response({'status': 'ok', 'transport': 'http-npz'})

    async def destroy_weights_update_group(request):
        return web.json_response({'status': 'ok'})

    async def terminate(request):
        """Graceful shutdown (reference: endpoints/management.py
        terminate): finish in-flight requests, then stop the process."""
        import asyncio as aio
        import os
        import signal

        async def _exit():
            await aio.sleep(0.2)          # let the response flush
            engine.engine.close()
            os.kill(os.getpid(), signal.SIGTERM)

        aio.get_running_loop().create_task(_exit())
        return web.json_response({'status': 'terminating'})

    app = web.Application(middlewares=[auth_middleware])
    from .anthropic_api import add_anthropic_routes
    add_anthropic_routes(app, engine, model_name)
    from .responses_api import add_responses_routes
    add_responses_routes(app, engine, model_name)
    app.router.add_get('/health', health)
    app.router.add_get('/v1/models', list_models)
    app.router.add_get('/metrics', metrics)
    app.router.add_post('/v1/chat/completions', chat_completions)
    app.router.add_post('/v1/completions', completions)
    app.router.add_post('/generate', generate)
    app.router.add_post('/abort_request', abort_request)
    app.router.add_post('/sleep', sleep_ep)
    app.router.add_post('/wakeup', wakeup_ep)
    app.router.add_post('/pooling', pooling)
    app.router.add_post('/update_weights', update_weights)
    app.router.add_post('/v1/encode', encode)
    app.router.add_post('/get_ppl', get_ppl)
    app.router.add_get('/is_sleeping', is_sleeping)
    app.router.add_post('/init_weights_update_group',
                        init_weights_update_group)
    app.router.add_post('/destroy_weights_update_group',
                        destroy_weights_update_group)
    app.router.add_post('/terminate', terminate)
    app.router.add_post('/distserve/prefill', distserve_prefill)
    app.router.add_post('/distserve/decode', distserve_decode)
    app.router.add_get('/distserve/export/{session_id}', distserve_export)
    app.router.add_post('/distserve/import', distserve_import)
    app.router.add_post('/distserve/continue', distserve_continue)
    return app


def serve(model_path: str, model_name: Optional[str] = None,
          server_name: str = '0.0.0.0', server_port: int = 23333,
          backend_config: Optional[TpuEngineConfig] = None,
          chat_template_config: Optional[ChatTemplateConfig] = None,
          api_key: Optional[str] = None, log_level: str = 'INFO', **kwargs):
    """Build engine + app and serve (reference: api_server.py serve())."""
    from aiohttp import web

    if os.environ.get('LMDEPLOY_TPU_COORDINATOR'):
        # multi-node launch (serve/launch_server.py --nnodes): join the
        # jax.distributed job before the engine builds its mesh
        from ..parallel.multihost import init as mh_init
        mh_init(coordinator_address=os.environ['LMDEPLOY_TPU_COORDINATOR'],
                num_processes=int(os.environ.get('LMDEPLOY_TPU_NNODES', 1)),
                process_id=int(os.environ.get('LMDEPLOY_TPU_NODE_RANK', 0)))
    engine = AsyncEngine(model_path, backend_config=backend_config,
                         chat_template_config=chat_template_config, **kwargs)
    app = create_app(engine, model_name or model_path, api_key)
    web.run_app(app, host=server_name, port=server_port)
