"""HTTP serving benchmark: concurrent OpenAI-API load with TTFT/TPOT stats.

Reference analog: ``benchmark/benchmark_serving.py`` / ``profile_restful_api.py``
(TPOT-primary methodology, benchmark/README.md:33-46).

Usage:
    python benchmark/benchmark_serving.py --url http://127.0.0.1:23333 \
        --num-prompts 64 --concurrency 16 --input-len 128 --output-len 128
"""
from __future__ import annotations

import argparse
import asyncio
import json
import random
import string
import sys
import time


def random_prompt(n_words: int) -> str:
    rng = random.Random()
    return ' '.join(''.join(rng.choices(string.ascii_lowercase,
                                        k=rng.randint(2, 9)))
                    for _ in range(n_words))


async def one_request(session, url, model, prompt, output_len, stats):
    start = time.perf_counter()
    first = None
    tokens = 0
    payload = {'model': model, 'stream': True, 'max_tokens': output_len,
               'temperature': 0.8,
               'messages': [{'role': 'user', 'content': prompt}]}
    async with session.post(url + '/v1/chat/completions', json=payload) as resp:
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith('data: ') or line == 'data: [DONE]':
                continue
            if first is None:
                first = time.perf_counter()
            tokens += 1
    end = time.perf_counter()
    stats.append({'ttft': (first or end) - start, 'latency': end - start,
                  'chunks': tokens})


async def run(args):
    import aiohttp

    stats = []
    sem = asyncio.Semaphore(args.concurrency)

    async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None)) as session:
        async def bounded(prompt):
            async with sem:
                await one_request(session, args.url, args.model, prompt,
                                  args.output_len, stats)

        prompts = [random_prompt(args.input_len // 2)
                   for _ in range(args.num_prompts)]
        t0 = time.perf_counter()
        await asyncio.gather(*[bounded(p) for p in prompts])
        wall = time.perf_counter() - t0

    ttfts = sorted(s['ttft'] for s in stats)
    lats = sorted(s['latency'] for s in stats)
    total_chunks = sum(s['chunks'] for s in stats)
    pct = lambda xs, p: xs[min(int(len(xs) * p), len(xs) - 1)]  # noqa: E731
    print(json.dumps({
        'num_prompts': args.num_prompts,
        'concurrency': args.concurrency,
        'duration_s': round(wall, 2),
        'rps': round(args.num_prompts / wall, 3),
        'stream_chunks_per_s': round(total_chunks / wall, 1),
        'ttft_p50_s': round(pct(ttfts, 0.5), 3),
        'ttft_p99_s': round(pct(ttfts, 0.99), 3),
        'latency_p50_s': round(pct(lats, 0.5), 3),
        'latency_p99_s': round(pct(lats, 0.99), 3),
    }, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--url', default='http://127.0.0.1:23333')
    ap.add_argument('--model', default='default')
    ap.add_argument('--num-prompts', type=int, default=64)
    ap.add_argument('--concurrency', type=int, default=16)
    ap.add_argument('--input-len', type=int, default=128)
    ap.add_argument('--output-len', type=int, default=128)
    asyncio.run(run(ap.parse_args()))


if __name__ == '__main__':
    main()
