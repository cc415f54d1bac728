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


def sample_requests(args):
    """(prompt, output_len) pairs for the chosen workload.

    - 'fixed': uniform input/output lengths (--input-len/--output-len)
    - 'sharegpt': real ShareGPT_V3 json via --dataset-path, with the
      reference's filters (prompt 4..1024, prompt+output <= 2048;
      benchmark/profile_throughput.py:23 sample_sharegpt_requests)
    - 'sharegpt-synthetic': no-network stand-in — lengths drawn from
      lognormals fit to ShareGPT stats (median prompt ~55 words, median
      output ~160 tokens, heavy tails), same filters.
    """
    rng = random.Random(args.seed)
    out = []
    if args.workload == 'sharegpt':
        with open(args.dataset_path) as f:
            data = json.load(f)
        convs = [d['conversations'] for d in data
                 if len(d.get('conversations', [])) >= 2]
        rng.shuffle(convs)
        for conv in convs:
            if len(out) >= args.num_prompts:
                break
            prompt = conv[0]['value']
            n_words = len(prompt.split())
            est_out = max(4, len(conv[1]['value'].split()) * 4 // 3)
            if n_words < 4 or n_words > 1024 or n_words + est_out > 2048:
                continue
            out.append((prompt, min(est_out, args.output_len or est_out)))
    elif args.workload == 'sharegpt-synthetic':
        while len(out) < args.num_prompts:
            n_in = int(rng.lognormvariate(4.0, 1.1))       # median ~55 words
            n_out = int(rng.lognormvariate(5.1, 0.9))      # median ~160 toks
            if n_in < 4 or n_in > 1024 or n_in + n_out > 2048 or n_out < 4:
                continue
            out.append((random_prompt(n_in), n_out))
    else:
        out = [(random_prompt(args.input_len // 2), args.output_len)
               for _ in range(args.num_prompts)]
    return out


async def run(args):
    import aiohttp

    stats = []
    sem = asyncio.Semaphore(args.concurrency)

    async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None)) as session:
        async def bounded(prompt, output_len):
            async with sem:
                await one_request(session, args.url, args.model, prompt,
                                  output_len, stats)

        requests = sample_requests(args)
        t0 = time.perf_counter()
        await asyncio.gather(*[bounded(p, ol) for p, ol in requests])
        wall = time.perf_counter() - t0

    ttfts = sorted(s['ttft'] for s in stats)
    lats = sorted(s['latency'] for s in stats)
    total_chunks = sum(s['chunks'] for s in stats)
    pct = lambda xs, p: xs[min(int(len(xs) * p), len(xs) - 1)]  # noqa: E731
    print(json.dumps({
        'workload': args.workload,
        'num_prompts': len(stats),
        'concurrency': args.concurrency,
        'duration_s': round(wall, 2),
        'rps': round(len(stats) / wall, 3),
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
    ap.add_argument('--workload', default='fixed',
                    choices=['fixed', 'sharegpt', 'sharegpt-synthetic'])
    ap.add_argument('--dataset-path', default='ShareGPT_V3_unfiltered_cleaned_split.json')
    ap.add_argument('--seed', type=int, default=0)
    asyncio.run(run(ap.parse_args()))


if __name__ == '__main__':
    main()
