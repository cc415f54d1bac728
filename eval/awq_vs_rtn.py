"""AWQ scale search vs plain RTN, through the serving stack.

VERDICT r4 weak #4: at 25M the AWQ checkpoint measured no better than
round-to-nearest (+8.5% vs +8.1% in a numpy forward) — the activation-aware
scale search, AWQ's entire value proposition (reference:
lite/quantization/awq.py:263), was unvalidated.  This script quantizes one
checkpoint BOTH ways (identical group size, identical asymmetric min/max
quantizer — the ONLY difference is the folded activation scales) and
measures held-out ppl via pipeline().get_ppl for each.

Run:  python eval/awq_vs_rtn.py [pylm-25m|pylm-100m]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'assets')


def build_rtn(model_path: str, work_dir: str, group_size: int = 128):
    """RTN baseline: the AWQ pipeline with the scale search disabled (every
    searched scale forced to 1) — isolates the activation-aware component."""
    from unittest import mock

    import numpy as np

    from lmdeploy_tpu.lite import auto_awq as aa

    def unit_scale(x_sample, weights, absmean, group_size):
        return np.ones(weights[0].shape[0], np.float32)

    with mock.patch.object(aa, '_search_scale', unit_scale):
        return aa.auto_awq(model_path, work_dir=work_dir,
                          w_group_size=group_size)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else 'pylm-25m'
    model = os.path.join(ASSETS, name)
    if not os.path.isdir(model):
        print(f'{model} missing — run eval/train_tiny.py '
              f'(TRAIN_SIZE={name.split("-")[-1]})', file=sys.stderr)
        return 2

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ppl_gate import heldout_texts, ppl_of
    from lmdeploy_tpu.lite.auto_awq import auto_awq

    texts = heldout_texts(16)
    base = ppl_of(model, texts)
    print(f'{name} fp32 ppl {base:.4f}', flush=True)

    rtn_dir = build_rtn(model, f'/tmp/rtn_{name}')
    rtn = ppl_of(rtn_dir, texts, dtype='float32')
    print(f'rtn    ppl {rtn:.4f}  (+{(rtn - base) / base * 100:.2f}%)',
          flush=True)

    awq_dir = auto_awq(model, work_dir=f'/tmp/awq_{name}')
    awq = ppl_of(awq_dir, texts, dtype='float32')
    print(f'awq    ppl {awq:.4f}  (+{(awq - base) / base * 100:.2f}%)',
          flush=True)
    print({'model': name, 'fp32': round(base, 4), 'rtn': round(rtn, 4),
           'awq': round(awq, 4), 'awq_beats_rtn': bool(awq < rtn)})
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
