"""Build a deterministic offline corpus for the quantization accuracy gate.

The image has no network and no real pretrained checkpoints, so the gate
(VERDICT r3 directive #3: "if fully offline, a fixed-corpus deterministic
gate on the largest loadable checkpoint") trains its own small llama-format
model on local text.  Corpus = the Python standard library sources (~16 MB
of real, low-entropy, structured text), split deterministically into train
and held-out shards by file-path hash.

Reference analog: lmdeploy/lite/utils/calib_dataloader.py loads c4/wikitext
for calibration; the gate's held-out shard plays the role of the eval set in
docs/en/quantization/kv_quant.md's accuracy tables.
"""
import glob
import hashlib
import os
import sysconfig

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'assets')
HELD_OUT_FRAC = 32        # 1/32 of files -> held-out


def corpus_files():
    lib = sysconfig.get_paths()['stdlib']
    files = sorted(glob.glob(lib + '/**/*.py', recursive=True))
    # drop encodings tables and test fixtures: near-duplicate machine output
    return [f for f in files
            if '/test/' not in f and '/tests/' not in f
            and '/encodings/' not in f and '/lib2to3/' not in f]


def split(f: str) -> str:
    rel = f.split('python3.', 1)[-1]
    h = int(hashlib.sha256(rel.encode()).hexdigest(), 16)
    return 'heldout' if h % HELD_OUT_FRAC == 0 else 'train'


def read(f: str) -> str:
    try:
        with open(f, encoding='utf-8', errors='ignore') as fh:
            return fh.read()
    except OSError:
        return ''


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    shards = {'train': [], 'heldout': []}
    for f in corpus_files():
        text = read(f)
        if len(text) >= 256:
            shards[split(f)].append(text)
    for name, docs in shards.items():
        path = os.path.join(OUT_DIR, f'corpus_{name}.txt')
        with open(path, 'w', encoding='utf-8') as fh:
            fh.write('\n\x00\n'.join(docs))     # \x00 = document separator
        print(f'{name}: {len(docs)} docs, '
              f'{os.path.getsize(path) / 1e6:.1f} MB -> {path}')


if __name__ == '__main__':
    main()
