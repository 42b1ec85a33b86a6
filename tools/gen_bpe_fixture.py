#!/usr/bin/env python3
"""Independent BPE oracle for the `text_bpe` query.

Re-implements the train+segment algorithm from scratch in pure Python
(Sennrich-style merges over the doc_id%5==0 slice's word histogram,
numMerges=40; greedy lowest-rank segmentation; 8-token preview) and
writes the expected output for a given sf dir as a parquet fixture.

Usage: gen_bpe_fixture.py <sf_dir> <out_parquet>

The committed fixture (fixtures/text_bpe_expected.parquet, generated at
sf0.01) turns the one rows-only CORRECTNESS cell into a full
rows+schema+hash gate: two independent implementations of the algorithm
must agree byte-for-byte. Regenerate with this script if the driver's
testdata generation changes documents.parquet.
"""
import re
import sys

import pandas as pd

EOW = "</w>"
NUM_MERGES = 40
PREVIEW = 8
WORD_RE = re.compile(r"[^a-z0-9]+")


def words(text: str):
    return [w for w in WORD_RE.split(text.lower()) if w]


def train(texts, num_merges):
    hist = {}
    for t in texts:
        for w in words(t):
            hist[w] = hist.get(w, 0) + 1
    vocab = [(list(w) + [EOW], c) for w, c in hist.items()]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        # total order: count desc, then pair lexicographic
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = []
        for syms, c in vocab:
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, c))
        vocab = new_vocab
    return merges


def apply_merges(word, rank):
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_i < 0:
            break
        syms = syms[:best_i] + [syms[best_i] + syms[best_i + 1]] + syms[best_i + 2:]
    return syms


def main(sf_dir, out_path):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    train_slice = docs[docs.doc_id % 5 == 0]
    merges = train(train_slice.text.tolist(), NUM_MERGES)
    rank = {m: i for i, m in enumerate(merges)}
    cache = {}
    rows = []
    for doc_id, text in zip(docs.doc_id, docs.text):
        n = 0
        preview = []
        for w in words(text):
            toks = cache.get(w)
            if toks is None:
                toks = apply_merges(w, rank)
                cache[w] = toks
            n += len(toks)
            if len(preview) < PREVIEW:
                preview.extend(toks[: PREVIEW - len(preview)])
        rows.append((int(doc_id), n, " ".join(preview)))
    out = pd.DataFrame(rows, columns=["doc_id", "n_bpe_tokens", "preview"])
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_bpe_tokens"] = out["n_bpe_tokens"].astype("int64")
    out.to_parquet(out_path, index=False)
    print(f"wrote {len(out)} rows, {len(merges)} merges -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
