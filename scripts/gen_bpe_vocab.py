#!/usr/bin/env python3
"""Generate the fixed byte-level BPE merge table shipped as a resource
(src/main/resources/graft/bpe_merges.txt).

Deterministic offline training, GPT-2 style byte-level BPE:
  - pretokenize with the same scanner the runtime uses:
      " ?[a-zA-Z]+ | ?[0-9]+ | ?[^\\sa-zA-Z0-9]+ | \\s+"
    (leftmost-first alternation; every byte of the input is covered, so
    tokenization is lossless)
  - base vocabulary = the 256 byte values (token id == byte value)
  - iteratively merge the most frequent adjacent token pair inside
    pretokens; ties break on (count desc, left id asc, right id asc) so
    the table is bit-reproducible
  - each output line "left right" defines token id 256+line_index whose
    byte string is vocab[left] ++ vocab[right]

Training corpus: the synthetic sf0.001 documents table — any fixed corpus
yields a usable fixed vocabulary; this one keeps merge ranks realistic for
the English-like synthetic text the gate queries run on. Production users
would regenerate from their tokenizer's merges.

Usage: python3 scripts/gen_bpe_vocab.py [n_merges]
"""
import re
import sys
from collections import Counter

import duckdb

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
PRETOK = re.compile(r" ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\x0b\f\ra-zA-Z0-9]+|[ \t\n\x0b\f\r]+")

texts = [r[0] for r in duckdb.sql(
    "SELECT text FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
).fetchall()]

# pretoken -> count, as tuples of byte-token ids
words = Counter()
for t in texts:
    for m in PRETOK.finditer(t):
        words[tuple(m.group(0).encode("utf-8"))] += 1

merges = []
for step in range(N_MERGES):
    pairs = Counter()
    for w, c in words.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += c
    if not pairs:
        break
    (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    if cnt < 2:
        break
    new_id = 256 + len(merges)
    merges.append((left, right))
    merged = Counter()
    for w, c in words.items():
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == left and w[i + 1] == right:
                out.append(new_id)
                i += 2
            else:
                out.append(w[i])
                i += 1
        merged[tuple(out)] += c
    words = merged

with open("src/main/resources/graft/bpe_merges.txt", "w") as f:
    for left, right in merges:
        f.write(f"{left} {right}\n")
print(f"wrote {len(merges)} merges")
