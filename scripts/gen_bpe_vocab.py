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

EXPAND = "--expand" in sys.argv
N_MERGES = (int(sys.argv[1]) if len(sys.argv) > 1 and not EXPAND else 512)
PRETOK = re.compile(r" ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\x0b\f\ra-zA-Z0-9]+|[ \t\n\x0b\f\r]+")

texts = [] if EXPAND else [r[0] for r in duckdb.sql(
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

if not EXPAND:
    with open("src/main/resources/graft/bpe_merges.txt", "w") as f:
        for left, right in merges:
            f.write(f"{left} {right}\n")
    print(f"wrote {len(merges)} merges")

# ---------------------------------------------------------------------------
# --expand mode (r15): the synthetic corpus saturates BPE training at ~127
# merges (61 distinct pretokens at sf0.1 — measured), far from the 32k-100k
# vocabularies production tokenizers carry. To exercise the tokenizer
# machinery at production vocabulary scale with a DETERMINISTIC, corpus-
# derived table, this mode expands the training histogram with a seeded
# Markov word generator whose letter-transition statistics come from the
# corpus itself, then trains n_merges with an incremental pair-count BPE
# trainer (same merge/tie rules as above, just O(affected words) per merge).
# Usage: python3 scripts/gen_bpe_vocab.py --expand 8192
def expand_and_train(n_merges, out_path):
    # corpus histogram from the LARGER slice (sf0.1), real words kept at
    # their true weights so common corpus words stay early merges
    texts01 = [r[0] for r in duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY doc_id"
    ).fetchall()]
    words = Counter()
    for t in texts01:
        for m in PRETOK.finditer(t):
            words[m.group(0)] += 1

    # letter-bigram transition stats + length distribution from the corpus
    # alpha pretokens (strip the GPT-2 leading space for the chain)
    trans = {}
    lengths = Counter()
    for w, c in words.items():
        core = w[1:] if w.startswith(" ") else w
        if not core.isalpha():
            continue
        lengths[len(core)] += c
        prev = "^"
        for ch in core.lower():
            trans.setdefault(prev, Counter())[ch] += c
            prev = ch
    # deterministic cumulative tables (sorted keys)
    ctrans = {k: sorted(v.items()) for k, v in trans.items()}
    clens = sorted(lengths.items())

    state = [0x9E3779B97F4A7C15]
    def rng():
        x = state[0]
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        state[0] = x
        return x

    def pick(pairs):
        tot = sum(c for _, c in pairs)
        r = rng() % tot
        for k, c in pairs:
            if r < c:
                return k
            r -= c
        return pairs[-1][0]

    def gen_word():
        n = pick(clens)
        prev = "^"
        out = []
        for _ in range(n):
            if prev not in ctrans:
                prev = "^"
            ch = pick(ctrans[prev])
            out.append(ch)
            prev = ch
        return "".join(out)

    # ~30k distinct synthetic words, Zipf-weighted so pair counts stay >= 2
    # and merge ranks have a realistic frequency shape
    target = 30000
    seen = set(words)
    rank = 0
    while rank < target:
        w = " " + gen_word()
        if w in seen:
            continue
        seen.add(w)
        words[w] = max(2, target // (rank + 10))
        rank += 1

    # incremental-pair-count BPE: same (count desc, (left,right) asc) rule
    word_ids = [list(w.encode("utf-8")) for w in words]
    word_cnt = list(words.values())
    pair_counts = Counter()
    pair_words = {}
    for wi, (ids, c) in enumerate(zip(word_ids, word_cnt)):
        for p in zip(ids, ids[1:]):
            pair_counts[p] += c
            pair_words.setdefault(p, set()).add(wi)
    merges = []
    for step in range(n_merges):
        if not pair_counts:
            break
        (left, right), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        new_id = 256 + len(merges)
        merges.append((left, right))
        affected = list(pair_words.get((left, right), ()))
        for wi in affected:
            ids = word_ids[wi]
            c = word_cnt[wi]
            # remove this word's old pair contributions
            for p in zip(ids, ids[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            # apply the merge leftmost-first
            out, i = [], 0
            while i < len(ids):
                if i + 1 < len(ids) and ids[i] == left and ids[i + 1] == right:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(ids[i])
                    i += 1
            word_ids[wi] = out
            # add back the new contributions
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words.setdefault(p, set()).add(wi)
    with open(out_path, "w") as f:
        for left, right in merges:
            f.write(f"{left} {right}\n")
    print(f"wrote {len(merges)} merges to {out_path}")


if "--expand" in sys.argv:
    n = int(sys.argv[sys.argv.index("--expand") + 1])
    expand_and_train(n, "src/main/resources/graft/bpe_merges_8k.txt")
