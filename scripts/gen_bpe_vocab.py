#!/usr/bin/env python
"""Train the vendored BPE merge table and the oracle token-count fixture.

Run offline; outputs are committed as data:
  cc_pyspark_spark/functions/bpe_vocab.json     — the merge table
  cc_pyspark_spark/functions/bpe_token_fixture.json
      — {md5(text): token_count} for every document text at sf0.001 and
        sf0.01, letting the `text_bpe_token_count` DuckDB oracle join
        md5(d.text) → precomputed count at either scale factor.

Training is classic BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): count adjacent symbol
pairs over the pre-tokenized corpus, repeatedly merge the most frequent
pair. Deterministic: ties break by comparing the NEGATED byte tuples of
(left, right) under max() — i.e. bytewise-smallest wins, except that
when one candidate's bytes are a proper prefix of another's the LONGER
token wins (negated-tuple ordering); corpus order is fixed (sf
ascending, doc_id ascending). The committed vocab was produced by this
exact rule — keep the rule and the data in sync. Re-running this
script after a driver testdata regeneration refreshes both files.
"""

from __future__ import annotations

import collections
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_MERGES = 384
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "cc_pyspark_spark", "functions"
)


def load_corpus() -> list[str]:
    import duckdb

    con = duckdb.connect()
    texts: list[str] = []
    for sf in SF_DIRS:
        rows = con.sql(
            f"SELECT text FROM '{sf}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
        texts.extend(r[0] for r in rows)
    return texts


def train(texts: list[str], n_merges: int) -> list[tuple[int, int]]:
    from cc_pyspark_spark.functions.bpe import PRETOKEN_RE  # regex only

    words: collections.Counter[bytes] = collections.Counter()
    for t in texts:
        for tok in PRETOKEN_RE.findall(t):
            words[tok.encode("utf-8")] += 1

    # word → current symbol-id sequence
    seqs: dict[bytes, list[int]] = {w: list(w) for w in words}
    token_bytes: list[bytes] = [bytes([i]) for i in range(256)]
    merges: list[tuple[int, int]] = []

    for _ in range(n_merges):
        pairs: collections.Counter[tuple[int, int]] = collections.Counter()
        for w, seq in seqs.items():
            f = words[w]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = max(
            pairs.items(),
            key=lambda kv: (
                kv[1],
                # ties: lexicographically smallest byte pair wins —
                # invert bytes so max() picks the smallest
                tuple(-x for x in token_bytes[kv[0][0]]),
                tuple(-x for x in token_bytes[kv[0][1]]),
            ),
        )
        (left, right), count = best
        if count < 2:
            break
        merges.append((left, right))
        new_id = len(token_bytes)
        token_bytes.append(token_bytes[left] + token_bytes[right])
        for w, seq in seqs.items():
            if len(seq) < 2:
                continue
            out: list[int] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def main() -> None:
    texts = load_corpus()
    merges = train(texts, N_MERGES)
    vocab_path = os.path.join(OUT_DIR, "bpe_vocab.json")
    with open(vocab_path, "w") as f:
        json.dump({"merges": [list(m) for m in merges]}, f)
    print(f"wrote {vocab_path}: {len(merges)} merges")

    # Reload the tokenizer against the fresh vocab for fixture counts.
    import importlib

    import cc_pyspark_spark.functions.bpe as bpe

    importlib.reload(bpe)
    fixture: dict[str, int] = {}
    for t in texts:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        if h not in fixture:
            fixture[h] = bpe.token_count(t)
    fix_path = os.path.join(OUT_DIR, "bpe_token_fixture.json")
    with open(fix_path, "w") as f:
        json.dump(fixture, f, sort_keys=True)
    print(f"wrote {fix_path}: {len(fixture)} texts")


if __name__ == "__main__":
    main()
