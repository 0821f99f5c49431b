"""Byte-level BPE tokenizer with a vendored merge table.

Beyond-reference: the reference's only token unit is the regex word
(word_count.py:25 ``\\w+``); an LLM-data pipeline's capacity unit is
the BPE token, so the packing / quality operators accept
``tokenizer="bpe"`` backed by this module.

Design: byte-level BPE (every byte is a base token, so *any* string
round-trips exactly), GPT-2-style pre-tokenization regex, greedy
lowest-rank merging. The merge table is DATA, not code —
``bpe_vocab.json`` next to this file, trained once by
``scripts/gen_bpe_vocab.py`` with deterministic tie-breaking and
committed. Ids: 0–255 = raw bytes, 256+k = k-th merge.

Spark surface: Arrow-batched pandas UDF (`token_count_udf`), with an
`lru_cache` per pre-token — natural text repeats pre-tokens heavily, so
the per-row cost collapses to dict lookups. Never a row-at-a-time
`F.udf`.
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache

#: GPT-2-style pre-tokenizer: a leading space sticks to the word it
#: precedes; letter runs, digit runs, symbol runs, and whitespace runs
#: are separate pre-tokens. Merges never cross pre-token boundaries —
#: this is what makes token counts additive over whitespace-joined
#: concatenation (pinned by a property test).
PRETOKEN_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

_VOCAB_PATH = os.path.join(os.path.dirname(__file__), "bpe_vocab.json")

with open(_VOCAB_PATH, "rb") as _f:
    #: [(left_id, right_id), ...] — pair k defines token id 256+k.
    MERGES: list[tuple[int, int]] = [tuple(m) for m in json.load(_f)["merges"]]

_RANK: dict[tuple[int, int], int] = {pair: i for i, pair in enumerate(MERGES)}

#: id → bytes for the full vocab (built bottom-up; merges only refer to
#: earlier ids, which the trainer guarantees).
TOKEN_BYTES: list[bytes] = [bytes([i]) for i in range(256)]
for _l, _r in MERGES:
    TOKEN_BYTES.append(TOKEN_BYTES[_l] + TOKEN_BYTES[_r])

VOCAB_SIZE = len(TOKEN_BYTES)


@lru_cache(maxsize=1 << 16)
def _encode_pretoken(tok: bytes) -> tuple[int, ...]:
    """BPE-merge one pre-token's bytes; cached (text repeats words)."""
    ids = list(tok)
    while len(ids) > 1:
        best_rank = None
        for i in range(len(ids) - 1):
            r = _RANK.get((ids[i], ids[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        left, right = MERGES[best_rank]
        merged = 256 + best_rank
        out: list[int] = []
        i = 0
        while i < len(ids):
            if i + 1 < len(ids) and ids[i] == left and ids[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(ids[i])
                i += 1
        ids = out
    return tuple(ids)


def encode(text: str) -> list[int]:
    """Text → token ids. Exact inverse of `decode` for any input."""
    ids: list[int] = []
    for tok in PRETOKEN_RE.findall(text):
        ids.extend(_encode_pretoken(tok.encode("utf-8")))
    return ids


def decode(ids: list[int]) -> str:
    return b"".join(TOKEN_BYTES[i] for i in ids).decode("utf-8")


def token_count(text: str) -> int:
    n = 0
    for tok in PRETOKEN_RE.findall(text):
        n += len(_encode_pretoken(tok.encode("utf-8")))
    return n


def token_count_udf():
    """Arrow-batched pandas UDF: text column → bigint token count."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    def _count(s):  # pd.Series -> pd.Series (hints omitted: local scope)
        return s.map(lambda t: token_count(t) if t is not None else None)

    return pandas_udf(_count, "long")
