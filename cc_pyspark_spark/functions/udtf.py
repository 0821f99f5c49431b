"""Python UDTFs (Spark 4) — the modern form of the reference's
one-record-to-N-rows generators (SURVEY.md §2.10 U2).

Most U2 cases compile to `explode` over array expressions (preferred —
JVM-side); a UDTF is the escape hatch when row expansion needs real
Python logic. `SentenceSplitUdtf` is the registered example: lateral
sentence expansion usable from SQL:

    spark.sql("SELECT d.doc_id, s.* FROM documents d, "
              "LATERAL split_sentences(d.doc_id, d.text) s")
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_RE = re.compile(r"[^.!?]+[.!?]?")


@udtf(returnType="doc_id: bigint, sentence_idx: int, sentence: string")
class SentenceSplitUdtf:
    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        idx = 0
        for m in _SENTENCE_RE.finditer(text):
            s = m.group(0).strip()
            if s:
                yield doc_id, idx, s
                idx += 1


def register_udtfs(spark) -> None:
    spark.udtf.register("split_sentences", SentenceSplitUdtf)
