"""Training-data export: gate → dedup → sharded JSONL.gz round-trip."""

from __future__ import annotations

import glob
import gzip
import json

from cc_pyspark_spark.operators.export import export_training_jsonl
from tests.conftest import SF_DIR


def test_export_training_jsonl(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "train")
    n = export_training_jsonl(
        docs, out, min_tokens=5, n_shards=3, extra_cols=["lang"]
    )
    n_unique = docs.select("text").distinct().count()
    assert n == n_unique  # fixture has no sub-5-token docs; dedup by text

    files = sorted(glob.glob(out + "/part-*.json.gz"))
    assert 1 <= len(files) <= 3
    rows = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            rows += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(rows) == n
    assert all({"doc_id", "text", "lang"} <= set(r) for r in rows)
    # deterministic sharding: doc_id ranges don't interleave across shards
    per_file_ids = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            ids = [json.loads(ln)["doc_id"] for ln in fh if ln.strip()]
        if ids:
            per_file_ids.append((min(ids), max(ids)))
    per_file_ids.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(per_file_ids, per_file_ids[1:]):
        assert hi1 < lo2
