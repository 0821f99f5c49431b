"""WET extraction with per-file side-output (wet_extractor.py parity, K4).

One WET file per input WARC file: response records → HTML→text →
`conversion` records written with the engine's WARC writer. The write
is a *side output* (not a DataFrame sink — same as the reference's
`write_output_file`, sparkcc.py:818-848): it runs inside
`applyInPandas` grouped by `warc_filename`, so each task owns exactly
one output file, and the returned DataFrame is the write manifest
(filename → wet path, record count) for idempotence checks
(wet_extractor.py:144-146 `check_for_output_file`).

Text extraction happens JVM-side *before* the Python stage — only
(filename, offset, uri, date, text) strings cross the Arrow boundary,
never raw HTML bytes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc_pyspark_spark.functions.html import html_to_text
from cc_pyspark_spark.sources.warc import is_html

WET_MANIFEST_SCHEMA = (
    "warc_filename string, wet_path string, n_records bigint, skipped boolean"
)


def extract_wet_files(
    records: DataFrame, output_dir: str, overwrite: bool = False
) -> DataFrame:
    """records DataFrame → WET files under `output_dir` + manifest DF."""
    resp = records.filter(
        (F.col("record_type") == "response") & is_html()
    ).select(
        "warc_filename",
        "warc_record_offset",
        "target_uri",
        "warc_date",
        html_to_text(F.expr("make_valid_utf8(cast(payload as string))")).alias(
            "text"
        ),
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from cc_pyspark_spark.sources.warcio_lite import WarcWriter  # noqa: PLC0415

        import hashlib  # noqa: PLC0415

        warc_name = pdf["warc_filename"].iloc[0]
        base = os.path.basename(warc_name).replace(".warc.gz", "").replace(
            ".warc", ""
        )
        # Two inputs with the same basename in different directories must
        # not collide on one wet_path (the idempotence check would
        # silently drop the second group) — disambiguate with a short
        # hash of the full input path.
        tag = hashlib.sha1(warc_name.encode()).hexdigest()[:8]
        wet_path = os.path.join(output_dir, f"{base}-{tag}.warc.wet.gz")
        if os.path.exists(wet_path) and not overwrite:  # idempotence check
            return pd.DataFrame(
                [
                    {
                        "warc_filename": warc_name,
                        "wet_path": wet_path,
                        "n_records": 0,
                        "skipped": True,
                    }
                ]
            )
        pdf = pdf.sort_values("warc_record_offset")
        os.makedirs(output_dir, exist_ok=True)
        tmp_path = wet_path + ".tmp"
        n = 0
        with open(tmp_path, "wb") as fh:
            w = WarcWriter(fh, gzip_members=True)
            w.write_record(
                "warcinfo",
                f"software: cc-pyspark-spark WET extractor\r\nsource: {warc_name}\r\n".encode(),
                content_type="application/warc-fields",
            )
            for row in pdf.itertuples(index=False):
                w.write_record(
                    "conversion",
                    (row.text or "").encode("utf-8"),
                    target_uri=row.target_uri,
                    content_type="text/plain",
                    warc_date=row.warc_date or "2017-03-20T10:00:00Z",
                )
                n += 1
        os.replace(tmp_path, wet_path)  # atomic publish per task
        return pd.DataFrame(
            [
                {
                    "warc_filename": warc_name,
                    "wet_path": wet_path,
                    "n_records": n,
                    "skipped": False,
                }
            ]
        )

    return resp.groupBy("warc_filename").applyInPandas(
        write_group, WET_MANIFEST_SCHEMA
    )
