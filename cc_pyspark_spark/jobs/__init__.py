"""Reference job parity as DataFrame pipelines over the records DataFrame."""

from cc_pyspark_spark.jobs.pipelines import (  # noqa: F401
    html_tag_count,
    server_count,
    server_ip_address,
    sitemaps_from_robotstxt,
    wat_extract_host_links,
    word_count,
)
