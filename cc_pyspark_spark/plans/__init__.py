"""Named, oracle-checkable query plans — the SURVEY §2 inventory.

Importing this package populates the registry (`plans.registry.QUERIES`).
"""

from cc_pyspark_spark.plans.registry import QUERIES, Query, register  # noqa: F401

# Import for side effects: each module registers its queries.
from cc_pyspark_spark.plans import (  # noqa: F401,E402
    c4,
    curation,
    dedup,
    events,
    graphq,
    layout,
    multimodal,
    relational,
    scale,
    similarity,
    sketches,
    text,
    tpch,
    warcq,
)
