"""Large-scale training-data pipeline operators (BASELINE.json north star).

Beyond the reference's surface: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard), similarity search over embeddings, text analysis, and
multimodal-column plumbing — every operator partition-parallel and
shuffle-conscious, designed for the 100 TB case and tested on the harness
``documents`` / ``embeddings`` tables.
"""

from icebergproject_spark.llm import (  # noqa: F401
    bpe,
    dedup,
    linalg,
    multimodal,
    sharding,
    similarity,
    text,
)
