"""Large-scale data-pipeline operators (beyond the reference's OLAP surface).

These are the training-data-pipeline primitives a 100 TB corpus needs —
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search (brute-force + LSH-bucketed), text analysis (language ID,
quality scoring, token counting, fingerprinting) and multimodal column
plumbing.  All hot paths are built from JVM-side ``pyspark.sql.functions``
expressions (whole-stage codegen, no Python row loops); Pandas UDFs appear
only where Python is genuinely required (multimodal decode).
"""

from . import (  # noqa: F401
    dedup,
    events,
    finance,
    multimodal,
    packing,
    pipeline,
    sampling,
    sessions,
    similarity,
    text,
    util,
)
