"""Large-scale training-data pipeline operators (BASELINE.json north star):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, and multimodal column plumbing.

Every operator is pure DataFrame-API composition over built-in functions
(JVM-side, whole-stage codegen) except the multimodal decoders, which are
Arrow-batched Pandas UDFs by necessity.
"""

from __future__ import annotations


def register_all() -> None:
    from .. import harness
    from . import (
        clustering,
        curation,
        dedup,
        indexing,
        multimodal,
        projection,
        similarity,
        text,
    )

    for mod in (
        text,
        dedup,
        similarity,
        curation,
        clustering,
        multimodal,
        indexing,
        projection,
    ):
        for name, (fn, sql) in mod.QUERIES.items():
            harness.register(name, fn, sql)
