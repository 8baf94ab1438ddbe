"""Large-scale pipeline operators beyond the reference surface:
dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
cosine), similarity search, text analysis, multimodal column plumbing.

Each module contributes (query, oracle) pairs; hash-dependent
operators (minhash/simhash/LSH) register without oracles and get the
driver's rows-only check — their quality properties are asserted in
pytest instead (tests/test_operators.py).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}

from . import dedup  # noqa: E402

QUERIES.update(dedup.QUERIES)
ORACLES.update(dedup.ORACLES)

# STRICT imports: every module here contributes gate-registered
# queries, so a broken import must fail loudly — a lenient
# `except ImportError: continue` would silently shrink the registry
# (registry() only raises for unknown names, not missing ones).
from . import (  # noqa: E402
    asof,
    bpe,
    cdc,
    chunking,
    classifier,
    collocation,
    dq,
    dsir,
    frequent,
    funnel,
    graph,
    health,
    linkage,
    lm,
    maintenance,
    multimodal,
    privacy,
    quality,
    release,
    retention,
    retrieval,
    sampling,
    segments,
    sequence,
    sketches,
    similarity,
    text,
    trend,
    vectors,
    versioning,
)

for _mod in (
    similarity,
    text,
    multimodal,
    asof,
    frequent,
    sampling,
    quality,
    cdc,
    health,
    chunking,
    funnel,
    segments,
    vectors,
    lm,
    maintenance,
    retrieval,
    retention,
    trend,
    linkage,
    graph,
    classifier,
    privacy,
    bpe,
    versioning,
    sequence,
    dq,
    collocation,
    sketches,
    release,
    dsir,
):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
