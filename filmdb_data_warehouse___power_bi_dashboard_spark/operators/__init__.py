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

for _mod_name in (
    "similarity", "text", "multimodal", "asof", "sampling", "quality", "cdc", "health"
):
    try:
        _mod = __import__(f"{__name__}.{_mod_name}", fromlist=["QUERIES", "ORACLES"])
    except ImportError:
        continue
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
