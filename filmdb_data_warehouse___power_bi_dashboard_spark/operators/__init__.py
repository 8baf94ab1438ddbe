"""Large-scale pipeline operators beyond the reference surface
(BASELINE.json north star): dedup, similarity search, text analysis,
multimodal column plumbing. Each module contributes query-registry
entries via its QUERIES/ORACLES dicts.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
