"""Semantic metrics layer (Power BI measure surface) — filled in next."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
