"""Training-data pipeline contract queries (dedup family, similarity
search, text analysis, multimodal plumbing) — filled in as operators land.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
