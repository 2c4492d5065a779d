"""Extension operators (SURVEY.md §2.13, M5): LLM-data-pipeline queries over
the ``documents`` and ``embeddings`` tables. Populated incrementally; each
entry keeps its oracle SQL adjacent.
"""

from __future__ import annotations

from candyspark.plans import QuerySpec

REGISTRY: dict[str, QuerySpec] = {}
