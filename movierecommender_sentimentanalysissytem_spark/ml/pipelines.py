"""MLlib pipelines: ALS recommender + sentiment classifier (SURVEY.md §2.9)."""

from __future__ import annotations
