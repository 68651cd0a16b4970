"""UDF surface (SURVEY.md §2.12) — filled incrementally."""

from __future__ import annotations
