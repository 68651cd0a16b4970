"""Deduplication operators (SURVEY.md §2.10) — filled incrementally."""

from __future__ import annotations
