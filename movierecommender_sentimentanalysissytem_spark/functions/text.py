"""Text / sentiment analytics surface (SURVEY.md §2.9) — filled incrementally."""

from __future__ import annotations
