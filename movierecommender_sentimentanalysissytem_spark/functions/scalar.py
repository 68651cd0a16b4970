"""Scalar function surface (SURVEY.md §2.8) — filled incrementally."""

from __future__ import annotations
