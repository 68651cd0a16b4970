"""Streaming operators over the events table (SURVEY.md §2.11)."""

from __future__ import annotations
