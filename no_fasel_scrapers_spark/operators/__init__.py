"""Crawl + analytics operators (SURVEY.md §2)."""
