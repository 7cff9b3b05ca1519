"""Offline preprocessing CLIs (reference ``scripts/``; SURVEY L-1)."""
