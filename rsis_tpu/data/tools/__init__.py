"""Offline dataset preparation tools (run once per dataset)."""
