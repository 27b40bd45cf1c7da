"""Offline QA harnesses (regression-by-windows; not part of the hot path)."""
