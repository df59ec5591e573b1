"""Repo maintenance tools (importable so tests share their predicates)."""
