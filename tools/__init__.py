"""Repo maintenance tools (bench diffing, explain/index generation)."""
