"""Composed query plans (the reference's end-to-end transform, re-planned)."""
