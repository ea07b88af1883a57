"""Placeholder — filled in as the family is implemented."""
