"""Placeholder — filled in as coverage widens."""
