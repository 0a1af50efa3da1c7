"""Placeholder — populated by later milestone."""
