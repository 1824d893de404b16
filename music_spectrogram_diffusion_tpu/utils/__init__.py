"""Shared utilities: profiling, logging helpers."""
