"""Autoregressive baseline model family (paper comparison config)."""
