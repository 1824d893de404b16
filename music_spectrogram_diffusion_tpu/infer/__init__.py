"""Inference: single-segment predictor and full-song renderer."""
