"""Flax model library: shared layers plus diffusion and AR model families."""
