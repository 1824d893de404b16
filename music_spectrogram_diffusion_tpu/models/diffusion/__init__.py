"""Diffusion model family: network, model API, sampler glue."""
