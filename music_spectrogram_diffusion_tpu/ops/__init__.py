"""Pure-JAX compute kernels (diffusion math, STFT/mel, attention)."""
