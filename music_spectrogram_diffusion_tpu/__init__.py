"""TPU-native music spectrogram diffusion framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
magenta/music-spectrogram-diffusion (ISMIR 2022, arXiv 2206.05408):
MIDI note events -> mel spectrograms via a T5-style encoder-decoder
diffusion model (or an autoregressive baseline), then mel spectrograms
-> 16 kHz audio via a GAN vocoder — all on device.

Layout:
  ops/       pure-JAX math kernels: diffusion, STFT/mel, attention, Pallas
  models/    Flax networks + model classes (diffusion, autoregressive)
  audio/     audio codecs (mel frontend) and the on-device vocoder
  midi/      event codec, vocabularies, note sequences, run-length encoding
  data/      dataset configs, preprocessors, feature converters, tasks
  parallel/  mesh construction, logical-axis sharding rules
  train/     train loop, optimizer, checkpointing, metrics
  infer/     single-segment predictor + full-song segment-chaining renderer
  utils/     profiling and misc helpers
"""

__version__ = "0.1.0"
