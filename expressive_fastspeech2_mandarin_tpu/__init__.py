"""TPU-native Mandarin expressive-TTS framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
Expressive-FastSpeech2-Mandarin reference (FastSpeech2 acoustic model with
speaker + emotion/arousal/valence conditioning, variance adaptor with
pitch/energy/duration control, HiFi-GAN vocoder, Mandarin pinyin text
front-end, offline feature-extraction pipeline, and training loop), designed
TPU-first: static bucketed shapes, vectorized length regulation, pjit/mesh
data parallelism, and Pallas kernels on the hot paths.

Reference parity targets are cited per-module as ``reference: <file:line>``
pointing into the upstream repo.
"""

__version__ = "0.1.0"
