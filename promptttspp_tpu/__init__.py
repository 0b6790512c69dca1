"""promptttspp_tpu: a TPU-native JAX/XLA/Pallas framework with the
capabilities of PromptTTS++ (line/promptttspp, ICASSP 2024).

Brand-new design, not a port: [B, T, C] layouts (lane-aligned channels),
pure-functional flax modules, lax scans for sequential structure, Pallas
kernels for the vocoder hot path, and pjit/shard_map mesh parallelism.
"""

__version__ = "0.1.0"
