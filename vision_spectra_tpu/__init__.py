"""vision-spectra-tpu: TPU-native framework for spectral analysis of ViT training.

A ground-up JAX / Flax / XLA / Pallas rebuild of the vision-spectra research
framework: Vision Transformer training (supervised, MAE-style masked image
modeling, finetuning, multitask) with per-layer spectral instrumentation —
batched on-device SVD, spectral entropy, stable rank, power-law exponents —
plus a six-scenario experiment grid, statistical comparison, and publication
figures.

Subpackages
-----------
- ``config``: pydantic config tree (CLI > YAML > env > defaults)
- ``data``: host pipelines producing fixed-shape uint8 batches; device-side aug
- ``models``: Flax ViT / MIM / multitask models
- ``ops``: Pallas kernels and fused device ops
- ``losses``: pure-function loss zoo + registry
- ``spectral``: SVD-based weight instrumentation (the science core)
- ``training``: jitted train/eval steps + host epoch drivers
- ``tracking``: MLflow-file-store-compatible experiment tracking
- ``parallel``: device mesh + sharding rules (dp / tp)
- ``experiments`` / ``analysis``: sweep drivers and publication figures
"""

__version__ = "0.1.0"
