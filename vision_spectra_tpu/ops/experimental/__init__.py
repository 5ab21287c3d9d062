"""Measured-loser kernel paths, quarantined (VERDICT r4 weak #3 / next #4).

Every module here is a COMPLETE, parity-tested implementation that LOST its
A/B measurement against the shipped default (numbers recorded in
results/RESULTS.md). They stay importable so the measurements remain
reproducible, but they are not part of the product dispatch's default
surface and their parity tests only run under ``pytest -m experimental``.

- ``block_hybrid`` — split-stage hybrid block (``VST_P4_HYBRID=1``):
  Pallas LN1+QKV, head-batched XLA attention, Pallas proj+LN2+MLP.
  3.8x slower than the monolithic fused block at patch-4.
- ``midn_alternatives`` — alternative mid-N attention formulations inside
  the fused block: whole-tile masked [T, T] scores (``VST_MIDN_MASKED=1``)
  and the batched 3-D-dot per-image mode (``VST_MIDN_BATCHED=1``).
"""
