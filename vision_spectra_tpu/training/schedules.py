"""Host-side learning-rate schedules.

The reference drives LR from torch schedulers plus a manual per-step linear
warmup (reference: vision_spectra/training/base.py:139-176, 267-272). Here the
learning rate is a **traced scalar argument** of the jitted train step — the
host computes it each step, which unifies warmup / cosine / step / plateau
under one mechanism with zero recompilation (the LR is data, not code).

Semantics preserved:
- linear per-step warmup over ``warmup_epochs`` epochs: ``lr · (s+1)/S_w``,
- cosine annealing with ``T_max = epochs − warmup_epochs`` and
  ``eta_min = min_lr``, advanced once per epoch after warmup,
- StepLR: ``lr · γ^⌊e/step_size⌋`` (γ = 0.1, step 30), after warmup,
- ReduceLROnPlateau: factor 0.1 / patience 10 on validation loss, stepped on
  every epoch (plateau ignores the warmup gate, as the reference does).
"""

from __future__ import annotations

import math

from vision_spectra_tpu.config import OptimizerConfig, SchedulerName


class LRSchedule:
    """Stateful host scheduler producing the LR for any (epoch, step)."""

    def __init__(
        self,
        config: OptimizerConfig,
        epochs: int,
        steps_per_epoch: int,
    ) -> None:
        self.config = config
        self.base_lr = config.learning_rate
        self.epochs = epochs
        self.steps_per_epoch = max(1, steps_per_epoch)
        self.warmup_steps = config.warmup_epochs * self.steps_per_epoch
        # epoch-level decay state (advanced by step_epoch / step_plateau)
        self._epoch_lr = self.base_lr
        self._epochs_stepped = 0
        # plateau state
        self._plateau_best = math.inf
        self._plateau_bad_epochs = 0

    def lr_for_step(self, global_step: int) -> float:
        """LR for one optimizer step (handles the warmup ramp)."""
        if global_step < self.warmup_steps:
            return self.base_lr * (global_step + 1) / self.warmup_steps
        return self._epoch_lr

    def step_epoch(self, epoch: int, val_loss: float | None = None) -> None:
        """Advance epoch-level decay; call once at the end of each epoch.

        ``epoch`` is 0-based (the epoch just finished). Mirrors the reference
        gating: plateau steps on val loss every epoch; cosine/step only after
        warmup (training/base.py:267-272).
        """
        cfg = self.config
        name = cfg.scheduler
        if name == SchedulerName.NONE:
            return
        if name == SchedulerName.PLATEAU:
            if val_loss is None:
                return
            if val_loss < self._plateau_best - 1e-12:
                self._plateau_best = val_loss
                self._plateau_bad_epochs = 0
            else:
                self._plateau_bad_epochs += 1
                if self._plateau_bad_epochs > cfg.plateau_patience:
                    self._epoch_lr = max(self._epoch_lr * cfg.plateau_factor, cfg.min_lr)
                    self._plateau_bad_epochs = 0
            return
        if epoch + 1 <= cfg.warmup_epochs:
            return
        self._epochs_stepped += 1
        t = self._epochs_stepped
        if name == SchedulerName.COSINE:
            t_max = max(1, self.epochs - cfg.warmup_epochs)
            t_eff = min(t, t_max)
            self._epoch_lr = cfg.min_lr + (self.base_lr - cfg.min_lr) * 0.5 * (
                1 + math.cos(math.pi * t_eff / t_max)
            )
        elif name == SchedulerName.STEP:
            self._epoch_lr = self.base_lr * (cfg.gamma ** (t // cfg.step_size))

    @property
    def current_lr(self) -> float:
        return self._epoch_lr
