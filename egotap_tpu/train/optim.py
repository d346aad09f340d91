"""Optimizers and LR schedules (optax), matching the reference exactly.

Reference: model/network.py:35-118.
  * Adam with L2-style weight decay folded into the gradient (torch Adam
    semantics) and the reference's eps=1e-4 default.
  * AdamW decoupled weight decay.
  * Learned-LR optimizers DAdam (D-Adaptation, decoupled variant) and
    Prodigy via optax.contrib (reference model/network.py:79-116 uses the
    dadaptation / prodigyopt packages with lr=1.0 under the schedule).
  * Schedules: 'lambda' linear decay stepped per epoch, 'step', 'exponent',
    'cos_anneal' per-iteration, and 'cos_anneal_warmup' (HF
    get_cosine_schedule_with_warmup: linear warmup over niter epochs of
    iterations, then cosine to zero).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from egotap_tpu.core.config import Config


def make_schedule(cfg: Config, iters_per_epoch: int) -> Callable:
    """Return lr(step). Epoch-granular policies ('lambda', 'step',
    'exponent') change once per epoch like torch schedulers stepped at
    epoch end; 'cos_anneal*' follow the global step."""
    base = cfg.lr
    ipe = max(1, iters_per_epoch)

    def sched(step):
        if cfg.lr_policy == "lambda":
            epoch = step // ipe
            factor = 1.0 - jnp.maximum(
                0.0, epoch + cfg.epoch_count - cfg.niter
            ) / float(cfg.niter_decay + 1)
            # the reference never runs past niter+niter_decay epochs, where
            # this factor would go negative — clamp for safety
            return base * jnp.maximum(0.0, factor)
        if cfg.lr_policy == "step":
            epoch = step // ipe
            return base * 0.5 ** (epoch // cfg.lr_decay_iters_step)
        if cfg.lr_policy == "exponent":
            return base * 0.95 ** (step // ipe)
        if cfg.lr_policy == "cos_anneal":
            t_max = max(1, (cfg.niter + cfg.niter_decay) * ipe)
            return base * 0.5 * (1 + jnp.cos(
                jnp.pi * jnp.minimum(step, t_max) / t_max))
        if cfg.lr_policy == "cos_anneal_warmup":
            warmup = cfg.niter * ipe
            total = (cfg.niter + cfg.niter_decay) * ipe
            progress = (step - warmup) / max(1, total - warmup)
            cos = base * jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(
                jnp.pi * jnp.minimum(progress, 1.0))))
            if warmup > 0:
                return jnp.where(step < warmup,
                                 base * step / max(1, warmup), cos)
            return cos
        raise NotImplementedError(f"lr policy {cfg.lr_policy}")

    return sched


def make_optimizer(cfg: Config, iters_per_epoch: int) -> optax.GradientTransformation:
    sched = make_schedule(cfg, iters_per_epoch)
    if cfg.optimizer_type == "Adam":
        # torch Adam semantics: weight decay is L2 added to the gradient
        chain = []
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain += [optax.scale_by_adam(eps=cfg.opt_eps),
                  optax.scale_by_learning_rate(sched)]
        return optax.chain(*chain)
    if cfg.optimizer_type == "AdamW":
        return optax.adamw(sched, eps=cfg.opt_eps,
                           weight_decay=cfg.weight_decay)
    if cfg.optimizer_type == "SGD":
        chain = []
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.sgd(sched))
        return optax.chain(*chain)
    # Learned-LR optimizers (reference model/network.py:79-116: DAdaptAdam /
    # Prodigy with base lr 1.0 times the schedule; growth_rate defaults to
    # inf there, i.e. uncapped, which matches optax.contrib's behavior).
    if cfg.optimizer_type == "DAdam":
        # the reference's recommended configuration passes --decouple
        # (AdamW-style decay), which is the variant optax.contrib ships
        from optax.contrib import dadapt_adamw
        return _with_extra_args(dadapt_adamw(
            learning_rate=_relative(sched, cfg.lr), eps=cfg.opt_eps,
            weight_decay=cfg.weight_decay))
    if cfg.optimizer_type == "Prodigy":
        from optax.contrib import prodigy
        return _with_extra_args(prodigy(
            learning_rate=_relative(sched, cfg.lr), eps=cfg.opt_eps,
            estim_lr_coef=cfg.d_coef, weight_decay=cfg.weight_decay,
            safeguard_warmup=True))  # network.py:116
    raise NotImplementedError(f"optimizer {cfg.optimizer_type}")


def _relative(sched: Callable, base: float) -> Callable:
    """D-Adaptation runs at lr=1.0 scaled by the schedule shape: the torch
    scheduler multiplies the optimizer's lr=1.0 by schedule(step)/base."""
    return lambda step: sched(step) / base


def _with_extra_args(tx) -> optax.GradientTransformation:
    """Adapt a GradientTransformationExtraArgs to the plain 3-arg update
    protocol task train_steps use."""
    def init(params):
        # contrib learned-LR optimizers keep the initial params in their
        # state (p0); copy so the opt_state never aliases param buffers —
        # train_step donates the whole state and XLA rejects donating the
        # same buffer twice
        return tx.init(jax.tree.map(jnp.array, params))

    def update(grads, state, params=None):
        return tx.update(grads, state, params)
    return optax.GradientTransformation(init, update)
