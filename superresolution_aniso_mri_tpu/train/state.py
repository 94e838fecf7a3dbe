"""Train state: params + BN stats + optax optimizer.

Replaces the reference's torch Adam setup
(reference: kwatsch/trainer_ae.py:29-33 — Adam(lr, weight_decay,
betas=(momentum, 0.999)); cosine annealing option at
kwatsch/base_trainer.py:18-22). Torch's Adam applies weight decay as an
L2 term added to the gradient BEFORE the moment updates, which is
``optax.add_decayed_weights`` chained in front of ``optax.adam`` (NOT
AdamW semantics).
"""
from __future__ import annotations

from typing import Any, Optional

import optax
from flax.training import train_state


class SRTrainState(train_state.TrainState):
    """TrainState carrying BatchNorm running statistics."""

    batch_stats: Any = None


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   momentum: float = 0.9,
                   cosine_steps: Optional[int] = None,
                   max_grad_norm: float = 0.0,
                   warmup_steps: int = 0) -> optax.GradientTransformation:
    """``max_grad_norm > 0`` adds global-norm clipping
    (reference: kwatsch/acai_utils.py clip_grad_norm via the trainers'
    max_grad_norm argument).

    ``warmup_steps > 0`` prefixes a linear 0-to-lr ramp (beyond-reference
    robustness lever: the reference's full LR from step 0 can saturate
    the sigmoid output head into an exactly-zero-gradient collapse when
    BatchNorm is ablated — measured on the cardiac production benchmark,
    docs/STATUS.md round-3)."""
    if cosine_steps:
        if warmup_steps:
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr,
                warmup_steps=int(warmup_steps),
                decay_steps=int(cosine_steps), end_value=0.0)
        else:
            schedule = optax.cosine_decay_schedule(
                init_value=lr, decay_steps=cosine_steps, alpha=0.0)
    elif warmup_steps:
        schedule = optax.linear_schedule(
            init_value=0.0, end_value=lr,
            transition_steps=int(warmup_steps))
    else:
        schedule = lr
    parts = []
    if max_grad_norm:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(schedule, b1=momentum, b2=0.999))
    return optax.chain(*parts)


def create_train_state(model, rng, sample_input, lr: float,
                       weight_decay: float = 0.0, momentum: float = 0.9,
                       cosine_steps: Optional[int] = None,
                       max_grad_norm: float = 0.0,
                       warmup_steps: int = 0) -> SRTrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(lr, weight_decay, momentum, cosine_steps,
                        max_grad_norm, warmup_steps)
    return SRTrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats)
