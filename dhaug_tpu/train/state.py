"""Train-state containers and optimizer constructors.

The reference drives six torch optimizers imperatively (Adam for each GAN
net + posenet, model_fk_gan_train.py:112-118,149-158); here each net carries
an immutable pytree state (params, batch_stats, opt_state) threaded through
jitted steps, and learning-rate schedules mutate only the
``optax.inject_hyperparams`` learning_rate leaf.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class NetState:
    params: Any
    batch_stats: Any
    opt_state: Any


def adam_gan(lr: float = 1e-4) -> optax.GradientTransformation:
    """GAN Adam: betas (0.5, 0.9) (model_fk_gan_train.py:112-118)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=0.5, b2=0.9)


def adam_posenet(lr: float = 1e-4, max_norm: float = 1.0) -> optax.GradientTransformation:
    """Posenet Adam with global-norm gradient clipping (the reference clips
    at 1.0 every step, function_aug/model_pos_train.py:42)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(max_norm),
            optax.adam(learning_rate),
        )
    )(learning_rate=lr)


def make_state(tx: optax.GradientTransformation, params, batch_stats=None) -> NetState:
    return NetState(params=params,
                    batch_stats={} if batch_stats is None else batch_stats,
                    opt_state=tx.init(params))


def set_learning_rate(state: NetState, lr: float) -> NetState:
    """Rewrite the injected learning_rate hyperparameter in-place (pytree
    update) — supports both plain and chained injected optimizers."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    opt_state = opt_state._replace(hyperparams=hp)
    return state.replace(opt_state=opt_state)


def current_learning_rate(state: NetState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def lambda_lr(base_lr: float, epoch: int, nepoch: int, nepoch_fix: int = 0) -> float:
    """The reference's LambdaLR linear decay (utils/utils.py:174-178):
    lr = base * (1 - max(0, epoch - fix) / (nepoch - fix + 1))."""
    return base_lr * (1.0 - max(0, epoch - nepoch_fix) / float(nepoch - nepoch_fix + 1))


def step_exp_lr(base_lr: float, step: int, decay_step: int, gamma: float) -> float:
    """Baseline runner's continuous exponential decay (utils/utils.py:115-119)."""
    return base_lr * gamma ** (step / decay_step)


def step_lr(base_lr: float, epoch: int, decay_step: int, gamma: float = 0.1) -> float:
    """StepLR policy of get_scheduler (utils/utils.py:179-181)."""
    return base_lr * gamma ** (epoch // decay_step)


class PlateauScheduler:
    """ReduceLROnPlateau policy of get_scheduler (utils/utils.py:182-184):
    multiply lr by ``factor`` after ``patience`` epochs without the monitored
    metric improving by more than ``threshold`` (relative)."""

    def __init__(self, base_lr: float, factor: float = 0.2,
                 threshold: float = 0.01, patience: int = 5):
        self.lr = base_lr
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr
