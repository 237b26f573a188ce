"""Train-state containers and optimizer constructors.

The reference drives six torch optimizers imperatively (Adam for each GAN
net + posenet, model_fk_gan_train.py:112-118,149-158); here each net carries
an immutable pytree state (params, batch_stats, opt_state) threaded through
jitted steps, and learning-rate schedules mutate only the
``optax.inject_hyperparams`` learning_rate leaf.
"""
from __future__ import annotations

from typing import Any, Callable

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
