"""Optimizer factory: reference method names -> gradient transformations.

Maps the reference's ``backend.optimizer_update(method=...)`` dispatch
(``backend_pytorch.py:200-468``, ``backend_jax.py:134-195``) onto optax plus
the Stiefel transforms in :mod:`tneq_tpu.optim.stiefel`.
"""

from __future__ import annotations

from typing import Any

import optax

from .stiefel import adamg, sgdg

__all__ = ["make_optimizer"]


def make_optimizer(method: str = "sgdg", **hyper: Any):
    """Create an optimizer by reference method name.

    Supported: 'sgdg' (Stiefel SGD-G), 'adamg' (Stiefel Adam-G), 'adam',
    'sgd', 'momentum', 'nesterov', 'rmsprop'.
    """
    method = method.lower()
    lr = hyper.pop("lr", hyper.pop("learning_rate", 1e-2))
    if method == "sgdg":
        return sgdg(lr, **hyper)
    if method == "adamg":
        return adamg(lr, **hyper)
    if method == "adam":
        return optax.adam(
            lr,
            b1=hyper.get("beta1", 0.9),
            b2=hyper.get("beta2", 0.999),
            eps=hyper.get("epsilon", 1e-8),
        )
    if method == "sgd":
        return optax.sgd(lr)
    if method == "momentum":
        return optax.sgd(lr, momentum=hyper.get("momentum", 0.9))
    if method == "nesterov":
        return optax.sgd(lr, momentum=hyper.get("momentum", 0.9), nesterov=True)
    if method == "rmsprop":
        return optax.rmsprop(
            lr,
            decay=hyper.get("decay", 0.99),
            eps=hyper.get("epsilon", 1e-8),
            momentum=hyper.get("momentum", 0.0),
        )
    raise ValueError(f"unknown optimizer method {method!r}")
