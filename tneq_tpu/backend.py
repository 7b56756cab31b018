"""Backend compatibility shim for users migrating from the reference.

The reference routes every tensor op through a ``ComputeBackend`` ABC with
torch/jax implementations and a factory
(``tneq_qc/backends/backend_interface.py:48``, ``backend_factory.py:34``).
This framework has exactly one backend — JAX on TPU — so the ABC dissolves;
this module keeps the *entry points* familiar so reference code ports with
minimal edits.  Each method is a thin delegation to jnp / the ops layer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["JaxBackend", "create_backend", "get_default_backend", "set_default_backend"]


class JaxBackend:
    """The reference ``ComputeBackend`` surface on jnp (selected methods:
    the ones the reference's own code paths actually exercise)."""

    def __init__(self, dtype=jnp.complex64, seed: int = 0):
        self.dtype = dtype
        self._key = jax.random.PRNGKey(seed)

    # -- info --------------------------------------------------------------

    @property
    def backend_info(self):
        dev = jax.devices()[0]
        return {
            "type": "jax",
            "device": dev.platform,
            "dtype": jnp.dtype(self.dtype).name,
        }

    def set_random_seed(self, seed: int) -> None:
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- tensor ops --------------------------------------------------------

    def convert_to_tensor(self, x: Any) -> jax.Array:
        return jnp.asarray(x).astype(self.dtype) if jnp.asarray(x).dtype != self.dtype else jnp.asarray(x)

    def tensor_to_numpy(self, x: jax.Array) -> np.ndarray:
        return np.asarray(x)

    def einsum(self, equation: str, *operands) -> jax.Array:
        return jnp.einsum(equation, *operands, optimize="auto")

    def reshape(self, x, shape) -> jax.Array:
        return jnp.reshape(x, shape)

    def zeros(self, shape, dtype=None) -> jax.Array:
        return jnp.zeros(shape, dtype or self.dtype)

    def ones(self, shape, dtype=None) -> jax.Array:
        return jnp.ones(shape, dtype or self.dtype)

    def eye(self, n: int, dtype=None) -> jax.Array:
        return jnp.eye(n, dtype=dtype or self.dtype)

    def is_complex(self, x) -> bool:
        return jnp.iscomplexobj(x)

    def abs_square(self, x) -> jax.Array:
        from .ops.contract import abs_square

        return abs_square(x)

    def clamp(self, x, min=None, max=None) -> jax.Array:
        return jnp.clip(x, min=min, max=max)

    def log(self, x) -> jax.Array:
        return jnp.log(x)

    def mean(self, x) -> jax.Array:
        return jnp.mean(x)

    def detach(self, x) -> jax.Array:
        return jax.lax.stop_gradient(x)

    # -- autodiff / jit ----------------------------------------------------

    def compute_value_and_grad(self, fn, argnums=0):
        return jax.value_and_grad(fn, argnums=argnums)

    def jit_compile(self, fn):
        return jax.jit(fn)

    def execute_expression(self, fn, *args):
        return fn(*args)

    # -- model init --------------------------------------------------------

    def init_random_core(self, shape: Sequence[int]) -> jax.Array:
        from .model.qctn import orthogonal_core

        return orthogonal_core(self._next_key(), shape, self.dtype)

    # -- optimizer dispatch ------------------------------------------------

    def make_optimizer(self, method: str = "sgdg", **hyper):
        from .optim.factory import make_optimizer

        return make_optimizer(method, **hyper)


_default: Optional[JaxBackend] = None


def create_backend(backend_type: str = "jax", device: str = "tpu",
                   dtype=jnp.complex64, **_) -> JaxBackend:
    """Factory with the reference's signature; only 'jax' exists here
    (requests for 'pytorch' get a clear error instead of a silent fallback)."""
    if backend_type not in ("jax", "tpu"):
        raise ValueError(
            f"this framework is JAX/TPU-native; backend {backend_type!r} "
            f"does not exist (the reference's torch paths map to jnp)"
        )
    return JaxBackend(dtype=dtype)


def get_default_backend() -> JaxBackend:
    global _default
    if _default is None:
        _default = JaxBackend()
    return _default


def set_default_backend(backend: JaxBackend) -> None:
    global _default
    _default = backend
