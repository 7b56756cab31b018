"""Dtype policy: parameter / compute / output precision control.

TPU-first numerics knob the reference lacks (it fixes one torch dtype per
backend, ``backend_pytorch.py:52-97``): run real networks with bfloat16
compute on the MXU while keeping float32 parameters and outputs.  Complex
circuits stay complex64 (complex matmuls lower to real MXU pairs; there is
no complex bf16).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["Policy", "DEFAULT", "BF16_COMPUTE"]


@dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.complex64
    compute_dtype: Any = jnp.complex64
    output_dtype: Any = jnp.float32

    def cast_params(self, params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {k: v.astype(self.compute_dtype) for k, v in params.items()}

    def cast_output(self, x: jax.Array) -> jax.Array:
        return x.astype(self.output_dtype)

    @property
    def is_complex(self) -> bool:
        return jnp.issubdtype(jnp.dtype(self.param_dtype), jnp.complexfloating)


DEFAULT = Policy()
BF16_COMPUTE = Policy(
    param_dtype=jnp.float32,
    compute_dtype=jnp.bfloat16,
    output_dtype=jnp.float32,
)
