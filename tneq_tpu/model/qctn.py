"""QCTN model: CircuitGraph + parameter pytree.

TPU-native replacement for the reference's mutable ``QCTN`` object
(``tneq_qc/core/qctn.py:456-1523``): the topology is an immutable
:class:`CircuitGraph` and the weights are a plain ``{core_name: jnp.ndarray}``
dict — a pytree that flows through ``jit`` / ``grad`` / optimizers untouched.
The class is a convenience wrapper; every operation has a pure-function core.

Checkpoint format is interoperable with the reference: safetensors with
complex tensors split as ``core_<name>_real`` / ``core_<name>_imag``
(``qctn.py:902-964``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph, parse_graph
from ..graph.surgery import merge_graphs, split_graph

__all__ = ["QCTN", "init_params", "orthogonal_core"]

Params = Dict[str, jax.Array]


def orthogonal_core(
    key: jax.Array, shape: Sequence[int], dtype=jnp.complex64
) -> jax.Array:
    """Haar-orthogonal core init with QR phase correction.

    Matches ``BackendPyTorch.init_random_core`` (``backend_pytorch.py:470-495``):
    draw a square Gaussian matrix over the leading half of ``shape``, QR it,
    fix the phase/sign ambiguity via diag(R), reshape.  Generalized to
    non-square cores (input_dim != output_dim) by drawing the enclosing
    square and slicing an isometry (the reference crashes on those).

    For complex dtypes the Gaussian is complex (real+imag), giving a Haar
    unitary; real dtypes give a Haar orthogonal matrix.
    """
    shape = tuple(int(s) for s in shape)
    ndim = len(shape)
    in_dim = int(np.prod(shape[: ndim // 2], dtype=np.int64)) if ndim else 1
    out_dim = int(np.prod(shape[ndim // 2 :], dtype=np.int64)) if ndim else 1
    n = max(in_dim, out_dim)

    if jnp.issubdtype(dtype, jnp.complexfloating):
        kr, ki = jax.random.split(key)
        real_dt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        a = jax.random.normal(kr, (n, n), real_dt) + 1j * jax.random.normal(
            ki, (n, n), real_dt
        )
        a = a.astype(dtype)
    else:
        a = jax.random.normal(key, (n, n), dtype)

    q, r = jnp.linalg.qr(a)
    d = jnp.diagonal(r)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        phases = d / (jnp.abs(d) + 1e-12)
        q = q * jnp.conj(phases)[None, :]
    else:
        q = q * jnp.sign(d)[None, :]
    return q[:in_dim, :out_dim].reshape(shape)


def init_params(
    graph: CircuitGraph, key: jax.Array, dtype=jnp.complex64
) -> Params:
    """Per-core orthogonal initialization (reference ``qctn.py:724-760``)."""
    keys = jax.random.split(key, graph.ncores)
    return {
        core.name: orthogonal_core(keys[i], core.shape, dtype)
        for i, core in enumerate(graph.cores)
    }


class QCTN:
    """Quantum Circuit Tensor Network: immutable graph + parameter pytree."""

    def __init__(
        self,
        graph: Union[str, CircuitGraph],
        params: Optional[Params] = None,
        *,
        key: Optional[jax.Array] = None,
        dtype=jnp.complex64,
    ):
        self.graph = parse_graph(graph) if isinstance(graph, str) else graph
        self.dtype = dtype
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = init_params(self.graph, key, dtype)
        self.params: Params = dict(params)
        self._loaded_metadata: Optional[Mapping[str, str]] = None

    # -- views ------------------------------------------------------------

    @property
    def nqubits(self) -> int:
        return self.graph.nqubits

    @property
    def ncores(self) -> int:
        return self.graph.ncores

    @property
    def cores(self):
        return self.graph.core_names

    def __repr__(self):
        return (
            f"QCTN(nqubits={self.nqubits}, ncores={self.ncores}, "
            f"cores={list(self.cores)}, dtype={jnp.dtype(self.dtype).name})"
        )

    def copy(self) -> "QCTN":
        return QCTN(self.graph, dict(self.params), dtype=self.dtype)

    # -- weight assignment (reference qctn.py:762-900) --------------------

    def set_cores(self, cores, strict: bool = True) -> None:
        """Set weights from a list (positional) or dict (by name).

        Tensors must match the target core's element count; mismatched shapes
        with equal numel are reshaped (reference semantics).
        """
        import warnings

        if isinstance(cores, (list, tuple)):
            if strict and len(cores) != self.ncores:
                raise ValueError(
                    f"strict: expected {self.ncores} tensors, got {len(cores)}"
                )
            n = min(len(cores), self.ncores)
            if len(cores) != self.ncores:
                warnings.warn(
                    f"setting only the first {n} of {self.ncores} cores",
                    stacklevel=2,
                )
            for i in range(n):
                self._set_one(self.cores[i], cores[i])
        elif isinstance(cores, dict):
            given, mine = set(cores), set(self.cores)
            if strict and given != mine:
                raise ValueError(
                    f"strict: key mismatch — missing {mine - given}, "
                    f"extra {given - mine}"
                )
            for extra in given - mine:
                warnings.warn(f"ignoring extra core {extra!r}", stacklevel=2)
            for name in mine & given:
                self._set_one(name, cores[name])
        else:
            raise TypeError(f"cores must be list or dict, got {type(cores).__name__}")

    def _set_one(self, name: str, tensor) -> None:
        target_shape = self.graph.shapes[name]
        arr = jnp.asarray(tensor)
        if int(np.prod(arr.shape, dtype=np.int64)) != int(
            np.prod(target_shape, dtype=np.int64)
        ):
            raise ValueError(
                f"core {name!r}: size mismatch {arr.shape} vs {target_shape}"
            )
        self.params[name] = arr.reshape(target_shape).astype(self.dtype)

    # -- checkpoint I/O (reference qctn.py:902-983) -----------------------

    def save_cores(
        self,
        file_path: Union[str, Path],
        metadata: Optional[Mapping[str, str]] = None,
    ) -> None:
        """Save to safetensors with the reference's real/imag split naming."""
        from safetensors.numpy import save_file

        tensors = {}
        for name, arr in self.params.items():
            a = np.asarray(arr)
            if np.iscomplexobj(a):
                tensors[f"core_{name}_real"] = np.ascontiguousarray(a.real)
                tensors[f"core_{name}_imag"] = np.ascontiguousarray(a.imag)
            else:
                tensors[f"core_{name}"] = np.ascontiguousarray(a)
        meta = {str(k): str(v) for k, v in (metadata or {}).items()}
        save_file(tensors, str(file_path), metadata=meta)

    def load_cores(
        self, file_path: Union[str, Path], strict: bool = True
    ) -> Mapping[str, str]:
        from safetensors import safe_open

        tensors = {}
        with safe_open(str(file_path), framework="numpy") as f:
            meta = dict(f.metadata() or {})
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
        for name in self.cores:
            if f"core_{name}_real" in tensors:
                arr = tensors[f"core_{name}_real"] + 1j * tensors[f"core_{name}_imag"]
            elif f"core_{name}" in tensors:
                arr = tensors[f"core_{name}"]
            elif strict:
                raise KeyError(f"missing tensor for core {name!r} in {file_path}")
            else:
                continue
            self.params[name] = jnp.asarray(arr).astype(self.dtype)
        self._loaded_metadata = meta
        return meta

    @classmethod
    def from_pretrained(
        cls,
        graph: Union[str, CircuitGraph],
        file_path: Union[str, Path],
        dtype=jnp.complex64,
        strict: bool = True,
    ) -> "QCTN":
        model = cls(graph, dtype=dtype)
        model.load_cores(file_path, strict=strict)
        return model

    # -- contraction conveniences (reference qctn.py:986-1211) ------------

    def contract_core_only(self, order: str = "reference"):
        """Dense circuit tensor with open boundary legs
        (reference ``QCTN._contract_core_only``)."""
        from ..ops.contract import contract_cores

        return contract_cores(self.graph, self.params, order)

    def contract_with_inputs(self, states, batched: bool = False):
        """Apply the circuit to per-qubit input vectors
        (reference ``QCTN._contract_with_inputs``)."""
        from ..ops.contract import make_with_inputs_fn

        return make_with_inputs_fn(self.graph, batched)(self.params, states)

    def contract_with_self(self, states, measures):
        """Siamese Born-rule probability
        (reference ``QCTN.contract_with_self``)."""
        from ..ops.contract import siamese_probability

        batched = any(getattr(s, "ndim", 1) == 2 for s in states)
        return siamese_probability(
            self.graph, self.params, states, measures, states_batched=batched
        )

    def contract_with_qctn(self, other: "QCTN", conj_target: bool = False):
        """Scalar overlap with another circuit
        (reference ``QCTN.optimize_contract_with_QCTN``)."""
        from ..ops.contract import make_two_network_fn

        return make_two_network_fn(self.graph, other.graph, conj_target)(
            self.params, other.params
        )

    # -- surgery (reference qctn.py:1296-1523) ----------------------------

    def split(self, split_idx: Optional[int] = None):
        """Split into two QCTNs at core index (weights carried over)."""
        src1, src2 = split_graph(self.graph.source or self._render(), split_idx)
        q1, q2 = QCTN(src1, dtype=self.dtype), QCTN(src2, dtype=self.dtype)
        for name in q1.cores:
            if name in self.params:
                q1.params[name] = self.params[name]
        for name in q2.cores:
            if name in self.params:
                q2.params[name] = self.params[name]
        return q1, q2

    def merge_with(self, other: "QCTN") -> "QCTN":
        """Left-right merge; cores renamed contiguously, weights carried."""
        merged_src, map1, map2 = merge_graphs(
            self.graph.source or self._render(),
            other.graph.source or other._render(),
        )
        out = QCTN(merged_src, dtype=self.dtype)
        for old, new in map1.items():
            if old in self.params:
                out.params[new] = self.params[old]
        for old, new in map2.items():
            if old in other.params:
                out.params[new] = other.params[old]
        return out

    @staticmethod
    def merge(q1: "QCTN", q2: "QCTN") -> "QCTN":
        return q1.merge_with(q2)

    def _render(self) -> str:
        if self.graph.source:
            return self.graph.source
        from ..graph.dsl import render_dsl

        return render_dsl(self.graph)
