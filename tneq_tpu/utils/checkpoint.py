"""Checkpoint manager with true resume.

The reference can save cores (``QCTN.save_cores``, safetensors) and has
optimizer ``state_dict`` plumbing that nothing calls — there is NO actual
resume (no step counter or data-cursor restore; SURVEY §5).  This manager
closes that gap: it persists params (reference-compatible
``core_<name>_real/_imag`` safetensors), the full optimizer-state pytree,
and a JSON metadata record (step, extra state), and restores all three.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import numpy as np

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory, keep: int = 3):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep = keep

    # -- paths ------------------------------------------------------------

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{step:08d}"

    def all_steps(self):
        steps = []
        for p in self.directory.glob("step_*"):
            m = re.match(r"step_(\d+)$", p.name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- save -------------------------------------------------------------

    def save(
        self,
        step: int,
        params: Dict[str, Any],
        opt_state: Any = None,
        extra: Optional[Mapping[str, Any]] = None,
    ) -> Path:
        from safetensors.numpy import save_file

        d = self._step_dir(step)
        d.mkdir(parents=True, exist_ok=True)

        tensors = {}
        for name, arr in params.items():
            a = np.asarray(arr)
            if np.iscomplexobj(a):
                tensors[f"core_{name}_real"] = np.ascontiguousarray(a.real)
                tensors[f"core_{name}_imag"] = np.ascontiguousarray(a.imag)
            else:
                tensors[f"core_{name}"] = np.ascontiguousarray(a)
        save_file(tensors, str(d / "params.safetensors"))

        if opt_state is not None:
            leaves = jax.tree.leaves(opt_state)
            np.savez(
                d / "opt_state.npz",
                **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
            )

        meta = {"step": step, "extra": dict(extra or {})}
        (d / "meta.json").write_text(json.dumps(meta, default=str))

        # retention
        steps = self.all_steps()
        for s in steps[: -self.keep] if self.keep else []:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)
        return d

    # -- load -------------------------------------------------------------

    def load(
        self,
        step: Optional[int] = None,
        opt_state_template: Any = None,
    ) -> Tuple[int, Dict[str, np.ndarray], Any, Dict[str, Any]]:
        """Returns ``(step, params, opt_state, extra)``.

        ``opt_state_template``: a freshly-initialized optimizer state whose
        pytree structure receives the saved leaves (None skips restore).
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        d = self._step_dir(step)

        from safetensors import safe_open

        tensors: Dict[str, np.ndarray] = {}
        with safe_open(str(d / "params.safetensors"), framework="numpy") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
        params: Dict[str, np.ndarray] = {}
        for k, v in tensors.items():
            m = re.match(r"core_(.+)_real$", k)
            if m:
                name = m.group(1)
                params[name] = v + 1j * tensors[f"core_{name}_imag"]
            elif not k.endswith("_imag"):
                params[k[len("core_"):]] = v

        opt_state = None
        opt_path = d / "opt_state.npz"
        if opt_state_template is not None and opt_path.exists():
            data = np.load(opt_path)
            leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
            treedef = jax.tree.structure(opt_state_template)
            template_leaves = jax.tree.leaves(opt_state_template)
            if len(leaves) != len(template_leaves):
                raise ValueError(
                    f"optimizer state mismatch: checkpoint has "
                    f"{len(leaves)} leaves, template has {len(template_leaves)}"
                )
            restored = [
                np.asarray(l).astype(np.asarray(t).dtype).reshape(np.asarray(t).shape)
                for l, t in zip(leaves, template_leaves)
            ]
            opt_state = jax.tree.unflatten(treedef, restored)

        meta = json.loads((d / "meta.json").read_text())
        return step, params, opt_state, meta.get("extra", {})
