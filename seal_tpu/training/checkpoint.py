"""Checkpoint save/restore for training state.

The reference's checkpoint story is fairseq's (save every 15k updates, keep
3 -- ``training_fairseq.sh:27-28``) plus state-dict adapters at load time.
Here: orbax for the param/opt pytrees (async-safe, TPU-friendly) with a
plain-npz fallback, and the converters in ``seal_tpu.models.convert`` for
importing foreign checkpoints.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, step: int, params, opt_state=None, keep: int = 3):
    """Write ``<path>/step_<N>`` (orbax if available, else npz) and prune."""
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, f"step_{step}")
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(target), state, force=True)
    except Exception:
        np.savez(target + ".npz", **_flatten(state))
    with open(os.path.join(path, "latest.json"), "w") as f:
        json.dump({"step": step}, f)
    _prune(path, keep)


def _prune(path: str, keep: int):
    steps = sorted(
        int(d.split("_")[1].split(".")[0])
        for d in os.listdir(path)
        if d.startswith("step_")
    )
    import shutil

    for s in steps[:-keep] if keep > 0 else []:
        for suffix in ("", ".npz"):
            p = os.path.join(path, f"step_{s}{suffix}")
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)


def latest_step(path: str) -> Optional[int]:
    meta = os.path.join(path, "latest.json")
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        return json.load(f)["step"]


def restore_checkpoint(path: str, template) -> Tuple[int, Any]:
    """Restore the newest checkpoint into the structure of ``template``
    ({"params": ..., "opt_state": ...}).  Returns (step, state)."""
    step = latest_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    target = os.path.join(path, f"step_{step}")
    if os.path.isdir(target):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(os.path.abspath(target), item=template)
        return step, state
    data = np.load(target + ".npz")
    flat_template = _flatten(template)
    assert set(data.files) == set(flat_template), "checkpoint/template mismatch"
    leaves, treedef = jax.tree_util.tree_flatten(template)
    keys = ["/".join(str(p) for p in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(template)[0]]
    restored = [data[k] for k in keys]
    return step, jax.tree_util.tree_unflatten(treedef, restored)
