"""Checkpoint save/load (orbax) with the reference's addressing scheme.

Parity targets (SURVEY §5 / reference behavior):
  * checkpoints under runs/<experiment>/ckpt_epoch=<E> every `save_epoch`
    epochs, keeping all (ModelCheckpoint(save_top_k=-1), ref
    trainer/train_retrieval.py:159);
  * per-subnet warm-start: load only one sub-tree ('unet_backbone',
    'retrieval_backbone', ...) out of a full checkpoint — the analog of the
    reference's state-dict prefix renaming (util/misc.py:23-28,
    trainer/train_refinement.py:295-306);
  * optimizer-state reset on phase-boundary resume
    (trainer/train_refinement.py:314-318) is expressed by loading params only.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(run_dir, epoch: int, params, opt_state=None, extra: dict | None = None) -> Path:
    """Write runs/<experiment>/ckpt_epoch=<E>/ with params (+ opt state, meta)."""
    run_dir = Path(run_dir)
    path = (run_dir / f"ckpt_epoch={epoch}").resolve()
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": _to_host(params)}
    if opt_state is not None:
        payload["opt_state"] = _to_host(opt_state)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch}
    meta.update(extra or {})
    (path / "meta.json").write_text(json.dumps(meta))
    return path


def load_checkpoint(path, template: dict | None = None) -> dict:
    """Load a checkpoint dict ({'params': ..., 'opt_state': ...?, meta})."""
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=_to_host(template) if template is not None else None)
    meta_path = path / "meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    restored["meta"] = meta
    return restored


def load_subnet_params(ckpt_path, subnet: str, template: Any = None):
    """Extract one submodule's params from a full refinement checkpoint —
    the prefix-rename warm-start of the reference."""
    restored = load_checkpoint(ckpt_path)
    params = restored["params"]
    if subnet not in params:
        raise KeyError(f"subnet '{subnet}' not in checkpoint ({list(params)})")
    return params[subnet]


def latest_checkpoint(run_dir) -> Path | None:
    """Most recent checkpoint by epoch (the reference picks newest by mtime,
    trainer/train_refinement.py:361; epoch order is equivalent and stabler)."""
    run_dir = Path(run_dir)
    if not run_dir.exists():
        return None
    ckpts = sorted(run_dir.glob("ckpt_epoch=*"),
                   key=lambda p: int(p.name.split("=")[1]))
    return ckpts[-1] if ckpts else None
