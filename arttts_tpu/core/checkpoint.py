"""Checkpoint save/restore.

Improves on the reference's `torch.save(model.state_dict())` convention
(`/root/reference/src/train.py:274,332-333` — which loses optimizer state on
resume, SURVEY.md §5.4): we persist `{params, opt_state, step, early_stop}`
together, with the same best/every-N file policy (`grad_{epoch}`,
`grad_best`, `grad_final`). Orbax handles the array tree; small metadata
rides along as JSON.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def save_checkpoint(
    ckpt_dir: str,
    name: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    extra: Optional[Dict] = None,
) -> str:
    """Save a named checkpoint (e.g. "grad_12", "grad_best")."""
    path = Path(ckpt_dir).resolve() / name
    ckptr = ocp.PyTreeCheckpointer()
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    # collective in multi-process runs: every process calls save (orbax
    # coordinates shard writes); only process 0 writes the metadata file
    ckptr.save(path, tree, force=True)
    if _process_index() == 0:
        meta = {"step": int(step), "extra": extra or {}}
        (path / "meta.json").write_text(json.dumps(meta))
    return str(path)


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def load_checkpoint(path: str, target: Any = None) -> Dict:
    """Load a checkpoint directory -> {"params", "opt_state"?, "step", "extra"}."""
    path = Path(path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path, item=target)
    meta = {"step": 0, "extra": {}}
    meta_fp = path / "meta.json"
    if meta_fp.exists():
        meta = json.loads(meta_fp.read_text())
    out = dict(tree)
    out["step"] = meta["step"]
    out["extra"] = meta["extra"]
    return out


def latest_checkpoint(ckpt_dir: str, prefix: str = "grad_") -> Optional[str]:
    """Find the numbered checkpoint with the highest epoch (digit-sort glob
    like the reference's `utils.py:49-64`)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_n = None, -1
    for p in ckpt_dir.iterdir():
        m = re.fullmatch(rf"{re.escape(prefix)}(\d+)", p.name)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return str(best) if best else None
