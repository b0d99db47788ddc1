"""Checkpoint save / scan-resume.

Keeps the reference's resume semantics (`tools/utils.py:69-88`): checkpoints
are `model_<step>.ckpt` files in the experiment dir; resume picks the highest
step.  Retention (`last_save_model_num`, config key the reference defines but
never enforces — SURVEY.md section 5) IS enforced here.  Serialization is flax
msgpack over the param/opt-state pytree, with the config YAML snapshot written
next to the checkpoints (self-describing checkpoint property,
`tools/saver.py:29-31`).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional, Tuple

from flax import serialization

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_meta",
    "load_checkpoint_extra",
    "latest_checkpoint_step",
]

_STEP_RE = re.compile(r"model_(\d+)\.ckpt$")
# sharded-format checkpoints are directories (train/sharded_checkpoint.py)
_STEP_ANY_RE = re.compile(r"model_(\d+)(\.ckpt|\.sharded)$")


def save_checkpoint(
    expdir: str | Path,
    step: int,
    params: Any,
    opt_state: Optional[Any] = None,
    keep: int = 4,
    meta: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> Path:
    """`meta` (JSON-serializable — e.g. epoch / batch-in-epoch position for
    deterministic resume) is written as a `model_<step>.meta.json` sidecar.
    `extra` ({name: pytree}, e.g. {"ema": ema_params}) is written as
    `model_<step>.<name>.ckpt` sidecars, retained/deleted with the parent."""
    expdir = Path(expdir)
    expdir.mkdir(parents=True, exist_ok=True)
    payload = {"step": step, "params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    path = expdir / f"model_{step}.ckpt"
    path.write_bytes(serialization.to_bytes(payload))
    if meta is not None:
        path.with_suffix(".meta.json").write_text(json.dumps(meta))
    for name, tree in (extra or {}).items():
        path.with_suffix(f".{name}.ckpt").write_bytes(serialization.to_bytes(tree))

    if keep and keep > 0:
        ckpts = sorted(
            (int(m.group(1)), p)
            for p in expdir.glob("model_*.ckpt")
            if (m := _STEP_RE.search(p.name))
        )
        for _, old in ckpts[:-keep]:
            old.unlink(missing_ok=True)
            old.with_suffix(".meta.json").unlink(missing_ok=True)
            for sidecar in expdir.glob(f"{old.stem}.*.ckpt"):
                sidecar.unlink(missing_ok=True)
    return path


def load_checkpoint_meta(expdir: str | Path, step: Optional[int] = None) -> dict:
    """The meta sidecar for `step` (default: latest), or {} if none exists."""
    expdir = Path(expdir)
    if step is None:
        step = latest_checkpoint_step(expdir)
        if step is None:
            return {}
    path = expdir / f"model_{step}.meta.json"
    if not path.exists():
        return {}
    try:
        return json.loads(path.read_text())
    except (json.JSONDecodeError, OSError):
        return {}


def load_checkpoint_extra(
    expdir: str | Path, name: str, template: Any, step: Optional[int] = None
) -> Optional[Any]:
    """Load a `model_<step>.<name>.ckpt` sidecar (default: latest step), or
    None when absent (e.g. a run saved before the sidecar existed)."""
    expdir = Path(expdir)
    if step is None:
        step = latest_checkpoint_step(expdir)
        if step is None:
            return None
    path = expdir / f"model_{step}.{name}.ckpt"
    if not path.exists():
        return None
    return serialization.from_bytes(template, path.read_bytes())


def latest_checkpoint_step(expdir: str | Path) -> Optional[int]:
    """Highest checkpointed step across both formats (msgpack file or
    sharded dir — the reference's scan semantics, `tools/utils.py:69-88`)."""
    expdir = Path(expdir)
    if not expdir.exists():
        return None
    steps = [int(m.group(1)) for p in expdir.glob("model_*") if (m := _STEP_ANY_RE.match(p.name))]
    return max(steps) if steps else None


def load_checkpoint(
    expdir: str | Path,
    params_template: Any,
    opt_state_template: Optional[Any] = None,
    step: Optional[int] = None,
) -> Tuple[int, Any, Optional[Any]]:
    """Returns (step, params, opt_state-or-None). Raises if no checkpoint."""
    expdir = Path(expdir)
    if step is None:
        step = latest_checkpoint_step(expdir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {expdir}")
    raw = (expdir / f"model_{step}.ckpt").read_bytes()
    template = {"step": 0, "params": params_template}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    # tolerate checkpoints without opt_state (save_opt=false runs)
    try:
        payload = serialization.from_bytes(template, raw)
    except (ValueError, KeyError):
        payload = serialization.from_bytes({"step": 0, "params": params_template}, raw)
    return payload["step"], payload["params"], payload.get("opt_state")
