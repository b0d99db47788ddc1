"""Debug / sanitizer switches (SURVEY.md §5 "race detection / sanitizers").

The reference ships no debug tooling at all — no torch anomaly mode, no
deterministic flags, nothing (SURVEY.md §5: "Race detection / sanitizers:
none").  This module is the TPU-native analogue, as config-gated switches
(`Config.debug`):

* ``debug_nans`` — flips JAX's ``jax_debug_nans``: any jitted op producing a
  NaN is re-run op-by-op outside jit and raises at the exact primitive (the
  closest equivalent of ``torch.autograd.set_detect_anomaly``).  Slow; a
  debugging mode, never a production default.
* ``check_interval`` — every N steps the trainer asserts the whole param tree
  (and the step loss) is finite, raising :class:`NonFiniteError` that names
  the offending leaf paths.  One fused jit computes per-leaf finiteness so
  the check costs a single device fetch, not one per leaf.
* ``dump_on_nan`` — when the check trips, the offending batch + step are
  written to ``<expdir>/nan_dump_<step>.npz`` for offline replay (the
  reference's NaN guard, `text2semantic/roformer/train.py:133-134`, raises
  with no forensics).

Trainers consult these via :func:`install` / :func:`check_step`; everything
is a no-op when the config is default (all off).
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.config import DebugConfig

__all__ = [
    "DebugConfig",
    "NonFiniteError",
    "install",
    "tree_nonfinite_paths",
    "assert_tree_finite",
    "dump_nan_batch",
    "check_step",
]


class NonFiniteError(RuntimeError):
    """A parameter/loss sanity check found NaN/Inf; `.paths` names the leaves."""

    def __init__(self, message: str, paths: Optional[list] = None):
        super().__init__(message)
        self.paths = paths or []


@contextlib.contextmanager
def install(dcfg: Optional[DebugConfig]):
    """Context manager applying process-global debug flags, restored on exit."""
    if dcfg is None or not dcfg.debug_nans:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@jax.jit
def _leaf_finiteness(tree) -> jnp.ndarray:
    """One compiled program returning a (n_leaves,) bool vector — a single
    device fetch regardless of tree size."""
    leaves = jax.tree_util.tree_leaves(tree)
    flags = [
        jnp.all(jnp.isfinite(x)) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
        else jnp.bool_(True)
        for x in leaves
    ]
    return jnp.stack(flags)


def tree_nonfinite_paths(tree) -> list:
    """Key paths of every leaf containing NaN/Inf (empty list = all finite)."""
    flags = np.asarray(_leaf_finiteness(tree))
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [jax.tree_util.keystr(p) for (p, _), ok in zip(paths, flags) if not ok]


def assert_tree_finite(tree, name: str = "params") -> None:
    bad = tree_nonfinite_paths(tree)
    if bad:
        shown = ", ".join(bad[:8]) + (" …" if len(bad) > 8 else "")
        raise NonFiniteError(
            f"non-finite values in {name} ({len(bad)} leaves): {shown}", paths=bad
        )


def dump_nan_batch(expdir: str, step: int, batch: Dict[str, Any], loss=None) -> Path:
    """Write the batch that produced a non-finite loss for offline replay."""
    path = Path(expdir) / f"nan_dump_{step}.npz"
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in batch.items() if v is not None}
    if loss is not None:
        arrays["__loss__"] = np.asarray(loss)
    arrays["__step__"] = np.asarray(step)
    np.savez(path, **arrays)
    return path


def check_step(
    dcfg: Optional[DebugConfig],
    step: int,
    params,
    loss,
    batch: Optional[Dict[str, Any]] = None,
    expdir: str = ".",
) -> None:
    """Trainer hook: periodic finiteness assertion with optional batch dump.

    No-op unless ``dcfg.check_interval > 0`` and the step is on cadence, so
    the async dispatch stream stays unbroken on every other step."""
    if dcfg is None or dcfg.check_interval <= 0 or step % dcfg.check_interval != 0:
        return
    loss_ok = bool(np.isfinite(np.asarray(loss))) if loss is not None else True
    bad = tree_nonfinite_paths(params)
    if loss_ok and not bad:
        return
    dump = None
    if dcfg.dump_on_nan and batch is not None:
        dump = dump_nan_batch(expdir, step, batch, loss)
    detail = f"loss={'non-finite' if not loss_ok else 'finite'}, bad param leaves={len(bad)}"
    if bad:
        detail += ": " + ", ".join(bad[:8]) + (" …" if len(bad) > 8 else "")
    if dump is not None:
        detail += f" (batch dumped to {dump})"
    raise NonFiniteError(f"sanity check failed at step {step}: {detail}", paths=bad)
