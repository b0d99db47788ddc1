"""Sharded (multi-host) checkpointing.

The msgpack path (`train/checkpoint.py`) serializes the whole pytree from one
host — fine for single-host runs and for multi-host *data* parallelism (params
replicated, rank-0 fetch is local), but wrong for cross-host `model`/`pipe`/
`expert` layouts: gather-on-save allgathers every shard into one host's RAM
(whole-tree bound), and restore cannot place shards back without re-sharding
through host memory.  This module is the Orbax-style replacement SURVEY.md §5
calls for (TPU-native successor of the reference's single-file
`tools/saver.py:85-109`):

* **save**: each process writes ONE `shard_p<k>.npz` containing exactly the
  chunks it owns (the first device holding each distinct shard index —
  deduplicated across replicas), plus a rank-0 `index.json` mapping every leaf
  to its chunk list.  Host memory bound: this process's shards only.
* **load**: each leaf is assembled host-side from its chunks, then placed via
  `jax.make_array_from_callback` under the TEMPLATE's sharding — so a
  checkpoint saved under dp2×tp2 restores onto dp4, a single chip, or any
  other mesh.  Host memory bound: one leaf's global array at a time.
* layout: `expdir/model_<step>.sharded/{index.json, shard_p*.npz}` — the
  same `model_<step>` step-scan/retention contract as the msgpack files.

Chunk payloads are raw bytes (uint8) + a dtype string in the index, so
bfloat16 and other ml_dtypes round-trip without npy descriptor support.

Collective discipline: `save_checkpoint_sharded` must be called by EVERY
process (shard writes + barrier); `expdir` must be shared storage (NFS/GCS —
the same assumption Orbax makes).  Retention runs on rank 0 after the
barrier.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.parallel.dist import (
    is_main_process,
    process_index,
    sync_global_devices,
)

__all__ = [
    "save_checkpoint_sharded",
    "load_checkpoint_sharded",
    "sharded_checkpoint_dir",
    "tree_needs_sharded_save",
]

_INDEX = "index.json"


def sharded_checkpoint_dir(expdir: str | Path, step: int) -> Path:
    return Path(expdir) / f"model_{step}.sharded"


def tree_needs_sharded_save(tree: Any) -> bool:
    """True when some leaf is sharded ACROSS processes (not merely replicated
    over them) — the case gather-on-save handles only at whole-tree cost."""
    return any(
        isinstance(x, jax.Array)
        and not x.is_fully_addressable
        and not x.is_fully_replicated
        for x in jax.tree_util.tree_leaves(tree)
    )


def _leaf_items(tree: Any):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in flat]


def _chunk_key(leafpath: str, index: Tuple[slice, ...]) -> str:
    starts = ".".join(str(s.start or 0) for s in index) or "scalar"
    return f"{leafpath}@{starts}"


def _owners(leaf: jax.Array) -> Dict[str, Tuple[int, int, Tuple[slice, ...]]]:
    """Deterministic chunk ownership: for each distinct shard index of the
    global array, the lowest-id device holding it.  Every process computes
    the same map from the (global) sharding metadata — no communication."""
    imap = leaf.sharding.devices_indices_map(leaf.shape)
    owners: Dict[str, Tuple[int, int, Tuple[slice, ...]]] = {}
    for dev, index in imap.items():
        key = _chunk_key("", index)
        cur = owners.get(key)
        if cur is None or dev.id < cur[0]:
            owners[key] = (dev.id, dev.process_index, index)
    return owners


def _index_to_json(index: Tuple[slice, ...], shape: Tuple[int, ...]) -> list:
    return [[s.start or 0, s.stop if s.stop is not None else dim]
            for s, dim in zip(index, shape)]


def save_checkpoint_sharded(
    expdir: str | Path,
    step: int,
    trees: Dict[str, Any],
    keep: int = 4,
    meta: Optional[dict] = None,
) -> Path:
    """Write `trees` ({"params": ..., "opt_state": ..., "ema": ...}) as a
    per-process sharded checkpoint.  COLLECTIVE: call from every process."""
    ckpt_dir = sharded_checkpoint_dir(expdir, step)
    if is_main_process():
        ckpt_dir.mkdir(parents=True, exist_ok=True)
    sync_global_devices(f"sharded-ckpt-mkdir-{step}")

    me = process_index()
    my_chunks: Dict[str, np.ndarray] = {}
    index: Dict[str, Any] = {"step": step, "trees": {}}
    for tree_name, tree in trees.items():
        if tree is None:
            continue
        leaves: Dict[str, Any] = {}
        for leafpath, leaf in _leaf_items(tree):
            if isinstance(leaf, jax.Array):
                dtype = str(leaf.dtype)
                shape = tuple(leaf.shape)
                chunks = []
                owners = _owners(leaf)
                local = {
                    _chunk_key("", s.index): s for s in leaf.addressable_shards
                }
                for _, (dev_id, proc, idx) in sorted(owners.items()):
                    ckey = _chunk_key(f"{tree_name}{leafpath}", idx)
                    chunks.append({
                        "key": ckey,
                        "file": f"shard_p{proc}.npz",
                        "index": _index_to_json(idx, shape),
                    })
                    if proc == me:
                        shard = local[_chunk_key("", idx)]
                        data = np.asarray(shard.data)
                        my_chunks[ckey] = np.frombuffer(
                            data.tobytes(), dtype=np.uint8
                        )
                leaves[leafpath] = {"shape": list(shape), "dtype": dtype,
                                    "chunks": chunks}
            else:
                # host-side leaf (python scalar / np array): rank-0 chunk
                arr = np.asarray(leaf)
                ckey = _chunk_key(f"{tree_name}{leafpath}", ())
                full = tuple(slice(0, d) for d in arr.shape)
                leaves[leafpath] = {
                    "shape": list(arr.shape), "dtype": str(arr.dtype),
                    "chunks": [{"key": ckey, "file": "shard_p0.npz",
                                "index": _index_to_json(full, arr.shape)}],
                    "host": True,
                }
                if me == 0:
                    my_chunks[ckey] = np.frombuffer(arr.tobytes(), dtype=np.uint8)
        index["trees"][tree_name] = leaves

    np.savez(ckpt_dir / f"shard_p{me}.npz", **my_chunks)
    if is_main_process():
        (ckpt_dir / _INDEX).write_text(json.dumps(index))
        if meta is not None:
            (Path(expdir) / f"model_{step}.meta.json").write_text(json.dumps(meta))
    # all shards durable before anyone considers the checkpoint complete
    sync_global_devices(f"sharded-ckpt-write-{step}")

    if keep and keep > 0 and is_main_process():
        _apply_retention(Path(expdir), keep)
    sync_global_devices(f"sharded-ckpt-retain-{step}")
    return ckpt_dir


def _apply_retention(expdir: Path, keep: int) -> None:
    """Retention across BOTH formats (msgpack files + sharded dirs)."""
    import re
    import shutil

    steps: Dict[int, list] = {}
    for p in expdir.glob("model_*"):
        m = re.match(r"model_(\d+)(\.ckpt|\.sharded)$", p.name)
        if m:
            steps.setdefault(int(m.group(1)), []).append(p)
    for step in sorted(steps)[:-keep]:
        for p in steps[step]:
            if p.is_dir():
                shutil.rmtree(p, ignore_errors=True)
            else:
                p.unlink(missing_ok=True)
            p.with_suffix(".meta.json").unlink(missing_ok=True)
            for sidecar in expdir.glob(f"model_{step}.*.ckpt"):
                sidecar.unlink(missing_ok=True)


class _ChunkReader:
    """Lazy npz access: zip members decompress per key, so reading one leaf
    touches only that leaf's chunks."""

    def __init__(self, ckpt_dir: Path):
        self.dir = ckpt_dir
        self._files: Dict[str, Any] = {}

    def read(self, file: str, key: str) -> np.ndarray:
        if file not in self._files:
            self._files[file] = np.load(self.dir / file)
        return self._files[file][key]

    def close(self):
        for f in self._files.values():
            f.close()


def _assemble_leaf(entry: dict, reader: _ChunkReader) -> np.ndarray:
    shape = tuple(entry["shape"])
    dtype = jnp.dtype(entry["dtype"])
    out = np.empty(shape, dtype=dtype)
    for chunk in entry["chunks"]:
        idx = tuple(slice(a, b) for a, b in chunk["index"])
        sub_shape = tuple(b - a for a, b in chunk["index"])
        raw = reader.read(chunk["file"], chunk["key"])
        out[idx] = np.frombuffer(raw.tobytes(), dtype=dtype).reshape(sub_shape)
    return out


def load_checkpoint_sharded(
    expdir: str | Path,
    step: int,
    templates: Dict[str, Any],
) -> Dict[str, Any]:
    """Restore `templates` ({name: pytree-with-target-shardings}) from the
    sharded checkpoint at `step`.  Each jax.Array template leaf is rebuilt
    under ITS sharding (re-sharding across mesh layouts is free here); host
    leaves are returned as numpy/python values matching the template type.
    Host memory bound: one leaf's global array at a time."""
    ckpt_dir = sharded_checkpoint_dir(expdir, step)
    index = json.loads((ckpt_dir / _INDEX).read_text())
    reader = _ChunkReader(ckpt_dir)
    try:
        out: Dict[str, Any] = {}
        for tree_name, template in templates.items():
            if template is None:
                out[tree_name] = None
                continue
            leaves = index["trees"].get(tree_name)
            if leaves is None:
                raise KeyError(f"checkpoint has no tree '{tree_name}'")
            flat, treedef = jax.tree_util.tree_flatten_with_path(template)
            missing = [jax.tree_util.keystr(p) for p, _ in flat
                       if jax.tree_util.keystr(p) not in leaves]
            if missing:
                raise KeyError(
                    f"checkpoint tree '{tree_name}' is missing leaves: "
                    + ", ".join(missing[:8])
                )
            new_leaves = []
            for path, leaf in flat:
                entry = leaves[jax.tree_util.keystr(path)]
                host = _assemble_leaf(entry, reader)
                if isinstance(leaf, jax.Array):
                    if tuple(host.shape) != tuple(leaf.shape):
                        raise ValueError(
                            f"shape mismatch for {tree_name}"
                            f"{jax.tree_util.keystr(path)}: checkpoint "
                            f"{host.shape} vs template {leaf.shape}"
                        )
                    if len(leaf.sharding.device_set) == 1:
                        # single-device template leaves (e.g. optax step
                        # counters created off-mesh by tx.init) restore as
                        # UNCOMMITTED arrays so jit may co-locate them with
                        # the mesh-sharded params, exactly like the originals
                        new_leaves.append(jnp.asarray(host))
                    else:
                        new_leaves.append(jax.make_array_from_callback(
                            host.shape, leaf.sharding, lambda i, h=host: h[i]
                        ))
                elif isinstance(leaf, np.ndarray):
                    new_leaves.append(host.reshape(leaf.shape))
                else:
                    new_leaves.append(type(leaf)(host.item()) if host.ndim == 0
                                      else host)
            out[tree_name] = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return out
    finally:
        reader.close()
