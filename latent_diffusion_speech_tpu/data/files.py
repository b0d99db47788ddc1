"""Filesystem helpers for the pipeline data layout."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Sequence

__all__ = ["traverse_dir", "speaker_id_map"]


def traverse_dir(
    root: str | Path,
    extensions: Sequence[str] = ("wav",),
    relative: bool = True,
    sort: bool = True,
    keep_ext: bool = True,
) -> List[str]:
    """Recursive file listing (reference `tools/utils.traverse_dir` behavior:
    relative, sorted, extension-filtered paths)."""
    root = Path(root)
    if not root.exists():
        return []
    out = []
    for dirpath, _, filenames in os.walk(root):
        for fn in filenames:
            if any(fn.endswith("." + e) for e in extensions):
                p = Path(dirpath) / fn
                rel = p.relative_to(root) if relative else p
                if not keep_ext:
                    rel = rel.with_suffix("")
                out.append(str(rel))
    return sorted(out) if sort else out


def speaker_id_map(paths: Sequence[str]) -> Dict[str, int]:
    """Directory -> 1-based speaker id, in path order (reference
    `data_loaders.py:116-124` convention: ids assigned as new speaker dirs
    appear in the sorted traversal)."""
    mapping: Dict[str, int] = {}
    next_id = 1
    for p in paths:
        d = os.path.dirname(p)
        if d not in mapping:
            mapping[d] = next_id
            next_id += 1
    return mapping
