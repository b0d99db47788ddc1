"""Import reference PyTorch HiFi-VAEGAN checkpoints into flax params.

Handles (SURVEY.md "Hard parts"):
* weight-norm folding: checkpoints store `weight_v`/`weight_g`; folded
  W = g * v / ||v|| with the norm over all dims except dim 0
  (torch.nn.utils.weight_norm default).
* layout: torch Conv1d weight (out, in, k) -> flax (k, in, out);
  torch ConvTranspose1d weight (in, out, k) -> input-dilated-conv kernel
  (k, in, out) with the tap axis flipped.

Checkpoint layout per the reference: `encoder.pth`/`decoder.pth` each
`{"model": state_dict, "config": h}` (`hifi_vaegan.py:6-8,33-40,55-62`).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["fold_weight_norm", "encoder_params_from_torch", "generator_params_from_torch"]


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, dtype=np.float32)


def fold_weight_norm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold every `<name>.weight_v`/`<name>.weight_g` pair into `<name>.weight`."""
    out: Dict[str, np.ndarray] = {}
    for key, val in state.items():
        if key.endswith(".weight_g"):
            continue
        if key.endswith(".weight_v"):
            base = key[: -len(".weight_v")]
            v = _np(val)
            g = _np(state[base + ".weight_g"])
            norm = np.sqrt(np.sum(v.reshape(v.shape[0], -1) ** 2, axis=1)).reshape(
                (-1,) + (1,) * (v.ndim - 1)
            )
            out[base + ".weight"] = g * v / np.maximum(norm, 1e-12)
        else:
            out[key] = _np(val)
    return out


def _conv(state: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = state[name + ".weight"]  # (out, in, k)
    p = {"kernel": np.transpose(w, (2, 1, 0))}
    if name + ".bias" in state:
        p["bias"] = state[name + ".bias"]
    return {"Conv_0": p}


def _conv_transpose(state: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = state[name + ".weight"]  # (in, out, k)
    kernel = np.transpose(w[:, :, ::-1], (2, 0, 1))  # flip taps -> (k, in, out)
    p = {"kernel": np.ascontiguousarray(kernel)}
    if name + ".bias" in state:
        p["bias"] = state[name + ".bias"]
    return {"Conv_0": p}


def _resblock(state: Dict[str, np.ndarray], prefix: str, resblock_type: str) -> Dict:
    out = {}
    if resblock_type == "1":
        for n in range(3):
            out[f"conv1_{n}"] = _conv(state, f"{prefix}.convs1.{n}")
            out[f"conv2_{n}"] = _conv(state, f"{prefix}.convs2.{n}")
    else:
        for n in range(2):
            out[f"conv_{n}"] = _conv(state, f"{prefix}.convs.{n}")
    return out


def encoder_params_from_torch(state: Dict, cfg) -> Dict:
    """Reference `Encoder` state dict -> flax `VAEEncoder` params."""
    state = fold_weight_norm(state)
    n_stages = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    params = {
        "conv_pre": _conv(state, "conv_pre"),
        "conv_post": _conv(state, "conv_post"),
    }
    for i in range(n_stages):
        params[f"down_{i}"] = _conv(state, f"ups.{i}")
        for j in range(n_kernels):
            params[f"res_{i}_{j}"] = _resblock(
                state, f"resblocks.{i * n_kernels + j}", cfg.resblock
            )
    return params


def generator_params_from_torch(state: Dict, cfg) -> Dict:
    """Reference `Generator` state dict -> flax `Generator` params."""
    state = fold_weight_norm(state)
    n_stages = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    params = {
        "conv_pre": _conv(state, "conv_pre"),
        "conv_post": _conv(state, "conv_post"),
    }
    for i in range(n_stages):
        params[f"up_{i}"] = _conv_transpose(state, f"ups.{i}")
        for j in range(n_kernels):
            params[f"res_{i}_{j}"] = _resblock(
                state, f"resblocks.{i * n_kernels + j}", cfg.resblock
            )
    return params
