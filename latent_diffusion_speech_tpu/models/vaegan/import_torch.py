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

__all__ = [
    "fold_weight_norm",
    "encoder_params_from_torch",
    "generator_params_from_torch",
    "discriminator_bank_params_from_torch",
]


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
    else:
        p["bias"] = np.zeros(w.shape[0], np.float32)
    return p


def _conv_transpose(state: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = state[name + ".weight"]  # (in, out, k)
    kernel = np.transpose(w[:, :, ::-1], (2, 0, 1))  # flip taps -> (k, in, out)
    p = {"kernel": np.ascontiguousarray(kernel)}
    if name + ".bias" in state:
        p["bias"] = state[name + ".bias"]
    else:
        p["bias"] = np.zeros(w.shape[1], np.float32)
    return p


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


# ---------------------------------------------------------------------------
# discriminator bank (reference MultiPeriodDiscriminator, models.py:131-159:
# [MultiScaleSTFTDiscriminator(filters=32), DiscriminatorS, DiscriminatorP x9])
# ---------------------------------------------------------------------------

def _conv2d(state: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = state[name + ".weight"]  # (out, in, kh, kw)
    p = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if name + ".bias" in state:
        p["bias"] = state[name + ".bias"]
    return p


def _conv1d(state: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    w = state[name + ".weight"]  # (out, in/groups, k)
    p = {"kernel": np.transpose(w, (2, 1, 0))}
    if name + ".bias" in state:
        p["bias"] = state[name + ".bias"]
    return p


def discriminator_bank_params_from_torch(
    state: Dict, periods=(2, 3, 5, 7, 11, 13, 19, 23, 29), n_stft_scales: int = 3
) -> Dict:
    """Map a reference `MultiPeriodDiscriminator` state dict onto the flax
    `DiscriminatorBank` tree (weight-norm folded first).

    Reference layout: `discriminators.0` = MS-STFT (its own
    `.discriminators.{s}.convs.{j}.conv` + `.conv_post.conv`),
    `discriminators.1` = DiscriminatorS (`convs.{j}` + `conv_post`),
    `discriminators.{2+i}` = DiscriminatorP(periods[i])."""
    state = fold_weight_norm({k: _np(v) for k, v in state.items()})
    params: Dict = {}
    for s in range(n_stft_scales):
        base = f"discriminators.0.discriminators.{s}"
        tree = {}
        for j in range(5):  # first conv + 3 dilated + pre-post
            tree[f"Conv_{j}"] = _conv2d(state, f"{base}.convs.{j}.conv")
        tree["Conv_5"] = _conv2d(state, f"{base}.conv_post.conv")
        params[f"stft_{s}"] = tree
    tree = {}
    for j in range(6):
        tree[f"Conv_{j}"] = _conv1d(state, f"discriminators.1.convs.{j}")
    tree["Conv_6"] = _conv1d(state, "discriminators.1.conv_post")
    params["scale"] = tree
    for i, p in enumerate(periods):
        base = f"discriminators.{2 + i}"
        tree = {}
        for j in range(5):
            tree[f"Conv_{j}"] = _conv2d(state, f"{base}.convs.{j}")
        tree["Conv_5"] = _conv2d(state, f"{base}.conv_post")
        params[f"period_{p}"] = tree
    return params
