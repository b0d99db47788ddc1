"""Import-and-verify any reference checkpoint in one command.

The real pretrained blobs (`pretrain/large-v3_encoder.pt`, HiFi-VAEGAN
`encoder.pth`/`decoder.pth`, `exp/*/model_<step>.pt`, `semantic_codebook.pt`
— reference layouts at `tools/tools.py:105-126`, `hifi_vaegan.py:6-8,33-40`,
`tools/saver.py:85-109`, `17_preprocess_train_cluster.py:70-75`) are absent
from the build environment, so every importer is parity-tested against
synthetic checkpoints of the same layout.  This tool makes the day-one smoke
with REAL weights a single command:

    python -m latent_diffusion_speech_tpu.cli.verify_import <ckpt> [--kind auto]

It (1) detects the artifact kind from the checkpoint's key fingerprint,
(2) infers the geometry from the state dict itself (layer counts, widths,
vocab sizes — not from defaults), (3) runs the importer and reports key
coverage (torch keys never read) and parameter-element accounting,
(4) runs a deterministic forward and reports output stats + finiteness, and
(5) optionally compares against / writes a golden npz:

    --save-golden g.npz   capture {inputs, output} from this import
    --golden g.npz        compare this import's forward to a saved capture
                          (produce the npz from a torch-side run for true
                          cross-framework parity; from a previous import for
                          regression testing)

Exit code 0 = imported, forward finite, golden (if given) within tolerance.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["verify", "detect_kind", "main"]


# ---------------------------------------------------------------------------
# state-dict access tracking (key coverage)
# ---------------------------------------------------------------------------


class _Tracking(dict):
    """Dict recording which keys were read via __getitem__.

    Importers that pre-fold weight norm rebuild the dict internally, losing
    tracking; `verify` detects that (zero reads) and reports element counts
    instead of an unused-key list.
    """

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read: set = set()
        self.bulk_read = False

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def items(self):
        # an importer iterating items() transforms the whole dict (prefix
        # strip / weight-norm fold): per-key coverage is no longer trackable
        self.bulk_read = True
        return super().items()


def _coverage(report: Dict, tracking: "_Tracking") -> None:
    report["torch_keys_read"] = len(tracking.read)
    if tracking.bulk_read:
        report["torch_keys_unused"] = None  # importer bulk-transforms the dict
    else:
        report["torch_keys_unused"] = sorted(set(tracking) - tracking.read)[:20]


def _to_np(v):
    return np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)


def _n_elements(tree) -> int:
    import jax

    return int(sum(np.size(x) for x in jax.tree_util.tree_leaves(tree)))


def _max_index(state: Dict, pattern: str) -> int:
    """Highest integer N over keys matching `pattern.format(N)` prefixes."""
    import re

    rx = re.compile(pattern)
    best = -1
    for k in state:
        m = rx.match(k)
        if m:
            best = max(best, int(m.group(1)))
    return best


# ---------------------------------------------------------------------------
# kind detection
# ---------------------------------------------------------------------------


def detect_kind(obj: Any, path: Path) -> str:
    """Fingerprint the checkpoint layout -> artifact kind."""
    if isinstance(obj, dict) and "cluster_centers_" in obj:
        return "codebook"
    if hasattr(obj, "cluster_centers_"):
        return "codebook"
    if isinstance(obj, dict) and "dims" in obj and "model_state_dict" in obj:
        return "whisper"
    state = obj.get("model", obj) if isinstance(obj, dict) else obj
    if not isinstance(state, dict):
        raise ValueError(f"{path}: unrecognized checkpoint object {type(obj)}")
    keys = list(state.keys())

    def has(prefix):
        return any(k.startswith(prefix) for k in keys)

    if has("text_encoder.") and has("semantic_decoder."):
        return "roformer"
    if has("llama.model.layers.") or has("model.layers."):
        return "llama"
    if has("unit_embed.") and has("decoder."):
        return "unit2mel"
    if has("conv1.") and has("blocks.0.attn."):
        return "whisper"  # bare encoder state dict without the dims wrapper
    if has("feature_extractor.conv_layers.") and has("encoder.layers.0.attention."):
        return "hubert"
    if has("wav2vec2.") or (has("feature_projection.") and has("encoder.pos_conv_embed.")):
        return "wav2vec2"
    if has("encoder.layers.0.conv_module.") or has("w2v_bert."):
        return "w2vbert"
    if has("embeddings.word_embeddings.") and has("encoder.layer.0.attention.self.query."):
        return "bert"
    if has("ups.0.") and has("conv_pre."):
        # HiFi-VAEGAN: encoder's conv_pre ingests raw audio (1 channel),
        # the generator's ingests the latent (inter_channels)
        w = None
        for cand in ("conv_pre.weight", "conv_pre.weight_v"):
            if cand in state:
                w = _to_np(state[cand])
                break
        if w is not None and w.shape[1] == 1:
            return "vaegan-encoder"
        return "vaegan-decoder"
    raise ValueError(
        f"{path}: cannot detect checkpoint kind from keys like {keys[:5]}; "
        "pass --kind explicitly"
    )


# ---------------------------------------------------------------------------
# per-kind verify: (import, forward, inputs) builders
# ---------------------------------------------------------------------------


def _verify_codebook(obj, report, args):
    from latent_diffusion_speech_tpu.quantize import load_codebook
    from latent_diffusion_speech_tpu.quantize.kmeans import kmeans_predict

    import jax.numpy as jnp

    centroids = load_codebook(args.path)
    report["geometry"] = {"clusters": centroids.shape[0], "dim": centroids.shape[1]}
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, centroids.shape[1])).astype(np.float32)
    ids = np.asarray(kmeans_predict(jnp.asarray(x), jnp.asarray(centroids)))
    return {"x": x}, ids.astype(np.int64), centroids


def _verify_whisper(obj, report, args):
    import jax
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.models.whisper.model import (
        WhisperDims,
        WhisperEncoder,
        whisper_encoder_params_from_torch,
    )

    if isinstance(obj, dict) and "dims" in obj:
        dims = WhisperDims.from_checkpoint_dims(obj["dims"])
        state = obj["model_state_dict"]
    else:
        state = obj.get("model", obj) if isinstance(obj, dict) else obj
        strip = {
            (k[len("encoder.") :] if k.startswith("encoder.") else k): v
            for k, v in state.items()
        }
        w = _to_np(strip["conv1.weight"])  # (n_state, n_mels, 3)
        dims = WhisperDims(
            n_mels=w.shape[1],
            n_audio_state=w.shape[0],
            n_audio_ctx=_to_np(strip["positional_embedding"]).shape[0]
            if "positional_embedding" in strip
            else 1500,
            n_audio_head=args.heads or max(w.shape[0] // 64, 1),
            n_audio_layer=_max_index(strip, r"blocks\.(\d+)\.") + 1,
        )
    tracking = _Tracking(state)
    params = whisper_encoder_params_from_torch(tracking, dims)
    report["geometry"] = dims.__dict__ if hasattr(dims, "__dict__") else str(dims)
    _coverage(report, tracking)

    module = WhisperEncoder(dims)
    rng = np.random.default_rng(0)
    T = min(200, 2 * dims.n_audio_ctx)  # stride-2 convs -> T/2 <= n_ctx outputs
    mel = rng.standard_normal((1, dims.n_mels, T)).astype(np.float32)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = np.asarray(module.apply({"params": params}, jnp.asarray(mel)))
    return {"mel": mel}, out, params


def _verify_vaegan(obj, report, args, kind):
    import jax
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.models.vaegan.config import VAEGANConfig
    from latent_diffusion_speech_tpu.models.vaegan.import_torch import (
        encoder_params_from_torch,
        generator_params_from_torch,
    )
    from latent_diffusion_speech_tpu.models.vaegan.models import Generator, VAEEncoder

    h = obj.get("config") if isinstance(obj, dict) else None
    cfg = VAEGANConfig.from_torch_h(h) if h else VAEGANConfig()
    report["geometry"] = {
        "inter_channels": cfg.inter_channels,
        "upsample_rates": list(cfg.upsample_rates),
        "resblock": cfg.resblock,
        "from_checkpoint_config": bool(h),
    }
    state = obj.get("model", obj) if isinstance(obj, dict) else obj
    rng = np.random.default_rng(0)
    if kind == "vaegan-encoder":
        params = encoder_params_from_torch(state, cfg)
        module = VAEEncoder(cfg)
        audio = (0.1 * rng.standard_normal((1, cfg.hop_size * 8))).astype(np.float32)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        _, m, logs = module.apply(
            {"params": params}, jnp.asarray(audio),
            rngs={"latent": jax.random.PRNGKey(0)},
        )
        out = np.concatenate([np.asarray(m), np.asarray(logs)], axis=-1)
        return {"audio": audio}, out, params
    params = generator_params_from_torch(state, cfg)
    module = Generator(cfg)
    z = rng.standard_normal((1, 8, cfg.inter_channels)).astype(np.float32)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = np.asarray(module.apply({"params": params}, jnp.asarray(z)))
    return {"z": z}, out, params


def _verify_unit2mel(obj, report, args):
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.infer.load import load_reference_pipeline

    # the config.yaml beside the checkpoint carries the geometry
    # (reference load_model_vocoder semantics, unit2mel.py:18-35)
    pipe = load_reference_pipeline(args.path, dtype=jnp.float32)
    system = pipe.diffusion
    cfg = system.cfg
    report["geometry"] = {
        "input_channel": cfg.input_channel,
        "out_dims": cfg.out_dims,
        "block_out_channels": list(cfg.block_out_channels),
        "n_hidden": cfg.n_hidden,
    }
    rng = np.random.default_rng(0)
    B, T = 1, 64
    units = rng.standard_normal((B, T, cfg.input_channel)).astype(np.float32)
    x_t = rng.standard_normal((B, T, cfg.out_dims)).astype(np.float32)
    t = np.asarray([10], np.int32)
    spk = np.ones((B, 1), np.int32)
    cond = system.module.apply(
        {"params": system.params}, jnp.asarray(units), None, jnp.asarray(spk), None,
        method=system.module.condition,
    )
    x = jnp.concatenate([jnp.asarray(x_t), cond.astype(jnp.float32)], axis=-1)
    out = np.asarray(
        system.module.apply({"params": system.params}, x, jnp.asarray(t),
                            method=system.module.denoise)
    )
    return {"units": units, "x_t": x_t, "t": t, "spk": spk}, out, system.params


def _verify_roformer(obj, report, args):
    import jax
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.models.lm.import_hf import roformer_params_from_torch
    from latent_diffusion_speech_tpu.models.lm.roformer import (
        RoformerConfig,
        RoformerSystem,
        StackConfig,
    )

    state = obj.get("model", obj) if isinstance(obj, dict) else obj
    # geometry from the state dict itself
    enc_layers = _max_index(state, r"text_encoder\.encoder\.layer\.(\d+)\.") + 1
    dec_layers = _max_index(state, r"semantic_decoder\.roformer\.encoder\.layer\.(\d+)\.") + 1
    enc_h = _to_np(state["text_encoder.embeddings.word_embeddings.weight"]).shape[1]
    dec_emb = _to_np(state["semantic_decoder.roformer.embeddings.word_embeddings.weight"])
    enc_ff = _to_np(state["text_encoder.encoder.layer.0.intermediate.dense.weight"]).shape[0]
    dec_ff = _to_np(
        state["semantic_decoder.roformer.encoder.layer.0.intermediate.dense.weight"]
    ).shape[0]
    n_spk = (_to_np(state["spk_emb.weight"]).shape[0] - 1) if "spk_emb.weight" in state else 0
    cfg = RoformerConfig(
        encoder=StackConfig(hidden_size=enc_h, num_hidden_layers=enc_layers,
                            intermediate_size=enc_ff,
                            num_attention_heads=args.heads or 8),
        decoder=StackConfig(hidden_size=dec_emb.shape[1], num_hidden_layers=dec_layers,
                            intermediate_size=dec_ff,
                            num_attention_heads=args.heads or 8),
        semantic_kmeans_num=dec_emb.shape[0] - 3,
        n_spk=n_spk,
    )
    report["geometry"] = {
        "encoder_layers": enc_layers, "decoder_layers": dec_layers,
        "hidden": enc_h, "semantic_kmeans_num": cfg.semantic_kmeans_num,
        "n_spk": n_spk,
    }
    tracking = _Tracking(state)
    params = roformer_params_from_torch(tracking, cfg)
    _coverage(report, tracking)

    system = RoformerSystem(cfg, params=jax.tree_util.tree_map(jnp.asarray, params))
    rng = np.random.default_rng(0)
    B, L, S = 1, 12, 16
    phone = rng.integers(1, 40, (B, L)).astype(np.int32)
    tone = rng.integers(0, 5, (B, L)).astype(np.int32)
    sem = rng.integers(0, min(64, cfg.semantic_kmeans_num), (B, S)).astype(np.int32)
    spk = np.ones((B, L), np.int32) if n_spk else None
    out = np.asarray(
        system.module.apply(
            {"params": system.params}, jnp.asarray(phone), jnp.asarray(tone),
            jnp.asarray(sem), jnp.asarray(spk) if spk is not None else None,
        )
    )
    return {"phone": phone, "tone": tone, "semantic": sem}, out, system.params


def _verify_llama(obj, report, args):
    import jax
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.models.lm.import_hf import llama_params_from_torch
    from latent_diffusion_speech_tpu.models.lm.llama import LlamaConfig, LlamaSystem
    from latent_diffusion_speech_tpu.text.symbols import symbols

    state = obj.get("model", obj) if isinstance(obj, dict) else obj
    pre = "llama." if any(k.startswith("llama.") for k in state) else ""
    pattern = (r"llama\." if pre else "") + r"model\.layers\.(\d+)\."
    layers = _max_index(state, pattern) + 1
    emb = _to_np(state[f"{pre}model.embed_tokens.weight"])
    ff = _to_np(state[f"{pre}model.layers.0.mlp.gate_proj.weight"]).shape[0]
    cfg = LlamaConfig(
        hidden_size=emb.shape[1],
        num_hidden_layers=layers,
        intermediate_size=ff,
        num_attention_heads=args.heads or 4,
        semantic_kmeans_num=emb.shape[0] - len(symbols) - 3,
    )
    report["geometry"] = {
        "layers": layers, "hidden": emb.shape[1], "intermediate": ff,
        "vocab": emb.shape[0], "semantic_kmeans_num": cfg.semantic_kmeans_num,
    }
    tracking = _Tracking(state)
    params = llama_params_from_torch(tracking, cfg)
    _coverage(report, tracking)

    system = LlamaSystem(cfg, params=jax.tree_util.tree_map(jnp.asarray, params))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (1, 16)).astype(np.int32)
    out = np.asarray(system.module.apply({"params": system.params}, jnp.asarray(ids)))
    return {"input_ids": ids}, out, system.params


def _verify_stats_only(obj, report, args, kind):
    """Import-only verification for the unit-encoder family (geometry comes
    from their own configs; forwards are covered by the HF-parity tests)."""
    import jax

    state = obj.get("model", obj) if isinstance(obj, dict) else obj
    if kind == "hubert":
        from latent_diffusion_speech_tpu.models.hubert import hubert_params_from_torch

        params = hubert_params_from_torch(state)
    elif kind == "wav2vec2":
        from latent_diffusion_speech_tpu.models.wav2vec2 import (
            Wav2Vec2Config,
            wav2vec2_params_from_fairseq,
            wav2vec2_params_from_hf,
        )

        cfg = Wav2Vec2Config()
        if any(k.startswith("w2v_encoder.") or k.startswith("encoder.layers.0.self_attn")
               for k in state):
            params = wav2vec2_params_from_fairseq(state, cfg)
        else:
            params = wav2vec2_params_from_hf(state, cfg)
    elif kind == "w2vbert":
        from latent_diffusion_speech_tpu.models.w2vbert import (
            W2vBertConfig,
            w2vbert_params_from_torch,
        )

        params = w2vbert_params_from_torch(state, W2vBertConfig())
    elif kind == "bert":
        from latent_diffusion_speech_tpu.models.bert import BertConfig, bert_params_from_torch

        emb = _to_np(state["embeddings.word_embeddings.weight"])
        layers = _max_index(state, r"encoder\.layer\.(\d+)\.") + 1
        cfg = BertConfig(vocab_size=emb.shape[0], hidden_size=emb.shape[1],
                         num_hidden_layers=layers)
        report["geometry"] = {"vocab": emb.shape[0], "hidden": emb.shape[1], "layers": layers}
        params = bert_params_from_torch(state, cfg)
    else:
        raise ValueError(kind)
    leaves = jax.tree_util.tree_leaves(params)
    out = np.asarray([float(np.abs(np.asarray(x)).mean()) for x in leaves[:8]])
    return {}, out, params


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def verify(args) -> Dict:
    path = Path(args.path)
    report: Dict = {"path": str(path)}

    obj: Any
    if path.is_dir() and (path / "decoder.pth").exists():
        # a HiFi-VAEGAN pair directory: verify both halves
        enc_args = argparse.Namespace(**{**vars(args), "path": str(path / "encoder.pth")})
        dec_args = argparse.Namespace(**{**vars(args), "path": str(path / "decoder.pth")})
        return {
            "encoder": verify(enc_args),
            "decoder": verify(dec_args),
        }
    if path.suffix == ".npz":
        obj = dict(np.load(path, allow_pickle=True))
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)

    kind = args.kind if args.kind != "auto" else detect_kind(obj, path)
    report["kind"] = kind

    if kind == "codebook":
        inputs, out, params = _verify_codebook(obj, report, args)
    elif kind == "whisper":
        inputs, out, params = _verify_whisper(obj, report, args)
    elif kind in ("vaegan-encoder", "vaegan-decoder"):
        inputs, out, params = _verify_vaegan(obj, report, args, kind)
    elif kind == "unit2mel":
        inputs, out, params = _verify_unit2mel(obj, report, args)
    elif kind == "roformer":
        inputs, out, params = _verify_roformer(obj, report, args)
    elif kind == "llama":
        inputs, out, params = _verify_llama(obj, report, args)
    elif kind in ("hubert", "wav2vec2", "w2vbert", "bert"):
        inputs, out, params = _verify_stats_only(obj, report, args, kind)
    else:
        raise ValueError(f"unknown kind {kind!r}")

    # element accounting: imported tree vs torch state (weight-norm folding
    # legitimately drops the per-channel g magnitudes; embeddings may add
    # BOS/EOS/PAD rows — the report states both numbers, not a verdict)
    state = obj.get("model", obj) if isinstance(obj, dict) else obj
    if isinstance(state, dict) and all(hasattr(v, "shape") or hasattr(v, "detach")
                                       for v in state.values()):
        report["torch_elements"] = int(sum(int(np.prod(_to_np(v).shape)) for v in state.values()))
    report["imported_elements"] = _n_elements(params)

    report["output_shape"] = list(np.asarray(out).shape)
    report["output_mean"] = float(np.mean(out))
    report["output_std"] = float(np.std(out))
    report["output_finite"] = bool(np.all(np.isfinite(out)))

    if args.save_golden:
        np.savez(
            args.save_golden, kind=kind, output=out,
            **{f"in_{k}": v for k, v in inputs.items()},
        )
        report["golden_saved"] = args.save_golden
    if args.golden:
        g = np.load(args.golden, allow_pickle=True)
        ref = np.asarray(g["output"])
        if ref.shape != np.asarray(out).shape:
            report["golden_match"] = False
            report["golden_error"] = f"shape {list(ref.shape)} != {list(np.asarray(out).shape)}"
        else:
            diff = float(np.max(np.abs(ref - out)))
            denom = float(np.max(np.abs(ref))) or 1.0
            report["golden_max_abs_diff"] = diff
            report["golden_rel_diff"] = diff / denom
            report["golden_match"] = bool(diff / denom <= args.tol)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("path", help="checkpoint file (.pt/.pth/.npz) or HiFi-VAEGAN dir")
    ap.add_argument("--kind", default="auto", choices=[
        "auto", "whisper", "vaegan-encoder", "vaegan-decoder", "unit2mel",
        "roformer", "llama", "codebook", "hubert", "wav2vec2", "w2vbert", "bert",
    ])
    ap.add_argument("--heads", type=int, default=0,
                    help="attention heads when not inferable from the state dict")
    ap.add_argument("--golden", default=None, help="npz with a trusted {inputs, output}")
    ap.add_argument("--save-golden", default=None, help="write this import's forward as npz")
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="max relative diff accepted vs --golden")
    ap.add_argument("--json", action="store_true", help="machine-readable output only")
    args = ap.parse_args(argv)

    report = verify(args)
    print(json.dumps(report, indent=None if args.json else 2, default=str))

    def failed(r):
        if "encoder" in r and "decoder" in r:
            return failed(r["encoder"]) or failed(r["decoder"])
        return (not r.get("output_finite", True)) or r.get("golden_match") is False

    return 1 if failed(report) else 0


if __name__ == "__main__":
    sys.exit(main())
