"""Effective (non-pad) LM training throughput under a realistic length mix.

VERDICT round-4 missing #2: the reference eliminates pad compute with
flash-attn varlen unpadding (`/root/reference/text2semantic/roformer/
roformer_flash_attn.py:110-169`); this repo pads to bucketed batch maxima
and computes every pad position, and its 939k tokens/s headline was
measured at a FIXED 448-token shape.  This bench answers what the trainer
delivers on realistic variable-length data, and what length-sorted
batching (DataLoader(length_sorted=True), the TPU-native counterpart —
static shapes, buckets hugging true lengths) is worth:

1. build a realistic utterance-length corpus (log-normal durations,
   median ~4 s clipped to [1, 10.2] s — typical single-speaker TTS corpus
   shape; semantic tokens at 50/s + BOS/EOS, the whisper-unit rate the
   reference trains on; phones ~12/s for the ZH frontend);
2. batch it both ways with the REAL DataLoader logic at the reference
   batch size 100 and the shipping collate (pad_multiple 32) — record the
   padded-token fraction and the (phone_bucket, semantic_bucket) shape
   histogram each strategy produces;
3. on the chip, time the REAL train step once per distinct shape
   (chained-amortized, primed), then epoch time = sum(count_s * t_s) and
   effective tokens/s = true (non-pad) semantic tokens / epoch time.

Merges an "lm_padding" section into benchmarks/TRAINER_BENCH.json.
"""

from __future__ import annotations

import json
import sys
import time
from collections import Counter
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import probe_devices  # noqa: E402

probe_devices(metric="lm_padding_bench")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B = 100                    # reference text2semantic.train.batch_size
N_UTTS = 5000              # one epoch of a small corpus
TOKENS_PER_S = 50          # whisper units: 16 kHz / hop 320
PHONES_PER_S = 12
PAD_MULTIPLE = 32          # shipping collate default
MAX_PHONE_BUCKET = 64
N_PRIME, N_CHAIN = 20, 10
OUT = Path(__file__).parent / "TRAINER_BENCH.json"


class _SyntheticTextDataset:
    """In-memory TextDataset stand-in: same item dict contract, lengths drawn
    from the corpus model; items are (seed, index)-keyed and cheap."""

    thread_safe_items = True

    def __init__(self, sem_lens, phone_lens):
        self.sem_lens = sem_lens
        self.phone_lens = phone_lens

    def __len__(self):
        return len(self.sem_lens)

    def item_lengths(self):
        return self.sem_lens

    def __getitem__(self, i):
        g = np.random.default_rng([7, int(i)])
        np_, ns = int(self.phone_lens[i]), int(self.sem_lens[i])
        return {
            "phone": g.integers(1, 100, np_).astype(np.int32),
            "tone": g.integers(0, 8, np_).astype(np.int32),
            "semantic": g.integers(0, 4096, ns).astype(np.int32),
            "spk_id": np.ones(np_, np.int32),
        }


def corpus():
    g = np.random.default_rng(0)
    dur = np.clip(g.lognormal(mean=np.log(4.0), sigma=0.45, size=N_UTTS), 1.0, 10.2)
    sem = (dur * TOKENS_PER_S).astype(np.int64) + 2  # + BOS/EOS
    ph = np.minimum((dur * PHONES_PER_S).astype(np.int64) + 2, MAX_PHONE_BUCKET - 2)
    return sem, ph


def batch_stats(loader):
    """Shape histogram + token accounting from the REAL loader/collate."""
    shapes = Counter()
    real = padded = 0
    for b in loader:
        pl, sl = b["phone"].shape[1], b["semantic"].shape[1]
        shapes[(pl, sl)] += 1
        real += int(b["attention_mask"].sum())
        padded += b["attention_mask"].size
    return shapes, real, padded


def main():
    from functools import partial

    from latent_diffusion_speech_tpu.config import Config
    from latent_diffusion_speech_tpu.data import DataLoader, collate_text_batch
    from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

    sem, ph = corpus()
    ds = _SyntheticTextDataset(sem, ph)
    collate = partial(collate_text_batch, phone_pad=0, semantic_pad=4099,
                      pad_multiple=PAD_MULTIPLE)

    strategies = {
        "shuffled": dict(),
        "length_sorted": dict(length_sorted=True, pool_factor=50),
    }
    stats = {}
    for name, kw in strategies.items():
        loader = DataLoader(ds, B, collate=collate, shuffle=True, seed=0,
                            num_threads=1, **kw)
        shapes, real, padded = batch_stats(loader)
        stats[name] = {
            "shapes": shapes, "real_tokens": real, "padded_positions": padded,
            "pad_fraction": round(1 - real / padded, 4),
            "distinct_shapes": len(shapes),
        }
        print(f"[host] {name}: pad_fraction={stats[name]['pad_fraction']} "
              f"shapes={len(shapes)}", flush=True)

    # ---- on-chip: time the real train step once per distinct shape ----------
    cfg = Config()
    tr = LMTrainer(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    g = np.random.default_rng(1)

    def make_batch(pl, sl):
        # ~85% fill within the bucket (sorted batches hug the bucket); masks
        # participate exactly as the collate emits them
        items = []
        for _ in range(B):
            npho = max(2, int(pl * 0.9))
            nsem = max(2, min(sl, int(sl * 0.9)))
            items.append({
                "phone": g.integers(1, 100, npho).astype(np.int32),
                "tone": g.integers(0, 8, npho).astype(np.int32),
                "semantic": g.integers(0, 4096, nsem).astype(np.int32),
                "spk_id": np.ones(npho, np.int32),
            })
        return tr.device_put_batch(
            collate(items, max_phone_len=pl, max_semantic_len=sl)
        )

    def _fetch(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    all_shapes = sorted(set().union(*[s["shapes"].keys() for s in stats.values()]))
    shape_times = {}
    for (pl, sl) in all_shapes:
        batch = make_batch(pl, sl)

        def step(i):
            p, o, loss, _ = tr._train_step(
                tr.system.params, tr.opt_state, batch, jax.random.fold_in(key, i)
            )
            tr.system.params, tr.opt_state = p, o
            return loss

        _fetch(step(0))
        for i in range(1, N_PRIME + 1):
            out = step(i)
        _fetch(out)
        t0 = time.perf_counter()
        for i in range(N_PRIME, N_PRIME + N_CHAIN):
            out = step(i)
        _fetch(out)
        shape_times[(pl, sl)] = (time.perf_counter() - t0) / N_CHAIN
        print(f"[chip] shape ({pl},{sl}): {shape_times[(pl, sl)]*1e3:.1f} ms",
              flush=True)

    rows = {}
    for name, s in stats.items():
        epoch_s = sum(shape_times[k] * c for k, c in s["shapes"].items())
        n_batches = sum(s["shapes"].values())
        rows[name] = {
            "pad_fraction": s["pad_fraction"],
            "distinct_shapes": s["distinct_shapes"],
            "batches_per_epoch": n_batches,
            "epoch_wall_s": round(epoch_s, 2),
            "effective_tokens_per_s": round(s["real_tokens"] / epoch_s),
            "padded_tokens_per_s": round(s["padded_positions"] / epoch_s),
            "shape_histogram": {f"{k[0]}x{k[1]}": c
                                for k, c in sorted(s["shapes"].items())},
        }

    speedup = (rows["shuffled"]["epoch_wall_s"]
               / rows["length_sorted"]["epoch_wall_s"])
    section = {
        "corpus": f"{N_UTTS} utts, lognormal dur median 4 s clip [1,10.2] s, "
                  f"{TOKENS_PER_S} semantic tok/s + BOS/EOS, batch {B}, "
                  f"pad_multiple {PAD_MULTIPLE}",
        "shuffled": rows["shuffled"],
        "length_sorted": rows["length_sorted"],
        "epoch_speedup_length_sorted": round(speedup, 3),
        "shape_step_s": {f"{k[0]}x{k[1]}": round(v, 4)
                         for k, v in sorted(shape_times.items())},
        "reference_counterpart": "flash-attn varlen unpad "
                                 "(roformer_flash_attn.py:110-169)",
        "device": str(jax.devices()[0]),
    }

    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data["lm_padding"] = section
    OUT.write_text(json.dumps(data, indent=2))
    print(json.dumps({
        "metric": "lm_effective_tokens_per_s_length_sorted",
        "value": rows["length_sorted"]["effective_tokens_per_s"],
        "unit": "tokens/s",
        "vs_baseline": round(speedup, 3),
        "detail": section,
    }))


if __name__ == "__main__":
    main()
