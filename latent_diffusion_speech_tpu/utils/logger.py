"""Metrics/observability: JSONL + optional TensorBoard.

Replaces the reference's Saver (`tools/saver.py:12-159`): scalar logging,
config snapshot beside checkpoints, rank-0 gating.  JSONL is the primary sink
(machine-readable, dependency-free); TensorBoard is attached when available.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, Optional

import jax

__all__ = ["MetricsLogger"]

_log = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, expdir: str | Path, config_snapshot: Optional[dict] = None, use_tensorboard: bool = True):
        self.is_main = jax.process_index() == 0
        self.expdir = Path(expdir)
        self._tb = None
        if not self.is_main:
            return
        (self.expdir / "logs").mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.expdir / "logs" / "metrics.jsonl", "a")
        if config_snapshot is not None:
            import yaml

            (self.expdir / "config.yaml").write_text(yaml.safe_dump(config_snapshot, sort_keys=False))
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.expdir / "logs"))
            except Exception as e:
                _log.warning("TensorBoard requested but unavailable (%s); scalars go to JSONL only", e)
                self._tb = None
        self._t0 = time.time()
        self._figure_error_logged = False

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if not self.is_main:
            return
        rec = {"step": step, "time": round(time.time() - self._t0, 3), **metrics}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def log_audio(self, step: int, tag: str, audio, sample_rate: int) -> None:
        if self.is_main and self._tb is not None:
            import numpy as np

            self._tb.add_audio(tag, np.asarray(audio).reshape(-1, 1), step, sample_rate=sample_rate)

    def log_spec_comparison(self, step: int, tag: str, pred, gt) -> None:
        """Spectrogram triptych |pred-gt| / gt / pred (reference
        `tools/saver.py:57-65` figure logging)."""
        if not (self.is_main and self._tb is not None):
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import numpy as np

            pred = np.asarray(pred).T
            gt = np.asarray(gt).T
            fig, axes = plt.subplots(3, 1, figsize=(10, 8))
            for ax, (data, title) in zip(
                axes, [(np.abs(pred - gt), "|pred - gt|"), (gt, "gt"), (pred, "pred")]
            ):
                ax.imshow(data, origin="lower", aspect="auto", cmap="magma")
                ax.set_title(title)
            fig.tight_layout()
            self._tb.add_figure(tag, fig, step)
            plt.close(fig)
        except Exception:
            # Figures are best-effort (training must not die on a matplotlib
            # regression), but a silent failure would kill validation figures
            # invisibly — log the first occurrence with the traceback.
            if not self._figure_error_logged:
                self._figure_error_logged = True
                _log.exception("spec-comparison figure logging failed (logged once; figures disabled this run)")

    def close(self) -> None:
        if self.is_main:
            self._jsonl.close()
            if self._tb is not None:
                self._tb.close()
