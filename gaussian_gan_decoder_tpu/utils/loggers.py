"""Training observability: jsonl + image grids + optional TB / wandb.

Re-design of the reference's logging block
(/root/reference/main/train_pano2gaussian_decoder.py:154-157 writer setup,
:267-296 scalar + side-by-side compare-image logging). The reference
hard-requires tensorboardX and optionally wandb; here both are
try-imports — the always-on sinks are stats.jsonl and render|target PNG
grids in <outdir>/images (wandb's compare_output equivalent you can
eyeball without any dashboard).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class TrainLogger:
    """Fan-out logger: jsonl (always), TensorBoard + wandb (if importable),
    and PNG image grids."""

    def __init__(self, outdir: str, use_wandb: bool = False,
                 wandb_project: str = "gaussian_gan_decoder_tpu",
                 run_name: Optional[str] = None):
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        os.makedirs(os.path.join(outdir, "images"), exist_ok=True)
        self._jsonl = open(os.path.join(outdir, "stats.jsonl"), "a")
        self._t_last = time.time()

        self._tb = None
        try:  # torch ships the TB writer; tensorboard itself may be absent
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=os.path.join(outdir, "tb"))
        except Exception:
            pass

        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=wandb_project, name=run_name,
                           dir=outdir, config={})
                self._wandb = wandb
            except Exception:
                print("wandb requested but unavailable — skipping")

    # -- scalars ---------------------------------------------------------------

    def log_scalars(self, step: int, metrics: Dict[str, float]):
        row = {k: float(v) for k, v in metrics.items()}
        row["step"] = int(step)
        row["wall"] = time.time() - self._t_last
        self._t_last = time.time()
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step",):
                    self._tb.add_scalar(k, v, global_step=step)
        if self._wandb is not None:
            self._wandb.log(row, step=int(step))
        return row

    # -- images ------------------------------------------------------------------

    def log_compare_image(self, step: int, image, target, tag: str = "Render"):
        """Side-by-side render|target grid (the reference's compare_image,
        train_pano2gaussian_decoder.py:268-275). image/target: (3, H, W)
        or (N, 3, H, W) in [0, 1]."""
        img = np.asarray(image, np.float32)
        tgt = np.asarray(target, np.float32)
        if img.ndim == 4:
            img, tgt = img[0], tgt[0]
        grid = np.concatenate([img, tgt], axis=2)  # side by side along W
        arr = np.clip(grid.transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)
        path = os.path.join(self.outdir, "images", f"{tag.lower()}_{step:06d}.png")
        try:
            from PIL import Image

            Image.fromarray(arr).save(path)
        except ImportError:
            np.save(path + ".npy", arr)
        if self._tb is not None:
            self._tb.add_image(tag, np.clip(grid, 0, 1), global_step=step)
        if self._wandb is not None:
            self._wandb.log(
                {"compare_output": [self._wandb.Image(
                    arr, caption="Comparison")]},
                step=int(step),
            )
        return path

    def write_raw(self, obj):
        self._jsonl.write(json.dumps(obj) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
