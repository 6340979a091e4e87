"""Metrics logging: console + CSV (+ optional TensorBoard / wandb).

Rebuild of the reference Logger (tools/logger.py:1-236): averaged meter
groups with train/eval formats, self-healing CSV schema (new fields trigger a
rewrite with the union header), and visual (video) logging hooks. TB/wandb
are optional; imports are gated so the framework runs in a hermetic image.
"""

from __future__ import annotations

import csv
import datetime
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import numpy as np

COMMON_TRAIN_FORMAT = [
    ("frame", "F", "int"),
    ("step", "S", "int"),
    ("episode", "E", "int"),
    ("episode_length", "L", "int"),
    ("episode_reward", "R", "float"),
    ("fps", "FPS", "float"),
    ("total_time", "T", "time"),
]

COMMON_EVAL_FORMAT = [
    ("frame", "F", "int"),
    ("step", "S", "int"),
    ("episode", "E", "int"),
    ("episode_length", "L", "int"),
    ("episode_reward", "R", "float"),
    ("total_time", "T", "time"),
]


class AverageMeter:
    def __init__(self):
        self._sum = 0.0
        self._count = 0

    def update(self, value, n=1):
        self._sum += float(value) * n
        self._count += n

    def value(self):
        return self._sum / max(1, self._count)


class MetersGroup:
    def __init__(self, csv_file_name: Path, formating):
        self._csv_file_name = Path(csv_file_name)
        self._formating = formating
        self._meters = defaultdict(AverageMeter)
        self._csv_file = None
        self._csv_writer = None
        self._csv_fields = []

    def log(self, key: str, value, n: int = 1):
        self._meters[key].update(value, n)

    def _prime_meters(self) -> Dict[str, float]:
        data = {}
        for key, meter in self._meters.items():
            if key.startswith("train/") or key.startswith("eval/"):
                key = key[key.index("/") + 1 :]
            data[key] = meter.value()
        return data

    # ---- CSV with schema self-healing (reference: tools/logger.py:59-116) ----
    def _migrate_schema(self, data):
        """Rewrite the CSV so its header covers the union of the existing
        fields and ``data``'s keys; rows keep their values, missing cells
        fill with 0.0. Rows at/after the current frame are dropped
        (resume-overwrite semantics). Returns the new field list."""
        rows, old_fields = [], []
        with self._csv_file_name.open("r") as f:
            reader = csv.DictReader(f)
            old_fields = list(reader.fieldnames or [])
            for row in reader:
                if "frame" in row and row["frame"] and float(row["frame"]) >= data["frame"]:
                    break
                rows.append(row)
        fields = sorted(set(old_fields) | set(data.keys()))
        with self._csv_file_name.open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fields, restval=0.0)
            writer.writeheader()
            for row in rows:
                writer.writerow({k: row.get(k, 0.0) for k in fields})
        return fields

    def _dump_to_csv(self, data):
        if self._csv_writer is not None and not set(data) <= set(self._csv_fields):
            # a metric appeared mid-run (e.g. episode_reward after the first
            # episode completes): rewrite with the union schema and reopen
            self._csv_file.close()
            self._csv_writer = None
        if self._csv_writer is None:
            self._csv_file_name.parent.mkdir(parents=True, exist_ok=True)
            header_needed = True
            if self._csv_file_name.exists():
                with self._csv_file_name.open("r") as f:
                    old_fields = csv.DictReader(f).fieldnames or []
                if set(data) <= set(old_fields):
                    self._csv_fields = list(old_fields)
                else:
                    self._csv_fields = self._migrate_schema(data)
                header_needed = False
            else:
                self._csv_fields = sorted(data.keys())
            self._csv_file = self._csv_file_name.open("a", newline="")
            self._csv_writer = csv.DictWriter(
                self._csv_file, fieldnames=self._csv_fields, restval=0.0
            )
            if header_needed:
                self._csv_writer.writeheader()
        self._csv_writer.writerow(data)
        self._csv_file.flush()

    @staticmethod
    def _format(key, value, ty):
        if ty == "int":
            return f"{key}: {int(value)}"
        if ty == "float":
            return f"{key}: {value:.04f}"
        if ty == "time":
            value = str(datetime.timedelta(seconds=int(value)))
            return f"{key}: {value}"
        raise ValueError(ty)

    def _dump_to_console(self, data, prefix):
        prefix = f"| {prefix: <14}"
        pieces = [prefix]
        for key, disp_key, ty in self._formating:
            if key in data:
                pieces.append(self._format(disp_key, data[key], ty))
        print(" | ".join(pieces))

    def dump(self, step, prefix):
        if len(self._meters) == 0:
            return
        data = self._prime_meters()
        data["frame"] = step
        self._dump_to_csv(data)
        self._dump_to_console(data, prefix)
        self._meters.clear()


class Logger:
    def __init__(self, log_dir, use_tb: bool = False, use_wandb: bool = False):
        self._log_dir = Path(log_dir)
        self._log_dir.mkdir(parents=True, exist_ok=True)
        self._train_mg = MetersGroup(self._log_dir / "train.csv", COMMON_TRAIN_FORMAT)
        self._eval_mg = MetersGroup(self._log_dir / "eval.csv", COMMON_EVAL_FORMAT)
        self._sw = None
        self._use_wandb = False
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._sw = SummaryWriter(str(self._log_dir / "tb"))
            except ImportError:
                print("logger: tensorboard unavailable, skipping")
        if use_wandb:
            try:
                import wandb  # noqa: F401

                self._use_wandb = True
            except ImportError:
                print("logger: wandb unavailable, skipping")

    def _try_sw_log(self, key, value, step):
        if self._sw is not None:
            self._sw.add_scalar(key, value, step)

    def _try_wandb_log(self, key, value, step):
        if self._use_wandb:
            import wandb

            wandb.log({key: value}, step=step)

    def log(self, key: str, value, step: int):
        assert key.startswith("train") or key.startswith("eval"), key
        value = float(np.asarray(value))
        self._try_sw_log(key, value, step)
        self._try_wandb_log(key, value, step)
        mg = self._train_mg if key.startswith("train") else self._eval_mg
        mg.log(key, value)

    def log_metrics(self, metrics: Dict[str, float], step: int, ty: str):
        for key, value in metrics.items():
            self.log(f"{ty}/{key}", value, step)

    def log_visual(self, visuals: Dict[str, np.ndarray], step: int, fps: int = 10):
        """videos: dict name -> [T, H, W, C] float in [0,1] or [B,T,H,W,C]."""
        for name, video in visuals.items():
            video = np.asarray(video)
            if video.ndim == 5:
                video = video[0]
            frames = (np.clip(video, 0, 1) * 255).astype(np.uint8)
            out = self._log_dir / "videos" / f"{name}_{step}.npz"
            out.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(out, frames=frames)
            if self._sw is not None:
                import torch

                self._sw.add_video(
                    name, torch.from_numpy(frames.transpose(0, 3, 1, 2)[None]), step, fps=fps
                )
            if self._use_wandb:
                import wandb

                wandb.log({name: wandb.Video(frames.transpose(0, 3, 1, 2), fps=fps)}, step=step)

    def dump(self, step, ty=None):
        if ty is None or ty == "train":
            self._train_mg.dump(step, "train")
        if ty is None or ty == "eval":
            self._eval_mg.dump(step, "eval")

    class _LogAndDump:
        def __init__(self, logger, step, ty):
            self._logger = logger
            self._step = step
            self._ty = ty

        def __enter__(self):
            return self

        def __call__(self, key, value):
            self._logger.log(f"{self._ty}/{key}", value, self._step)

        def __exit__(self, *args):
            self._logger.dump(self._step, self._ty)

    def log_and_dump_ctx(self, step, ty):
        return Logger._LogAndDump(self, step, ty)
