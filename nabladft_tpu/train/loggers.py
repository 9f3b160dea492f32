"""Metric loggers: stdout, CSV, and optional wandb/tensorboard.

Reference parity: WandbLogger by default (config/loggers/wandb.yaml, login
at startup utils/pipelines.py:50-52, finish-on-close l.32-41), tensorboardX
for PhiSNet. Both are optional here (import-guarded); CSV + stdout always
work, which is what CI and the bench harness read.
"""

from __future__ import annotations

import csv
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


class Logger:
    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        raise NotImplementedError

    def log_hyperparams(self, params: Dict) -> None:
        pass

    def log_histograms(self, params, step: int) -> None:
        """Parameter histograms (a flax param pytree). No-op by default —
        only the tensorboard backend renders them (PhiSNet legacy parity:
        phisnet/training logs param histograms via tensorboardX)."""
        pass

    def finalize(self) -> None:
        pass


class StdoutLogger(Logger):
    def __init__(self, every_n: int = 1):
        self.every_n = every_n
        self._n = 0

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        self._n += 1
        if self._n % self.every_n == 0:
            msg = "  ".join(f"{k}={v:.4e}" for k, v in sorted(metrics.items()))
            logger.info("[step %d] %s", step, msg)


class CSVLogger(Logger):
    def __init__(self, path: Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fieldnames: Optional[List[str]] = None
        self._file = None
        self._writer = None

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        row = {"step": step, "time": time.time(), **metrics}
        if self._writer is None or any(k not in self._fieldnames for k in row):
            names = sorted(set(row) | set(self._fieldnames or []))
            # rewrite with extended header if schema grew
            old_rows = []
            if self._file is not None:
                self._file.close()
                with open(self.path) as f:
                    old_rows = list(csv.DictReader(f))
            self._fieldnames = names
            self._file = open(self.path, "w", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=names, restval="")
            self._writer.writeheader()
            for r in old_rows:
                self._writer.writerow(r)
        self._writer.writerow(row)
        self._file.flush()

    def finalize(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
            self._writer = None


class WandbLogger(Logger):
    def __init__(self, project: str, name: Optional[str] = None, **kwargs):
        import wandb  # deferred; optional dependency

        self._run = wandb.init(project=project, name=name, **kwargs)

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        self._run.log(metrics, step=step)

    def log_hyperparams(self, params: Dict) -> None:
        self._run.config.update(params, allow_val_change=True)

    def finalize(self) -> None:
        self._run.finish()


class TensorBoardLogger(Logger):
    """Scalar summaries + parameter histograms in tensorboard event files.

    Reference parity: the PhiSNet legacy trainer writes tensorboardX
    summaries including per-parameter histograms (phisnet/train.py
    SummaryWriter usage); implemented here on torch's bundled
    SummaryWriter (no tensorflow needed) so `tensorboard --logdir` reads
    the runs directly.
    """

    def __init__(self, log_dir: Path):
        from torch.utils.tensorboard import SummaryWriter  # deferred

        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self._writer = SummaryWriter(log_dir=str(log_dir))

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        for k, v in metrics.items():
            self._writer.add_scalar(k, float(v), global_step=step)

    def log_hyperparams(self, params: Dict) -> None:
        # flatten to scalars/strings; SummaryWriter hparams need flat dicts
        flat = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix}{k}." if not prefix else f"{prefix}{k}.", v)
            else:
                flat[prefix.rstrip(".")] = (
                    node if isinstance(node, (int, float, bool)) else str(node)
                )

        walk("", params or {})
        if flat:
            self._writer.add_hparams(flat, {"hparams/recorded": 1.0},
                                     run_name=".")

    def log_histograms(self, params, step: int) -> None:
        import numpy as np

        try:
            import jax
        except Exception:  # pragma: no cover
            return
        leaves = jax.tree_util.tree_leaves_with_path(params)
        for path, leaf in leaves:
            name = "/".join(
                getattr(p, "key", getattr(p, "name", str(p))) for p in path
            )
            arr = np.asarray(leaf, dtype=np.float32)
            if arr.size:
                self._writer.add_histogram(f"params/{name}", arr, global_step=step)

    def finalize(self) -> None:
        self._writer.flush()
        self._writer.close()


class MultiLogger(Logger):
    def __init__(self, loggers: List[Logger]):
        self.loggers = loggers

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_hyperparams(self, params: Dict) -> None:
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def log_histograms(self, params, step: int) -> None:
        for lg in self.loggers:
            lg.log_histograms(params, step)

    def finalize(self) -> None:
        for lg in self.loggers:
            lg.finalize()
