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


class MultiLogger(Logger):
    def __init__(self, loggers: List[Logger]):
        self.loggers = loggers

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_hyperparams(self, params: Dict) -> None:
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def finalize(self) -> None:
        for lg in self.loggers:
            lg.finalize()
