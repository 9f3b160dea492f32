"""Checkpointing: top-k on a monitored metric + last, with resume.

Feature parity with the reference's Lightning ModelCheckpoint setup
(config/callbacks/default.yaml: save_top_k=3 on val/loss + save_last,
resume via ckpt_path, pipelines.py:120) without Lightning: states are
flax-serialized msgpack files plus a JSON index.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

from flax import serialization

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(
        self,
        directory: Path,
        top_k: int = 3,
        monitor: str = "val/loss",
        mode: str = "min",
    ):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.monitor = monitor
        self.mode = mode
        self._index_path = self.dir / "index.json"
        self._index: Dict[str, Any] = {"best": [], "last": None}
        if self._index_path.exists():
            self._index = json.loads(self._index_path.read_text())

    def _write_index(self) -> None:
        self._index_path.write_text(json.dumps(self._index, indent=1))

    def _save_state(self, state: Any, path: Path) -> None:
        path.write_bytes(serialization.to_bytes(state))

    def save(
        self,
        state: Any,
        step: int,
        metrics: Dict[str, float],
        aux: Optional[Dict[str, Any]] = None,
    ) -> None:
        """`aux` carries host-side scheduler state (plateau counters, ...) —
        the analog of Lightning persisting lr-scheduler state in ckpts."""
        last_path = self.dir / "last.ckpt"
        self._save_state(state, last_path)
        if aux is not None:
            (self.dir / "last.ckpt.aux.json").write_text(json.dumps(aux))
        self._index["last"] = {"path": last_path.name, "step": step, "metrics": metrics}

        score = metrics.get(self.monitor)
        if score is not None and self.top_k > 0:
            entry = {
                "path": f"step{step:09d}.ckpt",
                "step": step,
                "score": float(score),
                "metrics": metrics,
            }
            best: List[Dict] = self._index["best"]
            best.append(entry)
            reverse = self.mode == "max"
            best.sort(key=lambda e: e["score"], reverse=reverse)
            keep, drop = best[: self.top_k], best[self.top_k :]
            if entry in keep:
                self._save_state(state, self.dir / entry["path"])
                if aux is not None:
                    (self.dir / (entry["path"] + ".aux.json")).write_text(json.dumps(aux))
            for e in drop:
                p = self.dir / e["path"]
                if p.exists() and e["path"] != entry["path"]:
                    p.unlink()
                    paux = self.dir / (e["path"] + ".aux.json")
                    if paux.exists():
                        paux.unlink()
            self._index["best"] = keep
        self._write_index()

    def read_aux(self, path: Optional[Path] = None) -> Optional[Dict[str, Any]]:
        """Host-side scheduler state saved alongside a checkpoint, if any."""
        path = Path(path) if path else self.last_path()
        if path is None:
            return None
        paux = path.parent / (path.name + ".aux.json")
        if paux.exists():
            return json.loads(paux.read_text())
        return None

    def best_path(self) -> Optional[Path]:
        best = self._index.get("best") or []
        return self.dir / best[0]["path"] if best else None

    def last_path(self) -> Optional[Path]:
        last = self._index.get("last")
        return self.dir / last["path"] if last else None

    def restore(self, target_state: Any, path: Optional[Path] = None) -> Tuple[Any, int]:
        """Restore into the structure of `target_state`; returns (state, step)."""
        path = Path(path) if path else self.last_path()
        if path is None or not path.exists():
            raise FileNotFoundError(f"no checkpoint at {path}")
        state = serialization.from_bytes(target_state, path.read_bytes())
        step = int(state.step) if hasattr(state, "step") else 0
        logger.info("restored checkpoint %s (step %d)", path, step)
        return state, step


def save_params(params: Any, path: Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(serialization.to_bytes(params))


def load_params(target: Any, path: Path) -> Any:
    return serialization.from_bytes(target, Path(path).read_bytes())


def load_params_for(model, path: Path) -> Any:
    """Load a raw param tree and remap it to the layout `model` resolves to.

    eSCN/EquiformerV2 use different parameter layouts on the fused-Pallas
    and XLA paths (use_pallas="auto" resolves per backend) — a checkpoint
    trained on TPU must restore for CPU eval and vice versa. The layouts
    are losslessly interconvertible (models/param_convert.py)."""
    from nabladft_tpu.models.param_convert import convert_params

    raw = serialization.msgpack_restore(Path(path).read_bytes())
    return convert_params(model, raw)
