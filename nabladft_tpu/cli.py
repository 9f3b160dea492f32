"""Command-line entry: ``python -m nabladft_tpu.cli --config <file> [k=v ...]``.

Replaces the reference's hydra `run.py` (run.py:9-13). Overrides use dotted
keys: ``trainer.max_epochs=3 model.kwargs.hidden=64``.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path
from typing import Any, Dict

import yaml

from nabladft_tpu.config import load_config
from nabladft_tpu.pipelines import run


_FLOAT_RE = __import__("re").compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _parse_overrides(pairs) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for pair in pairs:
        key, _, raw = pair.partition("=")
        value = yaml.safe_load(raw)
        # YAML 1.1 leaves '1e-3' (no dot) as a string — users mean a float
        if isinstance(value, str) and _FLOAT_RE.match(value):
            value = float(value)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="nablaDFT-TPU pipeline runner")
    parser.add_argument("--config", required=True, type=Path)
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
    )
    cfg = load_config(args.config, overrides=_parse_overrides(args.overrides))
    run(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
