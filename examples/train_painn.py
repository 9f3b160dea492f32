"""Example: train PaiNN on a nablaDFT energy split, evaluate, predict.

Equivalent of the reference's run.py + config/painn-oc.yaml flow
(examples/ notebooks in AIRI-Institute/nablaDFT), as a plain script.

    python examples/train_painn.py --split dataset_train_tiny --epochs 5
"""

import argparse
import logging

from nabladft_tpu.config import load_config
from nabladft_tpu.pipelines import run


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--split", default="dataset_train_tiny")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = load_config(
        "configs/painn-oc.yaml",
        overrides={
            "dataset_name": args.split,
            "datamodule": {"batch_size": args.batch_size},
            "trainer": {"max_epochs": args.epochs},
            "model": {
                "kwargs": {"compute_dtype": "bfloat16"} if args.bf16 else {}
            },
        },
    )
    metrics = run(cfg)
    print("final validation metrics:", metrics)

    # evaluate the best checkpoint on the same datamodule's test split
    test_cfg = dict(cfg, job_type="test", ckpt_path=f"{cfg['ckpt_dir']}/last.ckpt")
    print("test metrics:", run(test_cfg))


if __name__ == "__main__":
    main()
