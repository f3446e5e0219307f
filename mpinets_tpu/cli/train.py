"""Training CLI.

Mirrors the reference driver's interface
(``/root/reference/mpinets/run_training.py:134-204``)::

    python -m mpinets_tpu.cli.train <jobconfig.yaml> [--test] [--no-logging]
        [--no-checkpointing] [--synthetic-data] [--resume EXP_DIR]

The YAML may be the reference's own ``jobconfig.yaml`` layout or this
package's nested layout (see :mod:`mpinets_tpu.cli.config`).
"""

from __future__ import annotations

import argparse

from mpinets_tpu.cli.config import load_config
from mpinets_tpu.train.trainer import Trainer


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("yaml_config", nargs="?", default=None)
    parser.add_argument(
        "--test", action="store_true",
        help="smoke mode: 10 train batches, 3 val problems, 1 epoch "
             "(run_training.py:68-70 semantics)",
    )
    parser.add_argument("--no-logging", action="store_true")
    parser.add_argument("--no-checkpointing", action="store_true")
    parser.add_argument(
        "--synthetic-data", action="store_true",
        help="train on the on-device pseudo-expert generator instead of HDF5",
    )
    parser.add_argument(
        "--resume", default=None, metavar="EXP_DIR",
        help="resume from an experiment directory's `last` checkpoint",
    )
    args = parser.parse_args(argv)

    cfg = load_config(args.yaml_config)
    if args.synthetic_data:
        cfg.data.synthetic = True
    if args.resume:
        cfg.resume_from = args.resume
    trainer = Trainer(
        cfg,
        test=args.test,
        should_log=not args.no_logging,
        should_checkpoint=not args.no_checkpointing,
    )
    trainer.run()


if __name__ == "__main__":
    main()
