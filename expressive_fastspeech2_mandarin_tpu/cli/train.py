"""Train CLI (reference: train.py:172-198).

Multi-host: pass --coordinator/--num-processes/--process-id on each host
(jax.distributed), or run single-process on one chip/slice.
"""

from __future__ import annotations

import argparse

from .common import add_config_args, config_from_args


def main() -> None:
    ap = argparse.ArgumentParser(prog="efs2-train")
    add_config_args(ap)
    ap.add_argument("--restore_step", type=int, default=None)
    ap.add_argument("--total_steps", type=int, default=None,
                    help="override train.step.total_step")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 for multi-host")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    from ..parallel import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    from ..train.loop import train

    cfg = config_from_args(args)
    train(cfg, restore_step=args.restore_step, total_steps=args.total_steps)


if __name__ == "__main__":
    main()
