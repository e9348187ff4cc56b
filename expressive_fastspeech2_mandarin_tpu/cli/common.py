"""Shared CLI plumbing: the reference-compatible ``-p/-m/-t`` config triplet
(reference: train.py:172-198)."""

from __future__ import annotations

import argparse

from ..config import Config, load_config


def add_config_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("-p", "--preprocess_config", required=True,
                    help="preprocess YAML (reference format)")
    ap.add_argument("-m", "--model_config", required=True,
                    help="model YAML (reference format)")
    ap.add_argument("-t", "--train_config", required=True,
                    help="train YAML (reference format)")


def config_from_args(args) -> Config:
    return load_config(args.preprocess_config, args.model_config,
                       args.train_config)
