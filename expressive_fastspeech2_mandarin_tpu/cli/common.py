"""Shared CLI plumbing: the reference-compatible ``-p/-m/-t`` config triplet
(reference: train.py:172-198) and a persistent XLA compilation cache."""

from __future__ import annotations

import argparse
import os

from ..config import Config, load_config


def enable_compilation_cache() -> None:
    """Persist XLA compilations across CLI runs (first TPU compiles can take
    tens of seconds; reruns then start instantly). Opt out with
    ``EFS2_NO_COMPILE_CACHE=1`` or override via ``JAX_COMPILATION_CACHE_DIR``.
    """
    if os.environ.get("EFS2_NO_COMPILE_CACHE"):
        return
    import jax

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "efs2-xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — harmless
        pass


def add_config_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("-p", "--preprocess_config", required=True,
                    help="preprocess YAML (reference format)")
    ap.add_argument("-m", "--model_config", required=True,
                    help="model YAML (reference format)")
    ap.add_argument("-t", "--train_config", required=True,
                    help="train YAML (reference format)")


def config_from_args(args) -> Config:
    enable_compilation_cache()
    return load_config(args.preprocess_config, args.model_config,
                       args.train_config)
