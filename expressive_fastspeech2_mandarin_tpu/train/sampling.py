"""Sample vocoding for the train/eval loops.

The reference vocodes GT-vs-predicted mels with the loaded HiFi-GAN during
training (reference: utils/tools.py:204-218, train.py:113-140) and logs one
reconstruction + prediction audio pair per eval (reference:
evaluate.py:57-84). This module provides the same capability: a HiFi-GAN
generator loaded from ``cfg.model.vocoder.ckpt_path`` when present, with a
Griffin-Lim fallback otherwise (reference: audio/tools.py:18-34).

All host-side: sample synthesis runs only on the main host with host-local
params (see loop.py), so everything here uses plain jit on local data.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class SampleVocoder:
    """mel (T, n_mels) → waveform for logging. HiFi-GAN if weights are
    configured, Griffin-Lim otherwise."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.hop = cfg.preprocess.stft.hop_length
        self._voc_params = None
        path = cfg.model.vocoder.ckpt_path
        if (path and os.path.exists(path)
                and cfg.model.vocoder.model == "HiFi-GAN"):
            from ..interop.torch_ckpt import (
                convert_hifigan,
                load_torch_state_dict,
            )
            from ..models.hifigan import (
                load_generator_npz,
                pack_generator_params,
            )

            if path.endswith(".npz"):  # efs2-train-vocoder export
                raw = load_generator_npz(path)
            else:
                raw = convert_hifigan(
                    load_torch_state_dict(path, key="generator"),
                    n_ups=len(cfg.model.vocoder.upsample_rates),
                    n_resblock_kernels=len(
                        cfg.model.vocoder.resblock_kernel_sizes))
            self._voc_params = jax.tree.map(
                jnp.asarray,
                pack_generator_params(
                    raw, cfg.model.vocoder,
                    fused=jax.default_backend() == "tpu",
                    fused_stages=(0,)))
        self._stft = None

    @property
    def kind(self) -> str:
        return "hifigan" if self._voc_params is not None else "griffin_lim"

    @lru_cache(maxsize=8)
    def _voc_fn(self, t_pad: int):
        from ..models import apply_generator

        def fn(p, mel):
            return apply_generator(p, mel, self.cfg.model.vocoder)

        return jax.jit(fn)

    def vocode(self, mel: np.ndarray, mel_len: int | None = None
               ) -> np.ndarray:
        """mel: (T, n_mels) log-mel (un-normalized, as stored on disk).
        Returns float32 waveform trimmed to ``mel_len * hop`` samples."""
        mel = np.asarray(mel, np.float32)
        t = mel.shape[0] if mel_len is None else int(mel_len)
        if self._voc_params is not None:
            t_pad = _ceil_to(max(t, 8), 32)  # few static shapes → few compiles
            # Pad with spectral silence (log 1e-5, the mel floor) rather
            # than zeros: the generator's receptive field bleeds padding
            # into the tail, and silence bleeds least audibly.
            mel_in = np.full((1, t_pad, mel.shape[1]), np.log(1e-5),
                             np.float32)
            mel_in[0, :t] = mel[:t]
            wav = np.asarray(self._voc_fn(t_pad)(
                self._voc_params, jnp.asarray(mel_in)), np.float32)[0]
            return wav[: t * self.hop]
        # Griffin-Lim runs pinned to CPU: it is a logging-only fallback, and
        # its 20-iteration complex-FFT/scatter program is pathological on
        # remote-attached TPU backends (compile takes minutes and a mid-run
        # compile rejection can poison in-flight train dispatches — observed
        # as UNIMPLEMENTED killing the round-3 convergence run at the first
        # synth_step crossing).
        cpu = jax.devices("cpu")[0]
        if self._stft is None:
            from ..dsp import MelSTFT

            with jax.default_device(cpu):
                self._stft = MelSTFT(self.cfg.preprocess.stft,
                                     self.cfg.preprocess.mel,
                                     self.cfg.preprocess.audio.sampling_rate)
        with jax.default_device(cpu):
            wav = np.asarray(self._stft.mel_to_audio(
                jax.device_put(mel[None, :t], cpu), n_iters=20),
                np.float32)[0]
        wav = wav[: t * self.hop]
        if wav.shape[0] < t * self.hop:  # iSTFT yields (t-1)*hop samples
            wav = np.pad(wav, (0, t * self.hop - wav.shape[0]))
        peak = float(np.abs(wav).max())
        if peak > 0.95:  # GL phase has no absolute scale; avoid int16 clip
            wav = (wav * (0.95 / peak)).astype(np.float32)
        return wav
