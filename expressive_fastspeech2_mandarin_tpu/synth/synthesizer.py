"""High-level synthesis pipeline: text → phonemes → mel → waveform.

The programmatic equivalent of the reference's synthesis drivers
(reference: synthesize_chinese_pinyin.py:132-307): loads model + vocoder
weights (native Orbax checkpoints or converted PyTorch ``.pth.tar``), maps
emotion names through emotions.json plus the fixed arousal/valence table,
pads to static buckets, runs the jitted forward, trims by predicted length,
and vocodes with HiFi-GAN (or Griffin-Lim fallback,
reference: utils/model.py:42-92).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.metadata import PreprocessedCorpus
from ..dsp import MelSTFT
from ..interop.torch_ckpt import (
    convert_fastspeech2,
    convert_hifigan,
    load_torch_state_dict,
)
from ..models import FastSpeech2, apply_generator
from ..models.hifigan import pack_generator_params
from ..preprocess.esd import EMOTION_AROUSAL_VALENCE
from ..text import text_to_ids
from ..utils.wav import save_wav

SRC_BUCKETS = (16, 32, 64, 128, 256)
MEL_BUCKETS = (250, 500, 1000, 2000)


def _load_vocoder(ckpt: str):
    """HiFi-GAN generator params from either a torch checkpoint
    (reference universal format) or a native ``generator.npz`` exported by
    ``efs2-train-vocoder``."""
    if ckpt.endswith(".npz"):
        from ..models.hifigan import load_generator_npz

        return load_generator_npz(ckpt)
    return convert_hifigan(load_torch_state_dict(ckpt, key="generator"))


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class SynthesisResult:
    basename: str
    wav: np.ndarray           # float32 [-1, 1]
    mel: np.ndarray           # (T, n_mels)
    durations: np.ndarray     # (S,)
    sampling_rate: int


class Synthesizer:
    def __init__(
        self,
        cfg: Config,
        params,
        bn_state,
        vocoder_params=None,
        stats: dict | None = None,
        speaker_map: dict[str, int] | None = None,
        emotion_maps: dict[str, dict[str, int]] | None = None,
        consts_override: dict | None = None,
    ):
        self.cfg = cfg
        self.model = FastSpeech2(cfg.model, cfg.preprocess, stats)
        if consts_override:
            self.model.consts.update(
                {k: jnp.asarray(v) for k, v in consts_override.items()})
        self.params = jax.tree.map(jnp.asarray, params)
        self.bn_state = jax.tree.map(jnp.asarray, bn_state)
        self.vocoder_params = (
            jax.tree.map(jnp.asarray,
                         pack_generator_params(
                             vocoder_params, cfg.model.vocoder,
                             # Fused Pallas MRF wins only on stage 0 on the
                             # real chip (PERF.md); interpret mode on CPU
                             # would only slow tests down.
                             fused=jax.default_backend() == "tpu",
                             fused_stages=(0,)))
            if vocoder_params is not None else None)
        self.melgan_params = None  # set via load_melgan()
        self.speaker_map = speaker_map or {}
        self.emotion_maps = emotion_maps or {}
        self.melstft = MelSTFT(cfg.preprocess.stft, cfg.preprocess.mel,
                               cfg.preprocess.audio.sampling_rate)
        self._melstft_cpu_cache = None

    @property
    def _melstft_cpu(self) -> MelSTFT:
        """MelSTFT whose constant tables live on CPU (Griffin-Lim path)."""
        if self._melstft_cpu_cache is None:
            with jax.default_device(jax.devices("cpu")[0]):
                self._melstft_cpu_cache = MelSTFT(
                    self.cfg.preprocess.stft, self.cfg.preprocess.mel,
                    self.cfg.preprocess.audio.sampling_rate)
        return self._melstft_cpu_cache

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_torch_checkpoint(
        cls,
        cfg: Config,
        model_ckpt: str,
        vocoder_ckpt: str | None = None,
        preprocessed_path: str | None = None,
    ) -> "Synthesizer":
        """Load the reference's torch checkpoints
        (reference: utils/model.py:11-69)."""
        sd = load_torch_state_dict(model_ckpt, key="model")
        params, bn_state, consts = convert_fastspeech2(sd)
        voc = _load_vocoder(vocoder_ckpt) if vocoder_ckpt else None
        stats = speaker_map = emotion_maps = None
        path = preprocessed_path or cfg.preprocess.path.preprocessed_path
        if path and os.path.isdir(path):
            corpus = PreprocessedCorpus(path)
            stats = corpus.stats
            speaker_map = corpus.speaker_map
            emotion_maps = {
                "emotion": corpus.emotion_map,
                "arousal": corpus.arousal_map,
                "valence": corpus.valence_map,
            }
        return cls(cfg, params, bn_state, voc, stats, speaker_map,
                   emotion_maps, consts_override=consts)

    @classmethod
    def from_orbax(cls, cfg: Config, ckpt_dir: str,
                   vocoder_ckpt: str | None = None,
                   preprocessed_path: str | None = None,
                   step: int | None = None) -> "Synthesizer":
        """Load a natively-trained checkpoint (train CLI output)."""
        from ..train import CheckpointManager, TrainState, create_train_state
        from ..train.schedule import make_optimizer

        path = preprocessed_path or cfg.preprocess.path.preprocessed_path
        corpus = PreprocessedCorpus(path) if path and os.path.isdir(path) else None
        stats = corpus.stats if corpus else None
        model = FastSpeech2(cfg.model, cfg.preprocess, stats)
        params, bn_state = model.init(jax.random.PRNGKey(0))
        tx = make_optimizer(cfg.train.optimizer,
                            cfg.model.transformer.encoder_hidden)
        example = create_train_state(params, bn_state, tx,
                                     jax.random.PRNGKey(0))
        mgr = CheckpointManager(ckpt_dir)
        state: TrainState = mgr.restore(example, step)
        voc = _load_vocoder(vocoder_ckpt) if vocoder_ckpt else None
        return cls(
            cfg, state.params, state.bn_state, voc, stats,
            corpus.speaker_map if corpus else None,
            {"emotion": corpus.emotion_map, "arousal": corpus.arousal_map,
             "valence": corpus.valence_map} if corpus else None)

    def load_melgan(self, ckpt_path: str) -> None:
        """Load a melgan-neurips generator checkpoint (torch state dict)."""
        from ..models import convert_melgan

        sd = load_torch_state_dict(ckpt_path)
        self.melgan_params = jax.tree.map(jnp.asarray, convert_melgan(sd))

    # -- id mapping ---------------------------------------------------------

    def resolve_ids(self, speaker: str | int, emotion: str | int):
        spk = (self.speaker_map.get(str(speaker), 0)
               if isinstance(speaker, str) else int(speaker))
        if isinstance(emotion, str) and self.emotion_maps:
            emo = self.emotion_maps["emotion"].get(emotion, 0)
            aro_s, val_s = EMOTION_AROUSAL_VALENCE.get(emotion, ("0.5", "0.5"))
            aro = self.emotion_maps["arousal"].get(aro_s, 0)
            val = self.emotion_maps["valence"].get(val_s, 0)
        else:
            emo = int(emotion) if not isinstance(emotion, str) else 0
            aro = val = 0
        return spk, emo, aro, val

    # -- synthesis ----------------------------------------------------------

    @lru_cache(maxsize=32)
    def _synth_fn(self, max_src: int, max_mel: int,
                  p_c: float, e_c: float, d_c: float):
        def fn(params, bn_state, spk, emo, aro, val, texts, src_lens):
            out, _ = self.model.apply(
                params, bn_state, spk, emo, aro, val, texts, src_lens,
                max_mel_len=max_mel, p_control=p_c, e_control=e_c,
                d_control=d_c, deterministic=True)
            return out.postnet_mel, out.mel_lens, out.durations_rounded
        return jax.jit(fn)

    @lru_cache(maxsize=8)
    def _vocoder_fn(self):
        dtype = jnp.dtype(self.cfg.model.vocoder.compute_dtype)

        def fn(p, mel):
            if dtype != jnp.float32:
                p = jax.tree.map(lambda x: x.astype(dtype), p)
                mel = mel.astype(dtype)
            return apply_generator(
                p, mel, self.cfg.model.vocoder).astype(jnp.float32)

        return jax.jit(fn)

    def synthesize(
        self,
        texts: list[str],
        speakers: list[str | int] | None = None,
        emotions: list[str | int] | None = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        basenames: list[str] | None = None,
        vocoder: str | None = None,
        max_mel_len: int | None = None,
    ) -> list[SynthesisResult]:
        """``texts`` may be hanzi or ``{phone ...}`` strings."""
        n = len(texts)
        speakers = speakers or [0] * n
        emotions = emotions or ["Neutral"] * n
        basenames = basenames or [f"utt_{i}" for i in range(n)]
        sr = self.cfg.preprocess.audio.sampling_rate
        hop = self.cfg.preprocess.stft.hop_length

        id_lists = [text_to_ids(t, self.cfg.preprocess.symbol_table)
                    for t in texts]
        max_src = _bucket(max(len(i) for i in id_lists), SRC_BUCKETS)
        max_mel = max_mel_len or _bucket(
            int(max(len(i) for i in id_lists) * 10 * duration_control) + 16,
            MEL_BUCKETS)

        texts_arr = np.zeros((n, max_src), np.int32)
        src_lens = np.zeros((n,), np.int32)
        for i, ids in enumerate(id_lists):
            s = min(len(ids), max_src)
            texts_arr[i, :s] = ids[:s]
            src_lens[i] = s
        ids4 = [self.resolve_ids(s, e) for s, e in zip(speakers, emotions)]
        spk, emo, aro, val = (np.asarray([x[j] for x in ids4], np.int32)
                              for j in range(4))

        fn = self._synth_fn(max_src, max_mel, pitch_control, energy_control,
                            duration_control)
        mel, mel_lens, durations = fn(
            self.params, self.bn_state, jnp.asarray(spk), jnp.asarray(emo),
            jnp.asarray(aro), jnp.asarray(val), jnp.asarray(texts_arr),
            jnp.asarray(src_lens))

        vocoder = vocoder or ("hifigan" if self.vocoder_params is not None
                              else "griffin_lim")
        if vocoder == "hifigan":
            if self.vocoder_params is None:
                raise ValueError("no HiFi-GAN weights loaded")
            wavs = np.asarray(self._vocoder_fn()(self.vocoder_params, mel))
        elif vocoder == "melgan":
            if self.melgan_params is None:
                raise ValueError("no MelGAN weights loaded")
            from ..models import apply_melgan

            wavs = np.asarray(jax.jit(apply_melgan)(self.melgan_params, mel))
        elif vocoder == "none":
            # Mel-only path (e.g. feeding the streaming vocoder).
            wavs = np.zeros((n, mel.shape[1] * hop), np.float32)
        else:
            # Griffin-Lim pinned to CPU: its complex-FFT iteration is
            # UNIMPLEMENTED on remote-attached TPU backends (and a fallback
            # path never needs the accelerator anyway).
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                wavs = np.asarray(self._melstft_cpu.mel_to_audio(
                    jax.device_put(np.asarray(mel), cpu)))
            # Griffin-Lim phase reconstruction has no absolute scale; pull
            # any over-full-scale utterance down to 0.95 peak so the int16
            # write (utils/wav.py:save_wav) never clips.
            peaks = np.abs(wavs).max(axis=1, keepdims=True)
            scale = np.where(peaks > 0.95, 0.95 / np.maximum(peaks, 1e-9),
                             1.0)
            wavs = (wavs * scale).astype(np.float32)

        results = []
        mel_np = np.asarray(mel)
        lens_np = np.asarray(mel_lens)
        dur_np = np.asarray(durations)
        for i in range(n):
            t = int(lens_np[i])
            n_samples = min(t * hop, wavs.shape[1])
            results.append(SynthesisResult(
                basename=basenames[i],
                wav=wavs[i, :n_samples].astype(np.float32),
                mel=mel_np[i, :t],
                durations=dur_np[i, : src_lens[i]],
                sampling_rate=sr,
            ))
        return results

    def synthesize_streaming(
        self,
        text: str,
        speaker: str | int = 0,
        emotion: str | int = "Neutral",
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        chunk_frames: int = 100,
        max_mel_len: int | None = None,
    ):
        """Yield waveform chunks (np.float32 @ sampling_rate) as they are
        vocoded — first-audio latency of one chunk instead of the whole
        utterance. Beyond-reference capability; the concatenation equals the
        non-streaming HiFi-GAN output exactly (synth/streaming.py)."""
        from .streaming import vocode_streaming

        if self.vocoder_params is None:
            raise ValueError("streaming requires HiFi-GAN weights")
        [result] = self.synthesize(
            [text], [speaker], [emotion], pitch_control, energy_control,
            duration_control, vocoder="none", max_mel_len=max_mel_len)
        hop = self.cfg.preprocess.stft.hop_length
        mel = jnp.asarray(result.mel)[None]
        dtype = jnp.dtype(self.cfg.model.vocoder.compute_dtype)
        params = self.vocoder_params
        if dtype != jnp.float32:
            params = jax.tree.map(lambda x: x.astype(dtype), params)
            mel = mel.astype(dtype)
        emitted = 0
        total = result.mel.shape[0] * hop
        for chunk in vocode_streaming(params, mel, self.cfg.model.vocoder,
                                      chunk_frames=chunk_frames):
            wav = np.asarray(chunk[0], np.float32)
            take = min(len(wav), max(total - emitted, 0))
            emitted += take
            if take:
                yield wav[:take]

    def save_results(self, results: list[SynthesisResult], out_dir: str,
                     tag: str | None = None,
                     save_mel: bool = False) -> list[str]:
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for r in results:
            name = f"{r.basename}{f'_{tag}' if tag else ''}.wav"
            p = os.path.join(out_dir, name)
            save_wav(p, r.wav, r.sampling_rate)
            paths.append(p)
            if save_mel:
                np.save(p[:-4] + "_mel.npy", r.mel)
        return paths
