"""Offline feature extraction: TextGrid alignments + wav → per-utterance
duration/pitch/energy/mel ``.npy`` files, corpus statistics and metadata.

Semantics follow the reference Preprocessor
(reference: preprocessor/preprocessor.py:116-388):

* alignment: read the "phones" tier, trim leading/tail silences
  (sil/sp/spn), frame-quantize durations by rounding *end positions*
  (:327-365 — the round(e·sr/hop) − round(s·sr/hop) formulation);
* F0 via DIO+StoneMask at hop period, truncated to total duration, rejected
  if ≤ 1 voiced frame (:256-263);
* mel+energy via the mel-STFT, truncated to total duration (:267-270);
* continuous pitch: linear interpolation over unvoiced gaps (:272-281);
* phoneme-level averaging of pitch/energy by duration segments (:282-302);
* corpus-wide z-normalization (two-pass, StandardScaler semantics) with
  outlier-trimmed statistics accumulation (:159-205, :367-375);
* outputs: speakers.json, emotions.json, stats.json, shuffled
  train.txt/val.txt (:182-222).

TPU-relevant differences: mel extraction is batched through the JAX MelSTFT
(can run on an accelerator), and utterance processing fans out over a
multiprocessing pool instead of the reference's single-threaded loop.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import random
from dataclasses import dataclass

import numpy as np

from ..config import PreprocessConfig
from ..dsp import MelSTFT, estimate_f0
from ..utils.wav import load_wav
from .textgrid import Tier, read_textgrid

SILENCE_PHONES = ("sil", "sp", "spn")


def _worker_force_cpu():
    """Preprocessing workers must not claim the TPU (feature extraction is a
    CPU-bound fan-out); keep their JAX on the host backend."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


@dataclass
class AlignmentResult:
    phones: list[str]
    durations: list[int]
    start: float
    end: float


def get_alignment(tier: Tier, sampling_rate: int, hop_length: int
                  ) -> AlignmentResult:
    """Reference: preprocessor/preprocessor.py:327-365.

    Beyond-reference hygiene: TextGrid gap intervals carry an EMPTY mark
    (MFA and the native aligner both emit them), which the reference
    classifies as a regular phone — a trailing ``sil + ""`` pair then
    defeats its tail trim and ships an empty-string "phone" whose duration
    misaligns the ids/durations streams at encode time. Here ``""`` is
    classified as silence and normalized to ``sp``."""
    phones: list[str] = []
    durations: list[int] = []
    start_time = 0.0
    end_time = 0.0
    end_idx = 0
    for iv in tier.intervals:
        s, e, p = iv.start, iv.end, iv.text
        if not phones:
            if p in SILENCE_PHONES or p == "":
                continue
            start_time = s
        if p not in SILENCE_PHONES and p != "":
            phones.append(p)
            end_time = e
            end_idx = len(phones)
        else:
            phones.append(p or "sp")
        durations.append(int(
            np.round(e * sampling_rate / hop_length)
            - np.round(s * sampling_rate / hop_length)))
    return AlignmentResult(phones[:end_idx], durations[:end_idx],
                           start_time, end_time)


def remove_outlier(values: np.ndarray) -> np.ndarray:
    """IQR trim (reference: preprocessor/preprocessor.py:367-375)."""
    values = np.asarray(values)
    if values.size == 0:
        return values
    p25, p75 = np.percentile(values, [25, 75])
    lower = p25 - 1.5 * (p75 - p25)
    upper = p75 + 1.5 * (p75 - p25)
    return values[np.logical_and(values > lower, values < upper)]


def interpolate_unvoiced(pitch: np.ndarray) -> np.ndarray:
    """Linear interp over zeros, edge-extended
    (reference: preprocessor/preprocessor.py:272-281)."""
    nonzero = np.nonzero(pitch)[0]
    if len(nonzero) == 0:
        return pitch
    out = np.interp(np.arange(len(pitch)), nonzero, pitch[nonzero])
    return out


def phoneme_average(values: np.ndarray, durations: list[int]) -> np.ndarray:
    """Frame values → per-phoneme means (reference: :282-302)."""
    out = np.zeros(len(durations), dtype=values.dtype)
    pos = 0
    for i, d in enumerate(durations):
        if d > 0 and pos < len(values):
            out[i] = np.mean(values[pos: pos + d])
        else:
            out[i] = 0
        pos += d
    return out


class Preprocessor:
    def __init__(self, cfg: PreprocessConfig, num_workers: int | None = None):
        self.cfg = cfg
        self.in_dir = os.path.join(cfg.path.raw_path, cfg.path.sub_dir_name)
        self.out_dir = cfg.path.preprocessed_path
        self.sr = cfg.audio.sampling_rate
        self.hop = cfg.stft.hop_length
        self.stft = MelSTFT(cfg.stft, cfg.mel, self.sr)
        self.num_workers = num_workers or max(1, (os.cpu_count() or 2) - 1)
        self.speakers = self._load_speaker_dict()
        self.filelist, self.emotions = self._load_filelist_dict()

    # -- corpus-level metadata (reference: :61-114) -------------------------

    def _load_speaker_dict(self) -> dict[str, int]:
        path = os.path.join(self.cfg.path.raw_path, "speaker_info.txt")
        spk: dict[str, int] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    spk[line.split("|")[0].strip()] = i
        return spk

    def _load_filelist_dict(self):
        path = os.path.join(self.cfg.path.raw_path, "filelist.txt")
        filelist: dict[str, str] = {}
        emotions, arousals, valences = set(), set(), set()
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split("|")
                    if len(parts) >= 8:
                        # ESD 8-field variant: base|text|spk|dataset|default|
                        # emotion|arousal|valence (esd_chinese.py:240-249).
                        base, text, spk = parts[0], parts[1], parts[2]
                        emotion, arousal, valence = parts[5], parts[6], parts[7]
                    elif len(parts) == 6:
                        # EN/IEMOCAP 6-field variant: base|text|spk|emotion|
                        # arousal|valence (reference iemocap.py:116,
                        # preprocessor_en.py filelist parsing).
                        base, text, spk = parts[0], parts[1], parts[2]
                        emotion, arousal, valence = parts[3], parts[4], parts[5]
                    else:
                        continue
                    filelist[base] = f"{spk}|{text}|{emotion}|{arousal}|{valence}"
                    emotions.add(emotion)
                    arousals.add(arousal)
                    valences.add(valence)
        emo_maps = {
            "emotion_dict": {e: i for i, e in enumerate(sorted(emotions))},
            "arousal_dict": {a: i for i, a in enumerate(sorted(arousals))},
            "valence_dict": {v: i for i, v in enumerate(sorted(valences))},
        }
        return filelist, emo_maps

    # -- per-utterance (reference: :226-325) --------------------------------

    def process_utterance(self, speaker: str, basename: str):
        wav_path = os.path.join(self.in_dir, speaker, f"{basename}.wav")
        lab_path = os.path.join(self.in_dir, speaker, f"{basename}.lab")
        tg_path = os.path.join(self.out_dir, "TextGrid", speaker,
                               f"{basename}.TextGrid")

        tg = read_textgrid(tg_path)
        align = get_alignment(tg.get_tier_by_name("phones"), self.sr, self.hop)
        if align.start >= align.end or not align.phones:
            return None
        total = sum(align.durations)
        text = "{" + " ".join(align.phones) + "}"

        wav, _ = load_wav(wav_path, self.sr)
        wav = wav[int(self.sr * align.start): int(self.sr * align.end)]

        raw_text = ""
        if os.path.exists(lab_path):
            with open(lab_path, encoding="utf-8") as f:
                raw_text = f.readline().strip("\n")

        pitch = estimate_f0(wav.astype(np.float64), self.sr, self.hop)[:total]
        if np.sum(pitch != 0) <= 1:
            return None

        mel, energy = self.stft.mel_energy(
            np.clip(wav, -1, 1)[None, :].astype(np.float32))
        mel = np.asarray(mel[0])[:total]          # (T, n_mels)
        energy = np.asarray(energy[0])[:total]

        if len(pitch) < total:
            pitch = np.pad(pitch, (0, total - len(pitch)))
        pitch = interpolate_unvoiced(pitch)
        if self.cfg.pitch.feature == "phoneme_level":
            pitch = phoneme_average(pitch, align.durations)
        if self.cfg.energy.feature == "phoneme_level":
            energy = phoneme_average(energy, align.durations)

        self._save(speaker, basename, "duration",
                   np.asarray(align.durations, np.int64))
        self._save(speaker, basename, "pitch", pitch)
        self._save(speaker, basename, "energy", energy)
        self._save(speaker, basename, "mel", mel)

        aux = self.filelist.get(basename, f"{speaker}|{raw_text}|Neutral|0.5|0.5")
        meta = "|".join([basename, speaker, text, raw_text, aux])
        return meta, remove_outlier(pitch), remove_outlier(energy), mel.shape[0]

    def _save(self, speaker, basename, kind, arr):
        np.save(os.path.join(self.out_dir, kind,
                             f"{speaker}-{kind}-{basename}.npy"), arr)

    # -- corpus build (reference: :116-224) ---------------------------------

    def build_from_path(self, val_size: int | None = None, seed: int = 1234):
        for kind in ("mel", "pitch", "energy", "duration"):
            os.makedirs(os.path.join(self.out_dir, kind), exist_ok=True)
        val_size = self.cfg.val_size if val_size is None else val_size

        jobs = []
        speakers = dict(self.speakers)
        for i, speaker in enumerate(sorted(os.listdir(self.in_dir))):
            if not os.path.isdir(os.path.join(self.in_dir, speaker)):
                continue
            if not self.speakers and speaker not in speakers:
                speakers[speaker] = len(speakers)
            for wav_name in sorted(os.listdir(os.path.join(self.in_dir, speaker))):
                if not wav_name.endswith(".wav"):
                    continue
                basename = wav_name[:-4]
                tg = os.path.join(self.out_dir, "TextGrid", speaker,
                                  f"{basename}.TextGrid")
                if os.path.exists(tg):
                    jobs.append((speaker, basename))

        results = []
        if self.num_workers > 1 and len(jobs) > 8:
            with mp.get_context("spawn").Pool(
                    self.num_workers, initializer=_worker_force_cpu) as pool:
                results = pool.starmap(self.process_utterance, jobs)
        else:
            results = [self.process_utterance(s, b) for s, b in jobs]

        out, n_frames = [], 0
        pitch_vals, energy_vals = [], []
        for ret in results:
            if ret is None:
                continue
            meta, pitch, energy, n = ret
            out.append(meta)
            if len(pitch):
                pitch_vals.append(pitch)
            if len(energy):
                energy_vals.append(energy)
            n_frames += n

        pitch_all = np.concatenate(pitch_vals) if pitch_vals else np.zeros(1)
        energy_all = np.concatenate(energy_vals) if energy_vals else np.zeros(1)
        p_mean, p_std = ((pitch_all.mean(), pitch_all.std())
                         if self.cfg.pitch.normalization else (0.0, 1.0))
        e_mean, e_std = ((energy_all.mean(), energy_all.std())
                         if self.cfg.energy.normalization else (0.0, 1.0))
        p_std = p_std or 1.0
        e_std = e_std or 1.0

        p_min, p_max = self._normalize_dir("pitch", p_mean, p_std)
        e_min, e_max = self._normalize_dir("energy", e_mean, e_std)

        with open(os.path.join(self.out_dir, "speakers.json"), "w") as f:
            json.dump(speakers, f)
        if self.emotions["emotion_dict"]:
            with open(os.path.join(self.out_dir, "emotions.json"), "w") as f:
                json.dump(self.emotions, f)
        with open(os.path.join(self.out_dir, "stats.json"), "w") as f:
            json.dump({
                "pitch": [float(p_min), float(p_max), float(p_mean), float(p_std)],
                "energy": [float(e_min), float(e_max), float(e_mean), float(e_std)],
            }, f)

        print(f"Total time: {n_frames * self.hop / self.sr / 3600:.2f} hours")

        random.Random(seed).shuffle(out)
        with open(os.path.join(self.out_dir, "train.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(out[val_size:]) + "\n")
        with open(os.path.join(self.out_dir, "val.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(out[:val_size]) + "\n")
        return out

    def _normalize_dir(self, kind: str, mean: float, std: float):
        d = os.path.join(self.out_dir, kind)
        vmin, vmax = np.inf, -np.inf
        for name in os.listdir(d):
            p = os.path.join(d, name)
            values = (np.load(p) - mean) / std
            np.save(p, values)
            if values.size:
                vmin = min(vmin, values.min())
                vmax = max(vmax, values.max())
        return vmin, vmax
