"""Preprocessed-corpus metadata: the reference's on-disk formats.

Reads/writes ``train.txt``/``val.txt`` lines
``basename|speaker|{phones}|raw_text|speaker|text|emotion|arousal|valence``
(reference: preprocessor/preprocessor.py:213-222, dataset_chinese.py:99-125),
``speakers.json``, ``emotions.json`` ({emotion,arousal,valence}_dict), and
``stats.json`` ([min, max, mean, std] for pitch/energy).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from ..text import phonemes_to_ids


@dataclass
class Utterance:
    basename: str
    speaker: str
    phone_text: str  # "{b a n ...}"
    raw_text: str
    emotion: str
    arousal: str
    valence: str

    def phone_ids(self, table: str = "pinyin") -> np.ndarray:
        phones = self.phone_text.strip("{}").split()
        if phones and all(p.isdigit() for p in phones):
            # Pre-encoded integer variant: the phones field already holds
            # symbol IDs (reference: dataset.py:60-70).
            return np.asarray([int(p) for p in phones], dtype=np.int32)
        return np.asarray(phonemes_to_ids(phones, table, unknown="skip"),
                          dtype=np.int32)


def parse_metadata_line(line: str) -> Utterance:
    parts = line.rstrip("\n").split("|")
    basename, speaker, phone_text, raw_text = parts[:4]
    aux = parts[4:]
    if len(aux) >= 3:
        emotion, arousal, valence = aux[-3], aux[-2], aux[-1]
    elif aux:
        # Emotion-only variant: derive arousal/valence from the emotion
        # label via the fixed table (reference: dataset.py:14-23).
        from ..preprocess.esd import EMOTION_AROUSAL_VALENCE

        emotion = aux[-1]
        arousal, valence = EMOTION_AROUSAL_VALENCE.get(
            emotion, ("0.5", "0.5"))
    else:
        emotion, arousal, valence = "Neutral", "0.5", "0.5"
    return Utterance(basename, speaker, phone_text, raw_text,
                     emotion, arousal, valence)


def read_metadata(path: str) -> list[Utterance]:
    with open(path, encoding="utf-8") as f:
        return [parse_metadata_line(ln) for ln in f if ln.strip()]


class PreprocessedCorpus:
    """Access layer over a reference-format preprocessed directory."""

    def __init__(self, preprocessed_path: str):
        self.root = preprocessed_path
        with open(os.path.join(self.root, "speakers.json")) as f:
            self.speaker_map: dict[str, int] = json.load(f)
        with open(os.path.join(self.root, "emotions.json")) as f:
            raw = json.load(f)
        self.emotion_map: dict[str, int] = raw["emotion_dict"]
        self.arousal_map: dict[str, int] = raw["arousal_dict"]
        self.valence_map: dict[str, int] = raw["valence_dict"]
        with open(os.path.join(self.root, "stats.json")) as f:
            self.stats: dict[str, list[float]] = json.load(f)

    def metadata(self, filename: str) -> list[Utterance]:
        return read_metadata(os.path.join(self.root, filename))

    def _npy(self, kind: str, utt: Utterance) -> np.ndarray:
        return np.load(os.path.join(
            self.root, kind, f"{utt.speaker}-{kind}-{utt.basename}.npy"))

    def mel(self, utt: Utterance) -> np.ndarray:       # (T, 80)
        return self._npy("mel", utt)

    def pitch(self, utt: Utterance) -> np.ndarray:     # (S,) phoneme-level
        return self._npy("pitch", utt)

    def energy(self, utt: Utterance) -> np.ndarray:
        return self._npy("energy", utt)

    def duration(self, utt: Utterance) -> np.ndarray:  # (S,) int
        return self._npy("duration", utt)

    # -- length cache (avoids the reference's load-every-mel-at-init flaw,
    #    dataset_chinese.py:116-118) --------------------------------------

    def lengths(self, filename: str) -> dict[str, tuple[int, int]]:
        """{basename: (src_len, mel_len)}, cached on disk."""
        cache = os.path.join(self.root, f".lengths-{filename}.json")
        if os.path.exists(cache):
            with open(cache) as f:
                return {k: tuple(v) for k, v in json.load(f).items()}
        out: dict[str, tuple[int, int]] = {}
        for utt in self.metadata(filename):
            d = self.duration(utt)
            out[utt.basename] = (len(d), int(d.sum()))
        with open(cache, "w") as f:
            json.dump(out, f)
        return out
