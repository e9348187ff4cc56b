"""Bucketed, statically-shaped batch pipeline.

The reference sorts by text length and chunks ``batch_size`` groups inside a
``batch_size*group_size`` mega-batch with dynamic padded shapes
(reference: dataset_chinese.py:171-190, train.py:31-38). Dynamic shapes force
an XLA recompile per batch, so here batches are padded to a small fixed set
of (src_bucket, mel_bucket) shape pairs (config ``BucketConfig``): same
locality benefit, bounded compile count.

Per-host sharding for multi-host data parallelism (two modes):

* ``shard_rows=True`` (the training-path mode): every host enumerates the
  SAME global batch list deterministically (seeded shuffle), computes bucket
  shapes from the full batch, and collates only its own contiguous row
  slice. The per-host arrays are then assembled into one global
  ``(batch, ...)`` array with ``jax.make_array_from_process_local_data``
  (parallel/mesh.py shard_batch) — standard multi-host data parallelism
  where ``batch_size`` is the *global* batch size.
* ``shard_rows=False`` (legacy): the ``process_index``-th strided slice of
  the batch list (each host sees disjoint whole batches; only correct for
  embarrassingly parallel offline jobs, not for a global-mesh train step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..config import BucketConfig
from .metadata import PreprocessedCorpus, Utterance


def pick_bucket(length: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


@dataclass
class Example:
    utt: Utterance
    speaker_id: int
    emotion_id: int
    arousal_id: int
    valence_id: int
    src_len: int
    mel_len: int


class BucketedDataset:
    """Length-bucketed batches of preprocessed utterances."""

    def __init__(
        self,
        corpus: PreprocessedCorpus,
        filename: str,
        batch_size: int,
        buckets: BucketConfig,
        max_seq_len: int = 2000,
        drop_last: bool = False,
        seed: int = 1234,
        num_shards: int = 1,
        shard_index: int = 0,
        symbol_table: str = "pinyin",
        shard_rows: bool = False,
    ):
        self.corpus = corpus
        self.batch_size = batch_size
        self.buckets = buckets
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.symbol_table = symbol_table
        self.shard_rows = shard_rows
        if shard_rows and batch_size % num_shards:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"{num_shards} hosts (row sharding)")

        lengths = corpus.lengths(filename)
        self.examples: list[Example] = []
        for utt in corpus.metadata(filename):
            src_len, mel_len = lengths[utt.basename]
            if mel_len > max_seq_len or src_len == 0:
                continue  # reference filter: dataset_chinese.py:116-118
            self.examples.append(Example(
                utt=utt,
                speaker_id=corpus.speaker_map[utt.speaker],
                emotion_id=corpus.emotion_map[utt.emotion],
                arousal_id=corpus.arousal_map[utt.arousal],
                valence_id=corpus.valence_map[utt.valence],
                src_len=src_len,
                mel_len=mel_len,
            ))

    def __len__(self) -> int:
        return len(self.examples)

    def _batches(self, epoch: int, shuffle: bool) -> list[list[Example]]:
        order = np.arange(len(self.examples))
        if shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(order)
        # Sort within mega-groups for length locality (reference group_size=4
        # behavior) by sorting the shuffled order in windows of 8 batches.
        window = self.batch_size * 8
        chunks = []
        for i in range(0, len(order), window):
            idx = order[i: i + window]
            idx = idx[np.argsort([-self.examples[j].src_len for j in idx])]
            chunks.append(idx)
        order = np.concatenate(chunks) if chunks else order

        batches = []
        for i in range(0, len(order), self.batch_size):
            idx = order[i: i + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    continue
                # Pad the tail batch by repeating examples (keeps shapes
                # static); repeated entries get weight via masks anyway.
                idx = np.concatenate(
                    [idx, idx[np.zeros(self.batch_size - len(idx), np.int64)]])
            batches.append([self.examples[j] for j in idx])
        if self.shard_rows:
            return batches  # every host sees the full list; rows sliced in _collate
        return batches[self.shard_index:: self.num_shards]

    def host_rows(self, epoch: int = 0, shuffle: bool = True) -> list[str]:
        """Basenames of the rows THIS host collates in ``epoch`` order —
        row-shard diagnostics (per-host disjointness/coverage; the
        multi-host feed-rate guard in tests/test_distributed.py)."""
        out = []
        for batch in self._batches(epoch, shuffle):
            if self.shard_rows and self.num_shards > 1:
                rows = len(batch) // self.num_shards
                batch = batch[self.shard_index * rows:
                              (self.shard_index + 1) * rows]
            out += [e.utt.basename for e in batch]
        return out

    def _collate(self, batch: list[Example]) -> dict[str, np.ndarray]:
        # Bucket shapes come from the FULL (global) batch so all hosts agree
        # on static shapes even when each collates only its own row slice.
        src_bucket = pick_bucket(max(e.src_len for e in batch),
                                 self.buckets.src_buckets)
        mel_bucket = pick_bucket(max(e.mel_len for e in batch),
                                 self.buckets.mel_buckets)
        if self.shard_rows and self.num_shards > 1:
            rows = len(batch) // self.num_shards
            batch = batch[self.shard_index * rows:
                          (self.shard_index + 1) * rows]
        b = len(batch)
        out = {
            "speakers": np.array([e.speaker_id for e in batch], np.int32),
            "emotions": np.array([e.emotion_id for e in batch], np.int32),
            "arousals": np.array([e.arousal_id for e in batch], np.int32),
            "valences": np.array([e.valence_id for e in batch], np.int32),
            "texts": np.zeros((b, src_bucket), np.int32),
            "src_lens": np.zeros((b,), np.int32),
            "mels": np.zeros((b, mel_bucket, 80), np.float32),
            "mel_lens": np.zeros((b,), np.int32),
            "pitches": np.zeros((b, src_bucket), np.float32),
            "energies": np.zeros((b, src_bucket), np.float32),
            "durations": np.zeros((b, src_bucket), np.int32),
        }
        for i, e in enumerate(batch):
            ids = e.utt.phone_ids(self.symbol_table)
            mel = self.corpus.mel(e.utt)
            pitch = self.corpus.pitch(e.utt)
            energy = self.corpus.energy(e.utt)
            duration = self.corpus.duration(e.utt).astype(np.int64)
            s = min(len(ids), src_bucket)
            t = min(mel.shape[0], mel_bucket)
            # Clamp durations so sum(durations) == mel frames kept.
            duration = duration[:s]
            excess = duration.sum() - t
            j = s - 1
            while excess > 0 and j >= 0:
                take = min(excess, duration[j])
                duration[j] -= take
                excess -= take
                j -= 1
            out["texts"][i, :s] = ids[:s]
            out["src_lens"][i] = s
            out["mels"][i, :t] = mel[:t]
            out["mel_lens"][i] = duration.sum()
            out["pitches"][i, :s] = pitch[:s]
            out["energies"][i, :s] = energy[:s]
            out["durations"][i, :s] = duration
        return out

    def epoch(self, epoch: int = 0, shuffle: bool = True
              ) -> Iterator[dict[str, np.ndarray]]:
        for batch in self._batches(epoch, shuffle):
            yield self._collate(batch)

    def epoch_with_examples(self, epoch: int = 0, shuffle: bool = True):
        """Like :meth:`epoch` but also yields the row-aligned Example list
        (per-utterance export paths, e.g. train.vocoder.export_gta_mels,
        need the basenames the collated batch drops)."""
        for batch in self._batches(epoch, shuffle):
            yield self._collate(batch), batch
