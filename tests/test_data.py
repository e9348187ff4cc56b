"""Data-pipeline tests over a synthetic reference-format preprocessed dir."""

import json
import os

import numpy as np
import pytest

from expressive_fastspeech2_mandarin_tpu.config import BucketConfig
from expressive_fastspeech2_mandarin_tpu.data import (
    BucketedDataset,
    PreprocessedCorpus,
    pick_bucket,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("preprocessed")
    rng = np.random.default_rng(0)
    speakers = {"0001": 0, "0002": 1}
    emotions = {
        "emotion_dict": {"Happy": 0, "Sad": 1},
        "arousal_dict": {"0.8": 0, "0.3": 1},
        "valence_dict": {"0.8": 0, "0.2": 1},
    }
    stats = {"pitch": [-2.0, 8.0, 0.0, 1.0], "energy": [-1.0, 7.0, 0.0, 1.0]}
    for name, obj in [("speakers.json", speakers),
                      ("emotions.json", emotions), ("stats.json", stats)]:
        with open(root / name, "w") as f:
            json.dump(obj, f)
    for sub in ("mel", "pitch", "energy", "duration"):
        os.makedirs(root / sub)

    lines = []
    for i in range(13):
        spk = "0001" if i % 2 == 0 else "0002"
        base = f"{spk}_{i:06d}"
        s = rng.integers(5, 20)
        durations = rng.integers(1, 9, s)
        if i == 12:  # over-long utterance: must be filtered
            durations = np.full(400, 9)
            s = 400
        mel_len = int(durations.sum())
        np.save(root / "duration" / f"{spk}-duration-{base}.npy", durations)
        np.save(root / "mel" / f"{spk}-mel-{base}.npy",
                rng.normal(size=(mel_len, 80)).astype(np.float32))
        np.save(root / "pitch" / f"{spk}-pitch-{base}.npy",
                rng.normal(size=s).astype(np.float32))
        np.save(root / "energy" / f"{spk}-energy-{base}.npy",
                rng.normal(size=s).astype(np.float32))
        phones = " ".join(rng.choice(["b", "a", "n", "zh", "ong"], s))
        emo = "Happy" if i % 3 else "Sad"
        aro = "0.8" if i % 3 else "0.3"
        val = "0.8" if i % 3 else "0.2"
        lines.append(f"{base}|{spk}|{{{phones}}}|raw text|{spk}|x|{emo}|{aro}|{val}")
    with open(root / "train.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(root)


def test_pick_bucket():
    assert pick_bucket(3, (32, 64)) == 32
    assert pick_bucket(33, (32, 64)) == 64
    assert pick_bucket(99, (32, 64)) == 64


def test_corpus_and_dataset(corpus_dir):
    corpus = PreprocessedCorpus(corpus_dir)
    assert corpus.stats["pitch"][0] == -2.0
    ds = BucketedDataset(
        corpus, "train.txt", batch_size=4,
        buckets=BucketConfig(src_buckets=(16, 24), mel_buckets=(64, 128, 256)),
        max_seq_len=300)
    # 13 utterances, one filtered as over-long.
    assert len(ds) == 12
    batches = list(ds.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["texts"].shape[0] == 4
        assert b["texts"].shape[1] in (16, 24)
        assert b["mels"].shape[1] in (64, 128, 256)
        assert b["mels"].shape[2] == 80
        # durations sum == mel_lens, mel_lens <= bucket
        np.testing.assert_array_equal(b["durations"].sum(1), b["mel_lens"])
        assert (b["mel_lens"] <= b["mels"].shape[1]).all()
        assert (b["src_lens"] <= b["texts"].shape[1]).all()
        assert (b["texts"] < 108).all() and (b["texts"] >= 0).all()

    # Length cache file written and reused.
    assert os.path.exists(os.path.join(corpus_dir, ".lengths-train.txt.json"))


def test_epoch_shuffling_and_sharding(corpus_dir):
    corpus = PreprocessedCorpus(corpus_dir)
    buckets = BucketConfig(src_buckets=(24,), mel_buckets=(256,))
    ds = BucketedDataset(corpus, "train.txt", batch_size=2, buckets=buckets,
                         max_seq_len=300)
    e0 = [b["speakers"].tolist() for b in ds.epoch(0)]
    e1 = [b["speakers"].tolist() for b in ds.epoch(1)]
    assert e0 != e1  # different shuffles

    shard0 = BucketedDataset(corpus, "train.txt", batch_size=2,
                             buckets=buckets, max_seq_len=300,
                             num_shards=2, shard_index=0)
    shard1 = BucketedDataset(corpus, "train.txt", batch_size=2,
                             buckets=buckets, max_seq_len=300,
                             num_shards=2, shard_index=1)
    n0 = len(list(shard0.epoch(0)))
    n1 = len(list(shard1.epoch(0)))
    assert n0 + n1 == len(list(ds.epoch(0)))


def test_pre_encoded_int_phones():
    """Pre-encoded integer metadata variant (reference: dataset.py:60-70)."""
    from expressive_fastspeech2_mandarin_tpu.data.metadata import (
        parse_metadata_line,
    )

    utt = parse_metadata_line("x|0001|{64 65 107}|raw|0001|t|Happy|0.8|0.8")
    assert utt.phone_ids().tolist() == [64, 65, 107]


def test_emotion_only_aux_derives_av():
    """Emotion-only metadata derives arousal/valence from the fixed table
    (reference: dataset.py:14-23)."""
    from expressive_fastspeech2_mandarin_tpu.data.metadata import (
        parse_metadata_line,
    )

    utt = parse_metadata_line("x|0001|{a}|raw|Angry")
    assert (utt.emotion, utt.arousal, utt.valence) == ("Angry", "0.9", "0.1")
    utt = parse_metadata_line("x|0001|{a}|raw")
    assert utt.emotion == "Neutral" and utt.arousal == "0.5"
