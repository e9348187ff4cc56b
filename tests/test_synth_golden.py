"""Deterministic end-to-end synthesis golden (VERDICT r3 item 6): fixed
seed + fixed text through the FULL Synthesizer path — text front-end,
flagship-dimension FastSpeech2 forward, packed HiFi-GAN vocoder — anchored
to a committed fixture so future perf work cannot silently drift numerics
between rounds.

Regenerate after an INTENDED numerics change:
    UPDATE_GOLDEN=1 python -m pytest tests/test_synth_golden.py
and commit the updated fixture with the justification.
"""

import os

import numpy as np

import jax

from expressive_fastspeech2_mandarin_tpu.config import Config
from expressive_fastspeech2_mandarin_tpu.models import init_generator
from expressive_fastspeech2_mandarin_tpu.models.fastspeech2 import FastSpeech2
from expressive_fastspeech2_mandarin_tpu.synth import Synthesizer

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "synth_golden.npz")
TEXT = "{b a n h ao sh i j ie}"


def _run():
    cfg = Config()  # flagship reference dimensions (34.7M params)
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    # Seeded-but-untrained duration predictions are negative enough that
    # every frame count rounds/clamps to zero; bias the duration head so
    # log-durations land near ~2 (≈6 frames/phone) and the full
    # length-regulator → decoder → vocoder path runs. Deterministic: part
    # of the fixture definition.
    dp = params["variance_adaptor"]["duration_predictor"]["linear"]
    dp["b"] = dp["b"] + 2.0
    voc = init_generator(jax.random.PRNGKey(1), cfg.model.vocoder)
    synth = Synthesizer(cfg, params, bn_state, voc)
    (res,) = synth.synthesize([TEXT], [0], ["Neutral"], vocoder="hifigan",
                              max_mel_len=250)
    return res


def test_synthesizer_golden():
    res = _run()
    assert res.mel.ndim == 2 and res.mel.shape[1] == 80
    assert res.wav.ndim == 1 and res.wav.size > 0
    assert np.isfinite(res.mel).all() and np.isfinite(res.wav).all()

    payload = {
        "mel_head": res.mel[:40].astype(np.float32),
        "mel_len": np.int64(res.mel.shape[0]),
        "durations": res.durations.astype(np.int64),
        "wav_head": res.wav[:2000].astype(np.float32),
        "wav_rms": np.float32(np.sqrt(np.mean(res.wav ** 2))),
    }
    if os.environ.get("UPDATE_GOLDEN"):
        np.savez(FIXTURE, **payload)
        return
    assert os.path.exists(FIXTURE), (
        "golden fixture missing — run with UPDATE_GOLDEN=1 and commit it")
    ref = np.load(FIXTURE)
    assert int(ref["mel_len"]) == res.mel.shape[0]
    np.testing.assert_array_equal(ref["durations"], payload["durations"])
    # Tolerances absorb XLA version-to-version fusion drift, not real
    # numerics changes (bf16-level divergence is 100x these bounds).
    np.testing.assert_allclose(ref["mel_head"], payload["mel_head"],
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(ref["wav_head"], payload["wav_head"],
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(float(ref["wav_rms"]),
                               float(payload["wav_rms"]), rtol=1e-3)
