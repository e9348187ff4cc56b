"""Bucket-invariance of inference numerics (ModelConfig.padding_inert).

TPU-first property: XLA needs static shapes, so the synthesizer pads every
utterance to a (src, mel) bucket — and the bucket choice must not change
the audio. The reference's own padded batches leak conditioning/bias
values into conv edges (its output depends on batch composition); with
``padding_inert=True`` (default) padded runs are bit-equal to exact-length
runs at every bucket size. Discovered by the round-5 parity drill
(tests/test_parity_drill.py), which compares against the reference's
UNPADDED single-utterance inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.config import Config
from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    stats = {"pitch": [-1.9, 9.5, 0.0, 1.0], "energy": [-1.5, 8.2, 0.0, 1.0]}
    model = FastSpeech2(cfg.model, cfg.preprocess, stats)
    params, bn = model.init(jax.random.PRNGKey(3))
    # Fresh-init duration predictors emit ~0 log-durations → empty mels;
    # bias the duration head so utterances get real (varied) lengths.
    params["variance_adaptor"]["duration_predictor"]["linear"]["b"] = (
        params["variance_adaptor"]["duration_predictor"]["linear"]["b"] + 1.2)
    return cfg, model, params, bn


def _apply(model, params, bn, ids, max_src, max_mel, **kw):
    texts = np.zeros((1, max_src), np.int32)
    texts[0, : len(ids)] = ids
    out, _ = model.apply(
        params, bn, jnp.asarray([1]), jnp.asarray([2]), jnp.asarray([1]),
        jnp.asarray([3]), jnp.asarray(texts), jnp.asarray([len(ids)]),
        max_mel_len=max_mel, **kw)
    return out


def test_inference_bucket_invariance(setup):
    cfg, model, params, bn = setup
    rng = np.random.default_rng(7)
    ids = rng.integers(4, 107, 20)
    base = _apply(model, params, bn, ids, 20, 128)
    t = int(base.mel_lens[0])
    assert 4 < t < 128, "duration bias produced a degenerate length"
    for max_src, max_mel in [(32, 250), (64, 500), (128, 500)]:
        out = _apply(model, params, bn, ids, max_src, max_mel)
        assert int(out.mel_lens[0]) == t
        np.testing.assert_array_equal(
            np.asarray(out.durations_rounded)[0, :20],
            np.asarray(base.durations_rounded)[0, :20])
        np.testing.assert_allclose(
            np.asarray(out.postnet_mel)[0, :t],
            np.asarray(base.postnet_mel)[0, :t], atol=2e-5,
            err_msg=f"bucket ({max_src}, {max_mel}) changed the mel")


def test_control_knobs_bucket_invariant(setup):
    cfg, model, params, bn = setup
    rng = np.random.default_rng(9)
    ids = rng.integers(4, 107, 12)
    kw = dict(p_control=1.4, e_control=0.7, d_control=1.5)
    a = _apply(model, params, bn, ids, 12, 96, **kw)
    b = _apply(model, params, bn, ids, 64, 250, **kw)
    t = int(a.mel_lens[0])
    assert int(b.mel_lens[0]) == t and t > 4
    np.testing.assert_allclose(np.asarray(b.postnet_mel)[0, :t],
                               np.asarray(a.postnet_mel)[0, :t], atol=2e-5)
