"""Streaming vocoder: chunked inference with receptive-field halos must
reproduce the monolithic waveform exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.config import Config
from expressive_fastspeech2_mandarin_tpu.models import (
    apply_generator,
    init_generator,
)
from expressive_fastspeech2_mandarin_tpu.synth.streaming import (
    generator_receptive_radius_frames,
    vocode_streaming,
)


def test_streaming_matches_monolithic():
    cfg = Config().model.vocoder
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 37, 80)).astype(np.float32))
    full = apply_generator(params, mel, cfg)
    chunks = list(vocode_streaming(params, mel, cfg, chunk_frames=8))
    out = jnp.concatenate(chunks, axis=1)
    assert out.shape == full.shape
    assert float(jnp.max(jnp.abs(out - full))) < 2e-5


def test_receptive_radius_reasonable():
    cfg = Config().model.vocoder
    r = generator_receptive_radius_frames(cfg)
    assert 10 <= r <= 20  # ~13.3 for the V1 topology


def test_streaming_halo_too_small_differs():
    """Sanity: with a tiny halo the chunk seams must show — proves the test
    above isn't vacuous."""
    cfg = Config().model.vocoder
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.normal(size=(1, 30, 80)).astype(np.float32))
    full = apply_generator(params, mel, cfg)
    out = jnp.concatenate(
        list(vocode_streaming(params, mel, cfg, chunk_frames=8,
                              halo_frames=1)), axis=1)
    assert float(jnp.max(jnp.abs(out - full))) > 1e-4


def test_synthesizer_streaming_api():
    """End-to-end: text -> streamed wav chunks == non-streaming output."""
    from expressive_fastspeech2_mandarin_tpu.config import (
        Config,
        ModelConfig,
        TransformerConfig,
        VariancePredictorConfig,
    )
    from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2
    from expressive_fastspeech2_mandarin_tpu.synth import Synthesizer

    from dataclasses import replace

    from expressive_fastspeech2_mandarin_tpu.config import VocoderConfig

    cfg = Config(model=ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=64, encoder_head=2,
            decoder_head=2),
        variance_predictor=VariancePredictorConfig(filter_size=32),
        vocoder=replace(VocoderConfig(), compute_dtype="float32"),
        n_speakers=2, n_emotions=2, n_arousals=2, n_valences=2,
        max_seq_len=256))
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    voc = init_generator(jax.random.PRNGKey(1), cfg.model.vocoder)
    synth = Synthesizer(cfg, params, bn_state, vocoder_params=voc)

    [res] = synth.synthesize(["{b a n h ao}"], [0], ["Neutral"],
                             max_mel_len=64)
    # Ground truth: monolithic vocoding of the *trimmed* mel (streaming
    # semantics; the batch path vocodes padded mel then trims, which only
    # differs inside the receptive field of the utterance tail).
    wav_full = np.asarray(apply_generator(
        voc, jnp.asarray(res.mel)[None], cfg.model.vocoder)[0])
    chunks = list(synth.synthesize_streaming(
        "{b a n h ao}", 0, "Neutral", chunk_frames=16, max_mel_len=64))
    wav_stream = np.concatenate(chunks)
    assert wav_stream.shape == wav_full.shape
    assert float(np.max(np.abs(wav_stream - wav_full))) < 1e-4
