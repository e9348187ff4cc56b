"""End-to-end numerical parity of the JAX FastSpeech2 against the PyTorch
reference (eval mode), via the torch-checkpoint converter.

Covers BASELINE.json config 1/3 semantics on random weights: teacher-forced
training-shape forward and free-running inference with control knobs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.config import (
    model_config_from_dict,
    preprocess_config_from_dict,
)
from expressive_fastspeech2_mandarin_tpu.interop.torch_ckpt import (
    convert_fastspeech2,
)
from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2

from .ref_oracle import (
    install_reference_path,
    make_reference_configs,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_setup(tmp_path_factory):
    install_reference_path()
    tmpdir = str(tmp_path_factory.mktemp("preprocessed"))
    pre_d, model_d, train_d = make_reference_configs(tmpdir)

    from model import FastSpeech2 as RefFastSpeech2

    torch.manual_seed(0)
    ref_model = RefFastSpeech2(pre_d, model_d).eval()

    stats = {"pitch": [-1.9, 9.5, 0.0, 1.0], "energy": [-1.5, 8.2, 0.0, 1.0]}
    # padding_inert=False: these tests feed PADDED batches to the torch
    # oracle, so the JAX side must replicate the reference's padded-batch
    # conv-edge behavior exactly (the default True matches the reference's
    # UNPADDED single-utterance inference instead — tests/test_parity_drill
    # + tests/test_padding_inert cover that side).
    model_cfg = model_config_from_dict(
        model_d, n_speakers=10, n_emotions=5, n_arousals=4, n_valences=5,
        padding_inert=False)
    pre_cfg = preprocess_config_from_dict(pre_d)
    jax_model = FastSpeech2(model_cfg, pre_cfg, stats)
    params, state, consts = convert_fastspeech2(
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()})
    jax_model.consts.update({k: jnp.asarray(v) for k, v in consts.items()})
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    return ref_model, jax_model, params, state


def _batch(rng, b=3, s=12):
    return {
        "speakers": rng.integers(0, 10, b),
        "emotions": rng.integers(0, 5, b),
        "arousals": rng.integers(0, 4, b),
        "valences": rng.integers(0, 5, b),
        "texts": np.concatenate(
            [rng.integers(4, 107, (b, s - 2)), np.zeros((b, 2), np.int64)],
            axis=1),
        "src_lens": np.array([s - 2, s - 3, s - 4]),
    }


def test_teacher_forced_parity(ref_setup):
    ref_model, jax_model, params, state = ref_setup
    rng = np.random.default_rng(0)
    b, s = 3, 12
    batch = _batch(rng, b, s)
    d_targets = rng.integers(0, 6, (b, s))
    # zero durations at text padding
    for i, l in enumerate(batch["src_lens"]):
        d_targets[i, l:] = 0
    mel_lens = d_targets.sum(1)
    max_mel = int(mel_lens.max())
    p_targets = rng.normal(0, 2, (b, s)).astype(np.float32)
    e_targets = rng.normal(0, 2, (b, s)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(batch["speakers"]),
            torch.from_numpy(batch["emotions"]),
            torch.from_numpy(batch["arousals"]),
            torch.from_numpy(batch["valences"]),
            torch.from_numpy(batch["texts"]),
            torch.from_numpy(batch["src_lens"]),
            s,
            mels=None,
            mel_lens=torch.from_numpy(mel_lens),
            max_mel_len=max_mel,
            p_targets=torch.from_numpy(p_targets),
            e_targets=torch.from_numpy(e_targets),
            d_targets=torch.from_numpy(d_targets),
        )

    out, _ = jax_model.apply(
        params, state,
        jnp.asarray(batch["speakers"]), jnp.asarray(batch["emotions"]),
        jnp.asarray(batch["arousals"]), jnp.asarray(batch["valences"]),
        jnp.asarray(batch["texts"]), jnp.asarray(batch["src_lens"]),
        max_mel_len=max_mel,
        mel_lens=jnp.asarray(mel_lens),
        p_targets=jnp.asarray(p_targets),
        e_targets=jnp.asarray(e_targets),
        d_targets=jnp.asarray(d_targets),
    )

    np.testing.assert_allclose(
        np.asarray(out.mel), ref_out[0].numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.postnet_mel), ref_out[1].numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.pitch_predictions), ref_out[2].numpy(),
        rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.energy_predictions), ref_out[3].numpy(),
        rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.log_duration_predictions), ref_out[4].numpy(),
        rtol=1e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(out.src_masks), ref_out[6].numpy())
    np.testing.assert_array_equal(
        np.asarray(out.mel_masks), ref_out[7].numpy())


@pytest.mark.parametrize("controls", [(1.0, 1.0, 1.0), (1.3, 0.7, 1.5)])
def test_inference_parity(ref_setup, controls):
    ref_model, jax_model, params, state = ref_setup
    p_c, e_c, d_c = controls
    rng = np.random.default_rng(1)
    b, s = 3, 10
    batch = _batch(rng, b, s)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(batch["speakers"]),
            torch.from_numpy(batch["emotions"]),
            torch.from_numpy(batch["arousals"]),
            torch.from_numpy(batch["valences"]),
            torch.from_numpy(batch["texts"]),
            torch.from_numpy(batch["src_lens"]),
            s,
            p_control=p_c, e_control=e_c, d_control=d_c,
        )
    ref_mel_lens = ref_out[9].numpy()
    max_mel = int(ref_out[1].shape[1])

    out, _ = jax_model.apply(
        params, state,
        jnp.asarray(batch["speakers"]), jnp.asarray(batch["emotions"]),
        jnp.asarray(batch["arousals"]), jnp.asarray(batch["valences"]),
        jnp.asarray(batch["texts"]), jnp.asarray(batch["src_lens"]),
        max_mel_len=max_mel,
        p_control=p_c, e_control=e_c, d_control=d_c,
    )

    np.testing.assert_array_equal(np.asarray(out.mel_lens), ref_mel_lens)
    np.testing.assert_array_equal(
        np.asarray(out.durations_rounded), ref_out[5].numpy())
    np.testing.assert_allclose(
        np.asarray(out.mel), ref_out[0].numpy(), rtol=1e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(out.postnet_mel), ref_out[1].numpy(), rtol=1e-4, atol=3e-4)


def test_param_count_around_28m(ref_setup):
    """The reference reports ~28M params (README.md:234)."""
    _, _, params, _ = ref_setup
    from expressive_fastspeech2_mandarin_tpu.models import param_count

    n = param_count(params)
    assert 25_000_000 < n < 40_000_000


def test_long_form_synthesis_past_max_seq_len():
    """Inference past max_seq_len regenerates the sinusoid tables at trace
    time (reference: transformer/Models.py:82-87,145-151) instead of
    clamping — long-form synthesis must produce finite mel of the requested
    static length."""
    import jax
    import jax.numpy as jnp

    from expressive_fastspeech2_mandarin_tpu.config import (
        Config,
        ModelConfig,
        TransformerConfig,
        VariancePredictorConfig,
    )
    from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2

    cfg = Config(model=ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=64, encoder_head=2,
            decoder_head=2),
        variance_predictor=VariancePredictorConfig(filter_size=32),
        n_speakers=2, n_emotions=2, n_arousals=2, n_valences=2,
        max_seq_len=64))
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, s, t_long = 2, 90, 100  # both source and mel exceed max_seq_len=64
    out, _ = model.apply(
        params, bn_state,
        jnp.asarray(rng.integers(0, 2, b), jnp.int32),
        jnp.asarray(rng.integers(0, 2, b), jnp.int32),
        jnp.asarray(rng.integers(0, 2, b), jnp.int32),
        jnp.asarray(rng.integers(0, 2, b), jnp.int32),
        jnp.asarray(rng.integers(4, 100, (b, s)), jnp.int32),
        jnp.asarray(np.full(b, s), jnp.int32),
        max_mel_len=t_long, deterministic=True)
    assert out.postnet_mel.shape == (b, t_long, 80)
    assert bool(jnp.all(jnp.isfinite(out.postnet_mel)))
