"""HiFi-GAN generator parity vs the reference torch implementation,
including weight-norm folding in the converter (BASELINE.json config 2
semantics on random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.config import VocoderConfig
from expressive_fastspeech2_mandarin_tpu.interop.torch_ckpt import (
    convert_hifigan,
)
from expressive_fastspeech2_mandarin_tpu.models import apply_generator

from .ref_oracle import install_reference_path, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def generators():
    install_reference_path()
    import json

    import hifigan

    with open("/root/reference/hifigan/config.json") as f:
        h = hifigan.AttrDict(json.load(f))
    torch.manual_seed(0)
    ref = hifigan.Generator(h).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_hifigan(sd))
    ref.remove_weight_norm()
    return ref, params, VocoderConfig()


def test_waveform_parity(generators):
    ref, params, cfg = generators
    rng = np.random.default_rng(0)
    mel = rng.normal(-3, 2, (2, 23, 80)).astype(np.float32)

    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()

    wav = apply_generator(params, jnp.asarray(mel), cfg)
    assert wav.shape == (2, 23 * 256)
    np.testing.assert_allclose(
        np.asarray(wav), ref_wav[:, 0, :], rtol=1e-4, atol=2e-4)


def test_weight_norm_fold_matches_remove_weight_norm(generators):
    """Folded kernels must equal torch's remove_weight_norm output."""
    ref, params, _ = generators
    # conv_pre after remove_weight_norm: (512, 80, 7)
    w_ref = ref.conv_pre.weight.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(params["conv_pre"]["kernel"]).transpose(2, 1, 0),
        w_ref, rtol=1e-5, atol=1e-6)
    w_up = ref.ups[0].weight.detach().numpy()  # (Cin, Cout, K)
    np.testing.assert_allclose(
        np.asarray(params["ups"][0]["kernel"]).transpose(1, 2, 0),
        w_up, rtol=1e-5, atol=1e-6)
