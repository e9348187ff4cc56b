"""Train/eval sample vocoding (reference: utils/tools.py:204-218,
evaluate.py:57-84): HiFi-GAN from a configured checkpoint, Griffin-Lim
fallback, and the evaluate() sample-logging path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from expressive_fastspeech2_mandarin_tpu.config import (
    Config,
    ModelConfig,
    PreprocessConfig,
    STFTConfig,
    VocoderConfig,
)
from expressive_fastspeech2_mandarin_tpu.train.sampling import SampleVocoder

from .ref_oracle import install_reference_path, reference_available


def test_griffin_lim_fallback():
    cfg = Config()
    s = SampleVocoder(cfg)
    assert s.kind == "griffin_lim"
    mel = np.random.default_rng(0).normal(-3, 2, (40, 80)).astype(np.float32)
    wav = s.vocode(mel, 32)
    assert wav.shape == (32 * cfg.preprocess.stft.hop_length,)
    assert np.isfinite(wav).all()


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_hifigan_sample_vocoder(tmp_path):
    install_reference_path()
    import hifigan

    h = hifigan.AttrDict({
        "resblock": "1",
        "upsample_rates": [4, 4],
        "upsample_kernel_sizes": [8, 8],
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "num_mels": 80,
    })
    torch.manual_seed(0)
    ref = hifigan.Generator(h)
    ckpt = tmp_path / "generator.pth.tar"
    torch.save({"generator": ref.state_dict()}, ckpt)

    voc = VocoderConfig(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                        upsample_initial_channel=32,
                        compute_dtype="float32", ckpt_path=str(ckpt))
    cfg = Config(
        preprocess=PreprocessConfig(stft=STFTConfig(hop_length=16)),
        model=ModelConfig(vocoder=voc))
    s = SampleVocoder(cfg)
    assert s.kind == "hifigan"

    # Non-bucket length: silence-padded to the 32-frame bucket, trimmed back.
    mel = np.random.default_rng(1).normal(-3, 2, (23, 80)).astype(np.float32)
    wav = s.vocode(mel)
    assert wav.shape == (23 * 16,)
    assert np.isfinite(wav).all()

    # Bucket-aligned length (no padding): exact parity with the torch
    # reference (padding frames otherwise bleed through the generator's
    # receptive field — boundary semantics, not conversion correctness).
    mel32 = np.random.default_rng(2).normal(-3, 2, (32, 80)).astype(np.float32)
    wav32 = s.vocode(mel32)
    ref.eval()
    ref.remove_weight_norm()
    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(mel32.T[None])).numpy()[0, 0]
    np.testing.assert_allclose(wav32, ref_wav, rtol=1e-4, atol=2e-4)
