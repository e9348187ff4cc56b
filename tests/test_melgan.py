"""MelGAN generator parity against a torch replica of the melgan-neurips
generator (built here as oracle; the real hub checkpoint converts through the
same state-dict naming)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.models.melgan import (
    N_RESIDUAL,
    NGF,
    RATIOS,
    apply_melgan,
    convert_melgan,
    init_melgan,
)


def _build_torch_melgan():
    """Torch replica with melgan-neurips Sequential layout + weight norm."""
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    class ResnetBlock(nn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = nn.Sequential(
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d(dilation),
                weight_norm(nn.Conv1d(dim, dim, 3, dilation=dilation)),
                nn.LeakyReLU(0.2),
                weight_norm(nn.Conv1d(dim, dim, 1)),
            )
            self.shortcut = weight_norm(nn.Conv1d(dim, dim, 1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = 2 ** len(RATIOS)
    layers = [
        nn.ReflectionPad1d(3),
        weight_norm(nn.Conv1d(80, NGF * mult, 7)),
    ]
    ch = NGF * mult
    for r in RATIOS:
        layers += [
            nn.LeakyReLU(0.2),
            weight_norm(nn.ConvTranspose1d(ch, ch // 2, 2 * r, stride=r,
                                           padding=r // 2 + r % 2,
                                           output_padding=r % 2)),
        ]
        ch //= 2
        for j in range(N_RESIDUAL):
            layers.append(ResnetBlock(ch, 3 ** j))
    layers += [
        nn.LeakyReLU(0.2),
        nn.ReflectionPad1d(3),
        weight_norm(nn.Conv1d(ch, 1, 7)),
        nn.Tanh(),
    ]
    return nn.Sequential(*layers)


def test_melgan_parity():
    torch.manual_seed(0)
    ref = _build_torch_melgan().eval()
    sd = {f"model.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_melgan(sd))

    rng = np.random.default_rng(0)
    mel = rng.normal(-1, 1, (2, 19, 80)).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    wav = apply_melgan(params, jnp.asarray(mel), from_natural_log=False)
    assert wav.shape == (2, 19 * 256)
    np.testing.assert_allclose(np.asarray(wav), ref_wav[:, 0, :],
                               rtol=1e-4, atol=2e-4)


def test_melgan_init_shapes():
    params = init_melgan(jax.random.PRNGKey(0))
    mel = jnp.zeros((1, 10, 80), jnp.float32)
    wav = apply_melgan(params, mel)
    assert wav.shape == (1, 2560)
