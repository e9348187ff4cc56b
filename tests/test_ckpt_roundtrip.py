"""Checkpoint-parity round trip (VERDICT r1 item 10): a *saved* Orbax
checkpoint → reference-format torch state dict → back must be lossless, and
the exported dict must load into the actual reference FastSpeech2 module.
Keeps the parity machinery warm for the 900k reference weights (git-LFS
pointers, absent here — reference: output/ckpt/*/900000.pth.tar)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from expressive_fastspeech2_mandarin_tpu.config import Config
from expressive_fastspeech2_mandarin_tpu.interop.torch_ckpt import (
    convert_fastspeech2,
    export_fastspeech2,
    load_torch_state_dict,
    save_torch_checkpoint,
)
from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2
from expressive_fastspeech2_mandarin_tpu.train import (
    CheckpointManager,
    create_train_state,
    make_optimizer,
)

from .ref_oracle import install_reference_path, reference_available


def _tree_equal(a, b, path=""):
    assert type(a) is type(b) or isinstance(a, (dict, list)) == isinstance(
        b, (dict, list)), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


def test_orbax_to_torch_and_back(tmp_path):
    cfg = Config()  # full reference-scale model
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    state = create_train_state(params, bn_state, tx, jax.random.PRNGKey(1))

    # Save + restore through Orbax (the "saved checkpoint" requirement).
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state)
    restored = mgr.restore(state, 7)

    consts = {k: np.asarray(v) for k, v in model.consts.items()
              if k in ("pitch_bins", "energy_bins")}
    sd = export_fastspeech2(restored.params, restored.bn_state, consts)
    ckpt_path = str(tmp_path / "native_as_torch.pth.tar")
    save_torch_checkpoint(ckpt_path, sd)

    sd2 = load_torch_state_dict(ckpt_path, key="model")
    params2, bn2, consts2 = convert_fastspeech2(sd2)

    _tree_equal(jax.tree.map(np.asarray, restored.params), params2)
    _tree_equal(jax.tree.map(np.asarray, restored.bn_state), bn2)
    np.testing.assert_array_equal(consts["pitch_bins"],
                                  consts2["pitch_bins"])


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_export_loads_into_reference_model(tmp_path):
    """The exported dict must cover the reference module's parameters —
    load_state_dict with no unexpected keys; only the (regenerated)
    positional tables and bin buffers may be absent."""
    install_reference_path()
    import utils.model as ref_model_mod  # noqa: F401  (path check)
    from model import FastSpeech2 as RefFastSpeech2

    import yaml

    with open("/root/reference/config/ESD-Chinese-Singing-MFA/"
              "preprocess.yaml") as f:
        pcfg = yaml.safe_load(f)
    with open("/root/reference/config/ESD-Chinese-Singing-MFA/"
              "model.yaml") as f:
        mcfg = yaml.safe_load(f)
    pcfg["path"]["preprocessed_path"] = str(tmp_path)
    import json

    with open(tmp_path / "stats.json", "w") as f:
        json.dump({"pitch": [-2.0, 8.0, 0.0, 1.0],
                   "energy": [-1.0, 7.0, 0.0, 1.0]}, f)
    with open(tmp_path / "speakers.json", "w") as f:
        json.dump({f"{i:04d}": i for i in range(10)}, f)
    with open(tmp_path / "emotions.json", "w") as f:
        json.dump({"emotion_dict": {str(i): i for i in range(5)},
                   "arousal_dict": {str(i): i for i in range(5)},
                   "valence_dict": {str(i): i for i in range(5)}}, f)
    ref = RefFastSpeech2(pcfg, mcfg)

    cfg = Config()
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    consts = {k: np.asarray(v) for k, v in model.consts.items()
              if k in ("pitch_bins", "energy_bins")}
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_fastspeech2(params, bn_state, consts).items()}

    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    allowed = {"encoder.position_enc", "decoder.position_enc"}
    assert set(missing) <= allowed, missing
