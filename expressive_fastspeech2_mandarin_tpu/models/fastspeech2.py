"""FastSpeech2 acoustic model with speaker + emotion/arousal/valence
conditioning.

Forward structure (reference: model/fastspeech2.py:73-148):
encoder → +speaker_emb → +emotion_linear(cat(emotion,arousal,valence)) →
variance adaptor → decoder → mel_linear → postnet (+residual).

Everything is static-shaped: the caller picks ``max_src_len`` /
``max_mel_len`` buckets; masks carry the true lengths. Non-trainable
constants (sinusoid tables, pitch/energy bin boundaries from stats.json) are
kept in a separate ``consts`` pytree so the optimizer and the checkpoint
format stay clean.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig, PreprocessConfig
from ..ops import mask_from_lengths
from .init import embedding_params, linear_params
from .postnet import apply_postnet, init_postnet
from .transformer import (
    apply_decoder,
    apply_encoder,
    init_decoder,
    init_encoder,
    sinusoid_encoding_table,
)
from .variance import (
    apply_variance_adaptor,
    init_variance_adaptor,
    make_variance_bins,
)

Params = dict[str, Any]


@dataclass
class FastSpeech2Output:
    """Mirrors the reference forward's 10-tuple (model/fastspeech2.py:138-148)."""

    mel: jnp.ndarray                 # (B, T, n_mels) pre-postnet
    postnet_mel: jnp.ndarray         # (B, T, n_mels)
    pitch_predictions: jnp.ndarray   # (B, S) or (B, T)
    energy_predictions: jnp.ndarray
    log_duration_predictions: jnp.ndarray  # (B, S)
    durations_rounded: jnp.ndarray   # (B, S)
    src_masks: jnp.ndarray           # (B, S) True at padding
    mel_masks: jnp.ndarray           # (B, T)
    src_lens: jnp.ndarray            # (B,)
    mel_lens: jnp.ndarray            # (B,)


class FastSpeech2:
    """Functional FastSpeech2: holds config + constants, params are explicit."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        preprocess_cfg: PreprocessConfig,
        stats: dict[str, list[float]] | None = None,
    ):
        self.cfg = model_cfg
        self.pre = preprocess_cfg
        n_pos = model_cfg.max_seq_len + 1
        ve = model_cfg.variance_embedding
        stats = stats or {"pitch": [-2.0, 8.0, 0.0, 1.0],
                          "energy": [-2.0, 8.0, 0.0, 1.0]}
        self.consts = {
            "enc_pos": jnp.asarray(
                sinusoid_encoding_table(n_pos, model_cfg.transformer.encoder_hidden)),
            "dec_pos": jnp.asarray(
                sinusoid_encoding_table(n_pos, model_cfg.transformer.decoder_hidden)),
            "pitch_bins": make_variance_bins(
                stats["pitch"][0], stats["pitch"][1], ve.n_bins,
                ve.pitch_quantization),
            "energy_bins": make_variance_bins(
                stats["energy"][0], stats["energy"][1], ve.n_bins,
                ve.energy_quantization),
        }

    # -- init ---------------------------------------------------------------

    def init(self, rng) -> tuple[Params, Params]:
        """Returns (params, bn_state)."""
        cfg = self.cfg
        d = cfg.transformer.encoder_hidden
        keys = jax.random.split(rng, 10)
        postnet_params, bn_state = init_postnet(
            keys[6], self.pre.mel.n_mel_channels)
        params: Params = {
            "encoder": init_encoder(keys[0], cfg.transformer, cfg.vocab_size),
            "decoder": init_decoder(keys[1], cfg.transformer),
            "variance_adaptor": init_variance_adaptor(keys[2], cfg),
            "mel_linear": linear_params(
                keys[3], cfg.transformer.decoder_hidden,
                self.pre.mel.n_mel_channels),
            "postnet": postnet_params,
        }
        if cfg.multi_speaker:
            params["speaker_emb"] = embedding_params(keys[4], cfg.n_speakers, d)
        if cfg.multi_emotion:
            k_e, k_a, k_v, k_l = jax.random.split(keys[5], 4)
            params["emotion_emb"] = embedding_params(k_e, cfg.n_emotions, d // 2)
            params["arousal_emb"] = embedding_params(k_a, cfg.n_arousals, d // 4)
            params["valence_emb"] = embedding_params(k_v, cfg.n_valences, d // 4)
            params["emotion_linear"] = linear_params(k_l, d, d)
        return params, {"postnet": bn_state}

    # -- forward ------------------------------------------------------------

    def apply(
        self,
        params: Params,
        state: Params,
        speakers: jnp.ndarray,
        emotions: jnp.ndarray,
        arousals: jnp.ndarray,
        valences: jnp.ndarray,
        texts: jnp.ndarray,
        src_lens: jnp.ndarray,
        *,
        max_mel_len: int,
        mel_lens: jnp.ndarray | None = None,
        p_targets: jnp.ndarray | None = None,
        e_targets: jnp.ndarray | None = None,
        d_targets: jnp.ndarray | None = None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
        rng=None,
    ) -> tuple[FastSpeech2Output, Params]:
        cfg = self.cfg
        max_src_len = texts.shape[1]
        src_masks = mask_from_lengths(src_lens, max_src_len)
        mel_masks = (
            mask_from_lengths(mel_lens, max_mel_len)
            if mel_lens is not None else None
        )
        if not deterministic and rng is None:
            raise ValueError("training mode requires an rng")
        rngs = (
            {k: jax.random.fold_in(rng, i) for i, k in
             enumerate(("enc", "va", "dec", "post"))}
            if not deterministic else dict.fromkeys(("enc", "va", "dec", "post"))
        )

        # Positional tables: regenerate longer tables at trace time for
        # sequences past max_seq_len (reference: Models.py:82-87,145-151).
        # Tables follow the parameter dtype so the bf16 mixed-precision
        # path (params cast in the train step) stays bf16 end-to-end —
        # a f32 table would silently re-promote every activation.
        compute_dtype = params["encoder"]["embed"].dtype
        enc_pos = self.consts["enc_pos"]
        if max_src_len > cfg.max_seq_len:
            enc_pos = jnp.asarray(sinusoid_encoding_table(
                max_src_len, cfg.transformer.encoder_hidden))
        dec_pos = self.consts["dec_pos"]
        if max_mel_len > cfg.max_seq_len:
            dec_pos = jnp.asarray(sinusoid_encoding_table(
                max_mel_len, cfg.transformer.decoder_hidden))
        enc_pos = enc_pos.astype(compute_dtype)
        dec_pos = dec_pos.astype(compute_dtype)

        x = apply_encoder(
            params["encoder"], texts, src_masks, enc_pos, cfg.transformer,
            deterministic=deterministic, rng=rngs["enc"])

        if cfg.multi_speaker:
            x = x + params["speaker_emb"][speakers][:, None, :]
        if cfg.multi_emotion:
            emb = jnp.concatenate(
                [params["emotion_emb"][emotions],
                 params["arousal_emb"][arousals],
                 params["valence_emb"][valences]], axis=-1)
            lin = params["emotion_linear"]
            emb = jax.nn.relu(emb @ lin["w"] + lin["b"])
            x = x + emb[:, None, :]
        if cfg.padding_inert:
            # Zero the conditioning at padded positions so the variance
            # predictors' convs see the same implicit zeros an exact-length
            # run would (see ModelConfig.padding_inert).
            x = jnp.where(src_masks[..., None], 0.0, x)

        (frames, p_pred, e_pred, log_d_pred, d_rounded, mel_lens_out,
         mel_masks) = apply_variance_adaptor(
            params["variance_adaptor"], x, src_masks, self.consts, cfg,
            max_mel_len,
            pitch_feature_level=self.pre.pitch.feature,
            energy_feature_level=self.pre.energy.feature,
            mel_mask=mel_masks,
            pitch_target=p_targets,
            energy_target=e_targets,
            duration_target=d_targets,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=deterministic, rng=rngs["va"])
        if d_targets is not None:
            mel_lens_out = mel_lens

        frames = apply_decoder(
            params["decoder"], frames, mel_masks, dec_pos, cfg.transformer,
            deterministic=deterministic, rng=rngs["dec"])

        mel = frames @ params["mel_linear"]["w"] + params["mel_linear"]["b"]
        if cfg.padding_inert and mel_masks is not None:
            # Padded mel rows would otherwise hold the mel-linear bias and
            # leak into the postnet's conv edges (radius 10 at k=5 × 5
            # layers); zero them so bucketed == exact-length numerics.
            mel = jnp.where(mel_masks[..., None], 0.0, mel)
        residual, new_bn = apply_postnet(
            params["postnet"], state["postnet"], mel,
            mask=mel_masks if cfg.padding_inert else None,
            deterministic=deterministic, rng=rngs["post"])
        postnet_mel = mel + residual

        out = FastSpeech2Output(
            mel=mel,
            postnet_mel=postnet_mel,
            pitch_predictions=p_pred,
            energy_predictions=e_pred,
            log_duration_predictions=log_d_pred,
            durations_rounded=d_rounded,
            src_masks=src_masks,
            mel_masks=mel_masks,
            src_lens=src_lens,
            mel_lens=mel_lens_out,
        )
        return out, {"postnet": new_bn}


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
