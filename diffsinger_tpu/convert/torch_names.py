"""Torch state_dict key -> Flax param path translation tables.

One-time converter from released reference checkpoints (layout documented at
reference utils/__init__.py:178-209 — ``torch.save`` dict with ``state_dict``
whose model keys carry a ``model.`` prefix) into this framework's param trees.

Tensor layout transforms:
  * Linear:            torch [out, in]        -> kernel [in, out]
  * Conv1d:            torch [out, in, k]     -> kernel [k, in, out]
  * ConvTranspose1d:   torch [in, out, k]     -> kernel [k, out, in]
  * Embedding / LayerNorm / biases: unchanged (LayerNorm weight -> scale)
  * weight-norm pairs (weight_g [out,1,1], weight_v) are folded first, matching
    ``remove_weight_norm`` semantics (reference vocoders/hifigan.py:30).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv1d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def t_conv_transpose1d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold every ``<name>.weight_g``/``<name>.weight_v`` pair into
    ``<name>.weight`` (norm over all dims except 0, torch weight_norm dim=0)."""
    out = dict(sd)
    for k in list(sd):
        if k.endswith(".weight_v"):
            base = k[: -len(".weight_v")]
            g = sd.get(base + ".weight_g")
            if g is None:
                continue
            v = sd[k]
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
            out[base + ".weight"] = g * v / np.maximum(norm, 1e-12)
            out.pop(k)
            out.pop(base + ".weight_g")
    return out


# ---------------------------------------------------------------------------
# FS2 (+MIDI): reference modules/fastspeech/fs2.py, modules/diffsinger_midi/fs2.py
# ---------------------------------------------------------------------------

def _predictor_rules(torch_prefix: str, flax_prefix: str):
    """Duration/Pitch predictor conv stacks: torch Sequential index 1=conv,
    3=LayerNorm (reference tts_modules.py:88-96,210-218)."""
    return [
        (rf"{torch_prefix}\.conv\.(\d+)\.1\.weight", rf"{flax_prefix}/conv_\1/conv/kernel", t_conv1d),
        (rf"{torch_prefix}\.conv\.(\d+)\.1\.bias", rf"{flax_prefix}/conv_\1/conv/bias", None),
        (rf"{torch_prefix}\.conv\.(\d+)\.3\.weight", rf"{flax_prefix}/conv_\1/norm/scale", None),
        (rf"{torch_prefix}\.conv\.(\d+)\.3\.bias", rf"{flax_prefix}/conv_\1/norm/bias", None),
        (rf"{torch_prefix}\.linear\.weight", rf"{flax_prefix}/linear/kernel", t_linear),
        (rf"{torch_prefix}\.linear\.bias", rf"{flax_prefix}/linear/bias", None),
        (rf"{torch_prefix}\.pos_embed_alpha", rf"{flax_prefix}/pos_embed_alpha", None),
    ]


def _fft_stack_rules(torch_prefix: str, flax_prefix: str):
    """FFTBlocks layer stack (reference tts_modules.py:251-307 /
    common_layers.py:542-589)."""
    return [
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.layer_norm1\.weight",
         rf"{flax_prefix}/layers_\1/layer_norm1/scale", None),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.layer_norm1\.bias",
         rf"{flax_prefix}/layers_\1/layer_norm1/bias", None),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.self_attn\.in_proj_weight",
         rf"{flax_prefix}/layers_\1/self_attn/in_proj/kernel", t_linear),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.self_attn\.out_proj\.weight",
         rf"{flax_prefix}/layers_\1/self_attn/out_proj/kernel", t_linear),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.layer_norm2\.weight",
         rf"{flax_prefix}/layers_\1/layer_norm2/scale", None),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.layer_norm2\.bias",
         rf"{flax_prefix}/layers_\1/layer_norm2/bias", None),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.ffn\.ffn_1\.weight",
         rf"{flax_prefix}/layers_\1/ffn/ffn_1/kernel", t_conv1d),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.ffn\.ffn_1\.bias",
         rf"{flax_prefix}/layers_\1/ffn/ffn_1/bias", None),
        # LEFT-padded ffn_1 is a Sequential(pad, conv) -> extra .1 in the name
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.ffn\.ffn_1\.1\.weight",
         rf"{flax_prefix}/layers_\1/ffn/ffn_1/kernel", t_conv1d),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.ffn\.ffn_1\.1\.bias",
         rf"{flax_prefix}/layers_\1/ffn/ffn_1/bias", None),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.ffn\.ffn_2\.weight",
         rf"{flax_prefix}/layers_\1/ffn/ffn_2/kernel", t_linear),
        (rf"{torch_prefix}\.layers\.(\d+)\.op\.ffn\.ffn_2\.bias",
         rf"{flax_prefix}/layers_\1/ffn/ffn_2/bias", None),
        (rf"{torch_prefix}\.layer_norm\.weight", rf"{flax_prefix}/layer_norm/scale", None),
        (rf"{torch_prefix}\.layer_norm\.bias", rf"{flax_prefix}/layer_norm/bias", None),
        (rf"{torch_prefix}\.pos_embed_alpha", rf"{flax_prefix}/pos_embed_alpha", None),
    ]


FS2_RULES = (
    [
        (r"encoder_embed_tokens\.weight", r"encoder/embed_tokens/embedding", None),
        (r"encoder\.embed_tokens\.weight", r"encoder/embed_tokens/embedding", None),
        (r"mel_out\.weight", r"mel_out/kernel", t_linear),
        (r"mel_out\.bias", r"mel_out/bias", None),
        (r"pitch_embed\.weight", r"pitch_embed/embedding", None),
        (r"energy_embed\.weight", r"energy_embed/embedding", None),
        (r"spk_embed_proj\.weight", r"spk_embed_proj/kernel", t_linear),
        (r"spk_embed_proj\.bias", r"spk_embed_proj/bias", None),
        (r"midi_embed\.weight", r"midi_embed/embedding", None),
        (r"midi_dur_layer\.weight", r"midi_dur_layer/kernel", t_linear),
        (r"midi_dur_layer\.bias", r"midi_dur_layer/bias", None),
        (r"is_slur_embed\.weight", r"is_slur_embed/embedding", None),
        # cwt heads (reference fs2.py:56-72)
        (r"cwt_predictor\.0\.weight", r"cwt_in_proj/kernel", t_linear),
        (r"cwt_predictor\.0\.bias", r"cwt_in_proj/bias", None),
        (r"cwt_stats_layers\.0\.weight", r"cwt_stats_0/kernel", t_linear),
        (r"cwt_stats_layers\.0\.bias", r"cwt_stats_0/bias", None),
        (r"cwt_stats_layers\.2\.weight", r"cwt_stats_1/kernel", t_linear),
        (r"cwt_stats_layers\.2\.bias", r"cwt_stats_1/bias", None),
        (r"cwt_stats_layers\.4\.weight", r"cwt_stats_2/kernel", t_linear),
        (r"cwt_stats_layers\.4\.bias", r"cwt_stats_2/bias", None),
    ]
    + _fft_stack_rules("encoder", "encoder/blocks")
    + _fft_stack_rules("decoder", "decoder/blocks")
    + _predictor_rules("dur_predictor", "dur_predictor")
    + _predictor_rules("pitch_predictor", "pitch_predictor")
    + _predictor_rules("energy_predictor", "energy_predictor")
    + _predictor_rules(r"cwt_predictor\.1", "cwt_predictor")
)


# ---------------------------------------------------------------------------
# DiffNet (reference usr/diff/net.py:81-130); torch prefix "denoise_fn."
# ---------------------------------------------------------------------------

DIFFNET_RULES = [
    (r"input_projection\.weight", r"input_projection/kernel", t_conv1d),
    (r"input_projection\.bias", r"input_projection/bias", None),
    (r"mlp\.0\.weight", r"mlp_0/kernel", t_linear),
    (r"mlp\.0\.bias", r"mlp_0/bias", None),
    (r"mlp\.2\.weight", r"mlp_2/kernel", t_linear),
    (r"mlp\.2\.bias", r"mlp_2/bias", None),
    (r"residual_layers\.(\d+)\.dilated_conv\.weight",
     r"residual_\1/dilated_conv/kernel", t_conv1d),
    (r"residual_layers\.(\d+)\.dilated_conv\.bias",
     r"residual_\1/dilated_conv/bias", None),
    (r"residual_layers\.(\d+)\.diffusion_projection\.weight",
     r"step_projection_\1/kernel", t_linear),
    (r"residual_layers\.(\d+)\.diffusion_projection\.bias",
     r"step_projection_\1/bias", None),
    (r"residual_layers\.(\d+)\.conditioner_projection\.weight",
     r"cond_projection_\1/kernel", t_conv1d),
    (r"residual_layers\.(\d+)\.conditioner_projection\.bias",
     r"cond_projection_\1/bias", None),
    (r"residual_layers\.(\d+)\.output_projection\.weight",
     r"residual_\1/output_projection/kernel", t_conv1d),
    (r"residual_layers\.(\d+)\.output_projection\.bias",
     r"residual_\1/output_projection/bias", None),
    (r"skip_projection\.weight", r"skip_projection/kernel", t_conv1d),
    (r"skip_projection\.bias", r"skip_projection/bias", None),
    (r"output_projection\.weight", r"output_projection/kernel", t_conv1d),
    (r"output_projection\.bias", r"output_projection/bias", None),
]


# ---------------------------------------------------------------------------
# HiFiGAN generator (reference modules/hifigan/hifigan.py:104-180); weight norm
# folded beforehand.
# ---------------------------------------------------------------------------

HIFIGAN_RULES = [
    (r"conv_pre\.weight", r"conv_pre/kernel", t_conv1d),
    (r"conv_pre\.bias", r"conv_pre/bias", None),
    (r"conv_post\.weight", r"conv_post/kernel", t_conv1d),
    (r"conv_post\.bias", r"conv_post/bias", None),
    (r"ups\.(\d+)\.weight", r"ups_\1/kernel", t_conv_transpose1d),
    (r"ups\.(\d+)\.bias", r"ups_\1/bias", None),
    (r"resblocks\.(\d+)\.convs1\.(\d+)\.weight", r"resblocks_\1/convs1_\2/kernel", t_conv1d),
    (r"resblocks\.(\d+)\.convs1\.(\d+)\.bias", r"resblocks_\1/convs1_\2/bias", None),
    (r"resblocks\.(\d+)\.convs2\.(\d+)\.weight", r"resblocks_\1/convs2_\2/kernel", t_conv1d),
    (r"resblocks\.(\d+)\.convs2\.(\d+)\.bias", r"resblocks_\1/convs2_\2/bias", None),
    (r"resblocks\.(\d+)\.convs\.(\d+)\.weight", r"resblocks_\1/convs_\2/kernel", t_conv1d),
    (r"resblocks\.(\d+)\.convs\.(\d+)\.bias", r"resblocks_\1/convs_\2/bias", None),
    (r"noise_convs\.(\d+)\.weight", r"noise_convs_\1/kernel", t_conv1d),
    (r"noise_convs\.(\d+)\.bias", r"noise_convs_\1/bias", None),
    (r"m_source\.l_linear\.weight", r"m_source/l_linear/kernel", t_linear),
    (r"m_source\.l_linear\.bias", r"m_source/l_linear/bias", None),
]


# ---------------------------------------------------------------------------
# ParallelWaveGAN generator (reference parallel_wavegan/models/parallel_wavegan.py)
# ---------------------------------------------------------------------------

def t_conv2d_up(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [out=1, in=1, kf, kt] -> HWIO [kf, kt, 1, 1]."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


PWG_RULES = [
    (r"first_conv\.weight", r"first_conv/kernel", t_conv1d),
    (r"first_conv\.bias", r"first_conv/bias", None),
    (r"conv_layers\.(\d+)\.conv\.weight", r"conv_layers_\1/conv/kernel", t_conv1d),
    (r"conv_layers\.(\d+)\.conv\.bias", r"conv_layers_\1/conv/bias", None),
    (r"conv_layers\.(\d+)\.conv1x1_aux\.weight",
     r"conv_layers_\1/conv1x1_aux/kernel", t_conv1d),
    (r"conv_layers\.(\d+)\.conv1x1_skip\.weight",
     r"conv_layers_\1/conv1x1_skip/kernel", t_conv1d),
    (r"conv_layers\.(\d+)\.conv1x1_skip\.bias",
     r"conv_layers_\1/conv1x1_skip/bias", None),
    (r"conv_layers\.(\d+)\.conv1x1_out\.weight",
     r"conv_layers_\1/conv1x1_out/kernel", t_conv1d),
    (r"conv_layers\.(\d+)\.conv1x1_out\.bias",
     r"conv_layers_\1/conv1x1_out/bias", None),
    (r"last_conv_layers\.1\.weight", r"last_conv_1/kernel", t_conv1d),
    (r"last_conv_layers\.1\.bias", r"last_conv_1/bias", None),
    (r"last_conv_layers\.3\.weight", r"last_conv_3/kernel", t_conv1d),
    (r"last_conv_layers\.3\.bias", r"last_conv_3/bias", None),
    (r"upsample_net\.conv_in\.weight", r"upsample_net/conv_in/kernel", t_conv1d),
    # up_layers: [stretch, conv] per scale -> conv at odd indices 1,3,5,...
    (r"upsample_net\.upsample\.up_layers\.1\.weight",
     r"upsample_net/up_conv_0", t_conv2d_up),
    (r"upsample_net\.upsample\.up_layers\.3\.weight",
     r"upsample_net/up_conv_1", t_conv2d_up),
    (r"upsample_net\.upsample\.up_layers\.5\.weight",
     r"upsample_net/up_conv_2", t_conv2d_up),
    (r"upsample_net\.upsample\.up_layers\.7\.weight",
     r"upsample_net/up_conv_3", t_conv2d_up),
    (r"pitch_embed\.weight", r"pitch_embed/embedding", None),
    (r"c_proj\.weight", r"c_proj/kernel", t_linear),
    (r"c_proj\.bias", r"c_proj/bias", None),
]


# ---------------------------------------------------------------------------
# PitchExtractor (reference modules/fastspeech/pe.py)
# ---------------------------------------------------------------------------

PE_RULES = (
    [
        (r"mel_prenet\.layers\.(\d+)\.0\.weight", r"mel_prenet/conv_\1/kernel", t_conv1d),
        (r"mel_prenet\.layers\.(\d+)\.0\.bias", r"mel_prenet/conv_\1/bias", None),
        (r"mel_prenet\.layers\.(\d+)\.2\.weight", r"mel_prenet/bn_\1/scale", None),
        (r"mel_prenet\.layers\.(\d+)\.2\.bias", r"mel_prenet/bn_\1/bias", None),
        (r"mel_prenet\.out_proj\.weight", r"mel_prenet/out_proj/kernel", t_linear),
        (r"mel_prenet\.out_proj\.bias", r"mel_prenet/out_proj/bias", None),
        (r"mel_encoder\.in_proj\.weight", r"mel_encoder/in_proj/kernel", t_linear),
        (r"mel_encoder\.in_proj\.bias", r"mel_encoder/in_proj/bias", None),
        (r"mel_encoder\.conv\.(\d+)\.conv\.conv\.weight",
         r"mel_encoder/conv_\1/kernel", t_conv1d),
        (r"mel_encoder\.conv\.(\d+)\.conv\.conv\.bias",
         r"mel_encoder/conv_\1/bias", None),
        (r"mel_encoder\.conv\.(\d+)\.norm\.weight", r"mel_encoder/norm_\1/scale", None),
        (r"mel_encoder\.conv\.(\d+)\.norm\.bias", r"mel_encoder/norm_\1/bias", None),
        (r"mel_encoder\.out_proj\.weight", r"mel_encoder/out_proj/kernel", t_linear),
        (r"mel_encoder\.out_proj\.bias", r"mel_encoder/out_proj/bias", None),
    ]
    + _predictor_rules("pitch_predictor", "pitch_predictor")
)

# BatchNorm running stats -> flax batch_stats collection
PE_STATS_RULES = [
    (r"mel_prenet\.layers\.(\d+)\.2\.running_mean", r"mel_prenet/bn_\1/mean", None),
    (r"mel_prenet\.layers\.(\d+)\.2\.running_var", r"mel_prenet/bn_\1/var", None),
]


def apply_rules(sd: Dict[str, np.ndarray], rules,
                strict_unused: bool = False) -> Dict[str, np.ndarray]:
    """Translate a torch state_dict into a flat {'a/b/c': array} flax dict."""
    out: Dict[str, np.ndarray] = {}
    used = set()
    for pattern, target, transform in rules:
        rx = re.compile("^" + pattern + "$")
        for key, val in sd.items():
            m = rx.match(key)
            if not m:
                continue
            tgt = rx.sub(target, key)
            out[tgt] = transform(val) if transform else np.asarray(val)
            used.add(key)
    if strict_unused:
        skip = ("_float_tensor", "running_mean", "running_var",
                "num_batches_tracked", "embed_positions", "betas", "alphas",
                "posterior", "spec_min", "spec_max", "sqrt_", "log_one")
        leftovers = [k for k in sd if k not in used
                     and not any(s in k for s in skip)]
        if leftovers:
            raise ValueError(f"unmapped torch keys: {leftovers[:10]}")
    return out


def to_nested(flat: Dict[str, np.ndarray]) -> Dict:
    import flax

    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})
