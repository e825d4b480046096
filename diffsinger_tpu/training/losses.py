"""Loss stack for FS2 / diffusion tasks.

Behavioral parity: tasks/tts/fs2.py:143-290 (mel l1/ssim mix, phone/word/sentence
duration losses, frame/cwt/ph pitch losses, energy loss) and
usr/diffsinger_task.py:351-389 (MIDI word-boundary duration loss). All are pure
jnp functions taking explicit masks; the ``B x word_id.max()`` dynamic scatter of
the reference becomes a fixed-size ``[B, T_txt+1]`` segment-sum (word count <=
phone count) so shapes stay static under jit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from diffsinger_tpu.models.predictors import mel2ph_to_dur
from diffsinger_tpu.ops.ssim import ssim


def weights_nonzero_speech(target: jnp.ndarray) -> jnp.ndarray:
    """[B, T, M] -> same-shape mask, 1 where the frame is non-silent/padded."""
    dim = target.shape[-1]
    return (jnp.abs(target).sum(-1, keepdims=True) > 0).astype(target.dtype) * jnp.ones(
        (1, 1, dim), target.dtype)


def mel_l1_loss(mel_out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    w = weights_nonzero_speech(target)
    return (jnp.abs(mel_out - target) * w).sum() / jnp.maximum(w.sum(), 1.0)


def mel_ssim_loss(mel_out: jnp.ndarray, target: jnp.ndarray,
                  bias: float = 6.0) -> jnp.ndarray:
    w = weights_nonzero_speech(target)
    ssim_map = 1 - ssim(mel_out + bias, target + bias, reduce_mean=False)
    return (ssim_map * w).sum() / jnp.maximum(w.sum(), 1.0)


def parse_mel_loss(spec: str) -> Dict[str, float]:
    """'l1:0.5|ssim:0.5' -> {'l1': 0.5, 'ssim': 0.5} (reference fs2.py:34-44)."""
    out = {}
    for part in spec.split("|"):
        if ":" in part:
            name, lbd = part.split(":")
            out[name] = float(lbd)
        else:
            out[part] = 1.0
    return out


def add_mel_losses(losses: Dict[str, jnp.ndarray], mel_out, target,
                   mel_loss_spec: str = "l1", postfix: str = ""):
    for name, lbd in parse_mel_loss(mel_loss_spec).items():
        if name == "l1":
            losses[f"l1{postfix}"] = mel_l1_loss(mel_out, target) * lbd
        elif name == "ssim":
            losses[f"ssim{postfix}"] = mel_ssim_loss(mel_out, target) * lbd
        else:
            raise NotImplementedError(name)


def duration_losses(losses: Dict[str, jnp.ndarray], dur_pred_log: jnp.ndarray,
                    mel2ph: jnp.ndarray, txt_tokens: jnp.ndarray,
                    is_sil: jnp.ndarray, *, lambda_ph_dur: float = 1.0,
                    lambda_word_dur: float = 1.0, lambda_sent_dur: float = 1.0,
                    dur_loss: str = "mse", crf_params=None):
    """Phone/word/sentence duration losses (reference fs2.py:177-219).

    is_sil: [B, T_txt] 1.0 at silence phones (computed host-side from the vocab).
    dur_loss='crf': dur_pred_log is [B, T, 32] emissions and pdur is the CRF NLL
    -log p(clamp(dur_gt,0,31)) with crf_params = the dur_predictor/crf param dict
    (reference fs2.py:200-202). wdur/sdur need linear-scale predicted durations,
    which the crf head has no differentiable form of (the reference crashes if
    combined); they're skipped under crf.
    """
    b, t_txt = txt_tokens.shape
    nonpadding = (txt_tokens != 0).astype(jnp.float32)
    dur_gt = mel2ph_to_dur(mel2ph, t_txt).astype(jnp.float32) * nonpadding

    if dur_loss == "crf":
        from diffsinger_tpu.ops.crf import crf_log_partition, crf_score
        tags = jnp.clip(dur_gt.astype(jnp.int32), 0, 31)
        mask = (txt_tokens != 0).at[:, 0].set(True)
        start, end, trans = (crf_params["start_transitions"],
                             crf_params["end_transitions"],
                             crf_params["transitions"])
        ll = (crf_score(dur_pred_log, tags, mask, start, end, trans)
              - crf_log_partition(dur_pred_log, mask, start, end, trans))
        losses["pdur"] = -ll.mean() * lambda_ph_dur
        return
    if dur_loss != "mse":
        raise NotImplementedError(dur_loss)
    pdur = (dur_pred_log - jnp.log(dur_gt + 1)) ** 2
    losses["pdur"] = (pdur * nonpadding).sum() / nonpadding.sum() * lambda_ph_dur
    dur_pred = jnp.maximum(jnp.exp(dur_pred_log) - 1, 0)

    if lambda_word_dur > 0:
        word_id = (jnp.cumsum(is_sil, -1) * (1 - is_sil)).astype(jnp.int32)
        # static upper bound: #words + 1 <= T_txt + 1
        seg = lambda vals: jax.vmap(
            lambda w, v: jnp.zeros(t_txt + 1, jnp.float32).at[w].add(v))(word_id, vals)
        word_dur_p = seg(dur_pred)[:, 1:]
        word_dur_g = seg(dur_gt)[:, 1:]
        wdur = (jnp.log(word_dur_p + 1) - jnp.log(word_dur_g + 1)) ** 2
        word_nonpadding = (word_dur_g > 0).astype(jnp.float32)
        losses["wdur"] = (wdur * word_nonpadding).sum() / jnp.maximum(
            word_nonpadding.sum(), 1.0) * lambda_word_dur
    if lambda_sent_dur > 0:
        sdur = (jnp.log(dur_pred.sum(-1) + 1) - jnp.log(dur_gt.sum(-1) + 1)) ** 2
        losses["sdur"] = sdur.mean() * lambda_sent_dur


def midi_duration_loss(losses: Dict[str, jnp.ndarray], dur_pred_log: jnp.ndarray,
                       mel2ph: jnp.ndarray, txt_tokens: jnp.ndarray,
                       word_boundary: jnp.ndarray, *, lambda_ph_dur: float = 1.0,
                       lambda_word_dur: float = 1.0, lambda_sent_dur: float = 0.0):
    """MIDI variant: words delimited by ``word_boundary`` cumsum
    (reference usr/diffsinger_task.py:351-389)."""
    b, t_txt = txt_tokens.shape
    nonpadding = (txt_tokens != 0).astype(jnp.float32)
    dur_gt = mel2ph_to_dur(mel2ph, t_txt).astype(jnp.float32) * nonpadding

    pdur = (dur_pred_log - jnp.log(dur_gt + 1)) ** 2
    losses["pdur"] = (pdur * nonpadding).sum() / nonpadding.sum() * lambda_ph_dur
    dur_pred = jnp.maximum(jnp.exp(dur_pred_log) - 1, 0)

    if lambda_word_dur > 0:
        shifted = jnp.pad(word_boundary, ((0, 0), (1, 0)))[:, :-1]
        word_id = jnp.cumsum(shifted, -1).astype(jnp.int32) + 1
        word_id = jnp.where(txt_tokens == 0, 0, word_id)
        seg = lambda vals: jax.vmap(
            lambda w, v: jnp.zeros(t_txt + 2, jnp.float32).at[w].add(v))(word_id, vals)
        word_dur_p = seg(dur_pred)[:, 1:]
        word_dur_g = seg(dur_gt)[:, 1:]
        wdur = (jnp.log(word_dur_p + 1) - jnp.log(word_dur_g + 1)) ** 2
        word_nonpadding = (word_dur_g > 0).astype(jnp.float32)
        losses["wdur"] = (wdur * word_nonpadding).sum() / jnp.maximum(
            word_nonpadding.sum(), 1.0) * lambda_word_dur
    if lambda_sent_dur > 0:
        sdur = (jnp.log(dur_pred.sum(-1) + 1) - jnp.log(dur_gt.sum(-1) + 1)) ** 2
        losses["sdur"] = sdur.mean() * lambda_sent_dur


def binary_cross_entropy_with_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def f0_loss(losses: Dict[str, jnp.ndarray], pitch_pred: jnp.ndarray, f0: jnp.ndarray,
            uv: Optional[jnp.ndarray], nonpadding: jnp.ndarray, *,
            use_uv: bool = True, pitch_loss: str = "l1", lambda_f0: float = 1.0,
            lambda_uv: float = 1.0):
    """Frame-level f0 (+uv) loss (reference fs2.py:254-269)."""
    if use_uv and uv is not None:
        bce = binary_cross_entropy_with_logits(pitch_pred[:, :, 1], uv)
        losses["uv"] = (bce * nonpadding).sum() / jnp.maximum(nonpadding.sum(),
                                                              1.0) * lambda_uv
        nonpadding = nonpadding * (uv == 0).astype(jnp.float32)
    f0_pred = pitch_pred[:, :, 0]
    err = jnp.abs(f0_pred - f0) if pitch_loss == "l1" else (f0_pred - f0) ** 2
    losses["f0"] = (err * nonpadding).sum() / jnp.maximum(nonpadding.sum(),
                                                          1.0) * lambda_f0


def ph_pitch_loss(losses: Dict[str, jnp.ndarray], pitch_pred, f0_ph, txt_tokens, *,
                  pitch_loss: str = "l1", lambda_f0: float = 1.0):
    """Phone-level pitch loss (reference fs2.py:222-229)."""
    nonpadding = (txt_tokens != 0).astype(jnp.float32)
    err = (jnp.abs(pitch_pred[:, :, 0] - f0_ph) if pitch_loss == "l1"
           else (pitch_pred[:, :, 0] - f0_ph) ** 2)
    losses["f0"] = (err * nonpadding).sum() / nonpadding.sum() * lambda_f0


def cwt_pitch_loss(losses: Dict[str, jnp.ndarray], output: Dict, cwt_spec, f0_mean,
                   f0_std, uv, nonpadding, *, use_uv: bool = True,
                   cwt_loss: str = "l1", lambda_f0: float = 1.0,
                   lambda_uv: float = 1.0):
    """CWT-domain pitch losses (reference fs2.py:230-252)."""
    cwt_pred = output["cwt"][:, :, :10]
    if cwt_loss == "l1":
        losses["C"] = jnp.abs(cwt_pred - cwt_spec).mean() * lambda_f0
    elif cwt_loss == "l2":
        losses["C"] = ((cwt_pred - cwt_spec) ** 2).mean() * lambda_f0
    else:
        raise NotImplementedError(cwt_loss)
    if use_uv:
        bce = binary_cross_entropy_with_logits(output["cwt"][:, :, -1], uv)
        losses["uv"] = (bce * nonpadding).sum() / jnp.maximum(nonpadding.sum(),
                                                              1.0) * lambda_uv
    losses["f0_mean"] = jnp.abs(output["f0_mean"] - f0_mean).mean() * lambda_f0
    losses["f0_std"] = jnp.abs(output["f0_std"] - f0_std).mean() * lambda_f0


def energy_loss(losses: Dict[str, jnp.ndarray], energy_pred, energy, *,
                lambda_energy: float = 0.1):
    """(reference fs2.py:285-290)."""
    nonpadding = (energy != 0).astype(jnp.float32)
    err = ((energy_pred - energy) ** 2 * nonpadding).sum() / jnp.maximum(
        nonpadding.sum(), 1.0)
    losses["e"] = err * lambda_energy
