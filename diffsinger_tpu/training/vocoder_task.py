"""HiFi-GAN vocoder training task.

The reference's configs name ``tasks.vocoder.hifigan.HifiGanTask`` but the class
is absent from the snapshot (SURVEY.md top-level facts) — vocoders there are
inference-only. This implements the standard HiFi-GAN recipe so the framework
can train its own vocoders: generator (models/hifigan.py) vs MPD+MSD
(models/hifigan_disc.py), LSGAN losses + feature matching + 45x mel L1,
alternating G/D AdamW steps, all under one jitted train step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator
from diffsinger_tpu.models.hifigan_disc import (MultiPeriodDiscriminator,
                                                MultiScaleDiscriminator,
                                                discriminator_loss,
                                                feature_loss, generator_loss)
from diffsinger_tpu.ops.mel import MelConfig, mel_spectrogram


class HifiGanTask:
    """Not a drop-in Task (two optimizers); used via its own fit loop."""

    def __init__(self, hp: Dict[str, Any]):
        self.hp = hp
        self.gen_cfg = HifiGanConfig.from_hparams(hp) if "upsample_rates" in hp \
            else HifiGanConfig(audio_sample_rate=int(hp["audio_sample_rate"]))
        self.gen = HifiGanGenerator(self.gen_cfg)
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        self.mel_cfg = MelConfig.from_hparams(hp)
        lr = float(hp.get("lr", 2e-4))
        betas = (float(hp.get("optimizer_adam_beta1", 0.8)),
                 float(hp.get("optimizer_adam_beta2", 0.99)))
        self.g_tx = optax.adamw(lr, b1=betas[0], b2=betas[1])
        self.d_tx = optax.adamw(lr, b1=betas[0], b2=betas[1])
        self._step = None

    def init_state(self, rng: jax.Array, mel: np.ndarray, wav: np.ndarray):
        g_rng, p_rng, s_rng = jax.random.split(rng, 3)
        g_params = self.gen.init(g_rng, jnp.asarray(mel))["params"]
        wav_j = jnp.asarray(wav)
        mpd_params = self.mpd.init(p_rng, wav_j, wav_j)["params"]
        msd_params = self.msd.init(s_rng, wav_j, wav_j)["params"]
        return {
            "g": g_params, "mpd": mpd_params, "msd": msd_params,
            "g_opt": self.g_tx.init(g_params),
            "d_opt": self.d_tx.init({"mpd": mpd_params, "msd": msd_params}),
        }

    def _losses(self, g_params, d_params, mel, wav):
        y_hat = self.gen.apply({"params": g_params}, mel)
        mel_hat = mel_spectrogram(y_hat, self.mel_cfg)[:, : mel.shape[1]]
        mel_loss = jnp.abs(mel_hat - mel).mean()
        p_rs, p_gs, p_fr, p_fg = self.mpd.apply({"params": d_params["mpd"]},
                                                wav, y_hat)
        s_rs, s_gs, s_fr, s_fg = self.msd.apply({"params": d_params["msd"]},
                                                wav, y_hat)
        return y_hat, mel_loss, (p_rs, p_gs, p_fr, p_fg), (s_rs, s_gs, s_fr, s_fg)

    def make_train_step(self):
        def train_step(state, mel, wav):
            d_params = {"mpd": state["mpd"], "msd": state["msd"]}

            # ---- discriminator step (generator detached)
            y_hat = jax.lax.stop_gradient(
                self.gen.apply({"params": state["g"]}, mel))

            def d_loss_fn(dp):
                p_rs, p_gs, _, _ = self.mpd.apply({"params": dp["mpd"]}, wav,
                                                  y_hat)
                s_rs, s_gs, _, _ = self.msd.apply({"params": dp["msd"]}, wav,
                                                  y_hat)
                pr, pg = discriminator_loss(p_rs, p_gs)
                sr, sg = discriminator_loss(s_rs, s_gs)
                return pr + pg + sr + sg

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_updates, d_opt = self.d_tx.update(d_grads, state["d_opt"], d_params)
            d_params = optax.apply_updates(d_params, d_updates)

            # ---- generator step
            def g_loss_fn(gp):
                _, mel_loss, (p_rs, p_gs, p_fr, p_fg), \
                    (s_rs, s_gs, s_fr, s_fg) = self._losses(gp, d_params, mel,
                                                            wav)
                fm = feature_loss(p_fr, p_fg) + feature_loss(s_fr, s_fg)
                adv = generator_loss(p_gs) + generator_loss(s_gs)
                total = adv + fm + 45.0 * mel_loss
                return total, {"mel": mel_loss, "fm": fm, "adv": adv}

            (g_loss, g_logs), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state["g"])
            g_updates, g_opt = self.g_tx.update(g_grads, state["g_opt"],
                                                state["g"])
            g_params = optax.apply_updates(state["g"], g_updates)

            new_state = {"g": g_params, "mpd": d_params["mpd"],
                         "msd": d_params["msd"], "g_opt": g_opt, "d_opt": d_opt}
            logs = {"d_loss": d_loss, "g_loss": g_loss, **g_logs}
            return new_state, logs

        return jax.jit(train_step, donate_argnums=(0,))

    def train_step(self, state, mel: np.ndarray, wav: np.ndarray):
        if self._step is None:
            self._step = self.make_train_step()
        return self._step(state, jnp.asarray(mel), jnp.asarray(wav))


def sample_segments(mel: np.ndarray, wav: np.ndarray, hop: int,
                    segment_frames: int, rng: np.random.RandomState):
    """Random aligned (mel, wav) crop for GAN training."""
    t = mel.shape[0]
    if t <= segment_frames:
        pad = segment_frames - t
        mel = np.pad(mel, ((0, pad), (0, 0)))
        wav = np.pad(wav, (0, pad * hop))
        start = 0
    else:
        start = rng.randint(0, t - segment_frames)
    mel_seg = mel[start: start + segment_frames]
    wav_seg = wav[start * hop: (start + segment_frames) * hop]
    return mel_seg, wav_seg
