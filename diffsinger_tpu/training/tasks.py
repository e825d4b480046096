"""Task layer: experiment definitions joining model, data, losses and inference.

Capability parity with the reference task classes (SURVEY.md §2.4):
  * ``fs2``       — FastSpeech2Task (tasks/tts/fs2.py): mel l1/ssim + dur + pitch
                    + energy losses.
  * ``diff``      — DiffSpeechTask / DiffSingerTask / DiffSingerOfflineTask
                    (usr/diffspeech_task.py, usr/diffsinger_task.py:30-234):
                    diffusion mel loss + dur/pitch/energy; fs2 conditioner frozen
                    entirely (fs2_ckpt, DiffSinger) or except predictors
                    (DiffSpeech).
  * ``midi``      — DiffSingerMIDITask (usr/diffsinger_task.py:273-389): MIDI
                    encoder inputs, word-boundary dur loss, switch_midi2f0_step
                    curriculum.
  * ``aux_midi``  — AuxDecoderMIDITask (usr/diffsinger_task.py:392-490).
  * ``pe``        — PitchExtractionTask (tasks/tts/pe.py:101-155).

Everything is expressed as pure functions over a params pytree
``{"fs2": ..., "denoiser": ...}``; the reference's requires_grad freezing becomes
an optax trainable-mask over param paths.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.models.diffnet import DiffNet
from diffsinger_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
from diffsinger_tpu.models.fs2 import FS2Config, FastSpeech2
from diffsinger_tpu.models.pe import PEConfig, PitchExtractor
from diffsinger_tpu.training import losses as L


def _spk_input(hp, batch):
    return batch.get("spk_ids") if hp.get("use_spk_id") else batch.get("spk_embed")


def make_is_sil(txt_tokens: jnp.ndarray, sil_ids: Tuple[int, ...]) -> jnp.ndarray:
    if not sil_ids:
        return jnp.zeros_like(txt_tokens, jnp.float32)
    sil = jnp.asarray(sil_ids)
    return (txt_tokens[:, :, None] == sil[None, None, :]).any(-1).astype(jnp.float32)


def path_contains(path: Tuple, needle: str) -> bool:
    return any(needle in str(k) for k in path)


def trainable_mask(params, rule: Callable[[Tuple], bool]):
    """Map each param path to True (train) / False (freeze)."""
    flat = flax.traverse_util.flatten_dict(params)
    mask = {p: bool(rule(p)) for p in flat}
    return flax.traverse_util.unflatten_dict(mask)


@dataclasses.dataclass
class TaskModules:
    hp: Dict[str, Any]
    fs2: FastSpeech2
    diffnet: Optional[DiffNet]
    gd: Optional[GaussianDiffusion]
    pe: Optional[PitchExtractor] = None


def build_modules(hp: Dict[str, Any], vocab_size: int) -> TaskModules:
    fs2_cfg = FS2Config.from_hparams(hp, vocab_size)
    fs2 = FastSpeech2(fs2_cfg)
    diffnet = gd = None
    task = hp.get("task_type", "diff")
    if task in ("diff", "midi"):
        decoder_type = hp.get("diff_decoder_type", "wavenet")
        compute_dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
            str(hp.get("compute_dtype", "float32")), None)
        if decoder_type == "wavenet":
            diffnet = DiffNet(
                in_dims=int(hp.get("audio_num_mel_bins", 80)),
                encoder_hidden=int(hp["hidden_size"]),
                residual_layers=int(hp.get("residual_layers", 20)),
                residual_channels=int(hp.get("residual_channels", 256)),
                dilation_cycle_length=int(hp.get("dilation_cycle_length", 1)),
                compute_dtype=compute_dtype)
        elif decoder_type == "fft":
            from diffsinger_tpu.models.fft_denoiser import FFTDenoiser

            diffnet = FFTDenoiser(
                in_dims=int(hp.get("audio_num_mel_bins", 80)),
                hidden_size=int(hp["hidden_size"]),
                residual_channels=int(hp.get("residual_channels", 256)),
                num_layers=int(hp.get("dec_layers", 4)),
                ffn_kernel_size=int(hp.get("dec_ffn_kernel_size", 9)),
                num_heads=int(hp.get("num_heads", 2)),
                dropout=0.0, compute_dtype=compute_dtype)
        else:
            raise NotImplementedError(f"diff_decoder_type={decoder_type}")
        dcfg = DiffusionConfig.from_hparams(hp)

        use_pallas = bool(hp.get("use_pallas_diffnet", False))
        dilations = tuple(
            2 ** (i % int(hp.get("dilation_cycle_length", 1)))
            for i in range(int(hp.get("residual_layers", 20))))

        def denoise_fn(params, x, t, cond):
            # cond: raw [B, T, H] (training), precomputed per-layer projections
            # [L, B, T, 2C], or a pack_sampling_ctx dict (sampling: projections
            # AND packed/cast weights hoisted out of the reverse scan)
            if isinstance(cond, dict):
                from diffsinger_tpu.ops.diffnet_stack import \
                    diffnet_forward_pallas

                return diffnet_forward_pallas(params, x, t, cond,
                                              dilations=dilations,
                                              compute_dtype=compute_dtype)
            if cond.ndim == 4:
                if use_pallas and decoder_type == "wavenet":
                    from diffsinger_tpu.ops.diffnet_stack import \
                        diffnet_forward_pallas

                    return diffnet_forward_pallas(params, x, t, cond,
                                                  dilations=dilations)
                return diffnet.apply({"params": params}, x, t, cond_proj=cond)
            if bool(hp.get("use_pallas_diffnet_train", False)) \
                    and decoder_type == "wavenet" \
                    and (compute_dtype is not None
                         or jax.default_backend() == "cpu"):
                # bf16-only on real TPU: the all-f32 kernels exceed the 16 MB
                # VMEM budget (ops/diffnet_train.py); f32 configs keep XLA
                # training path: fused stack with the hand-written backward
                # kernel (ops/diffnet_train.py); interpret-mode on CPU so the
                # same config runs in tests
                from diffsinger_tpu.ops.diffnet_train import \
                    diffnet_train_forward

                return diffnet_train_forward(
                    params, x, t, cond, dilations=dilations,
                    interpret=jax.default_backend() == "cpu",
                    compute_dtype=compute_dtype,
                    save_dtype=(jnp.bfloat16 if compute_dtype is not None
                                else jnp.float32))
            return diffnet.apply({"params": params}, x, t, cond)

        gd = GaussianDiffusion(dcfg, denoise_fn)
    return TaskModules(hp=hp, fs2=fs2, diffnet=diffnet, gd=gd)


class DiffSingerTask:
    """Diffusion text/MIDI-to-mel task (covers DiffSpeech, DiffSinger, MIDI
    variants via hparams, like the reference's class family does via subclassing)."""

    def __init__(self, hp: Dict[str, Any], vocab_size: int,
                 sil_ids: Tuple[int, ...] = ()):
        hp = dict(hp)
        hp.setdefault("task_type", "midi" if hp.get("use_midi") else "diff")
        self.hp = hp
        self.m = build_modules(hp, vocab_size)
        self.sil_ids = tuple(sil_ids)
        self.use_midi = bool(hp.get("use_midi", False))

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array, batch: Dict[str, np.ndarray]):
        hp = self.hp
        fs2_rng, dn_rng = jax.random.split(rng)
        kwargs = self._fs2_kwargs(batch)
        fs2_vars = self.m.fs2.init(fs2_rng, jnp.asarray(batch["txt_tokens"]),
                                   mel2ph=jnp.asarray(batch["mel2ph"]),
                                   skip_decoder=False, **kwargs)
        b, t_mel, m = batch["mels"].shape
        dn_vars = self.m.diffnet.init(
            dn_rng, jnp.zeros((b, t_mel, m)), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, t_mel, hp["hidden_size"])))
        return {"fs2": fs2_vars["params"], "denoiser": dn_vars["params"]}

    def _fs2_kwargs(self, batch) -> Dict[str, Any]:
        kw = {}
        if self.use_midi:
            kw["pitch_midi"] = jnp.asarray(batch["pitch_midi"])
            if batch.get("midi_dur") is not None:
                kw["midi_dur"] = jnp.asarray(batch["midi_dur"])
            if batch.get("is_slur") is not None:
                kw["is_slur"] = jnp.asarray(batch["is_slur"])
        spk = _spk_input(self.hp, batch)
        if spk is not None:
            kw["spk_embed"] = jnp.asarray(spk)
        return kw

    # ------------------------------------------------------------------ loss
    def _cond_forward(self, fs2_params, batch, drop_rng,
                      deterministic: bool, use_gt_f0: bool):
        """The training-mode FS2 conditioner forward (skip_decoder=True) on a
        batch dict — shared by ``train_loss`` and ``precompute_scan_cond``."""
        hp = self.hp
        txt_tokens = jnp.asarray(batch["txt_tokens"])
        mel2ph = jnp.asarray(batch["mel2ph"])
        f0 = jnp.asarray(batch["f0"])
        uv = jnp.asarray(batch["uv"])
        energy = jnp.asarray(batch["energy"])
        f0_in, uv_in = (f0, uv) if use_gt_f0 else (None, None)
        variables = {"params": fs2_params}
        if hp.get("pitch_type") == "cwt":
            # f0 target derived from gt cwt (reference fs2.py task :121-123)
            f0_use = self.m.fs2.apply(
                variables, jnp.asarray(batch["cwt_spec"]),
                jnp.asarray(batch["f0_mean"]), jnp.asarray(batch["f0_std"]),
                method=FastSpeech2.cwt2f0_norm)
        else:
            f0_use = f0_in
        return self.m.fs2.apply(
            variables, txt_tokens, mel2ph=mel2ph, f0=f0_use, uv=uv_in,
            energy=energy if hp.get("use_energy_embed") else None,
            skip_decoder=True, deterministic=deterministic,
            rngs=None if deterministic else {"dropout": drop_rng},
            **self._fs2_kwargs(batch))

    def fs2_fully_frozen(self) -> bool:
        """True when the trainable rule freezes the WHOLE fs2 subtree (the
        DiffSinger production semantics, usr/diffsinger_task.py:60-64)."""
        hp = self.hp
        return bool(hp.get("fs2_ckpt")) and bool(
            hp.get("freeze_fs2_all",
                   hp.get("task_cls", "").find("DiffSpeech") < 0))

    def precompute_scan_cond(self, params, stacked, rng,
                             use_gt_f0: bool = True,
                             deterministic: bool = False):
        """One BATCHED FS2 call for all K scan batches (``cond_precompute``):
        with the conditioner structurally frozen its forward carries no
        gradient state, so the K per-step forwards collapse into a single
        [K*B]-batch call hoisted out of the ``lax.scan`` — better MXU
        utilization and K-1 fewer kernel launches. Returns the fs2 ret tree
        with every leaf reshaped back to [K, B, ...] for per-step slicing."""
        k, b = stacked["txt_tokens"].shape[:2]
        flat = {kk: jnp.asarray(v).reshape((k * b,) + v.shape[2:])
                for kk, v in stacked.items()
                if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[0] == k}
        ret = self._cond_forward(params["fs2"], flat, rng, deterministic,
                                 use_gt_f0)
        return {kk: v.reshape((k, b) + v.shape[1:]) for kk, v in ret.items()
                if hasattr(v, "shape") and v.shape[:1] == (k * b,)}

    def train_loss(self, params, batch, rng, global_step=None,
                   deterministic: bool = False, use_gt_f0: bool = True,
                   fs2_ret=None):
        """Returns (total_loss, loss_dict). Mirrors run_model of the reference
        tasks (usr/diffspeech_task.py:48-78, usr/diffsinger_task.py:273-314).

        ``use_gt_f0`` implements the switch_midi2f0_step curriculum
        (usr/diffsinger_task.py:284-289) as a *static* flag the trainer flips
        once when global_step crosses the threshold (one recompile).
        ``fs2_ret`` is an optional precomputed conditioner forward (see
        ``precompute_scan_cond``) — only sound when fs2 is fully frozen.
        """
        hp = self.hp
        txt_tokens = jnp.asarray(batch["txt_tokens"])
        target = jnp.asarray(batch["mels"])
        mel2ph = jnp.asarray(batch["mel2ph"])
        f0 = jnp.asarray(batch["f0"])
        uv = jnp.asarray(batch["uv"])
        energy = jnp.asarray(batch["energy"])

        rng, drop_rng, t_rng, noise_rng = jax.random.split(rng, 4)
        losses: Dict[str, jnp.ndarray] = {}

        if fs2_ret is not None:
            ret = fs2_ret
        else:
            ret = self._cond_forward(params["fs2"], batch, drop_rng,
                                     deterministic, use_gt_f0)
        cond = ret["decoder_inp"]

        b = txt_tokens.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, self.m.gd.cfg.k_step)
        noise = jax.random.normal(noise_rng, target.shape)
        losses["mel"] = self.m.gd.training_loss(params["denoiser"], target, t, cond,
                                                noise)

        self._aux_losses(losses, ret, batch, txt_tokens, mel2ph, f0, uv, energy,
                         fs2_params=params["fs2"])
        total = sum(losses.values())
        return total, losses

    def _aux_losses(self, losses, ret, batch, txt_tokens, mel2ph, f0, uv, energy,
                    fs2_params=None):
        hp = self.hp
        if self.use_midi:
            L.midi_duration_loss(
                losses, ret["dur"], mel2ph, txt_tokens,
                jnp.asarray(batch["word_boundary"]),
                lambda_ph_dur=hp.get("lambda_ph_dur", 1.0),
                lambda_word_dur=hp.get("lambda_word_dur", 1.0),
                lambda_sent_dur=hp.get("lambda_sent_dur", 1.0))
        else:
            is_sil = make_is_sil(txt_tokens, self.sil_ids)
            dur_loss = hp.get("dur_loss", "mse")
            crf_params = (fs2_params["dur_predictor"]["crf"]
                          if dur_loss == "crf" else None)
            L.duration_losses(losses, ret["dur"], mel2ph, txt_tokens, is_sil,
                              lambda_ph_dur=hp.get("lambda_ph_dur", 1.0),
                              lambda_word_dur=hp.get("lambda_word_dur", 1.0),
                              lambda_sent_dur=hp.get("lambda_sent_dur", 1.0),
                              dur_loss=dur_loss, crf_params=crf_params)
        if hp.get("use_pitch_embed"):
            nonpadding = (mel2ph != 0).astype(jnp.float32)
            if hp.get("pitch_type") == "cwt":
                L.cwt_pitch_loss(losses, ret, jnp.asarray(batch["cwt_spec"]),
                                 jnp.asarray(batch["f0_mean"]),
                                 jnp.asarray(batch["f0_std"]), uv, nonpadding,
                                 use_uv=hp.get("use_uv", True),
                                 cwt_loss=hp.get("cwt_loss", "l1"),
                                 lambda_f0=hp.get("lambda_f0", 1.0),
                                 lambda_uv=hp.get("lambda_uv", 1.0))
            elif hp.get("pitch_type") == "ph":
                L.ph_pitch_loss(losses, ret["pitch_pred"], jnp.asarray(batch["f0"]),
                                txt_tokens, pitch_loss=hp.get("pitch_loss", "l1"),
                                lambda_f0=hp.get("lambda_f0", 1.0))
            else:
                L.f0_loss(losses, ret["pitch_pred"], f0, uv, nonpadding,
                          use_uv=hp.get("use_uv", True),
                          pitch_loss=hp.get("pitch_loss", "l1"),
                          lambda_f0=hp.get("lambda_f0", 1.0),
                          lambda_uv=hp.get("lambda_uv", 1.0))
        if hp.get("use_energy_embed"):
            L.energy_loss(losses, ret["energy_pred"], energy,
                          lambda_energy=hp.get("lambda_energy", 0.1))

    # ------------------------------------------------------------------ infer
    def inference(self, params, batch, rng, t_mel: Optional[int] = None,
                  use_gt_dur: bool = True, use_gt_f0: bool = False):
        """Diffusion inference (reference GaussianDiffusion.forward infer branch
        :248-275): full FS2 forward -> fs2_mel boost (or gaussian start) ->
        reverse scan -> denorm + mel2ph masking."""
        hp = self.hp
        txt_tokens = jnp.asarray(batch["txt_tokens"])
        mel2ph = jnp.asarray(batch["mel2ph"]) if use_gt_dur and \
            batch.get("mel2ph") is not None else None
        f0 = jnp.asarray(batch["f0"]) if use_gt_f0 else None
        uv = jnp.asarray(batch["uv"]) if use_gt_f0 else None
        if t_mel is None:
            t_mel = int(batch["mels"].shape[1]) if batch.get("mels") is not None \
                else int(hp["max_frames"])
        offline = bool(hp.get("offline_boost")) and batch.get("fs2_mels") is not None
        ret = self.m.fs2.apply(
            {"params": params["fs2"]}, txt_tokens, mel2ph=mel2ph, f0=f0, uv=uv,
            skip_decoder=offline, infer=True, t_mel=t_mel,
            **self._fs2_kwargs(batch))
        cond = ret["decoder_inp"]
        if offline:
            # OfflineGaussianDiffusion: boost mel precomputed by FFT-Singer
            # (reference shallow_diffusion_tts.py:291-323)
            fs2_mel = jnp.asarray(batch["fs2_mels"])
        else:
            fs2_mel = ret["mel_out"]
        ret["fs2_mel"] = fs2_mel
        tgt_nonpadding = (ret["mel2ph"] > 0).astype(jnp.float32)
        # hoist the step-invariant conditioner projections out of the scan
        # (WaveNet denoiser only; the FFT denoiser consumes cond directly)
        cond_ctx = None
        if isinstance(self.m.diffnet, DiffNet):
            from diffsinger_tpu.ops.diffnet_stack import precompute_cond_packed

            cdt = jnp.bfloat16 if str(
                hp.get("compute_dtype", "float32")) == "bfloat16" \
                and hp.get("use_pallas_diffnet") else None
            cond_ctx = precompute_cond_packed(
                params["denoiser"], cond,
                int(hp.get("residual_layers", 20)), compute_dtype=cdt)
            if hp.get("use_pallas_diffnet"):
                # also hoist weight packing (+ bf16 cast: halves the dominant
                # per-step HBM stream, the [L, B, T, 2C] cond tensor; the
                # cond itself was already cast pre-transpose above)
                from diffsinger_tpu.ops.diffnet_stack import pack_sampling_ctx

                cond_ctx = pack_sampling_ctx(
                    params["denoiser"], cond_ctx,
                    int(hp.get("residual_layers", 20)), compute_dtype=cdt)
        ret["mel_out"] = self.m.gd.sample(params["denoiser"], cond, rng,
                                          fs2_mel=fs2_mel,
                                          tgt_nonpadding=tgt_nonpadding,
                                          cond_ctx=cond_ctx)
        return ret

    # ------------------------------------------------------------------ freeze
    def trainable_rule(self) -> Callable[[Tuple], bool]:
        """Freezing policy (reference usr/diffspeech_task.py:33-38 freezes all
        non-predictor FS2 params; usr/diffsinger_task.py:60-64 freezes all of
        FS2). Active only when warm-started from fs2_ckpt."""
        hp = self.hp
        if not hp.get("fs2_ckpt"):
            return lambda path: True
        freeze_all_fs2 = self.fs2_fully_frozen()
        def rule(path):
            if path[0] != "fs2":
                return True
            if freeze_all_fs2:
                return False
            return path_contains(path, "predictor")
        return rule


class FastSpeech2Task:
    """Aux/FFT-Singer task (reference tasks/tts/fs2.py + AuxDecoderMIDITask)."""

    def __init__(self, hp: Dict[str, Any], vocab_size: int,
                 sil_ids: Tuple[int, ...] = ()):
        hp = dict(hp)
        hp["task_type"] = "fs2"
        self.hp = hp
        self.m = build_modules(hp, vocab_size)
        self.sil_ids = tuple(sil_ids)
        self.use_midi = bool(hp.get("use_midi", False))
        self._diff = DiffSingerTask.__new__(DiffSingerTask)  # reuse helpers
        self._diff.hp = hp
        self._diff.use_midi = self.use_midi
        self._diff.sil_ids = self.sil_ids
        self._diff.m = self.m

    def init_params(self, rng, batch):
        fs2_vars = self.m.fs2.init(rng, jnp.asarray(batch["txt_tokens"]),
                                   mel2ph=jnp.asarray(batch["mel2ph"]),
                                   **self._diff._fs2_kwargs(batch))
        return {"fs2": fs2_vars["params"]}

    def train_loss(self, params, batch, rng, global_step=0,
                   deterministic: bool = False):
        hp = self.hp
        txt_tokens = jnp.asarray(batch["txt_tokens"])
        target = jnp.asarray(batch["mels"])
        mel2ph = jnp.asarray(batch["mel2ph"])
        f0 = jnp.asarray(batch["f0"])
        uv = jnp.asarray(batch["uv"])
        energy = jnp.asarray(batch["energy"])
        rng, drop_rng = jax.random.split(rng)
        variables = {"params": params["fs2"]}
        if hp.get("pitch_type") == "cwt":
            f0_use = self.m.fs2.apply(variables, jnp.asarray(batch["cwt_spec"]),
                                      jnp.asarray(batch["f0_mean"]),
                                      jnp.asarray(batch["f0_std"]),
                                      method=FastSpeech2.cwt2f0_norm)
        else:
            f0_use = f0
        ret = self.m.fs2.apply(
            variables, txt_tokens, mel2ph=mel2ph, f0=f0_use, uv=uv,
            energy=energy if hp.get("use_energy_embed") else None,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": drop_rng},
            **self._diff._fs2_kwargs(batch))
        losses: Dict[str, jnp.ndarray] = {}
        L.add_mel_losses(losses, ret["mel_out"], target,
                         hp.get("mel_loss", "l1"))
        self._diff._aux_losses(losses, ret, batch, txt_tokens, mel2ph, f0, uv,
                               energy, fs2_params=params["fs2"])
        total = sum(losses.values())
        return total, losses

    def inference(self, params, batch, rng, t_mel=None, use_gt_dur=True,
                  use_gt_f0=False):
        hp = self.hp
        txt_tokens = jnp.asarray(batch["txt_tokens"])
        mel2ph = jnp.asarray(batch["mel2ph"]) if use_gt_dur and \
            batch.get("mel2ph") is not None else None
        f0 = jnp.asarray(batch["f0"]) if use_gt_f0 else None
        uv = jnp.asarray(batch["uv"]) if use_gt_f0 else None
        if t_mel is None:
            t_mel = int(batch["mels"].shape[1]) if batch.get("mels") is not None \
                else int(hp["max_frames"])
        return self.m.fs2.apply({"params": params["fs2"]}, txt_tokens,
                                mel2ph=mel2ph, f0=f0, uv=uv, infer=True,
                                t_mel=t_mel, **self._diff._fs2_kwargs(batch))

    def trainable_rule(self):
        return lambda path: True


class PitchExtractionTask:
    """PE training (reference tasks/tts/pe.py:101-155): frame pitch loss only."""

    def __init__(self, hp: Dict[str, Any], vocab_size: int = 0, sil_ids=()):
        self.hp = dict(hp)
        self.pe = PitchExtractor(PEConfig.from_hparams(hp))

    def init_params(self, rng, batch):
        variables = self.pe.init(rng, jnp.asarray(batch["mels"]), train=True)
        return {"pe": variables["params"], "batch_stats": variables.get(
            "batch_stats", {})}

    def train_loss(self, params, batch, rng, global_step=0,
                   deterministic: bool = False):
        hp = self.hp
        mels = jnp.asarray(batch["mels"])
        f0 = jnp.asarray(batch["f0"])
        uv = jnp.asarray(batch["uv"])
        mel2ph = jnp.asarray(batch["mel2ph"])
        variables = {"params": params["pe"], "batch_stats": params["batch_stats"]}
        ret, updates = self.pe.apply(variables, mels, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": rng})
        losses: Dict[str, jnp.ndarray] = {}
        nonpadding = (mel2ph != 0).astype(jnp.float32)
        L.f0_loss(losses, ret["pitch_pred"], f0, uv, nonpadding,
                  use_uv=hp.get("use_uv", True),
                  pitch_loss=hp.get("pitch_loss", "l1"),
                  lambda_f0=hp.get("lambda_f0", 1.0),
                  lambda_uv=hp.get("lambda_uv", 1.0))
        total = sum(losses.values())
        # BatchNorm running stats ride along as an aux (non-differentiated) output
        return total, {**losses, "_new_state": updates["batch_stats"]}

    def inference(self, params, batch, rng=None, **kw):
        variables = {"params": params["pe"], "batch_stats": params["batch_stats"]}
        return self.pe.apply(variables, jnp.asarray(batch["mels"]), train=False)

    def trainable_rule(self):
        return lambda path: path[0] != "batch_stats"


TASK_REGISTRY = {
    # reference task_cls dotted paths -> our task classes
    "tasks.tts.fs2.FastSpeech2Task": FastSpeech2Task,
    "usr.diffsinger_task.AuxDecoderMIDITask": FastSpeech2Task,
    "usr.task.DiffFsTask": DiffSingerTask,
    "usr.diffspeech_task.DiffSpeechTask": DiffSingerTask,
    "usr.diffsinger_task.DiffSingerTask": DiffSingerTask,
    "usr.diffsinger_task.DiffSingerOfflineTask": DiffSingerTask,
    "usr.diffsinger_task.DiffSingerMIDITask": DiffSingerTask,
    "tasks.tts.pe.PitchExtractionTask": PitchExtractionTask,
    # short names
    "fs2": FastSpeech2Task,
    "diff": DiffSingerTask,
    "pe": PitchExtractionTask,
}


def build_task(hp: Dict[str, Any], vocab_size: int, sil_ids=()):
    cls = TASK_REGISTRY.get(hp.get("task_cls", "diff"))
    if cls is None:
        raise KeyError(f"unknown task_cls {hp.get('task_cls')}")
    return cls(hp, vocab_size, sil_ids)
