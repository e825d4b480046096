"""Locate the training-step bottleneck on one chip (flagship shapes B=24 x 1024).

Methodology note (fixes the round-2 version): every timed function is reduced
to a scalar that depends on EVERY output leaf (sum of sums). The old tool
summed only ``tree_leaves(out)[0]``, which let XLA dead-code-eliminate most of
the backward pass — its stages summed to ~21 ms while the real step was 171 ms.

Stages:
  * full train_loss fwd
  * full fwd+bwd (grad wrt ALL params)        <- the honest number
  * fwd+bwd wrt denoiser params only (fs2 frozen)
  * fwd+bwd wrt fs2 params only (denoiser frozen)
  * optimizer update
  * mel2ph expansion fwd / fwd+bwd variants (gather+matmul-vjp vs one-hot)
  * embedding-table backward: scatter-add vs one-hot matmul (the round-3 fix)

Run to natural completion — killing mid-compile wedges the tunneled device.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T_TXT, T_MEL, H = 24, 128, 1024, 256
REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("| devices:", jax.devices(), flush=True)

    import __graft_entry__ as g
    from diffsinger_tpu.models.predictors import expand_by_mel2ph
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import build_optimizer

    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=B, t_txt=T_TXT, t_mel=T_MEL)
    mel2ph = jnp.asarray(batch["mel2ph"])
    enc = jnp.asarray(rng.randn(B, T_TXT, H).astype(np.float32))

    def timeit(name, fn, *args):
        def scalar(*a):
            out = fn(*a)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

        jfn = jax.jit(scalar)
        t0 = time.perf_counter()
        float(jfn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jfn(*args)
        float(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"[{name:42s}] {dt * 1000:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    # dispatch-overhead calibration (see bench_sampler_stages.py): every row
    # below carries this per-jit cost on top of its device time
    timeit("null jit (dispatch overhead)", lambda a: a + 1.0,
           jnp.zeros((8, 128), jnp.float32))

    # --- expansion fwd+bwd: custom-vjp gather vs one-hot fwd ------------------
    def exp_grad(e):
        return jax.grad(lambda x: jnp.sum(expand_by_mel2ph(x, mel2ph) ** 2))(e)

    def exp_onehot_grad(e):
        def f(x):
            oh = jax.nn.one_hot(mel2ph, T_TXT + 1, dtype=x.dtype)[:, :, 1:]
            return jnp.sum(jnp.einsum("bmt,btc->bmc", oh, x) ** 2)
        return jax.grad(f)(e)

    timeit("expand fwd (gather)", lambda e: expand_by_mel2ph(e, mel2ph), enc)
    timeit("expand fwd+bwd (gather + matmul vjp)", exp_grad, enc)
    timeit("expand fwd+bwd (one-hot both ways)", exp_onehot_grad, enc)

    # --- embedding-table backward: the round-3 fix, isolated ------------------
    from diffsinger_tpu.ops.gather import gather_rows

    table = jnp.asarray(rng.randn(300, H).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 300, size=(B, T_MEL)))
    cot = jnp.asarray(rng.randn(B, T_MEL, H).astype(np.float32))
    timeit("embed bwd scatter-add (old)",
           lambda t: jax.grad(
               lambda tt: jnp.sum(jnp.take(tt, ids, axis=0) * cot))(t), table)
    timeit("embed bwd one-hot matmul (gather_rows)",
           lambda t: jax.grad(
               lambda tt: jnp.sum(gather_rows(tt, ids) * cot))(t), table)

    # --- full train step + ablations -----------------------------------------
    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
              schedule_type="linear", pitch_type="frame", lr=0.001,
              decay_steps=50000, clip_grad_norm=1)
    if "bf16" in sys.argv:  # production compute dtype (BENCH.md training)
        hp["compute_dtype"] = "bfloat16"
    if "dropout" in sys.argv:  # flagship training rates (part of step cost)
        hp.update(dropout=0.1, predictor_dropout=0.5)
    print(f"| stages at compute_dtype={hp.get('compute_dtype', 'float32')}",
          flush=True)
    task = build_task(hp, vocab_size=80)
    params = task.init_params(jax.random.PRNGKey(0), batch)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}

    def fwd_only(p):
        total, _ = task.train_loss(p, arrays, jax.random.PRNGKey(0))
        return total

    timeit("train_loss fwd", fwd_only, params)
    timeit("train_loss fwd+bwd (ALL grads)",
           lambda p: jax.grad(fwd_only)(p), params)
    timeit("fwd+bwd denoiser grads only",
           lambda p: jax.grad(
               lambda d: fwd_only({**p, "denoiser": d}))(p["denoiser"]),
           params)
    timeit("fwd+bwd fs2 grads only",
           lambda p: jax.grad(lambda f: fwd_only({**p, "fs2": f}))(p["fs2"]),
           params)

    # --- forward breakdown (fwd measured well above its ~3.7 ms roofline) ---
    import jax.numpy as jnp2

    def fs2_fwd(p):
        return task.m.fs2.apply(
            {"params": p["fs2"]}, jnp.asarray(arrays["txt_tokens"]),
            mel2ph=jnp.asarray(arrays["mel2ph"]),
            f0=jnp.asarray(arrays["f0"]), uv=jnp.asarray(arrays["uv"]),
            skip_decoder=True, deterministic=True)

    timeit("fwd: fs2 conditioner only", fs2_fwd, params)

    cond_fix = jnp.asarray(
        np.random.RandomState(3).randn(B, T_MEL, H).astype(np.float32))

    def diff_fwd(p):
        t = jax.random.randint(jax.random.PRNGKey(1), (B,), 0,
                               task.m.gd.cfg.k_step)
        noise = jax.random.normal(jax.random.PRNGKey(2), (B, T_MEL, 80))
        return task.m.gd.training_loss(p["denoiser"],
                                       jnp.asarray(arrays["mels"]), t,
                                       cond_fix, noise)

    timeit("fwd: diffusion branch only", diff_fwd, params)

    ret_fix = jax.jit(fs2_fwd)(params)
    ret_fix = jax.tree_util.tree_map(
        lambda x: jnp2.asarray(np.asarray(x)), ret_fix)

    def aux_only(p):
        losses = {}
        task._aux_losses(losses, ret_fix, arrays,
                         jnp.asarray(arrays["txt_tokens"]),
                         jnp.asarray(arrays["mel2ph"]),
                         jnp.asarray(arrays["f0"]), jnp.asarray(arrays["uv"]),
                         jnp.asarray(arrays["energy"]), fs2_params=p["fs2"])
        return sum(losses.values())

    timeit("fwd: aux losses only (fixed ret)", aux_only, params)

    hp_nopitch = dict(hp, use_pitch_embed=False)
    task_np = build_task(hp_nopitch, vocab_size=80)
    params_np = task_np.init_params(jax.random.PRNGKey(0), batch)
    timeit("fwd: full, use_pitch_embed=False",
           lambda p: task_np.train_loss(p, arrays, jax.random.PRNGKey(0))[0],
           params_np)
    timeit("fwd+bwd: full, use_pitch_embed=False",
           lambda p: jax.grad(lambda q: task_np.train_loss(
               q, arrays, jax.random.PRNGKey(0))[0])(p), params_np)

    # optimizer update alone (trainable subtree, as the Trainer runs it)
    from diffsinger_tpu.training.tasks import trainable_mask
    from diffsinger_tpu.training.trainer import partition_params

    mask = trainable_mask(params, task.trainable_rule())
    pt, _ = partition_params(params, mask)
    tx = build_optimizer(hp, pt)
    opt_state = tx.init(pt)
    grads = jax.jit(lambda p: jax.grad(fwd_only)(p))(params)
    grads_t, _ = partition_params(grads, mask)

    def opt_step(g_, s_, p_):
        import optax
        u, s2 = tx.update(g_, s_, p_)
        return optax.apply_updates(p_, u)

    timeit("optimizer update (clip+adamw)", opt_step, grads_t, opt_state, pt)


if __name__ == "__main__":
    main()
