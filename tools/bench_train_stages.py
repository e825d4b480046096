"""Locate the training-step bottleneck on one chip (B=24 x 1024, MFU ~7%).

Times fwd+bwd of each component in its own jit at the training shapes:
loss-like scalar -> grad wrt inputs/params. Prime suspects: backward of the
gather-based mel2ph expansion (TPU scatter-add), predictor stacks on T_mel,
aux losses, optimizer update.

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
    from diffsinger_tpu.training.trainer import Trainer, build_optimizer

    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=B, t_txt=T_TXT, t_mel=T_MEL)
    mel2ph = jnp.asarray(batch["mel2ph"])
    enc = jnp.asarray(rng.randn(B, T_TXT, H).astype(np.float32))

    def timeit(name, fn, *args):
        jfn = jax.jit(lambda *a: jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0]))
        t0 = time.perf_counter()
        float(jfn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jfn(*args)
        float(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"[{name:38s}] {dt * 1000:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    # --- expansion fwd+bwd: gather vs one-hot matmul -------------------------
    def exp_gather_grad(e):
        return jax.grad(lambda x: jnp.sum(expand_by_mel2ph(x, mel2ph) ** 2))(e)

    def exp_onehot_grad(e):
        def f(x):
            oh = jax.nn.one_hot(mel2ph, T_TXT + 1, dtype=x.dtype)[:, :, 1:]
            return jnp.sum(jnp.einsum("bmt,btc->bmc", oh, x) ** 2)
        return jax.grad(f)(e)

    timeit("expand gather fwd", lambda e: expand_by_mel2ph(e, mel2ph), enc)
    timeit("expand gather fwd+bwd (scatter)", exp_gather_grad, enc)
    timeit("expand one-hot fwd+bwd (matmul)", exp_onehot_grad, enc)

    # --- full train step + ablations -----------------------------------------
    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
              schedule_type="linear", pitch_type="frame", lr=0.001,
              decay_steps=50000, clip_grad_norm=1)
    task = build_task(hp, vocab_size=80)
    params = task.init_params(jax.random.PRNGKey(0), batch)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}

    def fwd_only(p):
        total, _ = task.train_loss(p, arrays, jax.random.PRNGKey(0))
        return total

    def fwd_bwd(p):
        return jax.grad(fwd_only)(p)

    timeit("task.train_loss fwd", fwd_only, params)
    timeit("task.train_loss fwd+bwd", fwd_bwd, params)

    # optimizer update alone
    tx = build_optimizer(hp, params, task.trainable_rule())
    opt_state = tx.init(params)
    grads = jax.jit(fwd_bwd)(params)

    def opt_step(g_, s_, p_):
        import optax
        u, s2 = tx.update(g_, s_, p_)
        return optax.apply_updates(p_, u)

    timeit("optimizer update (clip+adamw+mask)", opt_step, grads, opt_state,
           params)

    # aux losses alone (fwd+bwd wrt a decoder_inp-shaped tensor is awkward;
    # time the full loss minus diffusion by zeroing K... instead: fwd+bwd of
    # just the diffusion branch with a fixed cond)
    cond = jnp.asarray(rng.randn(B, T_MEL, H).astype(np.float32))

    def diff_only(p):
        t = jax.random.randint(jax.random.PRNGKey(1), (B,), 0,
                               task.m.gd.cfg.k_step)
        noise = jax.random.normal(jax.random.PRNGKey(2), (B, T_MEL, 80))
        return task.m.gd.training_loss(p["denoiser"],
                                       jnp.asarray(batch["mels"]), t, cond,
                                       noise)

    timeit("diffusion branch fwd+bwd", lambda p: jax.grad(diff_only)(p), params)


if __name__ == "__main__":
    main()
