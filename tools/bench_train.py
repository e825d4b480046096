"""Training-step throughput on the real chip (diffusion task, flagship shapes)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import __graft_entry__ as g
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer

    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
              schedule_type="linear", pitch_type="frame", lr=0.001,
              decay_steps=50000, clip_grad_norm=1)
    # variants: bench_train.py [B] [bf16] [nodrop] [pallas] [freeze]
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    if "bf16" in sys.argv:
        hp["compute_dtype"] = "bfloat16"
    if "pallas" in sys.argv:
        # fused training stack with the hand-written backward kernel
        hp["use_pallas_diffnet_train"] = True
    if "condpre" in sys.argv:
        # hoist the frozen-FS2 conditioner out of the K-step scan as one
        # [K*B]-batched call (the r4 named lever; implies freeze)
        hp["cond_precompute"] = True
    if "freeze" in sys.argv or "condpre" in sys.argv:
        # DiffSinger production semantics (usr/diffsinger_task.py:60-64): the
        # whole FS2 is frozen. Round-4 structural freezing means XLA never
        # builds the FS2 backward — this flag measures that saving. (The ckpt
        # path doesn't exist; warm start is skipped with a warning, which is
        # fine — the bench measures step cost, not convergence.)
        hp["fs2_ckpt"] = "__bench_frozen__"
        hp["freeze_fs2_all"] = True
    if "nodrop" not in sys.argv:
        # flagship lj_ds_beta6 training rates (the honest workload; threefry
        # mask generation is part of the real step cost)
        hp["dropout"] = 0.1
        hp["predictor_dropout"] = 0.5
    print(f"[train] B={B} compute_dtype={hp.get('compute_dtype', 'float32')}",
          flush=True)
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    T_MEL = 1024  # ~max_tokens 24k at 1024-frame bucket (B=24)
    batch = g._synthetic_batch(rng, b=B, t_txt=128, t_mel=T_MEL)
    mesh = make_mesh(num_data=1)
    trainer = Trainer(hp, task, mesh=mesh, work_dir="/tmp/bench_train")
    t0 = time.perf_counter()
    trainer.initialize(batch)
    trainer.train_step(batch, jax.random.PRNGKey(0))
    jax.block_until_ready(trainer.params)
    _ = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
    print(f"[train] init+compile {time.perf_counter() - t0:.1f}s", flush=True)
    n = 10
    # cold: per-step host->device batch copy (through the dev tunnel this is
    # ~10 MB over HTTP and dominates; production PCIe makes it ~1 ms)
    t0 = time.perf_counter()
    for i in range(n):
        losses = trainer.train_step(batch, jax.random.PRNGKey(i))
    _ = float(losses["total_loss"])  # sync
    _ = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0].ravel()[:1])
    dt_cold = (time.perf_counter() - t0) / n
    print(f"[train] cold (per-step H2D copy): {dt_cold * 1000:.1f} ms/step",
          flush=True)
    # pipelined: batch device-resident (what Trainer.fit's prefetch achieves —
    # the copy of batch k+1 overlaps step k)
    dev_batch = trainer.prepare_batch(batch)
    t0 = time.perf_counter()
    for i in range(n):
        losses = trainer.train_step(dev_batch, jax.random.PRNGKey(i))
    _ = float(losses["total_loss"])
    _ = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / n
    frames = B * T_MEL
    from diffsinger_tpu.ops.flops import mfu, train_step_flops

    flops = train_step_flops(hp, B, 128, T_MEL)
    # bf16-peak normalization: default-precision f32 matmuls run the MXU at
    # bf16 input rate (ops/flops.py note)
    print(f"[train] {dt * 1000:.1f} ms/step  {frames / dt:.0f} mel-frames/s  "
          f"({frames} frames/batch)  {flops / 1e9:.1f} GFLOP/step  "
          f"MFU {100 * mfu(flops, dt, 'bf16'):.1f}%", flush=True)
    # 160k-update reference budget (usr/configs/lj_ds_beta6.yaml:34) at this rate:
    print(f"[train] 160k updates => {160000 * dt / 3600:.2f} h on one chip",
          flush=True)

    # K-steps-per-call scan (train_steps_per_call): amortizes the per-call
    # dispatch of ~1000 param/opt buffer handles
    K = 8
    trainer.train_step_many([dev_batch] * K, jax.random.PRNGKey(100))  # compile
    _ = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0].ravel()[:1])
    t0 = time.perf_counter()
    for i in range(3):
        out = trainer.train_step_many([dev_batch] * K, jax.random.PRNGKey(i))
    _ = float(out["total_loss"])
    _ = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0].ravel()[:1])
    dt_scan = (time.perf_counter() - t0) / (3 * K)
    print(f"[train] scan K={K}: {dt_scan * 1000:.1f} ms/step  "
          f"{frames / dt_scan:.0f} mel-frames/s  "
          f"MFU {100 * mfu(flops, dt_scan, 'bf16'):.1f}%  "
          f"(160k => {160000 * dt_scan / 3600:.2f} h)", flush=True)


if __name__ == "__main__":
    main()
