"""Isolate the K-step scan's bookkeeping: scan K=1 vs plain step vs scan K=8
(production freeze config, bf16, B=24). All pipelined, device-resident batch."""
import os
import sys
import time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import __graft_entry__ as g
from diffsinger_tpu.parallel.mesh import make_mesh
from diffsinger_tpu.training.tasks import build_task
from diffsinger_tpu.training.trainer import Trainer

hp = g._tiny_hp()
hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
          residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
          schedule_type="linear", pitch_type="frame", compute_dtype="bfloat16",
          dropout=0.1, predictor_dropout=0.5,
          fs2_ckpt="__bench_frozen__", freeze_fs2_all=True)
task = build_task(hp, vocab_size=80)
rng = np.random.RandomState(0)
batch = g._synthetic_batch(rng, b=24, t_txt=128, t_mel=1024)
trainer = Trainer(hp, task, mesh=make_mesh(num_data=1),
                  work_dir="/tmp/bench_scanov")
trainer.initialize(batch)
dev = trainer.prepare_batch(batch)

def run(tag, fn, n, per):
    fn()  # compile/warm
    _ = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    _ = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / (n * per)
    print(f"[{tag}] {dt * 1e3:.2f} ms/step", flush=True)

run("plain step", lambda: trainer.train_step(dev, jax.random.PRNGKey(0)),
    20, 1)
run("scan K=1 ", lambda: trainer.train_step_many([dev],
                                                 jax.random.PRNGKey(0)), 20, 1)
run("scan K=2 ", lambda: trainer.train_step_many([dev] * 2,
                                                 jax.random.PRNGKey(0)), 10, 2)
run("scan K=8 ", lambda: trainer.train_step_many([dev] * 8,
                                                 jax.random.PRNGKey(0)), 5, 8)
