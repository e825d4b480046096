"""Two-process ``jax.distributed`` CPU test (round-1 VERDICT item 6).

Spawns 2 real processes (4 virtual CPU devices each, gloo collectives,
coordinator on localhost), runs 3 training steps with per-host batch slicing
through ``make_array_from_process_local_data`` (parallel/mesh.py shard_batch),
and asserts loss equality with the single-process 8-device run — the semantics
the reference gets from NCCL DDP (tasks/base_task.py:277-291,
tasks/tts/tts.py:85-88).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np

from tests.helpers import make_synthetic_dataset, tiny_hparams

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = 3


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses(data_dir, tmp_path):
    from diffsinger_tpu.data.dataset import FastSpeechDataset
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer

    hp = tiny_hparams(data_dir, work_dir=str(tmp_path / "exp_single"))
    ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh(num_data=8))
    batch = next(ds.iter_batches())
    trainer.initialize(batch)
    return [float(trainer.train_step(batch, jax.random.PRNGKey(i))["total_loss"])
            for i in range(STEPS)]


def test_two_process_training_matches_single_process(tmp_path):
    data_dir = make_synthetic_dataset(str(tmp_path / "ds"))
    want = _single_process_losses(data_dir, tmp_path)

    coord = f"localhost:{_free_port()}"
    out_dir = str(tmp_path / "dist")
    os.makedirs(out_dir, exist_ok=True)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "dist_worker.py"),
             "--process-id", str(p), "--num-processes", "2",
             "--coordinator", coord, "--data-dir", data_dir,
             "--out", out_dir, "--steps", str(STEPS)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    losses = [json.load(open(os.path.join(out_dir, f"losses_p{p}.json")))
              for p in range(2)]
    # both processes observe the same (psum-reduced) global losses
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # ... and they match the single-process 8-device run
    np.testing.assert_allclose(losses[0], want, rtol=2e-5, atol=1e-5)
