"""Standalone worker for the two-process ``jax.distributed`` CPU test.

Launched as ``python tests/dist_worker.py --process-id P ...`` (NOT collected by
pytest). Each process sees 4 virtual CPU devices; together they form the same
8-device data mesh the single-process suite uses, so 3 training steps must
produce bit-comparable losses. Replaces-and-verifies the reference's NCCL DDP
bring-up semantics (tasks/base_task.py:277-291, pl_utils.py:938-994).
"""

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:29741")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    jax.distributed.initialize(args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    from tests.helpers import tiny_hparams

    from diffsinger_tpu.data.dataset import FastSpeechDataset
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer

    hp = tiny_hparams(args.data_dir,
                      work_dir=os.path.join(args.out,
                                            f"exp_p{args.process_id}"))
    ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh())  # all 8 global devices
    batch = next(ds.iter_batches())
    trainer.initialize(batch)
    losses = []
    for i in range(args.steps):
        out = trainer.train_step(batch, jax.random.PRNGKey(i))
        losses.append(float(out["total_loss"]))
    with open(os.path.join(args.out, f"losses_p{args.process_id}.json"),
              "w") as f:
        json.dump(losses, f)
    print(f"| worker {args.process_id}/{args.num_processes} done: {losses}")


if __name__ == "__main__":
    main()
