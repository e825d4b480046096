"""Tensor-parallel numeric equality (round-2 VERDICT item 5).

The dp-axis has a loss-equality test (test_distributed.py); this gives the tp
axis the same correctness gate: on the 8-virtual-device CPU mesh, 3 train steps
with dp=8/tp=1 must produce the same per-step losses as dp=4/tp=2 (same data,
same seeds, same init), and fused inference must produce the same mel. A wrong
``param_shardings`` rule that silently changes math fails here, not just a
finite-loss dryrun.

Semantics being extended: the reference only has DDP gradient sync
(tasks/base_task.py:277-291); TP has no reference analogue (SURVEY.md §2.8
stretch goal).
"""

import jax
import numpy as np

from diffsinger_tpu.data.dataset import FastSpeechDataset
from diffsinger_tpu.parallel.mesh import make_mesh, param_shardings
from diffsinger_tpu.training.tasks import build_task
from diffsinger_tpu.training.trainer import Trainer
from tests.helpers import make_synthetic_dataset, tiny_hparams

STEPS = 3


def _run(data_dir, tmp_path, num_model: int, tag: str):
    hp = tiny_hparams(data_dir, work_dir=str(tmp_path / f"exp_{tag}"),
                      num_model_shards=num_model, tp_min_param_size=64)
    ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    mesh = make_mesh(num_data=8 // num_model, num_model=num_model)
    trainer = Trainer(hp, task, mesh=mesh)
    batch = next(ds.iter_batches(max_sentences=8))
    trainer.initialize(batch)
    losses = [float(trainer.train_step(batch, jax.random.PRNGKey(i))
                    ["total_loss"]) for i in range(STEPS)]
    # inference equality on the SAME trained params
    arrays = {k: v for k, v in batch.items()
              if isinstance(v, np.ndarray) and k not in ("item_name", "text")}
    out = jax.jit(lambda p, b: task.inference(
        p, b, jax.random.PRNGKey(7), t_mel=int(arrays["mels"].shape[1]),
        use_gt_dur=True, use_gt_f0=True)["mel_out"])(trainer.params, arrays)
    return losses, np.asarray(out)


def test_tp2_training_and_inference_match_tp1(tmp_path):
    data_dir = make_synthetic_dataset(str(tmp_path / "ds"), n_train=8)
    losses_dp8, mel_dp8 = _run(data_dir, tmp_path, num_model=1, tag="dp8")
    losses_tp2, mel_tp2 = _run(data_dir, tmp_path, num_model=2, tag="tp2")
    # per-step losses equal: the tp=2 partitioning changes only summation
    # order, not math
    np.testing.assert_allclose(losses_tp2, losses_dp8, rtol=5e-5, atol=1e-5)
    # fused inference (conditioner + 10-step reverse scan) equal
    np.testing.assert_allclose(mel_tp2, mel_dp8, rtol=1e-4, atol=5e-4)

    # the tp run must actually shard something, or this test proves nothing
    hp = tiny_hparams(data_dir, tp_min_param_size=64)
    task = build_task(hp, vocab_size=10)
    ds = FastSpeechDataset(hp, "train")
    batch = next(ds.iter_batches(max_sentences=8))
    params = task.init_params(jax.random.PRNGKey(1234), batch)
    mesh = make_mesh(num_data=4, num_model=2)
    shardings = param_shardings(params, mesh, min_size=64)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(shardings)
        if "model" in str(s.spec))
    assert n_sharded > 0, "tp placement rule sharded nothing at this size"


def test_dp_sharded_serving_matches_single_device(tmp_path):
    """Batched serving scales by data parallelism: the fused inference
    program with the batch sharded over the 8-device 'data' axis must equal
    the single-device result exactly (per-example programs are independent —
    sharding only partitions the batch dimension). This is the §2.8 serving
    story: N chips serve N× the batch of one chip with no code change."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffsinger_tpu.parallel.mesh import replicated

    data_dir = make_synthetic_dataset(str(tmp_path / "ds"), n_train=8)
    hp = tiny_hparams(data_dir, work_dir=str(tmp_path / "exp_serve"))
    ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    batch = next(ds.iter_batches(max_sentences=8))
    arrays = {k: v for k, v in batch.items()
              if isinstance(v, np.ndarray) and k not in ("item_name", "text")}
    b = arrays["txt_tokens"].shape[0]
    if b < 8:  # pad the batch to the mesh size by repeating rows
        reps = -(-8 // b)
        arrays = {k: np.concatenate([v] * reps, 0)[:8] for k, v in arrays.items()}
    params = task.init_params(jax.random.PRNGKey(0), arrays)
    t_mel = int(arrays["mels"].shape[1])

    def fn(p, ba):
        return task.inference(p, ba, jax.random.PRNGKey(7), t_mel=t_mel,
                              use_gt_dur=True, use_gt_f0=True)["mel_out"]

    mel_single = np.asarray(jax.jit(fn)(params, arrays))

    mesh = make_mesh(num_data=8)
    batch_sh = NamedSharding(mesh, P("data"))
    sharded = {k: jax.device_put(jnp.asarray(v), batch_sh)
               for k, v in arrays.items()}
    p_repl = jax.device_put(params, replicated(mesh))
    mel_dp = np.asarray(jax.jit(fn)(p_repl, sharded))
    # per-example computation is untouched by batch sharding; any deviation
    # beyond reduction-order noise means a cross-example leak
    np.testing.assert_allclose(mel_dp, mel_single, rtol=1e-5, atol=1e-5)
