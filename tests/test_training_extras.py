"""Schedules, grad accumulation, gradio sentence splitting, vocoder registry."""

import numpy as np

from diffsinger_tpu.inference.gradio_app import split_sentences
from diffsinger_tpu.inference.vocoder import GriffinLim, HifiGAN, PWG, get_vocoder_cls
from diffsinger_tpu.training.schedules import (build_lr_schedule, rsqrt_schedule,
                                               step_lr_schedule)


def test_rsqrt_schedule_matches_reference_formula():
    """reference utils/training_utils.py:16-24."""
    sched = rsqrt_schedule(2.0, warmup_updates=8000, hidden_size=256)
    for step in [0, 1, 100, 4000, 8000, 20000, 160000]:
        warmup = min(step / 8000, 1.0)
        want = max(2.0 * warmup * max(8000, step) ** -0.5 * 256 ** -0.5, 1e-7)
        got = float(sched(step))
        assert abs(got - want) < 1e-9, (step, got, want)


def test_step_lr_schedule():
    sched = step_lr_schedule(0.001, decay_steps=50000, gamma=0.5)
    assert abs(float(sched(0)) - 0.001) < 1e-9
    assert abs(float(sched(49999)) - 0.001) < 1e-9
    assert abs(float(sched(50000)) - 0.0005) < 1e-9
    assert abs(float(sched(150000)) - 0.000125) < 1e-9


def test_build_lr_schedule_selection():
    assert abs(float(build_lr_schedule(
        {"lr": 0.001, "decay_steps": 50000})(50000)) - 0.0005) < 1e-9
    s = build_lr_schedule({"lr": 2.0, "warmup_updates": 4000,
                           "hidden_size": 256})
    assert float(s(1)) < float(s(4000))


def test_vocoder_registry():
    assert get_vocoder_cls({"vocoder": "hifigan"}) is HifiGAN
    assert get_vocoder_cls({"vocoder": "vocoders.hifigan.HifiGAN"}) is HifiGAN
    assert get_vocoder_cls({"vocoder": "pwg"}) is PWG
    assert get_vocoder_cls({"vocoder": "griffinlim"}) is GriffinLim


def test_gradio_sentence_split():
    text = "你好。再见。"
    notes = "A4 B4。C4 D4。"
    durs = "0.5 0.5。0.5 0.5。"
    chunks = split_sentences(text, notes, durs)
    assert len(chunks) == 1  # small input batches into one chunk
    s, n, d = chunks[0]
    assert "你好" in s and "再见" in s
    # long input splits into multiple chunks
    long_text = ("好" * 300 + "。") * 3
    long_notes = ("A4 " * 300 + "。") * 3
    long_durs = ("0.5 " * 300 + "。") * 3
    chunks = split_sentences(long_text, long_notes, long_durs)
    assert len(chunks) >= 2


def test_grad_accumulation(tmp_path):
    import jax

    from diffsinger_tpu.data.dataset import FastSpeechDataset
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer
    from tests.helpers import make_synthetic_dataset, tiny_hparams

    data_dir = make_synthetic_dataset(str(tmp_path / "ds"))
    hp = tiny_hparams(data_dir, accumulate_grad_batches=2,
                      work_dir=str(tmp_path / "exp"))
    ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh(num_data=8))
    batch = next(ds.iter_batches())
    trainer.initialize(batch)
    p0 = jax.tree_util.tree_map(np.asarray, trainer.params["denoiser"])
    trainer.train_step(batch, jax.random.PRNGKey(0))
    p1 = jax.tree_util.tree_map(np.asarray, trainer.params["denoiser"])
    # first micro-batch: no optimizer step yet
    d01 = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p0, p1)))
    assert d01 == 0.0
    trainer.train_step(batch, jax.random.PRNGKey(1))
    p2 = jax.tree_util.tree_map(np.asarray, trainer.params["denoiser"])
    d12 = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p1, p2)))
    assert d12 > 0.0


def test_grad_accum_schedule_fn():
    """Per-epoch dict schedule maps update counts to factors (reference
    GradientAccumulationScheduler, pl_utils.py:348-372)."""
    import pytest

    from diffsinger_tpu.training.schedules import grad_accum_schedule

    # {1:1, 3:2}, 4 batches/epoch: epochs 1-2 at factor 1 = 8 updates,
    # then factor 2 forever
    fn = grad_accum_schedule({1: 1, 3: 2}, batches_per_epoch=4)
    assert int(fn(0)) == 1
    assert int(fn(7)) == 1
    assert int(fn(8)) == 2
    assert int(fn(1000)) == 2
    # missing epoch-1 key implies {1: 1} (reference :361-362)
    fn2 = grad_accum_schedule({2: 4}, batches_per_epoch=10)
    assert int(fn2(0)) == 1
    assert int(fn2(9)) == 1
    assert int(fn2(10)) == 4
    with pytest.raises(TypeError):
        grad_accum_schedule({}, 4)
    with pytest.raises(IndexError):
        grad_accum_schedule({0: 2}, 4)


def test_grad_accum_dict_schedule_in_trainer(tmp_path):
    """accumulate_grad_batches as {epoch: factor}: factor 1 in epoch 1,
    factor 2 afterwards -- verified by watching when params actually move."""
    import jax

    from diffsinger_tpu.data.dataset import FastSpeechDataset
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer
    from tests.helpers import make_synthetic_dataset, tiny_hparams

    data_dir = make_synthetic_dataset(str(tmp_path / "ds"))
    hp = tiny_hparams(data_dir, accumulate_grad_batches={1: 1, 2: 2},
                      work_dir=str(tmp_path / "exp"))
    ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh(num_data=8))
    bpe = len(ds.batches())
    trainer.batches_per_epoch = bpe
    batch = next(ds.iter_batches())
    trainer.initialize(batch)

    def snap():
        return jax.tree_util.tree_map(np.asarray, trainer.params["denoiser"])

    def moved(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(np.abs(x - y).max()), a, b))) > 0.0

    # epoch 1 (bpe mini-batches): factor 1 -> every mini-batch updates
    prev = snap()
    for i in range(bpe):
        trainer.train_step(batch, jax.random.PRNGKey(i))
        cur = snap()
        assert moved(prev, cur), f"epoch-1 step {i} should update"
        prev = cur
    # epoch 2: factor 2 -> first mini-batch accumulates, second updates
    trainer.train_step(batch, jax.random.PRNGKey(100))
    cur = snap()
    assert not moved(prev, cur), "first accum micro-batch must not update"
    trainer.train_step(batch, jax.random.PRNGKey(101))
    cur = snap()
    assert moved(prev, cur)


def test_train_step_many_matches_single_steps(tmp_path):
    """The K-steps-per-call lax.scan path must produce the same per-step
    losses as K individual train_step calls with the same keys."""
    import jax

    from diffsinger_tpu.data.dataset import FastSpeechDataset
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer
    from tests.helpers import make_synthetic_dataset, tiny_hparams

    data_dir = make_synthetic_dataset(str(tmp_path / "ds"), n_train=4)
    K = 3

    def build(tag):
        hp = tiny_hparams(data_dir, work_dir=str(tmp_path / f"exp_{tag}"))
        ds = FastSpeechDataset(hp, "train")
        task = build_task(hp, vocab_size=10)
        tr = Trainer(hp, task, mesh=make_mesh(num_data=1, devices=jax.devices()[:1]))
        batch = next(ds.iter_batches(max_sentences=4))
        tr.initialize(batch)
        return tr, batch

    key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, K)

    tr1, batch = build("single")
    singles = [float(tr1.train_step(batch, keys[i])["total_loss"])
               for i in range(K)]

    tr2, _ = build("scan")
    out = tr2.train_step_many([batch] * K, key)
    scanned = [float(v) for v in out["losses_all"]["total_loss"]]
    assert tr2.global_step == K
    np.testing.assert_allclose(scanned, singles, rtol=2e-5, atol=1e-6)
    # params advanced identically
    l1 = jax.tree_util.tree_leaves(tr1.params)
    l2 = jax.tree_util.tree_leaves(tr2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fit_with_train_steps_per_call(tmp_path):
    """fit() with train_steps_per_call=2 reaches max_updates and checkpoints."""
    import os

    from diffsinger_tpu.data.dataset import FastSpeechDataset
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer
    from tests.helpers import make_synthetic_dataset, tiny_hparams

    data_dir = make_synthetic_dataset(str(tmp_path / "ds"), n_train=6)
    hp = tiny_hparams(data_dir, work_dir=str(tmp_path / "exp_spc"),
                      train_steps_per_call=2, max_updates=6,
                      val_check_interval=4, log_interval=2,
                      num_sanity_val_steps=0, save_codes=[])
    task = build_task(hp, vocab_size=10)
    tr = Trainer(hp, task, mesh=make_mesh(num_data=8))
    ds_train = FastSpeechDataset(hp, "train")
    ds_valid = FastSpeechDataset(hp, "valid")
    tr.fit(ds_train, ds_valid)
    assert tr.global_step >= 6
    assert os.path.isdir(os.path.join(hp["work_dir"], "ckpts"))


def test_flat_optimizer_matches_tree_optimizer():
    """_flat_wrap (one concatenated AdamW vector) must be numerically
    equivalent to the plain per-leaf form: same updates for every leaf, same
    clip-norm behavior, over several steps. (Freezing is structural now —
    frozen leaves never reach the optimizer; see
    test_partitioned_step_matches_full_grads.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffsinger_tpu.training.trainer import build_optimizer

    rng = np.random.RandomState(0)
    params = {
        "fs2": {"w": jnp.asarray(rng.randn(16, 8), jnp.float32),
                "b": jnp.asarray(rng.randn(8), jnp.float32)},
        "denoiser": {"k": jnp.asarray(rng.randn(4, 4), jnp.float32)},
    }
    hp = dict(lr=0.01, decay_steps=1000, clip_grad_norm=0.5, weight_decay=0.1,
              optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98)
    tx_flat = build_optimizer({**hp, "flat_optimizer": True}, params)
    tx_tree = build_optimizer({**hp, "flat_optimizer": False}, params)
    s_f, s_t = tx_flat.init(params), tx_tree.init(params)
    p_f = p_t = params
    for i in range(3):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32) * (i + 1),
            params)
        u_f, s_f = tx_flat.update(grads, s_f, p_f)
        u_t, s_t = tx_tree.update(grads, s_t, p_t)
        for kf in ("fs2", "denoiser"):
            for leaf in u_f[kf]:
                np.testing.assert_allclose(np.asarray(u_f[kf][leaf]),
                                           np.asarray(u_t[kf][leaf]),
                                           rtol=1e-6, atol=1e-7)
        p_f = optax.apply_updates(p_f, u_f)
        p_t = optax.apply_updates(p_t, u_t)


def test_partitioned_step_matches_full_grads():
    """The structurally-frozen train step (grads w.r.t. the trainable subtree
    only, reference requires_grad=False semantics) must produce exactly the
    gradients a full-tree jax.grad gives on the trainable leaves, keep frozen
    leaves bit-identical, and report grad_norm over the trainable subtree
    only (reference usr/diffsinger_task.py:60-64 — frozen FS2 params never
    appear in the optimizer or the norm)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffsinger_tpu.training.tasks import trainable_mask
    from diffsinger_tpu.training.trainer import (merge_params,
                                                 partition_params)

    rng = np.random.RandomState(1)
    params = {
        "fs2": {"enc": {"w": jnp.asarray(rng.randn(6, 4), jnp.float32)},
                "b": jnp.asarray(rng.randn(4), jnp.float32)},
        "denoiser": {"k": jnp.asarray(rng.randn(4, 3), jnp.float32)},
        "batch_stats": {},  # empty subtree must survive partition/merge
    }
    x = jnp.asarray(rng.randn(5, 6), jnp.float32)

    def loss(p):
        h = jnp.tanh(x @ p["fs2"]["enc"]["w"] + p["fs2"]["b"])
        return jnp.sum((h @ p["denoiser"]["k"]) ** 2)

    mask = trainable_mask(params, lambda path: path[0] == "denoiser")
    pt, pf = partition_params(params, mask)
    merged = merge_params(pt, pf)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(params)  # incl. empty batch_stats

    grads_t = jax.grad(lambda q: loss(merge_params(q, pf)))(pt)
    grads_full = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(grads_t["denoiser"]["k"]),
                               np.asarray(grads_full["denoiser"]["k"]),
                               rtol=1e-6)
    # grad_norm covers the trainable subtree only
    gn = float(optax.global_norm(grads_t))
    gn_expected = float(jnp.linalg.norm(grads_full["denoiser"]["k"]))
    np.testing.assert_allclose(gn, gn_expected, rtol=1e-6)
    assert gn != float(optax.global_norm(grads_full))  # fs2 excluded


def test_cond_precompute_scan_matches_unhoisted(tmp_path):
    """cond_precompute hoists the frozen-FS2 conditioner out of the K-step
    scan as ONE [K*B]-batched FS2 call (the r4 named training lever). With
    dropout 0 and identical rng splits (t/noise draws are unaffected by the
    hoist), per-step losses and final params must match the unhoisted scan."""
    import jax

    from diffsinger_tpu.data.dataset import FastSpeechDataset
    from diffsinger_tpu.parallel.mesh import make_mesh
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer
    from tests.helpers import make_synthetic_dataset, tiny_hparams

    data_dir = make_synthetic_dataset(str(tmp_path / "ds"), n_train=4)
    K = 3
    runs = {}
    for pre in (False, True):
        hp = tiny_hparams(data_dir, work_dir=str(tmp_path / f"exp_{pre}"))
        hp.update(dropout=0.0, predictor_dropout=0.0,
                  fs2_ckpt="__frozen_bench__",  # freeze engages; no file ->
                  freeze_fs2_all=True,          # warm start skipped w/ warning
                  cond_precompute=pre)
        ds = FastSpeechDataset(hp, "train")
        task = build_task(hp, vocab_size=10)
        assert task.fs2_fully_frozen()
        tr = Trainer(hp, task,
                     mesh=make_mesh(num_data=1, devices=jax.devices()[:1]))
        batch = next(ds.iter_batches(max_sentences=4))
        tr.initialize(batch)
        dev = tr.prepare_batch(batch)
        out = tr.train_step_many([dev] * K, jax.random.PRNGKey(5))
        runs[pre] = ({k: np.asarray(v) for k, v in out["losses_all"].items()},
                     tr.params)
    losses0, params0 = runs[False]
    losses1, params1 = runs[True]
    for k in losses0:
        np.testing.assert_allclose(losses1[k], losses0[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(params0),
                    jax.tree_util.tree_leaves(params1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)
