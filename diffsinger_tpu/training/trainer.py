"""Training runtime: pjit train loop, checkpointing, validation, logging.

Replaces the reference's vendored PyTorch-Lightning trainer (utils/pl_utils.py,
1709 LoC) with a small explicit loop (SURVEY.md §7.6):
  * ``train_step`` = jit(grad + masked-AdamW update) over a ``data``-sharded batch
    on a device mesh — XLA inserts the gradient psum the reference got from DDP
    (pl_utils.py:188-312 / NCCL at tasks/base_task.py:291).
  * gradient accumulation via optax.MultiSteps (pl_utils.py:1582,1616-1635).
  * checkpoints via Orbax: keep-latest-N + best-by-val_loss, auto-resume from the
    highest step (pl_utils.py:375-442,690-750; atomic save semantics come from
    Orbax's tmp-dir + rename, matching _atomic_save:813).
  * periodic validation every ``val_check_interval`` updates with
    ``num_sanity_val_steps`` at startup (pl_utils.py:644-660,1491-1496).
  * TensorBoard scalars via tensorboardX on process 0 (reference
    tasks/base_task.py:237-241), stdout loss postfix via tqdm.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffsinger_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          pad_batch_for_sharding, replicated,
                                          shard_batch)
from diffsinger_tpu.training.schedules import build_lr_schedule
from diffsinger_tpu.training.tasks import trainable_mask
from diffsinger_tpu.utils.misc import MetricsDict

ARRAY_KEYS_EXCLUDE = ("item_name", "text", "nsamples", "id")


def _batch_arrays(batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {k: v for k, v in batch.items()
            if isinstance(v, (np.ndarray, jax.Array))
            and k not in ARRAY_KEYS_EXCLUDE}


def partition_params(params, mask):
    """Split a nested-dict param tree into (trainable, frozen) trees by a
    bool tree from :func:`trainable_mask`.

    Matches the reference's ``requires_grad=False`` freezing
    (usr/diffsinger_task.py:60-64, usr/diffspeech_task.py:33-38): the loss is
    differentiated w.r.t. the trainable subtree ONLY, so XLA never builds the
    frozen backward, and grad-norm/clip never see frozen params. Empty
    subtrees (e.g. a ``batch_stats: {}`` placeholder) ride in the frozen tree
    so merge restores the exact input structure."""
    import flax.traverse_util as trav

    flat = trav.flatten_dict(params, keep_empty_nodes=True)
    fmask = trav.flatten_dict(mask)
    train = {k: v for k, v in flat.items() if fmask.get(k, False)}
    frozen = {k: v for k, v in flat.items() if not fmask.get(k, False)}
    return trav.unflatten_dict(train), trav.unflatten_dict(frozen)


def merge_params(a, b):
    """Inverse of :func:`partition_params`."""
    import flax.traverse_util as trav

    flat = trav.flatten_dict(a, keep_empty_nodes=True)
    flat.update(trav.flatten_dict(b, keep_empty_nodes=True))
    return trav.unflatten_dict(flat)


def _flat_wrap(tx: optax.GradientTransformation, params
               ) -> optax.GradientTransformation:
    """Run the optimizer math over ONE concatenated flat vector.

    A param tree here has hundreds of small leaves; per-leaf AdamW lowers to
    hundreds of tiny XLA fusions whose launch overhead dominates the actual
    HBM traffic (measured ~4.2 ms/step at B=24 vs a ~0.7 ms bandwidth
    roofline, tools/bench_train_stages.py). Flattening runs the whole update
    as a handful of big elementwise kernels. Only used for replicated params
    (dp-only meshes): a flat m/v vector cannot follow per-param
    tensor-parallel shardings. Operates on the TRAINABLE subtree (freezing is
    structural: frozen params never reach the optimizer)."""
    from jax.flatten_util import ravel_pytree

    _, unravel = ravel_pytree(params)

    def init(p):
        flat, _ = ravel_pytree(p)
        return tx.init(flat)

    def update(grads, state, p=None):
        gflat, _ = ravel_pytree(grads)
        pflat, _ = ravel_pytree(p)
        uflat, state = tx.update(gflat, state, pflat)
        return unravel(uflat), state

    return optax.GradientTransformation(init, update)


def build_optimizer(hp: Dict[str, Any], params,
                    batches_per_epoch: Optional[int] = None,
                    mesh=None) -> optax.GradientTransformation:
    """Optimizer over ``params`` — pass the TRAINABLE subtree (see
    :func:`partition_params`); frozen params are excluded structurally rather
    than masked, so clip/grad-norm semantics match the reference's
    ``requires_grad=False`` (tasks/base_task.py optimizer over trainable
    parameters only)."""
    schedule = build_lr_schedule(hp)
    b1 = float(hp.get("optimizer_adam_beta1", 0.9))
    b2 = float(hp.get("optimizer_adam_beta2", 0.98))
    wd = float(hp.get("weight_decay", 0.0))
    opt_name = str(hp.get("optimizer", "adamw")).lower()
    if opt_name == "radam":  # reference parallel_wavegan/optimizers/radam.py
        tx = optax.radam(schedule, b1=b1, b2=b2)
    else:
        tx = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=wd)
    clip = float(hp.get("clip_grad_norm", 0) or 0)
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    model_sharded = (int(hp.get("num_model_shards", 1) or 1) > 1
                     or (mesh is not None and mesh.shape.get("model", 1) > 1))
    if bool(hp.get("flat_optimizer", True)) and not model_sharded:
        tx = _flat_wrap(tx, params)
    accum = hp.get("accumulate_grad_batches", 1)
    if isinstance(accum, dict):
        # per-epoch schedule {epoch: factor} (reference
        # GradientAccumulationScheduler, pl_utils.py:348-372)
        from diffsinger_tpu.training.schedules import grad_accum_schedule

        if batches_per_epoch is None:
            raise ValueError(
                "accumulate_grad_batches as a per-epoch dict needs "
                "batches_per_epoch (Trainer.fit derives it; set "
                "trainer.batches_per_epoch when calling initialize directly)")
        tx = optax.MultiSteps(
            tx, every_k_schedule=grad_accum_schedule(accum, batches_per_epoch))
    elif int(accum) > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum))
    return tx


class Trainer:
    def __init__(self, hp: Dict[str, Any], task, *, mesh=None,
                 work_dir: Optional[str] = None):
        self.hp = hp
        self.task = task
        if mesh is None:
            mesh = make_mesh(num_model=int(hp.get("num_model_shards", 1)))
        self.mesh = mesh
        self.work_dir = work_dir or hp.get("work_dir") or "checkpoints/default"
        os.makedirs(self.work_dir, exist_ok=True)
        self.global_step = 0
        self.params = None
        self.opt_state = None
        self.tx = None
        self.mask = None  # trainable-leaf bool tree (set by initialize)
        self.batches_per_epoch = None  # needed for dict grad-accum schedules
        self._train_step_fn = None
        self._writer = None
        self.best_val_loss = float("inf")
        self.plotter = None  # optional validation plot callback
        self._ckpt_mgr = None  # long-lived Orbax manager (one per Trainer)
        self._lr_schedule = None  # built once, read every log interval

    # ------------------------------------------------------------------ setup
    def initialize(self, sample_batch: Dict[str, Any],
                   rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(
            int(self.hp.get("seed", 1234)))
        batch = _batch_arrays(sample_batch)
        self.params = self.task.init_params(rng, batch)
        self.load_warm_start()
        # structural freeze: optimizer state exists only for trainable leaves
        self.mask = trainable_mask(self.params, self.task.trainable_rule())
        pt, _ = partition_params(self.params, self.mask)
        self.tx = build_optimizer(self.hp, pt,
                                  batches_per_epoch=self.batches_per_epoch,
                                  mesh=self.mesh)
        self.opt_state = self.tx.init(pt)
        self.restore()  # auto-resume if checkpoints exist
        self._place()
        if jax.process_index() == 0:  # reference utils/__init__.py:240-250
            for top, sub in self.params.items():
                n = sum(int(np.prod(x.shape)) for x in
                        jax.tree_util.tree_leaves(sub))
                print(f"| {top} params: {n / 1e6:.3f}M")
        return self.params

    def load_warm_start(self):
        """fs2_ckpt / pe_ckpt style warm starts (reference utils/__init__.py:178-209
        via the torch converter, or our own orbax checkpoints)."""
        from diffsinger_tpu.convert.checkpoint import load_warm_start_params

        self.params = load_warm_start_params(self.hp, self.params)

    def _place(self):
        if self.mesh.shape.get("model", 1) > 1:
            from diffsinger_tpu.parallel.mesh import param_shardings

            p_sh = param_shardings(self.params, self.mesh,
                                   min_size=int(self.hp.get(
                                       "tp_min_param_size", 1 << 16)))
            self.params = jax.tree_util.tree_map(jax.device_put, self.params,
                                                 p_sh)
            # re-derive optimizer state from the placed params so the moments
            # inherit each param's sharding (TP resume re-initializes moments)
            self.opt_state = self.tx.init(
                partition_params(self.params, self.mask)[0])
        else:
            sharding = replicated(self.mesh)
            self.params = jax.device_put(self.params, sharding)
            self.opt_state = jax.device_put(self.opt_state, sharding)

    # ------------------------------------------------------------------ steps
    def _step_body(self, use_gt_f0: bool = True):
        task, tx = self.task, self.tx
        kw = {}
        # switch_midi2f0_step curriculum (usr/diffsinger_task.py:284-289):
        # one recompile when the step threshold is crossed
        if "use_gt_f0" in type(task).train_loss.__code__.co_varnames:
            kw["use_gt_f0"] = use_gt_f0

        mask = self.mask

        # NOTE: no unused args here — every argument is a per-call host->device
        # upload (a real HTTP round trip through the axon dev tunnel)
        def train_step(params, opt_state, batch, rng, fs2_ret=None):
            # differentiate w.r.t. the trainable subtree only: XLA never
            # builds the frozen (e.g. whole-FS2) backward, and grad_norm /
            # clip see exactly what the reference's requires_grad=True set is
            p_train, p_frozen = partition_params(params, mask)
            kw_step = dict(kw, fs2_ret=fs2_ret) if fs2_ret is not None else kw

            def loss_fn(pt):
                total, losses = task.train_loss(merge_params(pt, p_frozen),
                                                batch, rng, global_step=None,
                                                **kw_step)
                new_state = losses.pop("_new_state", None)
                return total, (losses, new_state)

            (total, (losses, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p_train)
            updates, opt_state = tx.update(grads, opt_state, p_train)
            p_train = optax.apply_updates(p_train, updates)
            params = merge_params(p_train, p_frozen)
            if new_state is not None and "batch_stats" in params:
                params = {**params, "batch_stats": new_state}
            losses["total_loss"] = total
            losses["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, losses

        return train_step

    def _make_train_step(self, use_gt_f0: bool = True):
        return jax.jit(self._step_body(use_gt_f0), donate_argnums=(0, 1))

    def _make_train_step_scan(self, use_gt_f0: bool = True):
        """K optimizer steps in ONE jit via ``lax.scan`` over stacked batches.

        Each dispatch marshals ~1000 param/optimizer buffer handles; at ~30 ms
        device-side steps that per-call overhead is material (and through the
        axon dev tunnel it dominates). K is baked into the compiled program by
        the stacked batch's leading axis. The reference has no analogue (one
        Python step per batch, utils/pl_utils.py:1527)."""
        body = self._step_body(use_gt_f0)
        task = self.task
        # cond_precompute: with the WHOLE fs2 frozen (DiffSinger production
        # semantics) its forward is gradient-free, so one [K*B]-batched FS2
        # call hoisted out of the scan replaces K in-scan forwards (the
        # named r4 training lever; reference freeze: usr/diffsinger_task.py:60-64)
        hoist = bool(self.hp.get("cond_precompute")) \
            and hasattr(task, "precompute_scan_cond") \
            and task.fs2_fully_frozen()

        def multi_step(params, opt_state, batches, rngs):
            pre = None
            if hoist:
                pre = task.precompute_scan_cond(
                    params, batches, jax.random.fold_in(rngs[0], 7),
                    use_gt_f0=use_gt_f0)

            def scan_body(carry, inp):
                p, s = carry
                batch, rng = inp[0], inp[1]
                p, s, losses = body(p, s, batch, rng,
                                    fs2_ret=inp[2] if hoist else None)
                return (p, s), losses

            xs = (batches, rngs, pre) if hoist else (batches, rngs)
            (params, opt_state), losses = jax.lax.scan(
                scan_body, (params, opt_state), xs)
            return params, opt_state, losses  # loss leaves stacked [K]

        return jax.jit(multi_step, donate_argnums=(0, 1))

    def train_step_many(self, batches, rng: jax.Array):
        """Run ``len(batches)`` optimizer steps in one device call. All batches
        must share shapes (one compile per (shape-signature, K)). Returns the
        last step's losses (device scalars) plus stacked ``losses_all``."""
        switch = self.hp.get("switch_midi2f0_step")
        use_gt_f0 = switch is None or self.global_step <= int(switch)
        key = (use_gt_f0, len(batches))
        if getattr(self, "_scan_key", None) != key:
            self._train_scan_fn = self._make_train_step_scan(use_gt_f0)
            self._scan_key = key
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P(None, "data"))  # [K, B, ...] batches
        stacked = jax.tree_util.tree_map(
            lambda *xs: jax.device_put(jnp.stack(xs), sh),
            *[_batch_arrays(b) for b in batches])
        rngs = jax.random.split(rng, len(batches))
        self.params, self.opt_state, losses_all = self._train_scan_fn(
            self.params, self.opt_state, stacked, rngs)
        self.global_step += len(batches)
        last = {k: v[-1] for k, v in losses_all.items()}
        last["losses_all"] = losses_all
        return last

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Host->device placement (pad to data shards + shard_batch). Split out
        of train_step so an input pipeline can prefetch: jax.device_put is
        async, so placing batch k+1 while step k runs overlaps the copy with
        compute — at flagship shapes the copy is ~10 MB/step and otherwise
        serializes with the ~21 ms step."""
        arrays = _batch_arrays(batch)
        arrays = pad_batch_for_sharding(arrays, self.mesh.shape["data"])
        arrays.pop("nsamples", None)
        return shard_batch(self.mesh, arrays)

    def prefetch(self, batch_iter: Iterator[Dict[str, Any]], size: int = 2
                 ) -> Iterator[Dict[str, Any]]:
        """Wrap a host batch iterator with ``size`` batches of device
        lookahead (the flax prefetch_to_device pattern)."""
        from collections import deque

        q: deque = deque()
        for b in batch_iter:
            q.append(self.prepare_batch(b))
            if len(q) >= size:
                yield q.popleft()
        while q:
            yield q.popleft()

    def train_step(self, batch: Dict[str, Any], rng: jax.Array):
        switch = self.hp.get("switch_midi2f0_step")
        use_gt_f0 = switch is None or self.global_step <= int(switch)
        if self._train_step_fn is None or use_gt_f0 != getattr(
                self, "_train_step_gt_f0", True):
            self._train_step_fn = self._make_train_step(use_gt_f0)
            self._train_step_gt_f0 = use_gt_f0
        arrays = _batch_arrays(batch)
        if not all(isinstance(v, jax.Array) for v in arrays.values()):
            arrays = self.prepare_batch(batch)  # not prefetched: place now
        self.params, self.opt_state, losses = self._train_step_fn(
            self.params, self.opt_state, arrays, rng)
        if self.hp.get("print_nan_grads") or self.hp.get("debug"):
            # debug guard (reference pl_utils.py:1608-1610 print_nan_grads)
            total = float(losses["total_loss"])
            if total != total:
                print(f"| WARNING: NaN loss at step {self.global_step}: "
                      f"{ {k: float(v) for k, v in losses.items()} }")
        self.global_step += 1
        return losses

    def validate(self, batches: Iterator[Dict[str, Any]],
                 max_batches: Optional[int] = None,
                 plotter=None) -> Dict[str, float]:
        """``plotter(trainer, batch, batch_idx)`` runs for the first
        ``num_valid_plots`` batches (reference validation_step plots,
        usr/diffsinger_task.py:86-98)."""
        num_plots = int(self.hp.get("num_valid_plots", 0)) if plotter else 0
        metrics = MetricsDict()
        if not hasattr(self, "_eval_fn") or self._eval_fn is None:
            self._eval_fn = jax.jit(
                lambda p, b, r: self.task.train_loss(p, b, r, global_step=None,
                                                     deterministic=True))
        eval_fn = self._eval_fn
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(batches):
            if max_batches is not None and i >= max_batches:
                break
            arrays = _batch_arrays(batch)
            arrays = pad_batch_for_sharding(arrays, self.mesh.shape["data"])
            n = arrays.pop("nsamples", len(next(iter(arrays.values()))))
            arrays = shard_batch(self.mesh, arrays)
            total, losses = eval_fn(self.params, arrays, rng)
            losses.pop("_new_state", None)
            scalars = {k: float(v) for k, v in losses.items()}
            scalars["total_loss"] = float(total)
            metrics.update(scalars, n)
            if i < num_plots:
                try:
                    plotter(self, batch, i)
                except Exception as e:  # plotting must never fail validation
                    print(f"| validation plot {i} failed: {e}")
        return metrics.averages()

    # ------------------------------------------------------------------ ckpt
    def _ckpt_dir(self) -> str:
        return os.path.join(os.path.abspath(self.work_dir), "ckpts")

    def _manager(self):
        """One long-lived Orbax CheckpointManager per Trainer (constructing a
        fresh manager per save rescans the checkpoint dir — wasteful at
        val_check_interval=2000 with large params)."""
        import orbax.checkpoint as ocp

        if self._ckpt_mgr is None:
            keep = int(self.hp.get("num_ckpt_keep", 3))
            self._ckpt_mgr = ocp.CheckpointManager(
                self._ckpt_dir(),
                options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                     create=True))
        return self._ckpt_mgr

    def save_checkpoint(self, val_loss: Optional[float] = None):
        import orbax.checkpoint as ocp

        mgr = self._manager()
        mgr.save(self.global_step, args=ocp.args.PyTreeSave(
            {"params": self.params, "opt_state": self.opt_state}))
        mgr.wait_until_finished()
        if val_loss is not None and val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            np.save(os.path.join(self.work_dir, "best_valid.npy"),
                    np.asarray([val_loss]))

    def restore(self) -> bool:
        import orbax.checkpoint as ocp

        d = self._ckpt_dir()
        if not os.path.isdir(d):
            return self._restore_torch()
        mgr = self._manager()
        step = mgr.latest_step()
        if step is None:
            return self._restore_torch()
        try:
            restored = mgr.restore(step, args=ocp.args.PyTreeRestore(
                {"params": self.params, "opt_state": self.opt_state}))
            self.params = restored["params"]
            self.opt_state = restored["opt_state"]
        except Exception as e:
            # opt_state layout changed between save and resume (e.g. a
            # checkpoint written before flat_optimizer, or before structural
            # freezing moved frozen leaves out of the optimizer). Params are
            # plain nested dicts, so a reference-free restore recovers them;
            # moments are re-initialized with a warning (advisor r3).
            raw = mgr.restore(step)
            import flax.traverse_util as trav

            want = set(trav.flatten_dict(self.params))
            got = set(trav.flatten_dict(raw.get("params", {})))
            if want != got:
                raise RuntimeError(
                    f"checkpoint at step {step} does not match the model: "
                    f"missing={sorted(want - got)[:5]} "
                    f"unexpected={sorted(got - want)[:5]}") from e
            self.params = jax.tree_util.tree_map(
                lambda ref, v: jnp.asarray(v, ref.dtype), self.params,
                raw["params"])
            pt, _ = partition_params(self.params, self.mask)
            self.opt_state = self.tx.init(pt)
            print(f"| WARNING: optimizer state at step {step} has an "
                  "incompatible layout (saved under a different optimizer "
                  "config); restored params and re-initialized moments "
                  f"({type(e).__name__}: {e})")
        self.global_step = int(step)
        best_fn = os.path.join(self.work_dir, "best_valid.npy")
        if os.path.exists(best_fn):
            self.best_val_loss = float(np.load(best_fn)[0])
        print(f"| restored checkpoint at step {step}")
        return True

    def _restore_torch(self) -> bool:
        """Load a RELEASED reference checkpoint (``model_ckpt_steps_*.ckpt``
        torch file in work_dir) directly: the 'model.'-prefixed state dict is
        sliced and converted to this framework's param trees, shape-pruned
        like the reference's non-strict load (utils/__init__.py:178-209).
        Optimizer moments start fresh. This is what lets a reference user
        point --exp_name at a released experiment dir and run --infer."""
        import re

        from diffsinger_tpu.convert.checkpoint import (
            convert_diffusion_ckpt, convert_fs2, convert_pe, find_latest_ckpt,
            load_torch_state_dict, merge_params)

        path = find_latest_ckpt(self.work_dir) if self.work_dir else None
        if path is None or not str(path).endswith(".ckpt"):
            return False
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        sd = load_torch_state_dict(raw)  # keys under 'model.'
        if not sd:
            return False
        tops = set(self.params)
        if {"fs2", "denoiser"} <= tops:  # diffusion families (lj_ds_beta6,
            conv = convert_diffusion_ckpt(sd)  # popcs offline, opencpop ds*)
        elif "pe" in tops:  # xiaoma_pe
            conv = {k: v for k, v in convert_pe(sd).items() if k in tops}
        elif "fs2" in tops:  # fs2_lj
            conv = {"fs2": convert_fs2(sd)}
        else:
            print(f"| torch checkpoint {path} does not map onto param tops "
                  f"{sorted(tops)}; ignoring")
            return False
        import flax.traverse_util as trav

        flat_params = trav.flatten_dict(self.params)
        n_merge = sum(1 for k in trav.flatten_dict(conv) if k in flat_params)
        if n_merge == 0:
            # e.g. a vocoder checkpoint dropped into a task work_dir: the
            # 'model.'-slice fallback yields keys, but conversion maps none
            # of them — restoring "successfully" would silently keep random
            # weights while jumping global_step to the checkpoint's step
            print(f"| torch checkpoint {path} contributed no parameters for "
                  f"this task; ignoring")
            return False
        self.params = merge_params(self.params, conv)
        pt, _ = partition_params(self.params, self.mask)
        self.opt_state = self.tx.init(pt)
        step = raw.get("global_step")
        if step is None:
            step = int(re.findall(r"steps_(\d+)\.ckpt", path)[0])
        self.global_step = int(step)
        print(f"| loaded torch checkpoint {path} (step {self.global_step}); "
              "optimizer moments re-initialized")
        return True

    # ------------------------------------------------------------------ logging
    @property
    def writer(self):
        if self._writer is None and jax.process_index() == 0:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(os.path.join(self.work_dir, "tb_logs"))
        return self._writer

    def log_scalars(self, scalars: Dict[str, float], prefix: str = "train"):
        w = self.writer
        if w is None:
            return
        for k, v in scalars.items():
            try:
                w.add_scalar(f"{prefix}/{k}", float(v), self.global_step)
            except (TypeError, ValueError):
                pass

    def snapshot_code(self):
        """Copy the framework source into work_dir/codes/<timestamp> for
        reproducibility (reference tasks/base_task.py:249-255)."""
        import shutil
        import time as _time

        if jax.process_index() != 0:
            return
        src_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        stamp = _time.strftime("%Y%m%d%H%M%S")
        dst = os.path.join(self.work_dir, "codes", stamp, "diffsinger_tpu")
        if not os.path.exists(os.path.join(self.work_dir, "codes")):
            shutil.copytree(src_root, dst,
                            ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))

    # ------------------------------------------------------------------ loop
    def fit(self, train_dataset, valid_dataset=None):
        """Epoch loop to ``max_updates`` (reference pl_utils.py:1404-1525)."""
        hp = self.hp
        max_updates = int(hp.get("max_updates", 160000))
        val_interval = int(hp.get("val_check_interval", 2000))
        log_interval = int(hp.get("log_interval", 100))
        sanity_steps = int(hp.get("num_sanity_val_steps", 5))
        rng = jax.random.PRNGKey(int(hp.get("seed", 1234)) + jax.process_index())

        first = None
        for batch in train_dataset.iter_batches(shuffle_batches=True, seed=0):
            first = batch
            break
        assert first is not None, "empty training set"
        if self.batches_per_epoch is None:
            self.batches_per_epoch = len(train_dataset.batches())
        if self.params is None:
            self.initialize(first)
        self.snapshot_code()

        # eval batching honors max_eval_tokens/max_eval_sentences
        # (reference configs/tts/base.yaml:101-102 semantics)
        ev_tokens = hp.get("max_eval_tokens", -1)
        ev_tokens = None if not ev_tokens or ev_tokens < 0 else ev_tokens
        ev_sents = hp.get("max_eval_sentences", -1)
        ev_sents = None if not ev_sents or ev_sents < 0 else ev_sents

        def valid_batches():
            return valid_dataset.iter_batches(max_tokens=ev_tokens,
                                              max_sentences=ev_sents)

        if valid_dataset is not None and sanity_steps > 0 and self.global_step == 0:
            self.validate(valid_batches(), max_batches=sanity_steps)

        profile_dir = hp.get("profile_dir")
        if profile_dir:  # jax.profiler trace of the first steps (SURVEY §5)
            jax.profiler.start_trace(profile_dir)

        spc = int(hp.get("train_steps_per_call", 1))

        self._last_log_step = self.global_step

        def handle_boundaries(prev_step, losses):
            nonlocal profile_dir, t0
            crossed = lambda iv: (self.global_step // iv) > (prev_step // iv)
            if crossed(log_interval):
                if self._lr_schedule is None:
                    self._lr_schedule = build_lr_schedule(hp)
                scalars = {k: float(v) for k, v in losses.items()}
                scalars["lr"] = float(self._lr_schedule(self.global_step))
                scalars["steps_per_sec"] = (
                    self.global_step - self._last_log_step) / max(
                    time.time() - t0, 1e-9)
                self._last_log_step = self.global_step
                t0 = time.time()
                self.log_scalars(scalars)
                print(f"| step {self.global_step} " + " ".join(
                    f"{k}={v:.4f}" for k, v in scalars.items()))
            if crossed(val_interval) and self.global_step > 0:
                if valid_dataset is not None:
                    val = self.validate(valid_batches(), plotter=self.plotter)
                    self.log_scalars(val, prefix="val")
                    self.save_checkpoint(val.get("total_loss"))
                else:
                    self.save_checkpoint()
            if profile_dir and self.global_step >= 10:
                jax.profiler.stop_trace()
                profile_dir = None

        def run_group(group):
            nonlocal rng
            rng, step_rng = jax.random.split(rng)
            prev = self.global_step
            if len(group) == 1:
                losses = self.train_step(group[0], step_rng)
            else:
                losses = self.train_step_many(group, step_rng)
                losses.pop("losses_all", None)
            handle_boundaries(prev, losses)

        def _shape_sig(arrays):
            return tuple(sorted((k, tuple(v.shape)) for k, v in arrays.items()
                                if hasattr(v, "shape")))

        epoch = 0
        t0 = time.time()
        while self.global_step < max_updates:
            # device prefetch: batch k+1's host->device copy overlaps step k
            batch_iter = self.prefetch(
                train_dataset.iter_batches(shuffle_batches=True, seed=epoch))
            if spc <= 1:
                for batch in batch_iter:
                    run_group([batch])
                    if self.global_step >= max_updates:
                        break
            else:
                # train_steps_per_call: group same-shape batches, K steps per
                # device call (lax.scan) — amortizes per-call dispatch. Partial
                # groups (shape change / epoch end) run as single steps so no
                # extra K-variant compiles.
                pending, sig = [], None
                for batch in batch_iter:
                    s = _shape_sig(batch)
                    if pending and s != sig:
                        for b in pending:
                            run_group([b])
                        pending = []
                    pending.append(batch)
                    sig = s
                    if len(pending) == spc:
                        run_group(pending)
                        pending = []
                    if self.global_step >= max_updates:
                        break
                for b in pending:
                    if self.global_step >= max_updates:
                        break
                    run_group([b])
            epoch += 1
        if profile_dir:
            jax.profiler.stop_trace()
        self.save_checkpoint()
