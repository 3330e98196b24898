"""Training harness: jitted/shard_mapped steps + host-side controllers.

Replaces the reference's PyTorch-Lightning `LitModel` + `Trainer`
(`reference main.py:21-151,231-293`) with a functional JAX loop:

  * Adam with torch semantics (L2 weight decay folded into the gradient
    before the moment update, LR applied last and injected per-step so the
    host-side plateau controller can change it without recompiling)
  * masked MSE on normalized targets; eval de-normalized by the target std
  * ReduceLROnPlateau + EarlyStopping on `val_mae_mean`
  * best-checkpoint keeping (orbax), CSV metric logging
  * data parallelism via `shard_map` over a 1-D mesh: per-device microbatch
    stacks, global-exact masked loss, `psum` gradients, cross-replica
    BatchNorm statistics (`ModelConfig.axis_name = "data"`).
"""

from __future__ import annotations

import csv
import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from equihgnn_tpu.parallel.mesh import get_data_mesh, group_for_devices
from equihgnn_tpu.train.metrics import EvalAccumulator
from equihgnn_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau


@dataclass
class TrainConfig:
    epochs: int = 300
    lr: float = 1e-4
    weight_decay: float = 0.0
    clip_gnorm: float | None = None  # reference parses but never applies this
    seed: int = 0
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    min_lr: float | None = None  # defaults to lr * 1e-5 (reference main.py:146)
    early_stop_patience: int = 50
    num_bootstraps: int = 50
    log_dir: str | None = None
    data_parallel: bool = False
    num_devices: int | None = None
    debug: bool = False  # fast_dev_run: 1 train + 1 val batch, no checkpoint
    resume: bool = False  # restore ckpt_last before fitting (the reference
    #                       has no mid-run resume — SURVEY §5.4; extension)
    profile_dir: str | None = None  # jax.profiler trace of epoch 1 (SURVEY §5.1)
    # Dropout-stream PRNG. torch dropout uses the counter-based Philox
    # generator; JAX's default threefry costs ~100 ms/step at FAFormer batch
    # 768 shapes on the v5e (measured), while "rbg" is the TPU-native counter
    # RNG: faformer 1,913 -> 2,905 mols/s, same loss trajectory (PERF.md).
    rng_impl: str = "rbg"
    # Extra run identity (method name, ModelConfig, std, ...) merged into
    # every checkpoint's .meta.json so `equihgnn_tpu.predict` can rebuild
    # the model from the checkpoint alone.
    run_meta: dict | None = None


def _adam_like(weight_decay: float, clip_gnorm: float | None = None):
    """torch.optim.Adam(lr, weight_decay) without the final LR scale."""
    chain = []
    if clip_gnorm:
        chain.append(optax.clip_by_global_norm(clip_gnorm))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


def masked_mse(preds, y, graph_mask):
    m = graph_mask.astype(preds.dtype)
    return jnp.sum((preds - y) ** 2 * m), jnp.sum(m)


class _Prefetcher:
    """Bounded background-thread iterator: runs the (numpy padding + H2D
    transfer) producer ahead of the consumer. JAX transfers are thread-safe;
    depth 2 is enough to hide host work behind the device step."""

    _END, _ERR = object(), object()

    def __init__(self, it, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(it,), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, it):
        try:
            for x in it:
                if not self._put(("ok", x)):
                    return
            self._put((self._END, None))
        except BaseException as e:  # propagate to the consumer
            self._put((self._ERR, e))

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():  # closed or exhausted: never block again
            raise StopIteration
        kind, val = self._q.get()
        if kind is self._END:
            self._stop.set()
            raise StopIteration
        if kind is self._ERR:
            self._stop.set()
            raise val
        return val

    def close(self):
        self._stop.set()


class Trainer:
    """Drives one run of (fit + test) for a model on padded-batch loaders."""

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        example_batch,
        std: float | None = None,
    ):
        self.model = model
        self.cfg = cfg
        self.std = std
        self.tx = _adam_like(cfg.weight_decay, cfg.clip_gnorm)
        self.mesh = (
            get_data_mesh(cfg.num_devices) if cfg.data_parallel else None
        )

        self._comet = self._maybe_comet()
        rng = jax.random.PRNGKey(cfg.seed)
        ex = jax.tree.map(jnp.asarray, example_batch)
        variables = model.init(rng, ex, deterministic=True)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        self._step_fn = self._build_train_step()
        self._eval_fn = self._build_eval_step()
        self.history: list[dict] = []

    # ------------------------------------------------------------------ steps
    def _build_train_step(self):
        model, tx = self.model, self.tx
        has_bn = bool(self.batch_stats)

        def step(params, opt_state, batch_stats, batch, lr, rng, axis=None):
            def loss_fn(p):
                variables = {"params": p}
                if has_bn:
                    variables["batch_stats"] = batch_stats
                    preds, mut = model.apply(
                        variables,
                        batch,
                        deterministic=False,
                        rngs={"dropout": rng},
                        mutable=["batch_stats"],
                    )
                    new_stats = mut["batch_stats"]
                else:
                    preds = model.apply(
                        variables, batch, deterministic=False, rngs={"dropout": rng}
                    )
                    new_stats = batch_stats
                sq, cnt = masked_mse(preds, batch.y, batch.graph_mask)
                if axis is not None:
                    cnt = jax.lax.psum(cnt, axis)
                loss = sq / jnp.maximum(cnt, 1.0)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            if axis is not None:
                grads = jax.lax.psum(grads, axis)
                loss = jax.lax.psum(loss, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_stats, loss

        # The carried dropout key is split INSIDE the jitted step: a host-side
        # jax.random.split per step is an eager op (a tunnel round-trip each
        # on axon) that serializes the async dispatch queue.
        if self.mesh is None:

            def single(params, opt_state, batch_stats, batch, lr, rng):
                rng, k = jax.random.split(rng)
                out = step(params, opt_state, batch_stats, batch, lr, k,
                           axis=None)
                return out + (rng,)

            return jax.jit(single)

        mesh = self.mesh
        ndev = mesh.devices.size

        def sharded(params, opt_state, batch_stats, batches, lr, rng):
            # batches: pytree with leading [ndev]; params/opt replicated
            rng, k = jax.random.split(rng)
            keys = jax.random.split(k, ndev)

            def body(p, o, bs, b, r):
                b = jax.tree.map(lambda x: x[0], b)
                return step(p, o, bs, b, lr, r[0], axis="data")

            out = shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(), P(), P("data"), P("data")),
                out_specs=P(),
                check_vma=False,
            )(params, opt_state, batch_stats, batches, keys)
            return out + (rng,)

        return jax.jit(sharded)

    def _build_eval_step(self):
        model = self.model
        has_bn = bool(self.batch_stats)

        def evaluate(params, batch_stats, batch):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, batch, deterministic=True)

        if self.mesh is None:
            return jax.jit(evaluate)

        mesh = self.mesh

        def sharded(params, batch_stats, batches):
            def body(p, bs, b):
                b = jax.tree.map(lambda x: x[0], b)
                return evaluate(p, bs, b)[None]

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )(params, batch_stats, batches)

        return jax.jit(sharded)

    # ------------------------------------------------------------------ loops
    def _device_batches(self, loader: Iterable, make_empty):
        """Host batches → device, prefetched on a background thread so the
        padding + H2D transfer of batch k+1 overlaps the device step of
        batch k (the jitted step is dispatched asynchronously)."""
        if self.mesh is None:
            src = (jax.tree.map(jnp.asarray, b) for b in loader)
        else:
            ndev = self.mesh.devices.size
            src = (
                jax.tree.map(jnp.asarray, g)
                for g in group_for_devices(iter(loader), ndev, make_empty)
            )
        pf = _Prefetcher(src, depth=2)
        try:
            yield from pf
        finally:
            pf.close()

    def train_epoch(self, loader, lr: float, rng, make_empty=None) -> float:
        # No host-side sync inside the loop: the loss stays a device scalar
        # (fetched once per epoch) and the dropout key advances inside the
        # jitted step, so steps pipeline through the async dispatch queue.
        losses: list = []
        lr32 = np.float32(lr)
        for batch in self._device_batches(loader, make_empty):
            (self.params, self.opt_state, self.batch_stats, loss, rng
             ) = self._step_fn(
                self.params, self.opt_state, self.batch_stats, batch, lr32, rng
            )
            losses.append(loss)
            if self.cfg.debug:
                break
        if not losses:
            return 0.0
        return float(np.mean(jax.device_get(losses)))  # one fetch per epoch

    def eval_epoch(self, loader, make_empty=None) -> EvalAccumulator:
        acc = EvalAccumulator(std=self.std)
        pending = []
        for batch in self._device_batches(loader, make_empty):
            preds = self._eval_fn(self.params, self.batch_stats, batch)
            pending.append((preds, batch.y, batch.graph_mask))
            if self.cfg.debug:
                break
        for preds, y, mask in pending:  # fetch after all dispatches
            acc.update(
                np.asarray(preds).reshape(-1),
                np.asarray(y).reshape(-1),
                np.asarray(mask).reshape(-1),
            )
        return acc

    def fit(
        self,
        train_loader_fn: Callable[[int], Iterable],
        val_loader_fn: Callable[[], Iterable],
        make_empty=None,
    ) -> dict:
        cfg = self.cfg
        plateau = ReduceLROnPlateau(
            cfg.lr,
            factor=cfg.plateau_factor,
            patience=cfg.plateau_patience,
            min_lr=cfg.min_lr if cfg.min_lr is not None else cfg.lr * 1e-5,
        )
        early = EarlyStopping(patience=cfg.early_stop_patience)
        rng = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
        best = {"val_mae_mean": float("inf"), "epoch": -1}
        lr = cfg.lr
        start_epoch = 0
        if cfg.resume:
            meta = self._restore_checkpoint("last")
            if meta:
                start_epoch = int(meta.get("epoch", -1)) + 1
                lr = float(meta.get("lr", lr))

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            rng, k = jax.random.split(rng)
            if cfg.profile_dir and epoch == start_epoch + 1:
                with jax.profiler.trace(cfg.profile_dir):
                    train_loss = self.train_epoch(
                        train_loader_fn(epoch), lr, k, make_empty
                    )
            else:
                train_loss = self.train_epoch(
                    train_loader_fn(epoch), lr, k, make_empty
                )
            acc = self.eval_epoch(val_loader_fn(), make_empty)
            metrics = acc.compute(
                prefix="val_", num_bootstraps=cfg.num_bootstraps, seed=epoch
            )
            metrics.update(
                epoch=epoch, train_loss=train_loss, lr=lr,
                epoch_time=time.time() - t0,
            )
            self.history.append(metrics)
            self._log_csv(metrics)

            monitored = metrics["val_mae_mean"]
            if monitored < best["val_mae_mean"] and not cfg.debug:
                best = {"val_mae_mean": monitored, "epoch": epoch}
                self._save_checkpoint("best", meta={"epoch": epoch, "lr": lr})
            lr = plateau.step(monitored)
            if not cfg.debug:
                self._save_checkpoint("last", meta={"epoch": epoch, "lr": lr})
            if early.step(monitored) or cfg.debug:
                break
        return best

    def test(self, test_loader_fn, restore_best: bool = True, make_empty=None):
        if restore_best and not self.cfg.debug:
            self._restore_checkpoint("best")
        acc = self.eval_epoch(test_loader_fn(), make_empty)
        metrics = acc.compute(prefix="test_", num_bootstraps=self.cfg.num_bootstraps)
        self._log_csv(metrics)
        if self.cfg.log_dir:
            preds, targets = acc.arrays()
            path = os.path.join(self.cfg.log_dir, "test_results.csv")
            with open(path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["pred", "truth"])
                w.writerows(zip(preds.tolist(), targets.tolist()))
        return metrics

    # ------------------------------------------------------------- utilities
    def _maybe_comet(self):
        """Comet experiment when COMET_API_KEY is set and comet_ml installed
        (reference logs to project "Geometric Molecular Hypergraph",
        `reference main.py:246-253`); silently disabled otherwise."""
        if not os.environ.get("COMET_API_KEY"):
            return None
        try:  # pragma: no cover - optional dependency
            import comet_ml

            return comet_ml.Experiment(
                api_key=os.environ["COMET_API_KEY"],
                project_name="Geometric Molecular Hypergraph",
            )
        except Exception as e:  # pragma: no cover
            print(f"[trainer] comet logging disabled: {e}")
            return None

    def _log_csv(self, metrics: dict):
        if self._comet is not None:  # pragma: no cover - optional dependency
            step = metrics.get("epoch")
            self._comet.log_metrics(
                {k: v for k, v in metrics.items() if isinstance(v, (int, float))},
                epoch=step,
            )
        if not self.cfg.log_dir:
            return
        os.makedirs(self.cfg.log_dir, exist_ok=True)
        path = os.path.join(self.cfg.log_dir, "metrics.csv")
        exists = os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=sorted(metrics.keys()))
            if not exists:
                w.writeheader()
            w.writerow(metrics)

    def _ckpt_dir(self, tag: str) -> str:
        base = self.cfg.log_dir or "checkpoints"
        return os.path.abspath(os.path.join(base, f"ckpt_{tag}"))

    def _save_checkpoint(self, tag: str, meta: dict | None = None):
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(tag)
        ckptr = ocp.StandardCheckpointer()
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "batch_stats": self.batch_stats,
        }
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        if meta is not None:
            if self.cfg.run_meta:
                meta = {**self.cfg.run_meta, **meta}
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)

    def _restore_checkpoint(self, tag: str) -> dict | None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(tag)
        if not os.path.exists(path):
            return None
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": self.params,
            "opt_state": self.opt_state,
            "batch_stats": self.batch_stats,
        }
        state = ckptr.restore(path, target)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.batch_stats = state["batch_stats"]
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                return json.load(f)
        return {}
