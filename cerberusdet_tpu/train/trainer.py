"""Epoch-loop training engine tying data, step, eval and checkpoints together.

Behavioral parity target: cerberusdet/train.py:42-276 (train()),
cerberusdet/trainers/base_trainer.py (val_epoch, warmup, per-task best
tracking) and trainers/averaging.py:97-203 (per-task iteration, batch
skipping, warmup window nw = max(warmup_epochs * nb, 1000)).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from cerberusdet_tpu.data.loaders import InfiniteLoader, create_dataloader
from cerberusdet_tpu.evaluation.metrics import overall_fitness
from cerberusdet_tpu.evaluation.val import run_task
from cerberusdet_tpu.manager.run_manager import RunManager
from cerberusdet_tpu.train.loss import DetectionLoss, scale_loss_gains
from cerberusdet_tpu.train.optim import SGDConfig
from cerberusdet_tpu.train.schedules import EarlyStopping, lr_lambda, warmup_lrs
from cerberusdet_tpu.train.step import MultiTaskTrainer, init_train_state
from cerberusdet_tpu.utils.hyp import get_hyperparameter, task_hyp_view


@dataclasses.dataclass
class TrainOptions:
    """CLI-surface mirror of train.py:279-336 (TPU-relevant subset; DDP/AMP
    flags are obsolete by design)."""

    cfg: Union[str, dict] = "configs/models/yolov8x.yaml"
    data: Union[str, dict] = ""
    hyp: Union[str, dict] = "configs/hyps/hyp.cerber-default.yaml"
    weights: str = ""                      # pretrained (.pt or .ckpt.npz)
    epochs: int = 100
    batch_size: Union[int, List[int]] = 16  # per task: int or list "4,4,40"
    imgsz: int = 640
    project: str = "runs/train"
    name: str = "exp"
    exist_ok: bool = False
    optimizer: str = "SGD"
    linear_lr: bool = False
    noval: bool = False
    nosave: bool = False
    patience: int = 30
    freeze_shared_till_epoch: int = 0
    skip_batches: bool = False
    balanced_sampler: bool = False
    labels_from_xml: bool = False
    use_multi_labels: bool = False
    use_soft_labels: bool = False
    cache_images: str = ""  # "" | "ram" | "disk" (packed memmap)
    augment_device: bool = False           # run mosaic/warp/HSV on the TPU
                                           # (data/device_augment.py); implies
                                           # cache_images="disk"
    single_cls: bool = False               # train multi-class data as one class
    workers: Optional[int] = None          # loader decode threads (--workers)
    proc_workers: int = 0                  # decode/augment worker PROCESSES
    warmup_min_iters: int = 1000           # reference warmup floor (averaging.py:57)
    use_mesh: bool = False                 # data-parallel mesh (--mesh); in
                                           # TrainOptions so resume restores it
    max_labels: int = 300
    plots: bool = True
    seed: int = 0
    compute_dtype: str = "float32"         # 'bfloat16' on TPU
    loss_weights: Optional[Dict[str, float]] = None
    resume: str = ""                       # path to last.ckpt.npz
    mlflow_url: str = ""                   # tracking server (reference --mlflow-url)
    experiment_name: str = "cerberusdet"


class TrainLoop:
    def __init__(self, opt: TrainOptions, data_dict: Dict[str, Any],
                 hyp: Dict[str, Any], use_mesh: Optional[bool] = None):
        self.opt = opt
        self.hyp = hyp
        if opt.single_cls:
            # the model is BUILT with one class per task
            # (models_manager.py:84-87)
            data_dict = dict(data_dict)
            data_dict["nc"] = [1] * len(data_dict["nc"])
            data_dict["names"] = [
                n if len(n) == 1 else ["item"] for n in data_dict["names"]
            ]
        self.manager = RunManager(
            hyp, data_dict, opt.cfg, Path(opt.project) / opt.name,
            exist_ok=opt.exist_ok, nosave=opt.nosave,
            mlflow_url=opt.mlflow_url, experiment_name=opt.experiment_name,
        )
        self.manager.dump_settings(dataclasses.asdict(opt))
        self.task_ids = self.manager.task_ids
        self.model, params, ckpt_meta = self.manager.load_model(
            opt.weights or None, seed=opt.seed, verbose=False)
        self.start_epoch = 0

        if not opt.nosave and jax.process_index() == 0:
            # one-time model-graph artifact in the run dir: StableHLO text +
            # XLA cost analysis — the TPU-native analog of the reference's
            # TensorBoard add_graph (models_manager.py:412-418). Process 0
            # only (it costs one eval-forward compile); evolve runs skip it
            # via nosave.
            from cerberusdet_tpu.utils.profiling import dump_model_graph

            dump_model_graph(self.model, params, self.manager.save_dir,
                             imgsz=opt.imgsz)

        # per-task batch sizes (train.py:286,370-373)
        bs = opt.batch_size
        self.batch_sizes = list(bs) if isinstance(bs, (list, tuple)) else [bs] * len(self.task_ids)

        # data loaders per task
        self.train_loaders, self.val_loaders, self.datasets = {}, {}, {}
        gs = int(max(self.model.strides))
        for ti, task in enumerate(self.task_ids):
            thyp = task_hyp_view(hyp, ti, task)
            ds, loader = create_dataloader(
                data_dict["train"][ti], imgsz=opt.imgsz,
                batch_size=self.batch_sizes[ti], stride=gs, hyp=thyp, augment=True,
                balanced_sampler=opt.balanced_sampler, use_xml=opt.labels_from_xml,
                classnames=data_dict["names"][ti],
                multi_label=opt.use_multi_labels, soft_label=opt.use_soft_labels,
                max_labels=opt.max_labels, task=task, seed=opt.seed,
                cache_images=opt.cache_images, single_cls=opt.single_cls,
                num_threads=opt.workers, num_workers=opt.proc_workers,
                augment_device=opt.augment_device,
            )
            self.datasets[task] = ds
            self.train_loaders[task] = loader
            _, vloader = create_dataloader(
                data_dict["val"][ti], imgsz=opt.imgsz,
                batch_size=self.batch_sizes[ti], stride=gs, augment=False,
                shuffle=False, use_xml=opt.labels_from_xml,
                classnames=data_dict["names"][ti],
                max_labels=opt.max_labels, task=f"{task}_val",
                single_cls=opt.single_cls, num_threads=opt.workers,
                # the packed cache serves val too (bit-identical to the
                # decode path), sparing every per-epoch val the re-decode —
                # but only where it pays: non-zero hosts never iterate this
                # loader, and noval (evolve) runs val at most once at the
                # end, so neither should eagerly decode the whole val set
                cache_images=(opt.cache_images
                              if jax.process_index() == 0 and not opt.noval
                              else ""),
                # process 0 validates the FULL set (reference rank-0 val);
                # other hosts never iterate this loader
                host_sharded=False,
            )
            self.val_loaders[task] = vloader

        # losses with scaled gains (models_manager.fill_tasks_parameters)
        nl = len(self.model.strides)
        self.losses = {}
        for ti, task in enumerate(self.task_ids):
            box_w = get_hyperparameter(hyp, "box", ti, task)
            cls_w = get_hyperparameter(hyp, "cls", ti, task)
            dfl_w = get_hyperparameter(hyp, "dfl", ti, task)
            box_w, cls_w = scale_loss_gains(box_w, cls_w, nl, opt.imgsz)
            self.losses[task] = DetectionLoss(
                nc=self.manager.nc[ti], strides=self.model.strides,
                box_w=box_w, cls_w=cls_w, dfl_w=dfl_w,
            )

        cdtype = jnp.bfloat16 if opt.compute_dtype == "bfloat16" else jnp.float32
        wd = float(get_hyperparameter(hyp, "weight_decay"))
        sgd_cfg = SGDConfig(weight_decay=wd, name=opt.optimizer)
        self.trainer = MultiTaskTrainer(
            self.model, self.losses, task_weights=opt.loss_weights,
            sgd=sgd_cfg, compute_dtype=cdtype,
        )
        self.state = init_train_state(params, sgd_cfg)

        # schedule
        self.lr0 = float(get_hyperparameter(hyp, "lr0"))
        self.lf = lr_lambda(opt.epochs, float(get_hyperparameter(hyp, "lrf")),
                            cos_lr=not opt.linear_lr)
        self.nb = max(len(l) for l in self.train_loaders.values())
        # warmup window: the reference floors it at 1000 iterations
        # (averaging.py:57) — sensible at production scale, but it silently
        # prevents ANY learning on tiny datasets (total iters < warmup), so
        # the floor is overridable for demos/tests
        self.nw = max(round(float(get_hyperparameter(hyp, "warmup_epochs")) * self.nb),
                      opt.warmup_min_iters)
        self.iters_per_task = None
        if opt.skip_batches:
            lens = [len(self.train_loaders[t]) for t in self.task_ids]
            self.iters_per_task = [max(self.nb // l, 1) for l in lens]
        self.stopper = EarlyStopping(opt.patience)
        # resume BEFORE mesh replication: _resume overwrites self.state with
        # freshly loaded host arrays, which would discard an earlier
        # replicate() and leave a resumed mesh run unsharded
        if opt.resume:
            self._resume(opt.resume)
        elif ckpt_meta:
            self.manager.best_fitness = ckpt_meta.get("best_fitness", 0.0)
        self.mesh = None
        if use_mesh is None:
            use_mesh = opt.use_mesh
        if use_mesh:
            from cerberusdet_tpu.parallel import make_mesh, replicate

            self.mesh = make_mesh()
            self.state = replicate(self.state, self.mesh)

    # ------------------------------------------------------------------
    def _resume(self, path: str):
        from cerberusdet_tpu.manager.checkpoint import load_checkpoint
        from cerberusdet_tpu.train.optim import SGDState

        ckpt = load_checkpoint(path)
        meta = ckpt["meta"]
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        self.state = init_train_state(params, self.trainer.sgd)
        if ckpt.get("ema"):
            self.state.ema_params = jax.tree_util.tree_map(jnp.asarray, ckpt["ema"])
        if ckpt.get("opt"):
            self.state.opt_state = SGDState(
                momentum_buf=jax.tree_util.tree_map(jnp.asarray, ckpt["opt"]),
                step=jnp.asarray(meta.get("n_updates", 0), jnp.int32),
            )
        self.state.n_updates = jnp.asarray(meta.get("n_updates", 0), jnp.int32)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.manager.best_fitness = meta.get("best_fitness", 0.0)
        self.manager.best_fitness_per_task.update(meta.get("best_fitness_per_task", {}))

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, np.ndarray]:
        opt = self.opt
        freeze = epoch < opt.freeze_shared_till_epoch
        iters = {t: InfiniteLoader(self.train_loaders[t], epoch=epoch)
                 for t in self.task_ids}
        momentum_h = float(get_hyperparameter(self.hyp, "momentum"))
        mloss: Dict[str, Any] = {t: None for t in self.task_ids}
        counts = {t: 0 for t in self.task_ids}
        is_main = jax.process_index() == 0
        if epoch == self.start_epoch and opt.plots and not opt.nosave and is_main:
            from cerberusdet_tpu.utils.plots import plot_labels

            for ti, t in enumerate(self.task_ids):
                plot_labels(self.datasets[t].labels,
                            self.manager.names[ti], self.manager.save_dir)
        for i in range(self.nb):
            ni = i + self.nb * epoch
            lrs, mom = warmup_lrs(
                ni, self.nw, epoch, self.lr0, self.lf(epoch),
                warmup_bias_lr=float(get_hyperparameter(self.hyp, "warmup_bias_lr")),
                warmup_momentum=float(get_hyperparameter(self.hyp, "warmup_momentum")),
                momentum=momentum_h,
            )
            self._last_lrs = lrs
            active = [
                t for ti, t in enumerate(self.task_ids)
                if self.iters_per_task is None or i % self.iters_per_task[ti] == 0
            ]
            if not active:
                continue
            batches = {}
            for t in active:
                b = next(iters[t])
                if (epoch == self.start_epoch and i < 3 and opt.plots
                        and not opt.nosave and is_main):
                    from cerberusdet_tpu.utils.plots import plot_images

                    plot_images(b, self.manager.save_dir / f"train_batch_{t}_{i}.png",
                                names=self.manager.names[self.task_ids.index(t)])
                b = {k: v for k, v in b.items() if k != "meta"}
                if self.mesh is not None:
                    from cerberusdet_tpu.parallel import pad_batch_to, shard_batch

                    # divisibility is per-host: local rows over local devices
                    # (shard_batch assembles the global batch under
                    # multi-process JAX)
                    n_dev = jax.local_device_count()
                    bs = b["img"].shape[0]
                    if bs % n_dev:
                        # loss- and BN-neutral padding (img_mask threads
                        # through the step): padded == unpadded gradients
                        b = pad_batch_to(b, bs + n_dev - bs % n_dev)
                    b = shard_batch(b, self.mesh)
                batches[t] = b
            self.state, items = self.trainer.step(self.state, batches, lrs, mom,
                                                  freeze_shared=freeze)
            for t in active:
                it = items[t]
                # accumulate ON DEVICE: float(it.box) here would force a
                # host sync every step (the round-1 ~1.0 s/step was mostly
                # this); the fetch happens once per epoch below
                dev = mloss.get(t)
                item_vec = jnp.stack([it.box, it.cls, it.dfl])
                mloss[t] = item_vec if dev is None else dev + item_vec
                counts[t] += 1
        out = {
            t: (np.asarray(mloss[t]) if mloss[t] is not None else np.zeros(3))
            / max(counts[t], 1)
            for t in self.task_ids
        }
        losses_str = "  ".join(
            f"{t}: box {out[t][0]:.3f} cls {out[t][1]:.3f} dfl {out[t][2]:.3f}"
            for t in self.task_ids)
        if is_main:
            print(f"epoch {epoch + 1}/{self.opt.epochs}  {losses_str}")
        return out

    # ------------------------------------------------------------------
    def val_epoch(self, epoch: int, plots: bool = False) -> float:
        """Per-task eval on EMA params; per-task best ckpts; returns mean
        fitness (base_trainer.py:114-194)."""
        results_per_task = {}
        ema_params = self.state.ema_params
        for ti, task in enumerate(self.task_ids):
            out = run_task(
                self.model, ema_params, task, self.val_loaders[task],
                nc=self.manager.nc[ti], names=self.manager.names[ti],
                compute_loss=self.losses[task], plots=plots,
                plots_dir=(self.manager.save_dir if plots and not self.opt.nosave
                           else None),
            )
            results_per_task[task] = out["results"][:4]
            self.manager.val_log(task, out["results"], epoch, out["fitness"])
            if out["fitness"] > self.manager.best_fitness_per_task[task]:
                self.manager.best_fitness_per_task[task] = out["fitness"]
                self.manager.save_best_task_model(task, self.state, epoch)
            if plots and not self.opt.nosave:
                self._save_val_plots(task, ti, out)
        return overall_fitness(results_per_task)

    def _save_val_plots(self, task: str, ti: int, out: dict):
        """PR curve + confusion matrix artifacts (val.py plots parity)."""
        from cerberusdet_tpu.utils.plots import plot_confusion_matrix, plot_pr_curve

        m = out["metrics"]
        if getattr(m, "_results", None):
            _, _, p, r, f1, ap, classes, p_curve, r_curve, px = m._results
            # curve rows follow ap_per_class's PRESENT-class order
            plot_pr_curve(px, p_curve, ap,
                          self.manager.save_dir / f"{task}_PR_curve.png",
                          [self.manager.names[ti][int(c)] for c in classes])
        plot_confusion_matrix(out["confusion"].matrix, self.manager.names[ti],
                              self.manager.save_dir / f"{task}_confusion_matrix.png")

    # ------------------------------------------------------------------
    def train(self) -> float:
        """Full loop; returns final best fitness.

        Multi-host (multi-process JAX): every host runs the identical jitted
        train step (the collectives need all of them), but validation,
        checkpoints, logs and plots belong to process 0 only — the reference's
        `RANK in [-1, 0]` gates (train.py:217-226). Unlike the reference,
        process 0's stop/fitness decision is BROADCAST so every host leaves
        the epoch loop together (the reference's rank-0-only `break` strands
        the other ranks at the next all-reduce)."""
        t0 = time.time()
        fi = 0.0
        is_main = jax.process_index() == 0
        for epoch in range(self.start_epoch, self.opt.epochs):
            mloss = self.train_epoch(epoch)
            stop = False
            if is_main:
                for t in self.task_ids:
                    self.manager.train_log(t, getattr(self, "_last_lrs", [0, 0, 0]),
                                           mloss[t], epoch)
                if not self.opt.noval:
                    final = epoch == self.opt.epochs - 1
                    fi = self.val_epoch(epoch, plots=final and self.opt.plots)
                is_best = fi >= self.manager.best_fitness
                if is_best:
                    self.manager.best_fitness = fi
                self.manager.save_model(self.state, epoch, is_best)
                stop = self.stopper(epoch, fi)
            stop, fi = self._broadcast_decision(stop, fi)
            if stop:
                break
        if self.opt.noval and is_main:  # evolve mode evaluates once at the end
            fi = self.val_epoch(self.opt.epochs - 1)
            self.manager.best_fitness = max(self.manager.best_fitness, fi)
        _, fi = self._broadcast_decision(False, fi)
        dt = time.time() - t0
        if is_main:
            if not self.opt.nosave and not self.opt.noval:
                self._final_val_on_ckpts()
            if not self.opt.nosave:
                # finalize saved artifacts: EMA promoted to params, optimizer
                # state dropped (strip_optimizer, train.py:260 /
                # general.py:557-578)
                from cerberusdet_tpu.manager.checkpoint import strip_checkpoint

                for name in ("last", "best"):
                    p = self.manager.wdir / f"{name}.ckpt.npz"
                    if p.exists():
                        strip_checkpoint(p)
            self.manager.finalize(self.opt.imgsz)
            print(f"training done in {dt/3600:.2f}h, "
                  f"best fitness {self.manager.best_fitness:.4f}")
        return self.manager.best_fitness if is_main else fi

    def _final_val_on_ckpts(self):
        """Re-validate the SAVED checkpoints (last, and best if it exists)
        through the standalone load path — fused conv+BN, EMA-preferred —
        like the reference's end-of-training val sweep (train.py:233-254).
        This validates the artifact a user will actually load."""
        from cerberusdet_tpu.manager.attempt_load import load_single

        for name in ("last", "best"):
            p = self.manager.wdir / f"{name}.ckpt.npz"
            if not p.exists():
                continue
            model, params, _meta = load_single(str(p), fuse=True)
            for ti, task in enumerate(self.task_ids):
                out = run_task(
                    model, params, task, self.val_loaders[task],
                    nc=self.manager.nc[ti], names=self.manager.names[ti],
                    verbose=True,
                )
                mp, mr, map50, mAP = out["results"][:4]
                print(f"final[{name}] {task}: P={mp:.4f} R={mr:.4f} "
                      f"mAP50={map50:.4f} mAP={mAP:.4f}")

    @staticmethod
    def _broadcast_decision(stop: bool, fitness: float):
        """Share process 0's (stop, fitness) with every host; no-op when
        single-process."""
        if jax.process_count() == 1:
            return stop, fitness
        from jax.experimental import multihost_utils

        arr = multihost_utils.broadcast_one_to_all(
            np.array([float(stop), float(fitness)], np.float32))
        return bool(arr[0] > 0.5), float(arr[1])
