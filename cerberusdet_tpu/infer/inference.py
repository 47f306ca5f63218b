"""Public inference API with the reference's output contract.

Behavioral parity target: cerberusdet/cerberusdet_inference.py:18-186:
all-task forward -> per-task NMS -> global class-id remap -> cross-task NMS ->
scale to original shapes -> [{box, score, label, label_name, task}] per image.

TPU-first: the forward + per-task NMS + cross-task suppression all run in ONE
jitted program with static shapes; only the final ragged formatting is host
python.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from cerberusdet_tpu.evaluation.val import scale_boxes_np
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx
from cerberusdet_tpu.ops.nms import cross_task_suppress, non_max_suppression


def build_category_map(names: Dict[str, Sequence[str]]):
    """{task: [names]} -> ({task: {local_id: global_id}}, all_names)
    (cerberusdet_inference.py:56-76)."""
    categories_map: Dict[str, Dict[int, int]] = {}
    all_names: List[str] = []
    offset = 0
    for task, task_names in names.items():
        categories_map[task] = {i: i + offset for i in range(len(task_names))}
        all_names.extend(task_names)
        offset += len(task_names)
    return categories_map, all_names


class CerberusDetInference:
    """Multi-task detector inference.

    Construct from (model, params) or from a framework checkpoint path.
    """

    def __init__(
        self,
        model: Optional[CerberusModel] = None,
        params=None,
        weights: Optional[str] = None,
        names: Optional[Dict[str, Sequence[str]]] = None,
        conf_thres: float = 0.25,
        iou_thres: float = 0.45,
        iou_thres_between_tasks: float = 0.8,
        img_size: int = 640,
        half: bool = True,
        max_det: int = 300,
        dtype=None,
        int8: str = "off",
        calib_batches=None,
        mesh=None,
        warmup_batch: Optional[int] = None,
    ):
        """dtype overrides the half flag when given (e.g. jnp.float64 for
        numeric-parity debugging with jax_enable_x64; params are kept fp32
        and cast per-op).

        int8: "off" | "deep" | "all" — post-training quantization of the
        fused convs (quant/ptq.py); activation scales calibrated on
        `calib_batches` (list of (B,H,W,3) float arrays in [0,1]; a
        random-noise batch is used when omitted — pass real data for best
        scales).

        mesh: optional jax.sharding.Mesh (1-D data axis, parallel/mesh.py)
        for multi-chip serving: params are replicated, predict() shards the
        batch over the axis, and GSPMD partitions the whole one-program
        pipeline — the Pallas NMS kernel carries its own batch-partitioning
        rule (ops/nms_pallas.py) so each chip NMSes only its shard. Batch
        size must be divisible by the mesh size."""
        if model is None:
            if weights is None:
                raise ValueError("provide (model, params) or a weights path")
            from cerberusdet_tpu.manager.checkpoint import load_checkpoint

            ckpt = load_checkpoint(weights)
            meta = ckpt["meta"]
            model = CerberusModel(meta["cfg"], meta["task_ids"], meta["nc"])
            params = ckpt["ema"] if ckpt.get("ema") else ckpt["params"]
            names = names or dict(zip(meta["task_ids"], meta["names"]))
        if names is None:
            raise ValueError("names required when passing (model, params)")
        self.model = model
        self.names = dict(names)
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.iou_thres_between_tasks = iou_thres_between_tasks
        self.max_det = max_det
        self.stride = int(max(model.strides))
        self.compute_dtype = (dtype if dtype is not None
                              else jnp.bfloat16 if half else jnp.float32)
        self.categories_map, self.all_class_names = build_category_map(self.names)
        self.task_order = list(self.names.keys())
        # always run fused at inference (exact; reference fuses in attempt_load)
        fused = model.fuse(params)
        if int8 != "off":
            from cerberusdet_tpu.quant import (
                calibrate_amax,
                quantize_params,
                select_all,
            )
            from cerberusdet_tpu.quant.ptq import select_deep

            if calib_batches is None:
                # uniform-noise fallback covers the [0,1] input range (a
                # constant image would underestimate every activation scale
                # and clip real inputs); REAL images give better scales
                print("CerberusDetInference: int8 enabled without "
                      "calib_batches — calibrating on random noise; pass "
                      "real batches for best accuracy")
                calib_batches = [np.random.default_rng(0).uniform(
                    0, 1, (2, img_size, img_size, 3)).astype(np.float32)]
            amax = calibrate_amax(model, fused, calib_batches,
                                  dtype=self.compute_dtype)
            fused = quantize_params(
                fused, amax,
                select=select_all if int8 == "all" else select_deep(),
                model=model)
        self.mesh = mesh
        if mesh is not None:
            from cerberusdet_tpu.parallel.mesh import replicate

            self.params = replicate(fused, mesh)
        else:
            self.params = jax.device_put(fused)
        # params are a RUNTIME argument of the jitted program, never a traced
        # constant: closure-capturing them would serialize every weight into
        # the HLO (hundreds of MB for v8x — rejected by remote compile
        # services) and force a recompile whenever params change.
        self._device_predict = jax.jit(
            self._predict_impl,
            static_argnames=("conf_thres", "iou_thres", "iou_bt", "agnostic",
                             "max_det"),
        )
        # warmup/compile at the nominal size; callers with a known serving
        # batch (serve.py pads every batch to max_batch) pass warmup_batch
        # so the ONE program shape they will actually run is compiled here —
        # a batch-1 warmup would compile a second, never-used program
        self.img_size = img_size
        self.warmup(img_size, warmup_batch)

    # ------------------------------------------------------------------
    def warmup(self, img_size: int, batch: Optional[int] = None):
        if batch is None:
            batch = 1 if self.mesh is None else self.mesh.devices.size
        dummy = self._shard(jnp.zeros((batch, img_size, img_size, 3),
                                      jnp.float32))
        self._device_predict(self.params, dummy, self.conf_thres, self.iou_thres,
                             self.iou_thres_between_tasks, False, self.max_det)

    def _shard(self, batch):
        """Place the batch: sharded over the mesh's data axis when serving
        multi-chip, default device placement otherwise."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        return jax.device_put(
            batch, NamedSharding(self.mesh, P(axis, None, None, None)))

    def _predict_impl(self, params, batch, conf_thres, iou_thres, iou_bt,
                      agnostic, max_det):
        """One fused program: forward all heads -> per-task NMS -> global class
        remap -> cross-task suppression. Returns (B, T*max_det, 6) + keep."""
        ctx = Ctx(train=False, dtype=self.compute_dtype)
        out = self.model(params, batch, ctx)
        dets_all, task_idx_all = [], []
        for ti, task in enumerate(self.task_order):
            pred, _ = out[task]
            nc = len(self.names[task])
            dets, _ = non_max_suppression(
                pred, nc=nc, conf_thres=float(conf_thres), iou_thres=float(iou_thres),
                agnostic=agnostic, max_det=max_det,
            )
            offset = self.categories_map[task][0]
            cls_global = jnp.where(dets[..., 4:5] > 0, dets[..., 5:6] + offset, 0.0)
            dets = jnp.concatenate([dets[..., :5], cls_global], axis=-1)
            dets_all.append(dets)
            task_idx_all.append(jnp.full(dets.shape[:2], ti, jnp.int32))
        merged = jnp.concatenate(dets_all, axis=1)          # (B, T*max_det, 6)
        task_idx = jnp.concatenate(task_idx_all, axis=1)    # (B, T*max_det)
        # task-major layout with max_det rows per task: final-task rows are
        # no-op scan iterations -> bound the sequential loop exactly
        scan_rows = (len(self.task_order) - 1) * max_det
        keep = jax.vmap(lambda d, t: cross_task_suppress(
            d, t, float(iou_bt), scan_rows=scan_rows))(merged, task_idx)
        return merged, task_idx, keep

    # ------------------------------------------------------------------
    def predict(
        self,
        batch,
        original_shape: Union[Tuple[int, int], List[Tuple[int, int]], None] = None,
        max_det: Optional[int] = None,
        agnostic_nms: bool = False,
        conf_thres: Optional[float] = None,
        iou_thres: Optional[float] = None,
        iou_thres_between_tasks: Optional[float] = None,
    ) -> List[List[Dict]]:
        """batch: (B, H, W, 3) float NHWC in [0,1] (CerberusPreprocessor
        output). Returns per image a list of
        {box, score, label, label_name, task} dicts (reference contract)."""
        conf_thres = self.conf_thres if conf_thres is None else conf_thres
        iou_thres = self.iou_thres if iou_thres is None else iou_thres
        iou_bt = (self.iou_thres_between_tasks if iou_thres_between_tasks is None
                  else iou_thres_between_tasks)
        max_det = self.max_det if max_det is None else max_det
        batch = self._shard(jnp.asarray(batch))
        merged, task_idx, keep = self._device_predict(
            self.params, batch, conf_thres, iou_thres, iou_bt,
            bool(agnostic_nms), int(max_det))
        merged = np.asarray(merged)
        task_idx = np.asarray(task_idx)
        keep = np.asarray(keep)

        net_shape = batch.shape[1:3]
        results: List[List[Dict]] = []
        for i in range(len(merged)):
            det = merged[i][keep[i]]
            tidx = task_idx[i][keep[i]]
            order = np.argsort(-det[:, 4])
            det, tidx = det[order], tidx[order]
            if len(det) and original_shape is not None:
                shape = (original_shape[i] if isinstance(original_shape, list)
                         else original_shape)
                det[:, :4] = scale_boxes_np(net_shape, det[:, :4], shape).round()
            image_results = []
            for row, ti in zip(det, tidx):
                c = int(row[5])
                image_results.append({
                    "box": [int(v) for v in row[:4]],
                    "score": float(row[4]),
                    "label": c,
                    "label_name": self.all_class_names[c],
                    "task": self.task_order[int(ti)],
                })
            results.append(image_results)
        return results
