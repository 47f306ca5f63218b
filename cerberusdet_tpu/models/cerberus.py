"""CerberusDet-TPU multi-task model: compile-time branch plan + pure forward.

This replaces the reference's mutable runtime DAG (cerberusdet/models/cerberus.py:
Controller nodes, execution_plan at :371, deepcopy-based sequential_split at
:704-737, rep_tensors caching at :825-877) with a *static* formulation:

  * The `cerber` schedule `[[k, [[head_ids...], ...]], ...]` (README.md:85-105)
    is resolved once into a per-(task, neck-layer) *branch label*: the tuple of
    (split_layer, group_index) pairs for every split at layer < current layer
    that mentions the task. Two tasks share a neck layer iff their labels for
    that layer are equal. Heads are always per-task.
  * Every unique (layer, label) pair becomes one parameter-tree entry ("uid").
    The forward pass is a plain Python walk over the union of the requested
    tasks' chains at TRACE time — XLA sees a single fused program computing
    each shared block exactly once; there is no runtime dispatch, no
    rep_tensors cache, no `find_unused_parameters`.
  * `serving_counts[uid]` (how many tasks use each block) is exported for the
    gradient-averaging train step (reference: trainers/averaging.py:211-217).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from cerberusdet_tpu.models.config import ParsedModel, parse_model_cfg
from cerberusdet_tpu.nn.layers import Detect
from cerberusdet_tpu.nn.module import Ctx, Params, split_rng

# experiment knob (tools/bench_int8 --barrier): wrap every block output in
# lax.optimization_barrier so XLA cannot fuse CONSECUTIVE convolutions into
# one kOutput fusion (the int8 trace shows 1x1+3x3 pairs at stage
# boundaries fused into ~25%-of-peak serial fusions)
import os as _os  # noqa: E402

_BLOCK_BARRIER = bool(_os.environ.get("CERBERUS_BLOCK_BARRIER"))

Label = Tuple[Tuple[int, int], ...]  # ((split_layer, group_idx), ...)


def _head_id_to_task(head_id: int, n_neck: int, n_tasks: int) -> int:
    """cerber head numbering: backbone=0, neck=1..n_neck, heads follow."""
    t = head_id - (n_neck + 1)
    if not 0 <= t < n_tasks:
        raise ValueError(f"cerber head id {head_id} out of range for {n_tasks} tasks")
    return t


def build_branch_labels(cerber: Optional[list], n_neck: int, n_tasks: int
                        ) -> Dict[int, List[Label]]:
    """For each task, the branch label of every neck layer (cerber index 1..n_neck).

    Returns {task_idx: [label_for_layer_1, ..., label_for_layer_n_neck]}.
    Matches the reference's sequential-split semantics (README example:
    `[[2, [[15], [13, 14]]], [6, [[13], [14]]]]` -> task 15 alone after layer 2;
    13 & 14 share 3..6 then split).
    """
    splits: List[Tuple[int, List[List[int]]]] = []
    for k, groups in (cerber or []):
        task_groups = [[_head_id_to_task(h, n_neck, n_tasks) for h in g] for g in groups]
        splits.append((int(k), task_groups))
    splits.sort(key=lambda s: s[0])

    out: Dict[int, List[Label]] = {}
    for t in range(n_tasks):
        labels: List[Label] = []
        for layer in range(1, n_neck + 1):
            comps: List[Tuple[int, int]] = []
            for k, groups in splits:
                if layer <= k:
                    continue
                for gi, g in enumerate(groups):
                    if t in g:
                        comps.append((k, gi))
                        break
            labels.append(tuple(comps))
        out[t] = labels
    return out


def _label_str(label: Label) -> str:
    return "" if not label else ":" + "-".join(f"{k}.{g}" for k, g in label)


@dataclasses.dataclass
class PlanStep:
    uid: str                 # parameter-tree key of this block instance
    node_idx: int            # yolo index into parsed.nodes (-1 for heads)
    in_uids: List[str]       # uids of the inputs ('__input__' for the image)
    task: Optional[str] = None  # set for head steps


class CerberusModel:
    """Static multi-task detector. All methods are pure w.r.t. params.

    Public surface (parity with cerberusdet/models/cerberus.py:142):
      init(rng) -> params
      __call__(params, x, ctx, tasks=None) -> {task_id: head_output}
      serving_counts, execution order (`plan(tasks)`), param grouping helpers.
    """

    def __init__(self, cfg: Union[str, dict], task_ids: Sequence[str],
                 nc: Union[int, Sequence[int]], verbose: bool = False):
        self.task_ids = list(task_ids)
        ncs = [nc] * len(task_ids) if isinstance(nc, int) else list(nc)
        if len(ncs) != len(self.task_ids):
            raise ValueError("nc list must match task_ids")
        self.nc = {t: n for t, n in zip(self.task_ids, ncs)}
        self.parsed: ParsedModel = parse_model_cfg(cfg)
        p = self.parsed
        self.n_backbone = p.n_backbone
        self.n_neck = len(p.nodes) - p.n_backbone
        self.strides = tuple(p.head_strides)

        self.labels = build_branch_labels(p.cerber, self.n_neck, len(self.task_ids))

        # ---- node uid assignment -------------------------------------------
        # backbone node i -> "b{i}" (always shared)
        # neck node with yolo idx j (cerber index c=j-n_backbone+1), task t ->
        #   "n{j}{label}" where label = labels[t][c-1]
        self._task_node_uid: Dict[Tuple[int, int], str] = {}
        for ti in range(len(self.task_ids)):
            for j in range(len(p.nodes)):
                self._task_node_uid[(ti, j)] = self._uid_for(ti, j)

        # per-task head layer objects (own nc each, shared strides/ch)
        self.heads: Dict[str, Detect] = {}
        for t in self.task_ids:
            h = Detect(self.nc[t], p.head_ch)
            h.stride = self.strides
            self.heads[t] = h

        # unique block instances: uid -> node_idx (for layer lookup)
        self.block_nodes: Dict[str, int] = {}
        for (ti, j), uid in self._task_node_uid.items():
            self.block_nodes.setdefault(uid, j)

        # serving counts: tasks per uid (heads count 1)
        self.serving_counts: Dict[str, int] = {}
        for ti, t in enumerate(self.task_ids):
            for j in range(len(p.nodes)):
                uid = self._task_node_uid[(ti, j)]
                self.serving_counts[uid] = self.serving_counts.get(uid, 0) + 1
            self.serving_counts[f"head_{t}"] = 1
        if verbose:
            for uid, n in self.serving_counts.items():
                print(f"{uid}: serving {n} task(s)")

    # ------------------------------------------------------------------ uids
    def _uid_for(self, task_idx: int, node_idx: int) -> str:
        if node_idx < self.n_backbone:
            return f"b{node_idx}"
        c = node_idx - self.n_backbone + 1  # cerber index
        label = self.labels[task_idx][c - 1]
        return f"n{node_idx}{_label_str(label)}"

    def head_uid(self, task: str) -> str:
        return f"head_{task}"

    # ------------------------------------------------------------------ plan
    def plan(self, tasks: Optional[Sequence[str]] = None) -> List[PlanStep]:
        """Topologically-ordered unique steps for the requested task subset.
        (Replaces CerberusDet.execution_plan, cerberus.py:371-403.)"""
        tasks = list(tasks) if tasks is not None else list(self.task_ids)
        p = self.parsed
        steps: List[PlanStep] = []
        seen: Dict[str, bool] = {}
        for t in tasks:
            ti = self.task_ids.index(t)
            for j in range(len(p.nodes)):
                uid = self._task_node_uid[(ti, j)]
                if uid in seen:
                    continue
                seen[uid] = True
                in_uids = [
                    "__input__" if f < 0 else self._task_node_uid[(ti, f)]
                    for f in p.nodes[j].frm
                ]
                steps.append(PlanStep(uid=uid, node_idx=j, in_uids=in_uids))
        for t in tasks:
            ti = self.task_ids.index(t)
            in_uids = [self._task_node_uid[(ti, f)] for f in p.head_from]
            steps.append(PlanStep(uid=self.head_uid(t), node_idx=-1, in_uids=in_uids, task=t))
        return steps

    # ------------------------------------------------------------------ init
    def init(self, rng) -> Params:
        """Init every unique block. Branched clones start with i.i.d. init;
        use `clone_shared_into_branches` after loading shared weights to
        replicate the reference's deepcopy-split (cerberus.py:461-633)."""
        uids = sorted(self.block_nodes) + [self.head_uid(t) for t in self.task_ids]
        keys = split_rng(rng, len(uids))
        params: Params = {}
        for uid, key in zip(uids, keys):
            if uid.startswith("head_"):
                params[uid] = self.heads[uid[len("head_"):]].init(key)
            else:
                params[uid] = self.parsed.nodes[self.block_nodes[uid]].layer.init(key)
        return params

    # --------------------------------------------------------------- forward
    def __call__(self, params: Params, x, ctx: Ctx,
                 tasks: Optional[Sequence[str]] = None) -> Dict[str, Any]:
        """x: (B, H, W, 3) NHWC float. Returns {task: head_output} where
        head_output is the Detect train/eval output (see nn/layers.py:Detect)."""
        outputs: Dict[str, Any] = {"__input__": x}
        results: Dict[str, Any] = {}
        for step in self.plan(tasks):
            if step.task is not None:
                head = self.heads[step.task]
                xs = [outputs[u] for u in step.in_uids]
                results[step.task] = head(params[step.uid], xs, ctx, (step.uid,))
                continue
            node = self.parsed.nodes[step.node_idx]
            if node.name == "Concat":
                inp = [outputs[u] for u in step.in_uids]
            else:
                inp = outputs[step.in_uids[0]]
            # .get: parameterless blocks (Upsample/Concat) may be absent from
            # trees that round-tripped through a flattened checkpoint
            p = params.get(step.uid, {})
            out = node.layer(p, inp, ctx, (step.uid,))
            if isinstance(p, dict) and "__q_out__" in p:
                # int8 PTQ annotation (quant/ptq.py:propagate_act_quant):
                # every consumer of this tensor quantizes with the same
                # scale, so quantize ONCE here — XLA fuses it into the
                # block's last conv epilogue and the tensor lives in HBM
                # as int8 (half the bytes of bf16)
                from cerberusdet_tpu.nn.module import quantize_act

                out = quantize_act(out, p["__q_out__"])
            if _BLOCK_BARRIER:
                import jax.lax

                out = jax.lax.optimization_barrier(out)
            outputs[step.uid] = out
        return results

    # ------------------------------------------------------- param utilities
    def clone_shared_into_branches(self, params: Params, src_params: Params) -> Params:
        """Given `src_params` from an unsplit model (all-shared: uids n{j}),
        copy each shared block's weights into every branched clone uid.
        Functional replacement for sequential_split's deepcopy."""
        out = dict(params)
        for uid, j in self.block_nodes.items():
            base = f"n{j}" if j >= self.n_backbone else uid
            src = src_params.get(uid, src_params.get(base))
            if src is not None:
                out[uid] = jax.tree_util.tree_map(lambda a: a, src)
        for t in self.task_ids:
            huid = self.head_uid(t)
            src = src_params.get(huid, src_params.get("head"))
            if src is not None:
                out[huid] = jax.tree_util.tree_map(lambda a: a, src)
        return out

    def grad_scale_tree(self, params: Params,
                        tasks: Optional[Sequence[str]] = None) -> Params:
        """Per-leaf 1/serving_count multipliers for gradient averaging
        (reference: averaging.py:211-217 divides grads of shared blocks by the
        number of tasks using them). With `tasks` given, counts only the
        active subset (batch-skipping semantics, averaging.py:183-192)."""
        if tasks is None:
            counts = self.serving_counts
        else:
            active = [self.task_ids.index(t) for t in tasks]
            counts = {}
            for ti in active:
                for j in range(len(self.parsed.nodes)):
                    uid = self._task_node_uid[(ti, j)]
                    counts[uid] = counts.get(uid, 0) + 1
            for t in tasks:
                counts[self.head_uid(t)] = 1
        scales: Params = {}
        for uid, sub in params.items():
            s = 1.0 / float(max(counts.get(uid, 1), 1))
            scales[uid] = jax.tree_util.tree_map(lambda _: s, sub)
        return scales

    def shared_uids(self) -> List[str]:
        """Blocks serving more than one task (or all backbone blocks when
        there is a single task) — the freeze_shared_layers target set
        (cerberus.py:884-928)."""
        if len(self.task_ids) == 1:
            return [u for u in self.block_nodes]
        return [u for u, n in self.serving_counts.items() if n > 1]

    def num_params(self, params: Params) -> int:
        return sum(int(jnp.size(l)) for l in jax.tree_util.tree_leaves(params))

    # ---------------------------------------------------------------- fuse
    def fuse(self, params: Params) -> Params:
        """Fold every BatchNorm into its preceding conv for inference
        (functional equivalent of CerberusDet.fuse, cerberus.py:739-757 /
        fuse_conv_and_bn, torch_utils.py:191-217). Returns a new tree where
        fused Convs hold {'w','b'}; apply() detects the layout per leaf."""
        from cerberusdet_tpu.nn.module import fuse_conv_bn

        def fuse_tree(p):
            if not isinstance(p, dict):
                return p
            if set(p.keys()) == {"w", "bn"}:
                w, b = fuse_conv_bn(p["w"], p["bn"])
                return {"w": w, "b": b}
            return {k: fuse_tree(v) for k, v in p.items()}

        return {uid: fuse_tree(sub) for uid, sub in params.items()}
