"""GOLDEN validation-protocol parity vs the reference's own val machinery.

Two layers:
1. EXACT: identical detections + labels through both frameworks'
   process_batch (10-IoU matching, val.py:32-54) and DetMetrics/ap_per_class
   (101-pt COCO interp, metrics.py:56-270) — the numbers must agree to fp.
2. END-TO-END (slow): the reference's actual val.run (its dataloader, its
   letterbox, its torchvision-semantics NMS via the pure-torch stub) vs our
   run_task on the same images/weights. A random-init model's dense
   near-equal scores make NMS survivor sets chaotic across frameworks, so
   this layer asserts protocol-level agreement (identical recall, mAP within
   a chaos band), not bitwise equality — layer 1 plus the forward-parity
   golden tests cover exactness.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def _ref_modules():
    from ref_torch import load_reference_cerberusdet

    if load_reference_cerberusdet() is None:
        pytest.skip("reference not importable")
    from cerberusdet import val as ref_val
    from cerberusdet.utils import metrics as ref_metrics

    return ref_val, ref_metrics


def random_eval_data(seed, n_det=120, n_gt=25, nc=7):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 500, (n_det, 2))
    wh = rng.uniform(10, 120, (n_det, 2))
    det = np.concatenate([
        xy, xy + wh, rng.uniform(0.01, 1.0, (n_det, 1)),
        rng.integers(0, nc, (n_det, 1)).astype(np.float64)], 1)
    # half the GT copied from detections (guaranteed matches), half random
    g_from_det = det[rng.choice(n_det, n_gt // 2, replace=False)][:, [5, 0, 1, 2, 3]]
    gxy = rng.uniform(0, 500, (n_gt - n_gt // 2, 2))
    gwh = rng.uniform(10, 120, (n_gt - n_gt // 2, 2))
    g_rand = np.concatenate([
        rng.integers(0, nc, (n_gt - n_gt // 2, 1)).astype(np.float64),
        gxy, gxy + gwh], 1)
    labels = np.concatenate([g_from_det, g_rand], 0)
    return det, labels, nc


def test_golden_process_batch_exact():
    """The 10-IoU correct-prediction matrix matches the reference's exactly
    on shared random detections."""
    ref_val, _ = _ref_modules()
    import torch

    from cerberusdet_tpu.evaluation.metrics import IOUV, process_batch

    for seed in range(5):
        det, labels, _ = random_eval_data(seed)
        ours = process_batch(det.astype(np.float32), labels.astype(np.float32),
                             IOUV)
        iouv = torch.linspace(0.5, 0.95, 10)
        theirs = ref_val.process_batch(torch.from_numpy(det),
                                       torch.from_numpy(labels), iouv)
        np.testing.assert_array_equal(np.asarray(ours, bool),
                                      theirs.cpu().numpy().astype(bool),
                                      err_msg=f"seed {seed}")


def test_golden_map_machinery_exact():
    """P/R/mAP50/mAP from DetMetrics match the reference's to 1e-10 on
    identical matching inputs (101-pt interp, F1-argmax point, per-class APs)."""
    ref_val, ref_metrics = _ref_modules()
    import torch

    from cerberusdet_tpu.evaluation.metrics import DetMetrics, IOUV, process_batch

    det, labels, nc = random_eval_data(11, n_det=400, n_gt=80)
    correct = process_batch(det.astype(np.float32), labels.astype(np.float32), IOUV)

    ours = DetMetrics(nc, [str(i) for i in range(nc)])
    ours.update(np.asarray(correct), det[:, 4], det[:, 5], labels[:, 0])
    ours.process()
    mp, mr, map50, mAP = ours.mean_results()

    theirs = ref_metrics.DetMetrics(names={i: str(i) for i in range(nc)})
    theirs.plot = False
    theirs.process(np.asarray(correct, bool), det[:, 4], det[:, 5], labels[:, 0])
    r_mp, r_mr, r_map50, r_mAP = theirs.mean_results()

    np.testing.assert_allclose([mp, mr, map50, mAP],
                               [r_mp, r_mr, r_map50, r_mAP], rtol=1e-10)
    # per-class APs too (reference exposes them via get_maps(nc))
    np.testing.assert_allclose(ours.maps, theirs.get_maps(nc), rtol=1e-10)


@pytest.mark.slow
def test_golden_val_run_end_to_end(tmp_path):
    """The reference's whole val.run vs our run_task on identical images,
    weights, protocol (rect=True pad=0.5) and conf/iou settings, with GT
    derived from the model's own detections so metrics are far from zero."""
    ref_val, _ = _ref_modules()
    import torch

    import jax
    import jax.numpy as jnp
    import cv2

    from cerberusdet.data.dataloaders import create_dataloader as ref_loader_fn
    from ref_torch import load_reference_cerberusdet
    from cerberusdet_tpu.data.loaders import create_dataloader
    from cerberusdet_tpu.evaluation import val as our_val
    from cerberusdet_tpu.manager.pt_import import import_state_dict
    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.ops.nms import non_max_suppression

    Ref = load_reference_cerberusdet()
    rng = np.random.default_rng(0)
    tasks, ncs = ["a", "b"], [3, 5]
    names = [["c0", "c1", "c2"], list("pqrst")]
    data = {"task_ids": tasks, "nc": ncs, "names": names, "train": [], "val": []}
    for ti, t in enumerate(tasks):
        img_dir = tmp_path / t / "images" / "val"
        lb_dir = tmp_path / t / "labels" / "val"
        img_dir.mkdir(parents=True)
        lb_dir.mkdir(parents=True)
        for i in range(8):
            h = int(rng.integers(70, 140))
            w = int(rng.integers(70, 140))
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.integers(0, 255, (h, w, 3), np.uint8))
            (lb_dir / f"{i}.txt").write_text("0 0.5 0.5 0.5 0.5")
        data["train"].append(str(img_dir))
        data["val"].append(str(img_dir))

    torch.manual_seed(0)
    ref = Ref(task_ids=tasks, nc=ncs,
              cfg="/root/reference/cerberusdet/models/yolov8x_voc_obj365.yaml",
              verbose=False).float().eval()
    ref.names = {t: names[ti] for ti, t in enumerate(tasks)}
    with torch.no_grad():  # lift cls biases so detections actually exist
        for n, p in ref.named_parameters():
            if "cv3" in n and n.endswith(".bias") and p.ndim == 1:
                p += 7.0
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    model = CerberusModel("configs/models/yolov8x_2task.yaml", tasks, ncs)
    params = import_state_dict(model, model.init(jax.random.PRNGKey(0)), sd)

    IMGSZ, BS, CONF = 96, 4, 0.05

    # GT := our model's own confident detections, mapped to native space
    for ti, t in enumerate(tasks):
        _, loader = create_dataloader(
            data["val"][ti], imgsz=IMGSZ, batch_size=BS, augment=False,
            shuffle=False, rect=True, pad=0.5, task=f"p1{t}",
            host_sharded=False, cache_dir=str(tmp_path))
        fwd = our_val._eval_forward(model, t, jnp.float32)
        for batch in loader:
            img = jnp.asarray(batch["img"]).astype(jnp.float32) / 255.0
            pred, _ = fwd(params, img)
            dets, counts = non_max_suppression(
                pred, nc=ncs[ti], conf_thres=CONF, iou_thres=0.6,
                multi_label=True, max_det=30)
            dets, counts = np.asarray(dets), np.asarray(counts)
            h, w = batch["img"].shape[1:3]
            for si in range(len(batch["img"])):
                meta = batch["meta"][si]
                det = dets[si][: int(counts[si])].copy()
                if len(det):
                    det[:, :4] = our_val.scale_boxes_np(
                        (h, w), det[:, :4], meta["ori_shape"], meta["shapes"][1])
                h0, w0 = meta["ori_shape"]
                lines = []
                for r in det[:8]:
                    cx, cy = (r[0] + r[2]) / 2 / w0, (r[1] + r[3]) / 2 / h0
                    bw, bh = (r[2] - r[0]) / w0, (r[3] - r[1]) / h0
                    if bw > 0.01 and bh > 0.01:
                        lines.append(f"{int(r[5])} {cx:.6f} {cy:.6f} "
                                     f"{bw:.6f} {bh:.6f}")
                lb = pathlib.Path(str(meta["path"]).replace(
                    "/images/", "/labels/")).with_suffix(".txt")
                lb.write_text("\n".join(lines))
    for c in tmp_path.rglob("*.cache*"):
        c.unlink()

    for ti, t in enumerate(tasks):
        loader, _ = ref_loader_fn(data["val"][ti], IMGSZ, BS, 32, rect=True,
                                  pad=0.5, workers=0, task_ind=ti,
                                  task_names=tasks)
        r = ref_val.run(data, batch_size=BS, imgsz=IMGSZ, model=ref,
                        half=False, dataloader=loader, task_id=t, task_ind=ti,
                        plots=False, save_dir=tmp_path, conf_thres=CONF,
                        verbose=False)[0][:4]
        _, ours_loader = create_dataloader(
            data["val"][ti], imgsz=IMGSZ, batch_size=BS, augment=False,
            shuffle=False, rect=True, pad=0.5, task=f"p2{t}",
            host_sharded=False, cache_dir=str(tmp_path / "p2"))
        o = our_val.run_task(model, params, t, ours_loader, nc=ncs[ti],
                             conf_thres=CONF)["results"][:4]
        # both must find every self-GT box (recall EXACTLY 1.0) and agree on
        # mAP within the random-model chaos band
        assert r[1] == 1.0 and o[1] == 1.0, (t, r, o)
        assert r[2] > 0.5 and o[2] > 0.5, (t, r, o)
        assert abs(r[2] - o[2]) < 0.1, (t, r, o)
        assert abs(r[0] - o[0]) < 0.08, (t, r, o)
