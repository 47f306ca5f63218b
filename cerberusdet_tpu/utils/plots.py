"""Plot artifacts saved to the run directory.

Behavioral parity target: cerberusdet/utils/plots.py:222-457 (train-batch
mosaics, label histograms, LR schedule curve, evolution scatter) and
cerberusdet/utils/metrics.py:472-509 (PR / metric-confidence curves).
All matplotlib/cv2, host-side.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from cerberusdet_tpu.infer.visualizer import CerberusVisualizer, colors  # noqa: E402


def plot_images(batch: Dict, fname, names: Optional[Sequence[str]] = None,
                max_images: int = 16, max_size: int = 1920):
    """Grid of training images with their boxes (plots.py:222-333)."""
    import cv2

    imgs = np.asarray(batch["img"])[:max_images]
    if imgs.dtype != np.uint8:
        imgs = (imgs * 255).astype(np.uint8)
    b, h, w, _ = imgs.shape
    ns = int(np.ceil(b ** 0.5))
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    vis = CerberusVisualizer(line_thickness=2, text_scale=0.4)
    for i in range(b):
        r, c = divmod(i, ns)
        tile = imgs[i].copy()
        mask = np.asarray(batch["mask"][i])
        boxes = np.asarray(batch["bboxes"][i])[mask]
        cls = np.asarray(batch["cls"][i])[mask]
        for bx, cl in zip(boxes, cls):
            x1 = (bx[0] - bx[2] / 2) * w
            y1 = (bx[1] - bx[3] / 2) * h
            x2 = (bx[0] + bx[2] / 2) * w
            y2 = (bx[1] + bx[3] / 2) * h
            label = names[int(cl)] if names else str(int(cl))
            vis.draw_box(tile, (x1, y1, x2, y2), label, colors(int(cl), bgr=True))
        mosaic[r * h:(r + 1) * h, c * w:(c + 1) * w] = tile
    scale = min(1.0, max_size / (ns * max(h, w)))
    if scale < 1:
        mosaic = cv2.resize(mosaic, None, fx=scale, fy=scale)
    cv2.imwrite(str(fname), mosaic[..., ::-1])  # RGB -> BGR for imwrite


def plot_labels(labels: List[np.ndarray], names: Sequence[str], save_dir):
    """Class histogram + box-geometry scatter (plots.py:353-406)."""
    rows = np.concatenate([l for l in labels if len(l)], 0) if labels else np.zeros((0, 6))
    if not len(rows):
        return
    cls = rows[:, 0].astype(int)
    boxes = rows[:, 2:6]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4), tight_layout=True)
    axes[0].hist(cls, bins=np.arange(len(names) + 1) - 0.5, rwidth=0.8)
    axes[0].set_xlabel("class")
    axes[1].scatter(boxes[:, 0], boxes[:, 1], s=3, alpha=0.4)
    axes[1].set_xlabel("x"); axes[1].set_ylabel("y")
    axes[2].scatter(boxes[:, 2], boxes[:, 3], s=3, alpha=0.4)
    axes[2].set_xlabel("width"); axes[2].set_ylabel("height")
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    fig.savefig(Path(save_dir) / "labels.png", dpi=150)
    plt.close(fig)


def plot_pr_curve(px, py_per_class, ap, fname, names: Sequence[str] = ()):
    """PR curves per class + mean (metrics.py:472-489)."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py_per_class, axis=1) if isinstance(py_per_class, list) else py_per_class.T
    if 0 < len(names) < 21:
        for i in range(py.shape[1]):
            ax.plot(px, py[:, i], linewidth=1,
                    label=f"{names[i] if i < len(names) else i} {ap[i, 0]:.3f}")
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    ax.plot(px, py.mean(1), linewidth=3, color="blue",
            label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall"); ax.set_ylabel("Precision")
    ax.set_xlim(0, 1); ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize=8)
    fig.savefig(fname, dpi=250)
    plt.close(fig)


def plot_mc_curve(px, py, fname, names: Sequence[str] = (), xlabel="Confidence",
                  ylabel="Metric"):
    """Metric-vs-confidence curves (metrics.py:492-509)."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            ax.plot(px, y, linewidth=1, label=f"{names[i] if i < len(names) else i}")
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = py.mean(0)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel); ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1); ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize=8)
    fig.savefig(fname, dpi=250)
    plt.close(fig)


def plot_lr_scheduler(lr_lambda_fn, lr0: float, epochs: int, save_dir):
    """LR curve over epochs (plots.py:336-350)."""
    ys = [lr0 * lr_lambda_fn(e) for e in range(epochs)]
    fig = plt.figure()
    plt.plot(range(epochs), ys, ".-", label="LR")
    plt.xlabel("epoch"); plt.ylabel("LR")
    plt.savefig(Path(save_dir) / "LR.png", dpi=150)
    plt.close(fig)


def plot_confusion_matrix(matrix: np.ndarray, names: Sequence[str], fname,
                          normalize: bool = True):
    """Confusion-matrix heatmap without seaborn (metrics.py plot parity)."""
    arr = matrix / (matrix.sum(0, keepdims=True) + 1e-9) if normalize else matrix
    fig, ax = plt.subplots(figsize=(10, 8), tight_layout=True)
    im = ax.imshow(arr, cmap="Blues", vmin=0.0)
    fig.colorbar(im)
    ticklabels = list(names) + ["background"]
    if len(ticklabels) == arr.shape[0] and len(ticklabels) < 60:
        ax.set_xticks(range(len(ticklabels)))
        ax.set_yticks(range(len(ticklabels)))
        ax.set_xticklabels(ticklabels, rotation=90, fontsize=7)
        ax.set_yticklabels(ticklabels, fontsize=7)
    if arr.shape[0] < 30:
        for i in range(arr.shape[0]):
            for j in range(arr.shape[1]):
                if arr[i, j] >= 0.005:
                    ax.text(j, i, f"{arr[i, j]:.2f}", ha="center", va="center", fontsize=7)
    ax.set_xlabel("True"); ax.set_ylabel("Predicted")
    ax.set_title("Confusion Matrix")
    fig.savefig(fname, dpi=250)
    plt.close(fig)


def feature_visualization(x, module_name: str, save_dir, n: int = 32):
    """Per-channel feature-map grid (plots.py:458-481). x: (B, H, W, C)."""
    x = np.asarray(x)
    if x.ndim != 4 or x.shape[1] <= 1 or x.shape[2] <= 1:
        return
    channels = min(n, x.shape[-1])
    cols = 8
    rows = -(-channels // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.5, rows * 1.5),
                             tight_layout=True)
    for i, ax in enumerate(np.atleast_1d(axes).ravel()):
        ax.axis("off")
        if i < channels:
            ax.imshow(x[0, :, :, i], cmap="viridis")
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    fig.savefig(Path(save_dir) / f"features_{module_name}.png", dpi=150)
    plt.close(fig)


def plot_val_images(batch: Dict, dets: np.ndarray, counts: np.ndarray, fname,
                    names: Optional[Sequence[str]] = None,
                    conf_thres: float = 0.25, max_images: int = 16,
                    max_size: int = 1920):
    """Grid of val images with PREDICTED boxes (val.py:73-83 pred mosaics).
    dets: (B, max_det, 6) xyxy-pixel rows from non_max_suppression."""
    import cv2

    imgs = np.asarray(batch["img"])[:max_images]
    if imgs.dtype != np.uint8:
        imgs = (imgs * 255).astype(np.uint8)
    b, h, w, _ = imgs.shape
    ns = int(np.ceil(b ** 0.5))
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    vis = CerberusVisualizer(line_thickness=2, text_scale=0.4)
    for i in range(b):
        r, c = divmod(i, ns)
        tile = imgs[i].copy()
        for det in np.asarray(dets[i])[: int(counts[i])]:
            if det[4] < conf_thres:
                continue
            cl = int(det[5])
            label = (names[cl] if names and cl < len(names) else str(cl))
            vis.draw_box(tile, det[:4], f"{label} {det[4]:.2f}",
                         colors(cl, bgr=True))
        mosaic[r * h:(r + 1) * h, c * w:(c + 1) * w] = tile
    scale = min(1.0, max_size / (ns * max(h, w)))
    if scale < 1:
        mosaic = cv2.resize(mosaic, None, fx=scale, fy=scale)
    cv2.imwrite(str(fname), mosaic[..., ::-1])
