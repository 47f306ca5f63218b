"""Helper: import the reference's torch model (read-only, for golden parity
tests), stubbing deps absent from this image. NOT part of the framework."""

import sys
import types

_REF = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _torch_nms(boxes, scores, iou_thres):
    """Exact torchvision.ops.nms semantics in pure torch (torchvision is not
    in this image): iterate candidates in descending score order, keep a box
    unless it overlaps an already-kept box above the threshold; return kept
    indices in score order."""
    import torch

    order = scores.argsort(descending=True)
    boxes = boxes[order]
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    n = boxes.shape[0]
    keep = []
    suppressed = torch.zeros(n, dtype=torch.bool)
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(x1[i], x1[i + 1:])
        yy1 = torch.maximum(y1[i], y1[i + 1:])
        xx2 = torch.minimum(x2[i], x2[i + 1:])
        yy2 = torch.minimum(y2[i], y2[i + 1:])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[i + 1:] - inter).clamp(min=1e-12)
        suppressed[i + 1:] |= iou > iou_thres
    return order[torch.tensor(keep, dtype=torch.long)]


def load_reference_cerberusdet():
    """Returns the reference CerberusDet class (torch), or None if
    unimportable."""
    noop = lambda *a, **k: None
    log = types.SimpleNamespace(info=noop, warning=noop, error=noop, debug=noop)
    _stub("pkg_resources", parse_version=lambda v: v)
    _stub("torchvision", ops=types.SimpleNamespace(nms=_torch_nms))
    _stub("loguru", logger=log)
    ml = _stub("mlflow")
    ml.__path__ = []
    mlm = _stub("mlflow.models")
    mlm.__path__ = []
    _stub("mlflow.models.signature", infer_signature=noop)
    _stub("mlflow.tracking", MlflowClient=object)
    ml.models = mlm
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    try:
        from cerberusdet.models.cerberus import CerberusDet
        return CerberusDet
    except Exception:
        return None
