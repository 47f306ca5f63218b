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


def load_reference_cerberusdet():
    """Returns the reference CerberusDet class (torch), or None if
    unimportable."""
    noop = lambda *a, **k: None
    log = types.SimpleNamespace(info=noop, warning=noop, error=noop, debug=noop)
    _stub("pkg_resources", parse_version=lambda v: v)
    _stub("torchvision", ops=types.SimpleNamespace(nms=None))
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
