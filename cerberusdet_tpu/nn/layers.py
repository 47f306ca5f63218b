"""YOLOv8 layer zoo, TPU-native (NHWC, bf16 compute, XLA-fused epilogues).

Behavioral parity targets (not ports): cerberusdet/models/common.py:11-295
(Conv/C2f/SPPF/... definitions) and cerberusdet/models/yolo.py:48-110
(DFL + Detect head). Everything here is a static-config object with pure
`init`/`__call__`; see nn/module.py for the conventions.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cerberusdet_tpu.nn.module import (
    Ctx,
    Params,
    Path,
    autopad,
    batch_norm,
    conv2d,
    init_bn,
    init_conv_w,
    kaiming_uniform,
    quantize_act,
    silu,
    split_rng,
)
from cerberusdet_tpu.ops.anchors import dfl_expectation, dist2bbox, make_anchors


class Layer:
    """Base: static config + pure init/apply. `c2` = output channels."""

    c2: int = 0

    def init(self, rng) -> Params:
        raise NotImplementedError

    def __call__(self, p: Params, x, ctx: Ctx, path: Path = ()):
        raise NotImplementedError


class Conv(Layer):
    """Conv2d + BatchNorm + SiLU (common.py:51-68)."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act=True):
        self.c1, self.c2, self.k, self.s, self.p, self.g, self.d = c1, c2, k, s, p, g, d
        self.act = act

    def init(self, rng) -> Params:
        return {"w": init_conv_w(rng, self.k, self.c1, self.c2, self.g), "bn": init_bn(self.c2)}

    def __call__(self, p, x, ctx, path=()):
        if ctx.taps is not None and x.dtype != jnp.int8:
            # PTQ calibration: record the input's absmax (quant/ptq.py)
            ctx.taps[path] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        if "w_q" in p:
            # int8 PTQ inference layout (quant/ptq.py)
            from cerberusdet_tpu.nn.module import conv2d_int8

            y = conv2d_int8(x, p, self.s, self.p, self.g, self.d)
        else:
            y = conv2d(x, p["w"], self.s, self.p, self.g, self.d, ctx.dtype)
            if "bn" in p:
                y = batch_norm(p["bn"], y, ctx, path + ("bn",))
            elif "b" in p:
                y = y + p["b"]
        if self.act:
            y = silu(y)
        return y.astype(ctx.dtype)

    def fuse(self, p: Params) -> Params:
        """Fold BN into w/b for inference."""
        from cerberusdet_tpu.nn.module import fuse_conv_bn

        if "bn" not in p:
            return p
        w, b = fuse_conv_bn(p["w"], p["bn"])
        return {"w": w, "b": b}


class DWConv(Conv):
    """Depthwise conv (common.py:11)."""

    def __init__(self, c1, c2, k=1, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class PlainConv(Layer):
    """Bare Conv2d with bias, no BN, no activation (Detect towers' last 1x1)."""

    def __init__(self, c1, c2, k=1, s=1, p=None):
        self.c1, self.c2, self.k, self.s, self.p = c1, c2, k, s, p

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        fan_in = self.c1 * self.k * self.k
        bound = 1.0 / math.sqrt(fan_in)
        return {
            "w": init_conv_w(r1, self.k, self.c1, self.c2),
            "b": jax.random.uniform(r2, (self.c2,), jnp.float32, -bound, bound),
        }

    def __call__(self, p, x, ctx, path=()):
        y = conv2d(x, p["w"], self.s, self.p, dtype=ctx.dtype)
        return (y + p["b"]).astype(ctx.dtype)


class Seq(Layer):
    """Sequential container; params keyed '0', '1', ..."""

    def __init__(self, *layers: Layer):
        self.layers = list(layers)
        self.c2 = self.layers[-1].c2 if self.layers else 0

    def init(self, rng) -> Params:
        keys = split_rng(rng, max(len(self.layers), 1))
        return {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def __call__(self, p, x, ctx, path=()):
        for i, layer in enumerate(self.layers):
            x = layer(p[str(i)], x, ctx, path + (str(i),))
        return x


class Bottleneck(Layer):
    """Standard bottleneck (common.py:107-117)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        return {"cv1": self.cv1.init(r1), "cv2": self.cv2.init(r2)}

    def __call__(self, p, x, ctx, path=()):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx, path + ("cv1",)), ctx, path + ("cv2",))
        return x + y if self.add else y


class C2f(Layer):
    """Faster CSP bottleneck with 2 convs — the main YOLOv8 block
    (common.py:174-197). Channel-last chunk/concat keeps everything
    contiguous for XLA."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n)]
        self.c2 = c2

    def init(self, rng) -> Params:
        keys = split_rng(rng, 2 + len(self.m))
        return {
            "cv1": self.cv1.init(keys[0]),
            "cv2": self.cv2.init(keys[1]),
            "m": {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.m, keys[2:]))},
        }

    def __call__(self, p, x, ctx, path=()):
        y = self.cv1(p["cv1"], x, ctx, path + ("cv1",))
        ys = [y[..., : self.c], y[..., self.c :]]
        for i, b in enumerate(self.m):
            ys.append(b(p["m"][str(i)], ys[-1], ctx, path + ("m", str(i))))
        if "w_q" in p["cv2"]:
            # int8: quantize each chunk to cv2's scale BEFORE the concat —
            # bitwise-identical to quantizing after (quantize_act commutes
            # with concat), fuses into each producer's epilogue, and the
            # concat moves int8 bytes instead of bf16
            ys = [quantize_act(t, p["cv2"]["s_x"]) for t in ys]
        return self.cv2(p["cv2"], jnp.concatenate(ys, axis=-1), ctx, path + ("cv2",))


class C2(Layer):
    """CSP bottleneck with 2 convs (common.py:154-171)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c2, 1)
        self.m = Seq(*[Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n)])
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2, r3 = split_rng(rng, 3)
        return {"cv1": self.cv1.init(r1), "cv2": self.cv2.init(r2), "m": self.m.init(r3)}

    def __call__(self, p, x, ctx, path=()):
        y = self.cv1(p["cv1"], x, ctx, path + ("cv1",))
        a, b = y[..., : self.c], y[..., self.c :]
        a = self.m(p["m"], a, ctx, path + ("m",))
        if "w_q" in p["cv2"]:
            a, b = (quantize_act(t, p["cv2"]["s_x"]) for t in (a, b))
        return self.cv2(p["cv2"], jnp.concatenate([a, b], axis=-1), ctx, path + ("cv2",))


class C3(Layer):
    """CSP bottleneck with 3 convs (common.py:139-151)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = Seq(*[Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)])
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2, r3, r4 = split_rng(rng, 4)
        return {
            "cv1": self.cv1.init(r1),
            "cv2": self.cv2.init(r2),
            "cv3": self.cv3.init(r3),
            "m": self.m.init(r4),
        }

    def __call__(self, p, x, ctx, path=()):
        a = self.m(p["m"], self.cv1(p["cv1"], x, ctx, path + ("cv1",)), ctx, path + ("m",))
        b = self.cv2(p["cv2"], x, ctx, path + ("cv2",))
        if "w_q" in p["cv3"]:
            a, b = (quantize_act(t, p["cv3"]["s_x"]) for t in (a, b))
        return self.cv3(p["cv3"], jnp.concatenate([a, b], axis=-1), ctx, path + ("cv3",))


def max_pool(x, k: int, s: int = 1, p: Optional[int] = None):
    p = k // 2 if p is None else p
    # init value must be a Python scalar (a traced/array init breaks
    # reduce_window's linearization under jit)
    # dtype-matched numpy scalar: a bare python int arrives as int32 and
    # reduce_window rejects the operand/init dtype mismatch for int8 inputs
    neg = (-float("inf") if jnp.issubdtype(x.dtype, jnp.floating)
           else x.dtype.type(jnp.iinfo(x.dtype).min))
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=[(0, 0), (p, p), (p, p), (0, 0)],
    )


class SPP(Layer):
    """Spatial pyramid pooling (common.py:216-227)."""

    def __init__(self, c1, c2, k=(5, 9, 13)):
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * (len(k) + 1), c2, 1, 1)
        self.k = k
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        return {"cv1": self.cv1.init(r1), "cv2": self.cv2.init(r2)}

    def __call__(self, p, x, ctx, path=()):
        x = self.cv1(p["cv1"], x, ctx, path + ("cv1",))
        if "w_q" in p["cv2"]:
            # max commutes with the monotone quantize: pool in int8
            x = quantize_act(x, p["cv2"]["s_x"])
        ys = [x] + [max_pool(x, k) for k in self.k]
        return self.cv2(p["cv2"], jnp.concatenate(ys, axis=-1), ctx, path + ("cv2",))


class SPPF(Layer):
    """Fast SPP: 3 chained k-pools == SPP(k, 2k-1, 3k-2) (common.py:230-245)."""

    def __init__(self, c1, c2, k=5):
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.k = k
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        return {"cv1": self.cv1.init(r1), "cv2": self.cv2.init(r2)}

    def __call__(self, p, x, ctx, path=()):
        x = self.cv1(p["cv1"], x, ctx, path + ("cv1",))
        if "w_q" in p["cv2"]:
            # max commutes with the monotone quantize: the 3 chained pools
            # and the concat all run on int8 (half the bytes), bitwise equal
            x = quantize_act(x, p["cv2"]["s_x"])
        y1 = max_pool(x, self.k)
        y2 = max_pool(y1, self.k)
        y3 = max_pool(y2, self.k)
        return self.cv2(p["cv2"], jnp.concatenate([x, y1, y2, y3], axis=-1), ctx, path + ("cv2",))


class Focus(Layer):
    """Space-to-depth stem (common.py:248-257)."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        self.conv = Conv(c1 * 4, c2, k, s, p, g, act=act)
        self.c2 = c2

    def init(self, rng) -> Params:
        return {"conv": self.conv.init(rng)}

    def __call__(self, p, x, ctx, path=()):
        y = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return self.conv(p["conv"], y, ctx, path + ("conv",))


class GhostConv(Layer):
    """Ghost convolution (experimental.py:29-41)."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        c_ = c2 // 2
        self.cv1 = Conv(c1, c_, k, s, None, g, act=act)
        self.cv2 = Conv(c_, c_, 5, 1, None, c_, act=act)
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        return {"cv1": self.cv1.init(r1), "cv2": self.cv2.init(r2)}

    def __call__(self, p, x, ctx, path=()):
        y = self.cv1(p["cv1"], x, ctx, path + ("cv1",))
        return jnp.concatenate([y, self.cv2(p["cv2"], y, ctx, path + ("cv2",))], axis=-1)


class Concat(Layer):
    """Concatenate a list of NHWC tensors on channels (common.py:288-295)."""

    def __init__(self, dimension: int = 1):
        # Reference uses NCHW dim=1 == channels; NHWC channels are axis -1.
        self.axis = -1 if dimension == 1 else dimension
        self.c2 = 0  # filled by the config parser

    def init(self, rng) -> Params:
        return {}

    def __call__(self, p, xs, ctx, path=()):
        if "q_in" in p:
            # annotated by quant/ptq.py:propagate_act_quant — the (single)
            # consumer's first conv is int8 with scale q_in: quantize every
            # input chunk up front so the quantize fuses into each producer
            # and the concat moves int8 bytes (bitwise equal either way)
            xs = [quantize_act(x, p["q_in"]) for x in xs]
        return jnp.concatenate(xs, axis=self.axis)


class Upsample(Layer):
    """Nearest-neighbor integer upsample (torch nn.Upsample equivalent)."""

    def __init__(self, size=None, scale_factor: int = 2, mode: str = "nearest"):
        assert size is None and mode == "nearest", "only integer nearest upsample supported"
        self.f = int(scale_factor)
        self.c2 = 0

    def init(self, rng) -> Params:
        return {}

    def __call__(self, p, x, ctx, path=()):
        if "q_in" in p:
            # quantize BEFORE replicating: nearest upsample copies values, so
            # this is bitwise equal, runs the quantize on the small tensor,
            # and replicates int8 bytes (propagate_act_quant annotation)
            x = quantize_act(x, p["q_in"])
        return jnp.repeat(jnp.repeat(x, self.f, axis=1), self.f, axis=2)


class Detect(Layer):
    """YOLOv8 anchor-free decoupled detection head (yolo.py:64-110).

    Train output: list of per-level (B, H, W, 4*reg_max + nc) maps (NHWC).
    Eval output: (preds, feats) where preds is (B, N, 4 + nc):
    xywh boxes in input pixels + sigmoid class scores, all levels flattened.
    The DFL decode is a softmax+projection fused by XLA into the head epilogue.
    """

    def __init__(self, nc: int, ch: Sequence[int] = ()):
        self.nc = nc
        self.reg_max = 16
        self.no = nc + self.reg_max * 4
        self.nl = len(ch)
        self.ch = tuple(ch)
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        # NOT the newer ultralytics max(ch[0], min(nc, 100)): the reference
        # (yolo.py:79) widens the whole cls tower for nc > ch[0] — matters
        # for Objects365-full (nc=365, published 107M params README.md:243)
        c3 = max(ch[0], nc)
        self.box_towers = [
            Seq(Conv(c, c2, 3), Conv(c2, c2, 3), PlainConv(c2, 4 * self.reg_max, 1)) for c in ch
        ]
        self.cls_towers = [
            Seq(Conv(c, c3, 3), Conv(c3, c3, 3), PlainConv(c3, nc, 1)) for c in ch
        ]
        self.stride: Tuple[float, ...] = tuple(2 ** (3 + i) for i in range(self.nl))
        self.c2 = self.no

    def init(self, rng) -> Params:
        keys = split_rng(rng, 2 * self.nl)
        p: Params = {}
        for i in range(self.nl):
            p[f"box{i}"] = self.box_towers[i].init(keys[2 * i])
            p[f"cls{i}"] = self.cls_towers[i].init(keys[2 * i + 1])
        return self.bias_init(p)

    def bias_init(self, p: Params) -> Params:
        """Prior-aware bias init (yolo.py:102-110)."""
        p = jax.tree_util.tree_map(lambda x: x, p)  # shallow-ish copy via tree rebuild
        for i, s in enumerate(self.stride):
            box_last = dict(p[f"box{i}"]["2"])
            box_last["b"] = jnp.full_like(box_last["b"], 1.0)
            pb = dict(p[f"box{i}"])
            pb["2"] = box_last
            p = {**p, f"box{i}": pb}
            cls_last = dict(p[f"cls{i}"]["2"])
            cls_last["b"] = jnp.full_like(
                cls_last["b"], math.log(5 / self.nc / (640 / s) ** 2)
            )
            pc = dict(p[f"cls{i}"])
            pc["2"] = cls_last
            p = {**p, f"cls{i}": pc}
        return p

    def __call__(self, p, xs: List, ctx: Ctx, path: Path = ()):
        assert len(xs) == self.nl
        feats = []
        for i, x in enumerate(xs):
            box = self.box_towers[i](p[f"box{i}"], x, ctx, path + (f"box{i}",))
            cls = self.cls_towers[i](p[f"cls{i}"], x, ctx, path + (f"cls{i}",))
            feats.append(jnp.concatenate([box, cls], axis=-1))
        if ctx.train:
            return feats
        return self.decode(feats), feats

    def decode(self, feats: List):
        """Flatten levels and decode boxes (eval/inference path)."""
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, strides = make_anchors(shapes, self.stride)
        b = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1)
        distri, cls = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]
        dist = dfl_expectation(distri.astype(jnp.float32), self.reg_max)
        boxes = dist2bbox(dist, anchors[None], xywh=True) * strides[None]
        return jnp.concatenate([boxes, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)


# Registry used by the model-config interpreter (models/config.py).
LAYERS = {
    "Conv": Conv,
    "DWConv": DWConv,
    "Bottleneck": Bottleneck,
    "C2": C2,
    "C2f": C2f,
    "C3": C3,
    "SPP": SPP,
    "SPPF": SPPF,
    "Focus": Focus,
    "GhostConv": GhostConv,
    "Concat": Concat,
    "nn.Upsample": Upsample,
    "Upsample": Upsample,
    "Detect": Detect,
}


class Identity(Layer):
    def init(self, rng) -> Params:
        return {}

    def __call__(self, p, x, ctx, path=()):
        return x


class BareConv(Layer):
    """Conv2d without bias/BN/act (BottleneckCSP's cv2/cv3, MixConv2d members)."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1):
        self.c1, self.c2, self.k, self.s, self.p, self.g = c1, c2, k, s, p, g

    def init(self, rng) -> Params:
        return {"w": init_conv_w(rng, self.k, self.c1, self.c2, self.g)}

    def __call__(self, p, x, ctx, path=()):
        return conv2d(x, p["w"], self.s, self.p, self.g, dtype=ctx.dtype).astype(ctx.dtype)


class BN(Layer):
    """Standalone BatchNorm + LeakyReLU(0.1) epilogue used by CSP blocks."""

    def __init__(self, c, leaky: float = 0.1):
        self.c2 = c
        self.leaky = leaky

    def init(self, rng) -> Params:
        return {"bn": init_bn(self.c2)}

    def __call__(self, p, x, ctx, path=()):
        y = batch_norm(p["bn"], x.astype(jnp.float32), ctx, path + ("bn",))
        y = jax.nn.leaky_relu(y, self.leaky)
        return y.astype(ctx.dtype)


class BottleneckCSP(Layer):
    """CSP bottleneck (common.py:120-136): cv1->m->cv3 || cv2, BN+LeakyReLU
    on the concat, cv4."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = BareConv(c1, c_, 1, 1)
        self.cv3 = BareConv(c_, c_, 1, 1)
        self.cv4 = Conv(2 * c_, c2, 1, 1)
        self.bn = BN(2 * c_)
        self.m = Seq(*[Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)])
        self.c2 = c2

    def init(self, rng) -> Params:
        r = split_rng(rng, 6)
        return {"cv1": self.cv1.init(r[0]), "cv2": self.cv2.init(r[1]),
                "cv3": self.cv3.init(r[2]), "cv4": self.cv4.init(r[3]),
                "bn": self.bn.init(r[4]), "m": self.m.init(r[5])}

    def __call__(self, p, x, ctx, path=()):
        y1 = self.cv3(p["cv3"], self.m(p["m"], self.cv1(p["cv1"], x, ctx, path + ("cv1",)),
                                       ctx, path + ("m",)), ctx, path + ("cv3",))
        y2 = self.cv2(p["cv2"], x, ctx, path + ("cv2",))
        y = self.bn(p["bn"], jnp.concatenate([y1, y2], axis=-1), ctx, path + ("bn",))
        return self.cv4(p["cv4"], y, ctx, path + ("cv4",))


class Linear(Layer):
    def __init__(self, c1, c2, bias: bool = True):
        self.c1, self.c2, self.bias = c1, c2, bias

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        p = {"w": kaiming_uniform(r1, (self.c1, self.c2), self.c1)}
        if self.bias:
            bound = 1.0 / math.sqrt(self.c1)
            p["b"] = jax.random.uniform(r2, (self.c2,), jnp.float32, -bound, bound)
        return p

    def __call__(self, p, x, ctx, path=()):
        y = jnp.dot(x.astype(ctx.dtype), p["w"].astype(ctx.dtype),
                    preferred_element_type=jnp.float32)
        if "b" in p:
            y = y + p["b"]
        return y.astype(ctx.dtype)


class MultiheadAttention(Layer):
    """torch.nn.MultiheadAttention-parity self/cross attention on (B, N, C)."""

    def __init__(self, c, num_heads):
        assert c % num_heads == 0
        self.c2 = c
        self.h = num_heads

    def init(self, rng) -> Params:
        r1, r2, r3 = split_rng(rng, 3)
        c = self.c2
        return {
            "in_w": kaiming_uniform(r1, (3 * c, c), c),
            "in_b": jnp.zeros((3 * c,)),
            "out_w": kaiming_uniform(r2, (c, c), c),
            "out_b": jnp.zeros((c,)),
        }

    def __call__(self, p, qkv, ctx, path=()):
        q, k, v = qkv
        c, h = self.c2, self.h
        d = c // h

        def proj(x, w, b):
            return jnp.dot(x.astype(ctx.dtype), w.T.astype(ctx.dtype),
                           preferred_element_type=jnp.float32) + b

        q = proj(q, p["in_w"][:c], p["in_b"][:c])
        k = proj(k, p["in_w"][c:2 * c], p["in_b"][c:2 * c])
        v = proj(v, p["in_w"][2 * c:], p["in_b"][2 * c:])
        B, N, _ = q.shape

        def heads(x):
            return x.reshape(B, N, h, d).transpose(0, 2, 1, 3)  # (B, h, N, d)

        qh, kh, vh = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / math.sqrt(d)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, c)
        out = jnp.dot(out, p["out_w"].T, preferred_element_type=jnp.float32) + p["out_b"]
        return out.astype(ctx.dtype)


class TransformerLayer(Layer):
    """LayerNorm-free transformer layer (common.py:71-86), on (B, N, C)."""

    def __init__(self, c, num_heads):
        self.c2 = c
        self.q = Linear(c, c, bias=False)
        self.k = Linear(c, c, bias=False)
        self.v = Linear(c, c, bias=False)
        self.ma = MultiheadAttention(c, num_heads)
        self.fc1 = Linear(c, c, bias=False)
        self.fc2 = Linear(c, c, bias=False)

    def init(self, rng) -> Params:
        r = split_rng(rng, 6)
        return {"q": self.q.init(r[0]), "k": self.k.init(r[1]), "v": self.v.init(r[2]),
                "ma": self.ma.init(r[3]), "fc1": self.fc1.init(r[4]),
                "fc2": self.fc2.init(r[5])}

    def __call__(self, p, x, ctx, path=()):
        qkv = (self.q(p["q"], x, ctx, path + ("q",)),
               self.k(p["k"], x, ctx, path + ("k",)),
               self.v(p["v"], x, ctx, path + ("v",)))
        x = self.ma(p["ma"], qkv, ctx, path + ("ma",)) + x
        y = self.fc2(p["fc2"], self.fc1(p["fc1"], x, ctx, path + ("fc1",)), ctx,
                     path + ("fc2",))
        return y + x


class TransformerBlock(Layer):
    """ViT-style block over flattened spatial positions (common.py:89-104)."""

    def __init__(self, c1, c2, num_heads, num_layers):
        self.conv = Conv(c1, c2) if c1 != c2 else None
        self.linear = Linear(c2, c2)  # learnable position embedding
        self.tr = [TransformerLayer(c2, num_heads) for _ in range(num_layers)]
        self.c2 = c2

    def init(self, rng) -> Params:
        r = split_rng(rng, 2 + len(self.tr))
        p: Params = {"linear": self.linear.init(r[0])}
        if self.conv is not None:
            p["conv"] = self.conv.init(r[1])
        p["tr"] = {str(i): t.init(k) for i, (t, k) in enumerate(zip(self.tr, r[2:]))}
        return p

    def __call__(self, p, x, ctx, path=()):
        if self.conv is not None:
            x = self.conv(p["conv"], x, ctx, path + ("conv",))
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = seq + self.linear(p["linear"], seq, ctx, path + ("linear",))
        for i, t in enumerate(self.tr):
            seq = t(p["tr"][str(i)], seq, ctx, path + ("tr", str(i)))
        return seq.reshape(b, h, w, c)


class C3TR(C3):
    """C3 with a TransformerBlock inner (common.py:200-205)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = TransformerBlock(c_, c_, 4, n)


class C3SPP(C3):
    """C3 with an SPP inner (common.py:208-213)."""

    def __init__(self, c1, c2, k=(5, 9, 13), n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = SPP(c_, c_, k)


class CrossConv(Layer):
    """Cross-convolution downsample (experimental.py:15-27): (1,k) then (k,1)."""

    def __init__(self, c1, c2, k=3, s=1, g=1, e=1.0, shortcut=False):
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, (1, k), (1, s))
        self.cv2 = Conv(c_, c2, (k, 1), (s, 1), g=g)
        self.add = shortcut and c1 == c2
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        return {"cv1": self.cv1.init(r1), "cv2": self.cv2.init(r2)}

    def __call__(self, p, x, ctx, path=()):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx, path + ("cv1",)), ctx,
                     path + ("cv2",))
        return x + y if self.add else y


class GhostBottleneck(Layer):
    """Ghost bottleneck (experimental.py:42-57)."""

    def __init__(self, c1, c2, k=3, s=1):
        c_ = c2 // 2
        self.conv = Seq(
            GhostConv(c1, c_, 1, 1),
            DWConv(c_, c_, k, s, act=False) if s == 2 else Identity(),
            GhostConv(c_, c2, 1, 1, act=False),
        )
        self.shortcut = (
            Seq(DWConv(c1, c1, k, s, act=False), Conv(c1, c2, 1, 1, act=False))
            if s == 2 else Identity()
        )
        self.c2 = c2

    def init(self, rng) -> Params:
        r1, r2 = split_rng(rng, 2)
        return {"conv": self.conv.init(r1), "shortcut": self.shortcut.init(r2)}

    def __call__(self, p, x, ctx, path=()):
        return (self.conv(p["conv"], x, ctx, path + ("conv",))
                + self.shortcut(p["shortcut"], x, ctx, path + ("shortcut",)))


class MixConv2d(Layer):
    """Mixed depthwise conv, equal-channel split (experimental.py:60-81)."""

    def __init__(self, c1, c2, k=(1, 3), s=1, equal_ch=True):
        import numpy as _np

        groups = len(k)
        if equal_ch:
            i = _np.floor(_np.linspace(0, groups - 1e-6, c2))
            c_ = [int((i == g).sum()) for g in range(groups)]
        else:
            raise NotImplementedError("equal-weight split not supported")
        self.m = [BareConv(c1, c_[g], k[g], s, k[g] // 2) for g in range(groups)]
        self.bn = BN(c2)
        self.c2 = c2

    def init(self, rng) -> Params:
        r = split_rng(rng, len(self.m) + 1)
        return {"m": {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.m, r))},
                "bn": self.bn.init(r[-1])}

    def __call__(self, p, x, ctx, path=()):
        ys = [m(p["m"][str(i)], x, ctx, path + ("m", str(i))) for i, m in enumerate(self.m)]
        return x + self.bn(p["bn"], jnp.concatenate(ys, axis=-1), ctx, path + ("bn",))


class Contract(Layer):
    """Space-to-channels: (B, H, W, C) -> (B, H/s, W/s, C*s*s) matching the
    reference's NCHW permutation order (common.py:260-270)."""

    def __init__(self, gain: int = 2):
        self.gain = gain
        self.c2 = 0

    def init(self, rng) -> Params:
        return {}

    def __call__(self, p, x, ctx, path=()):
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h // s, s, w // s, s, c)
        x = x.transpose(0, 2, 4, 5, 1, 3)  # (B, s, s, C, H/s, W/s) — NCHW parity
        return x.reshape(b, s * s * c, h // s, w // s).transpose(0, 2, 3, 1)


class Expand(Layer):
    """Channels-to-space inverse of Contract (common.py:273-285)."""

    def __init__(self, gain: int = 2):
        self.gain = gain
        self.c2 = 0

    def init(self, rng) -> Params:
        return {}

    def __call__(self, p, x, ctx, path=()):
        b, h, w, c = x.shape
        s = self.gain
        x = x.transpose(0, 3, 1, 2)  # NCHW for parity with the reference view
        x = x.reshape(b, s, s, c // s**2, h, w)
        x = x.transpose(0, 3, 4, 1, 5, 2)
        x = x.reshape(b, c // s**2, h * s, w * s)
        return x.transpose(0, 2, 3, 1)


class ImplicitA(Layer):
    """Additive implicit knowledge (yoloR, common.py:17-28)."""

    def __init__(self, channel):
        self.c2 = channel

    def init(self, rng) -> Params:
        return {"implicit": 0.02 * jax.random.normal(rng, (1, 1, 1, self.c2))}

    def __call__(self, p, x, ctx, path=()):
        return x + p["implicit"].astype(x.dtype)


class ImplicitM(Layer):
    """Multiplicative implicit knowledge (yoloR, common.py:31-39)."""

    def __init__(self, channel):
        self.c2 = channel

    def init(self, rng) -> Params:
        return {"implicit": 1.0 + 0.02 * jax.random.normal(rng, (1, 1, 1, self.c2))}

    def __call__(self, p, x, ctx, path=()):
        return x * p["implicit"].astype(x.dtype)


LAYERS.update({
    "BottleneckCSP": BottleneckCSP,
    "C3TR": C3TR,
    "C3SPP": C3SPP,
    "CrossConv": CrossConv,
    "GhostBottleneck": GhostBottleneck,
    "MixConv2d": MixConv2d,
    "Contract": Contract,
    "Expand": Expand,
    "TransformerLayer": TransformerLayer,
    "TransformerBlock": TransformerBlock,
    "ImplicitA": ImplicitA,
    "ImplicitM": ImplicitM,
})
