"""Headline benchmark: batched 2-task CerberusDet-v8x inference @640 on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published 2-task speed, 7.2 ms/img on V100 b32 fp16
(README.md:241) = 138.9 img/s. North star (BASELINE.md): >= 2000 img/s/chip.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.nn.module import Ctx

    batch = 32
    model = CerberusModel(
        "configs/models/yolov8x_2task.yaml", ["voc", "animals"], [20, 19]
    )
    params = model.init(jax.random.PRNGKey(0))
    # bf16 weights for inference: halves HBM traffic, MXU-native
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 and x.ndim == 4 else x,
        params,
    )

    def forward(params, img):
        ctx = Ctx(train=False, dtype=jnp.bfloat16)
        out = model(params, img, ctx)
        return {t: pred for t, (pred, _f) in out.items()}

    jfn = jax.jit(forward)
    img = jnp.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, 640, 640, 3), jnp.float32)
    )
    # warmup + compile
    jax.block_until_ready(jfn(params, img))
    jax.block_until_ready(jfn(params, img))

    # NOTE: each iteration's input depends on the previous output (a zero-valued
    # but data-dependent perturbation). This defeats any async-dispatch /
    # memoization shortcuts in the runtime and yields an honest per-step time;
    # it is conservative (adds one elementwise pass + dispatch round-trip).
    iters = 20
    x = img
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(params, x)
        x = img + out["voc"][0, 0, 0] * 0.0
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    imgs_per_s = batch / dt

    baseline_imgs_per_s = 1000.0 / 7.2  # reference: 7.2 ms/img, V100 b32 fp16
    print(json.dumps({
        "metric": "2task_inference_throughput_640",
        "value": round(imgs_per_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_s / baseline_imgs_per_s, 2),
    }))


if __name__ == "__main__":
    main()
