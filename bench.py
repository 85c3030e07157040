"""Benchmark: EfficientNet-b4 UniDefense two-pass training throughput @256².

Measures images/sec/chip for the full training step (two forward/backward
passes + two optimizer updates, batch 10 real + 10 fake — the reference's
per-GPU workload, README.md:110-120 + config_template/forgery/model_udeb4.yml:33).
BASELINE.md's north star: >=2x an H100 running the PyTorch reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference implementation throughput for the same workload (EfficientNet-b4
# dual-space two-pass train step @256², batch 10+10). The reference repo
# publishes no numbers (BASELINE.md); this constant is the measured PyTorch
# eager CPU-extrapolated placeholder until an H100 measurement lands — update
# BASELINE.md when it does. vs_baseline reports value/baseline.
H100_BASELINE_IMG_PER_SEC = float(os.environ.get("UD_BASELINE_IPS", "0") or 0)


def main():
    from unidefense_tpu.models.registry import load_model
    from unidefense_tpu.train.optim import build_optimizer
    from unidefense_tpu.train.step import create_train_state, make_train_step

    batch_real = batch_fake = 10
    n = batch_real + batch_fake
    size = 256
    steps = 20  # per timing window; ~170 ms/step sustained on the v5e tunnel

    from unidefense_tpu.data.transforms import DevicePipeline

    model = load_model("UDEB4")(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    # uint8 input + fused device preprocessing inside the step, like the
    # engines run it (normalize + random flip -> bf16)
    device_tf = DevicePipeline(hflip_p=0.5, out_dtype=jnp.float32)
    x_u8 = jax.random.randint(rng, (n, size, size, 3), 0, 256, jnp.int32).astype(jnp.uint8)
    x = device_tf(x_u8, None)  # for init shapes
    labels = jnp.array([0] * batch_real + [1] * batch_fake)

    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, train=False)
    )
    cfg = {
        "optimizer": {"name": "adamw", "lr": 1e-4, "betas": [0.9, 0.999],
                      "weight_decay": 5e-6, "amsgrad": True},
        "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
        "lambda_mask": 0.1, "lambda_fac": 0.1,
    }
    tx, _ = build_optimizer(cfg, shapes["params"])
    state = create_train_state(model, tx, rng, x)
    # per-call dispatch with donated state — the exact execution model the
    # engines use. (A lax.scan-of-steps variant measures ~10x slower on the
    # axon tunnel backend — its while-loop iterations appear to round-trip
    # the host — so the async dispatch chain is both the realistic and the
    # faster path.)
    step_fn = jax.jit(
        make_train_step(model, tx, cfg, num_steps=90000,
                        sum_real=batch_real, sum_fake=batch_fake,
                        preprocess=device_tf),
        donate_argnums=0,
    )
    batch = {"image": x_u8, "label": labels}

    windows = 3
    rngs = list(jax.random.split(rng, windows * steps + 10))
    jax.block_until_ready(rngs)

    # compile + 10-step warmup (absorbs the donation-variant recompile)
    for i in range(10):
        state, metrics, _ = step_fn(state, batch, rngs[i])
    assert bool(jnp.isfinite(float(metrics["total_loss"])))

    # several timing windows, best-of; each window ENDS with a forced value
    # fetch — block_until_ready alone returns before execution completes on
    # some remote-device runtimes and then reports dispatch rate, not compute
    best_dt = float("inf")
    k = 10
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps):
            state, metrics, _ = step_fn(state, batch, rngs[k])
            k += 1
        loss = float(metrics["total_loss"])
        best_dt = min(best_dt, time.time() - t0)
    dt = best_dt
    assert np.isfinite(loss), "non-finite loss in bench"

    ips = n * steps / dt
    vs = ips / H100_BASELINE_IMG_PER_SEC if H100_BASELINE_IMG_PER_SEC else None
    print(json.dumps({
        "metric": "udeb4_train_images_per_sec_per_chip_256",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
