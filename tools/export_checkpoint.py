#!/usr/bin/env python
"""Export a unidefense_tpu run checkpoint to a reference-loadable torch file.

Makes checkpoints interchangeable BOTH ways: the framework already loads the
reference's .pth/.bin files (models/convert.py); this writes our orbax
TrainState back out as the reference's own save format
(`torch.save({'model': state_dict, 'step': ...})`,
engine/forgery_engine.py:215-223), so a model trained here can be evaluated
or fine-tuned inside the reference codebase.

    python tools/export_checkpoint.py --run runs/UDEB4/my-exp --model UDEB4 \
        --out exported_udeb4.bin [--best]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="run dir (contains ckpt/)")
    ap.add_argument("--model", required=True, choices=["UDEB4", "UDR18", "UDR50"])
    ap.add_argument("--out", required=True, help="output .bin path")
    ap.add_argument("--best", action="store_true", help="export best (default: latest)")
    ap.add_argument("--size", type=int, default=64,
                    help="dummy init resolution (structure only)")
    ap.add_argument("--num_classes", type=int, default=2)
    ap.add_argument("--mid_depth", type=int, default=None)
    # orbax restores against the SAVED tree structure, which includes the
    # optimizer state — rebuild the same optimizer the run used
    ap.add_argument("--optimizer", default="adamw")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=5e-6)
    ap.add_argument("--no-amsgrad", dest="amsgrad", action="store_false")
    args = ap.parse_args()

    from unidefense_tpu.checkpoint import CheckpointManager
    from unidefense_tpu.models.convert import save_torch_checkpoint
    from unidefense_tpu.models.registry import load_model
    from unidefense_tpu.train.optim import build_optimizer
    from unidefense_tpu.train.step import create_train_state

    kw = {"num_classes": args.num_classes}
    if args.mid_depth is not None:
        kw["mid_depth"] = args.mid_depth
    model = load_model(args.model)(**kw)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, sample, train=False)
    )
    tx, _ = build_optimizer(
        {"optimizer": {"name": args.optimizer, "lr": args.lr,
                       "weight_decay": args.weight_decay,
                       "amsgrad": args.amsgrad}},
        shapes["params"],
    )
    state = create_train_state(model, tx, rng, sample)
    ckpt = CheckpointManager(args.run)
    state, meta = ckpt.restore(state, best=args.best)
    save_torch_checkpoint(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        args.out, step=int(meta.get("step", int(state.step))),
        extra_meta={k: v for k, v in meta.items()
                    if isinstance(v, (int, float, str))},
    )
    print(f"exported {args.model} step {int(meta.get('step', int(state.step)))} -> {args.out}")


if __name__ == "__main__":
    main()
