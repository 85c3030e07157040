"""Training meters and timers (utils/misc.py:39-117 parity, numpy-based)."""

from __future__ import annotations

import sys
import time

import numpy as np


class AccMeter:
    """Running accuracy over logits (argmax, or sigmoid>=0.5 for 1-logit
    heads) — utils/misc.py:53-71."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.nums = 0
        self.acc = 0

    def update(self, logits, target):
        logits = np.asarray(logits)
        target = np.asarray(target)
        if logits.shape[-1] == 1:
            pred = (1.0 / (1.0 + np.exp(-logits.squeeze(-1))) >= 0.5).astype(np.int64)
        else:
            pred = logits.argmax(-1)
        self.nums += target.shape[0]
        self.acc += int(np.sum(pred == target))

    def mean_acc(self):
        return self.acc / max(self.nums, 1)


class AUCMeter:
    """Accumulate (score, label) pairs; AUC + ROC-curve dump
    (utils/misc.py:74-97)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.score = None
        self.true = None

    def update(self, score, true):
        score = np.asarray(score).reshape(-1)
        true = np.asarray(true).reshape(-1)
        self.score = score if self.score is None else np.concatenate([self.score, score])
        self.true = true if self.true is None else np.concatenate([self.true, true])

    def mean_auc(self):
        from sklearn.metrics import roc_auc_score

        return roc_auc_score(self.true, self.score)

    def curve(self, prefix):
        import pickle

        from scipy.interpolate import interp1d
        from scipy.optimize import brentq
        from sklearn.metrics import roc_curve

        fpr, tpr, thresholds = roc_curve(self.true, self.score, pos_label=1)
        eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
        thresh = interp1d(fpr, thresholds)(eer)
        print(f"# EER: {eer:.4f}(thresh: {float(thresh):.4f})")
        import os

        with open(os.path.join(prefix, "roc_curve.pickle"), "wb") as f:
            pickle.dump([fpr, tpr, thresholds], f)


class AverageMeter:
    """Running average (utils/misc.py:100-117)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count


class Timer:
    """Elapsed / ETA timer (utils/misc.py:39-50)."""

    def __init__(self):
        self.o = time.time()

    def measure(self, p=1):
        x = int((time.time() - self.o) / p)
        if x >= 3600:
            return f"{x / 3600:.1f}h"
        if x >= 60:
            return f"{round(x / 60)}m"
        return f"{x}s"


class Logger:
    """Tee stdout to a records file (utils/misc.py:25-36)."""

    def __init__(self, filename):
        self.terminal = sys.stdout
        self.log = open(filename, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        pass


def center_print(content, around="*", repeat_around=10):
    print(repeat_around * around + f" {content} " + repeat_around * around)


class DeviceMetricAccumulator:
    """Every-step train metric averages WITHOUT per-step host syncs.

    The reference updates its AverageMeters/AccMeter on every training step
    (engine/forgery_engine.py:285-297); fetching the jitted step's metric
    scalars to host each step would cost a device round-trip per step
    (CLAUDE.md gotcha 3), so this keeps the running sums — one scalar per
    metric plus classification correct/total — ON DEVICE, adding them with a
    single tiny jitted call per step (dispatched asynchronously alongside the
    train step). `snapshot()` fetches everything in one transfer at log
    boundaries. Accuracy follows AccMeter semantics (argmax, or
    sigmoid >= 0.5 for 1-logit heads)."""

    def __init__(self):
        self._state = None
        self._update = None

    def update(self, metrics: dict, cls_out, labels):
        import jax
        import jax.numpy as jnp

        if self._update is None:
            def _upd(state, metrics, cls_out, labels):
                metrics = {k: v.astype(jnp.float32) for k, v in metrics.items()}
                if cls_out.shape[-1] == 1:
                    pred = (jax.nn.sigmoid(cls_out[:, 0]) >= 0.5).astype(labels.dtype)
                else:
                    pred = jnp.argmax(cls_out, -1).astype(labels.dtype)
                correct = jnp.sum((pred == labels).astype(jnp.float32))
                return {
                    "sums": {k: state["sums"][k] + v for k, v in metrics.items()},
                    "count": state["count"] + 1.0,
                    "correct": state["correct"] + correct,
                    "total": state["total"] + jnp.float32(labels.shape[0]),
                }

            self._update = jax.jit(_upd)  # scalar state: donation not worth it
            self._state = {
                "sums": {k: jnp.zeros((), jnp.float32) for k in metrics},
                "count": jnp.zeros((), jnp.float32),
                "correct": jnp.zeros((), jnp.float32),
                "total": jnp.zeros((), jnp.float32),
            }
        self._state = self._update(self._state, metrics, cls_out, labels)

    def snapshot(self) -> dict:
        """One host fetch: {'means': per-metric running means, 'acc': running
        accuracy, 'count': steps accumulated}."""
        if self._state is None:
            return {"means": {}, "acc": 0.0, "count": 0}
        import jax

        host = jax.device_get(self._state)
        n = max(float(host["count"]), 1.0)
        return {
            "means": {k: float(v) / n for k, v in host["sums"].items()},
            "acc": float(host["correct"]) / max(float(host["total"]), 1.0),
            "count": int(host["count"]),
        }
