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
