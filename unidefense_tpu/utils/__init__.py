from unidefense_tpu.utils.io import load_from_json, write_to_json
from unidefense_tpu.utils.metrics import cal_metrics, find_best_threshold, get_tpr_at_fpr
from unidefense_tpu.utils.meters import AccMeter, AverageMeter, Timer

__all__ = [
    "cal_metrics",
    "find_best_threshold",
    "get_tpr_at_fpr",
    "AccMeter",
    "AverageMeter",
    "Timer",
    "load_from_json",
    "write_to_json",
]
