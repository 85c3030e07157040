from unidefense_tpu.losses.functional import (
    cross_entropy,
    binary_cross_entropy_with_logits,
    mse,
    kl_div_log_target,
    soft_margin,
    asymmetric_weighted_triplet,
    factorization,
    get_loss,
    LOSSES,
)

__all__ = [
    "cross_entropy",
    "binary_cross_entropy_with_logits",
    "mse",
    "kl_div_log_target",
    "soft_margin",
    "asymmetric_weighted_triplet",
    "factorization",
    "get_loss",
    "LOSSES",
]
