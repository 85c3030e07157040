"""Model registry (model/__init__.py:7-17 parity)."""

from __future__ import annotations

from unidefense_tpu.models.unidefense import (
    UniDefenseModelEb4,
    UniDefenseModelRes18,
    UniDefenseModelRes50,
)

MODEL = {
    "UDEB4": UniDefenseModelEb4,
    "UDR18": UniDefenseModelRes18,
    "UDR50": UniDefenseModelRes50,
}


def load_model(name: str = "UDE"):
    name_upper = name.upper()
    if name_upper not in MODEL:
        raise KeyError(f"Model '{name}' not found; available: {sorted(MODEL)}")
    return MODEL[name_upper]


def build_model(name: str, model_cfg: dict, axis_name=None, dtype=None, remat=False):
    """Construct a model from reference-style YAML `model:` kwargs
    (config_template/forgery/model_udeb4.yml:1-6). Unknown torch-specific
    keys (extractor_weights handled by the engine, not here) are filtered."""
    cls = load_model(name)
    fields = getattr(cls, "__dataclass_fields__", {})
    kwargs = {}
    # drop_connect_rate / feat_drop_rate are additive keys (the reference
    # hardcodes both at 0.2); they MUST pass through — engines/base.py's
    # deterministic_regularization zeroes them in model_cfg, and silently
    # filtering them here left UDEB4 training with stochastic depth while
    # the reference side had it zeroed (round-5 engine-A/B root cause:
    # UDEB4 loss corr 0.70 -> fixed; field-gated since UDR18/50 have no
    # drop_connect_rate).
    for key in ("num_classes", "drop_rate", "extractor", "mid_depth",
                "freq_norm", "affine", "drop_connect_rate", "feat_drop_rate"):
        if key in model_cfg and key in fields:
            kwargs[key] = model_cfg[key]
    if "bias" in model_cfg:
        kwargs["use_bias"] = model_cfg["bias"]
    if remat and "remat" in getattr(cls, "__dataclass_fields__", {}):
        kwargs["remat"] = True
    return cls(axis_name=axis_name, dtype=dtype, **kwargs)
