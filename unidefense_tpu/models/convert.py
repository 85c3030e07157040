"""torch checkpoint -> flax variables conversion.

Loads the reference's pretrained backbone weights into our models:
* EfficientNet advprop .pth files (lukemelas naming, `_conv_stem`,
  `_blocks.N._depthwise_conv`, ... — model/efficientnet/utils.py:594-634);
* torchvision ResNet-18 / timm ResNet-50 state dicts (conv1, layerL.B.convK,
  downsample.{0,1} — model/resnet/exp.py:523-550).

SFConv-only parameters (freq_conv, sf_coef) are tolerated as missing and keep
their initialisation, mirroring check_for_sfconv_params
(model/efficientnet/utils.py:627-634). Layout conversion: torch conv
(O, I, kh, kw) -> flax (kh, kw, I, O); linear (O, I) -> (I, O); BN weight ->
scale, running_mean/var -> batch_stats.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

_SF_ONLY = ("freq_conv", "sf_coef")


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _convert_value(path: tuple, torch_val: np.ndarray, target_shape) -> np.ndarray:
    leaf = path[-1]
    if leaf == "kernel":
        if torch_val.ndim == 4 and "deconv" in path:
            # torch ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out);
            # our ConvTranspose layer applies the spatial flip internally
            out = torch_val.transpose(2, 3, 0, 1)
        elif torch_val.ndim == 4:  # conv (out, in, kh, kw) -> (kh, kw, in, out)
            out = torch_val.transpose(2, 3, 1, 0)
        elif torch_val.ndim == 2:  # dense
            out = torch_val.T
        else:
            out = torch_val
    else:
        out = torch_val
    if tuple(out.shape) != tuple(target_shape):
        # torch's load_state_dict legacy rule: a (1,) tensor loads into a 0-d
        # param (nn.Module._load_from_state_dict). Needed for checkpoints
        # where the scalar coefs (sf_coef/fuse_coef) were saved 1-d.
        if tuple(target_shape) == () and tuple(out.shape) == (1,):
            out = out.reshape(())
        else:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"torch {out.shape} vs flax {target_shape}")
    # NOT ascontiguousarray: it promotes 0-d scalars (sf_coef/fuse_coef) to (1,)
    return np.array(out, dtype=np.float32)


def _efficientnet_torch_key(path: tuple, collection: str) -> Optional[str]:
    """flax path -> lukemelas torch key. Returns None for keys the torch
    checkpoint may legitimately lack (SFConv params)."""
    parts = [p for p in path if p != "Conv_0" and p != "Dense_0"]
    leaf = parts[-1]
    mods = parts[:-1]

    out = []
    for i, m in enumerate(mods):
        bm = re.fullmatch(r"block(\d+)", m)
        if bm:
            out.append(f"_blocks.{bm.group(1)}")
        elif m in ("conv_stem", "conv_head", "fc"):
            out.append("_" + m)
        elif re.fullmatch(r"bn[0-2]", m):
            out.append("_" + m)
        elif m in ("expand_conv", "depthwise_conv", "project_conv", "se_reduce", "se_expand"):
            out.append("_" + m)
        elif m == "freq_conv":
            out.append("freq_conv")
        else:
            raise KeyError(f"Unmapped EfficientNet module '{m}' in {path}")

    leaf_map = {
        "kernel": "weight", "scale": "weight", "bias": "bias",
        "mean": "running_mean", "var": "running_var", "sf_coef": "sf_coef",
    }
    return ".".join(out + [leaf_map[leaf]]) if leaf != "sf_coef" else ".".join(out + ["sf_coef"])


def _resnet_torch_key(path: tuple, collection: str) -> Optional[str]:
    """flax path -> timm/torchvision ResNet key. The flax tree may sit under
    an 'extractor/net' prefix (ExtractorRes18/50) or be the bare ResNet."""
    parts = [p for p in path if p not in ("Conv_0", "Dense_0", "net")]
    leaf = parts[-1]
    mods = parts[:-1]
    out = []
    for m in mods:
        bm = re.fullmatch(r"block(\d+)", m)
        if bm:
            out.append(bm.group(1))
        elif m == "downsample_conv":
            out.append("downsample.0")
        elif m == "downsample_bn":
            out.append("downsample.1")
        elif m == "freq_conv":
            out.append("freq_conv")
        else:
            out.append(m)  # conv1, bn1, layerL, fc, ...
    leaf_map = {
        "kernel": "weight", "scale": "weight", "bias": "bias",
        "mean": "running_mean", "var": "running_var", "sf_coef": "sf_coef",
    }
    return ".".join(out + [leaf_map[leaf]])


_LEAF_MAP = {
    "kernel": "weight", "scale": "weight", "bias": "bias",
    "mean": "running_mean", "var": "running_var", "sf_coef": "sf_coef",
}

# Sequential index of each decoder stage inside the reference's nn.Sequential
# decoder blocks (model/unidefense.py:59-102: conv, IN, act, convT, IN, act,
# conv, IN, act[, conv, tanh]).
_DEC_IDX = {"conv1": "0", "in1": "1", "deconv": "3", "in2": "4",
            "conv2": "6", "in3": "7", "conv_out": "9"}


def _unidefense_torch_key(path: tuple, collection: str) -> Optional[str]:
    """flax path -> reference UniDefenseModel* state-dict key
    (model/unidefense.py naming). Handles all three variants."""
    parts = [p for p in path if p not in ("Conv_0", "Dense_0")]
    leaf = parts[-1]
    mods = list(parts[:-1])

    if mods and mods[0] == "backbone":
        inner = _efficientnet_torch_key(tuple(parts[1:]), collection)
        return f"backbone.{inner}"
    if mods and mods[0] == "extractor":
        inner = _resnet_torch_key(tuple(parts[1:]), collection)
        return f"extractor.{inner}"
    if mods and mods[0].startswith("dec_block"):
        idx = _DEC_IDX[mods[1]]
        return f"{mods[0]}.{idx}.{_LEAF_MAP[leaf]}"
    if mods and mods[0].startswith("emb_block"):
        rest = []
        for m in mods[1:]:
            rest.append({"down_conv": "downsample.0", "down_norm": "downsample.1"}.get(m, m))
        return ".".join([mods[0]] + rest + [_LEAF_MAP[leaf]])
    if mods and mods[0] == "bottleneck":
        return f"bottleneck.{_LEAF_MAP[leaf]}"
    if mods and mods[0] == "classifier":
        return f"classifier.fc.{_LEAF_MAP[leaf]}"
    if mods and mods[0] == "attention":
        if leaf == "fuse_coef":
            return "fuse_coef"
        filt = mods[1]  # freq_filter | spat_filter
        sub = {"proj": "layer1.0", "proj_norm": "layer1.1", "mask_conv": "layer2.0"}[mods[2]]
        return f"{filt}.{sub}.{_LEAF_MAP[leaf]}"
    raise KeyError(f"Unmapped UniDefense module path {path}")


_KEY_FNS = {
    "efficientnet": _efficientnet_torch_key,
    "resnet": _resnet_torch_key,
    "unidefense": _unidefense_torch_key,
}


def load_torch_backbone(variables: dict, state_dict: dict, arch: str,
                        strict: bool = True, verbose: bool = False) -> dict:
    """Fill `variables` ({'params', 'batch_stats'}) from a torch state_dict.

    Missing SFConv params keep their init (reference tolerance rule); any
    other missing key raises when strict. Returns new variables.
    """
    key_fn = _KEY_FNS[arch]
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    new_vars = {}
    missing, loaded = [], 0
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        flat = flatten_dict(variables[coll])
        out = {}
        for path, val in flat.items():
            tk = key_fn(path, coll)
            if tk in sd:
                out[path] = _convert_value(path, sd[tk], val.shape)
                loaded += 1
            else:
                if not any(s in path for s in _SF_ONLY):
                    missing.append(tk)
                out[path] = val
        new_vars[coll] = unflatten_dict(out)
    if missing and strict:
        raise KeyError(f"Missing non-SFConv keys in torch checkpoint: {missing[:10]} "
                       f"(+{max(0, len(missing) - 10)} more)")
    if verbose:
        print(f"Converted {loaded} tensors from torch checkpoint ({arch}); "
              f"{len(missing)} non-SFConv missing.")
    return new_vars


def load_unidefense_checkpoint(variables: dict, ckpt_path: str) -> dict:
    """Load a FULL reference UniDefense torch checkpoint (the
    {'step', 'best_*', 'model': state_dict} files written by _save_ckpt,
    engine/forgery_engine.py:215-223) into a UDEB4/UDR18/UDR50 flax tree —
    enables running released reference checkpoints for inference/eval."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return load_torch_backbone(variables, sd, "unidefense", strict=False)


def load_pretrained_extractor(variables: dict, weights_path: str, model_name: str) -> dict:
    """Load `extractor_weights` (reference YAML key) into a UniDefense model's
    backbone subtree. model_name in {'UDEB4','UDR18','UDR50'}."""
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    name = model_name.upper()
    if name == "UDEB4":
        sub, arch = "backbone", "efficientnet"
        # drop the torch classifier head (include_top=False path,
        # model/efficientnet/utils.py:612-614)
        sd = {k: v for k, v in sd.items() if not k.startswith("_fc.")}
    else:
        sub, arch = "extractor", "resnet"
        sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}

    sub_vars = {
        coll: variables[coll][sub] for coll in ("params", "batch_stats") if sub in variables.get(coll, {})
    }
    # extractors only instantiate stem + layers 1-3 (module_exp.py:8-59):
    # torch keys for layer4/fc simply go unused.
    converted = load_torch_backbone(sub_vars, sd, arch, strict=False)
    new_vars = {coll: dict(variables[coll]) for coll in variables}
    for coll in converted:
        new_vars[coll][sub] = converted[coll]
    return new_vars


# ----------------------------------------------------------------- export
# Reverse direction: flax variables -> reference-compatible torch state_dict,
# so a model trained HERE runs inside the reference codebase (checkpoints
# interchangeable both ways; the reference's test path loads
# {'model': state_dict} — engine/forgery_engine.py:200-209).


def _deconvert_value(path: tuple, flax_val: np.ndarray) -> np.ndarray:
    """Inverse of _convert_value's layout transforms."""
    leaf = path[-1]
    v = np.asarray(flax_val, np.float32)
    if leaf == "kernel":
        if v.ndim == 4 and "deconv" in path:
            # (kh, kw, in, out) -> torch ConvTranspose2d (in, out, kh, kw)
            return np.ascontiguousarray(v.transpose(2, 3, 0, 1))
        if v.ndim == 4:  # (kh, kw, in, out) -> torch conv (out, in, kh, kw)
            return np.ascontiguousarray(v.transpose(3, 2, 0, 1))
        if v.ndim == 2:  # dense
            return np.ascontiguousarray(v.T)
    if v.ndim == 0:
        # keep scalars 0-d: the reference's sf_coef/fuse_coef are 0-d torch
        # tensors and ascontiguousarray would promote () -> (1,)
        return np.array(v, np.float32)
    return np.ascontiguousarray(v)


def export_torch_state_dict(variables: dict, arch: str = "unidefense") -> dict:
    """flax {'params', 'batch_stats'} -> torch state_dict (numpy values).

    Exact inverse of load_torch_backbone: the same per-path key mapping, the
    inverse layout transforms, plus zeroed `num_batches_tracked` entries for
    every BatchNorm (torch state_dicts carry them; the reference loads
    non-strict so zeros are safe). Round-trip pinned by
    tests/test_convert.py::test_export_round_trip*."""
    key_fn = _KEY_FNS[arch]
    sd: dict = {}
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        import jax

        flat = flatten_dict(jax.tree.map(np.asarray, variables[coll]))
        for path, val in flat.items():
            tk = key_fn(path, coll)
            if tk is None:
                continue
            sd[tk] = _deconvert_value(path, val)
            if path[-1] == "mean":  # one per BN module
                sd[tk.rsplit(".", 1)[0] + ".num_batches_tracked"] = np.zeros((), np.int64)
    # the reference's BN bottleneck keeps a FROZEN zero bias in its
    # state_dict (model/unidefense.py:104-107); our layer omits the
    # parameter entirely — materialize the zeros it expects
    if "bottleneck.weight" in sd and "bottleneck.bias" not in sd:
        sd["bottleneck.bias"] = np.zeros_like(sd["bottleneck.weight"])
    return sd


def save_torch_checkpoint(variables: dict, out_path: str, arch: str = "unidefense",
                          step: int = 0, extra_meta: Optional[dict] = None):
    """Write a reference-loadable checkpoint: torch.save({'model': sd, ...})
    with tensors, matching the reference's save format
    (engine/forgery_engine.py:215-223)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v))  # copy: writable tensor
          for k, v in export_torch_state_dict(variables, arch).items()}
    payload = {"model": sd, "step": step}
    payload.update(extra_meta or {})
    torch.save(payload, out_path)
