"""torch(vision) → flax weight conversion for the ResNet family.

The reference pipeline uses ImageNet-pretrained torchvision weights;
torch (CPU) is present in this environment for conversion only.  The
converter consumes a ``state_dict``-like mapping of numpy arrays so it
works with a real torchvision checkpoint or any compatible torch model.

Layout mapping (torch → flax):
- conv ``(O, I, kH, kW)`` → HWIO ``(kH, kW, I, O)``
- linear ``(O, I)`` → ``(I, O)``
- bn weight/bias → scale/bias (params); running_mean/var → batch_stats
- ``layer{i}.{j}.*`` → ``layer{i}_{j}/*``; ``downsample.0/1`` →
  ``downsample_conv`` / ``downsample_bn``
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _conv(w) -> jnp.ndarray:
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _dense(w) -> jnp.ndarray:
    return jnp.asarray(np.transpose(np.asarray(w), (1, 0)))


def _bn(prefix: str, sd: Mapping[str, Any], params: Dict, stats: Dict,
        flax_name: str) -> None:
    params[flax_name] = {
        "scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
        "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"])),
    }
    stats[flax_name] = {
        "mean": jnp.asarray(np.asarray(sd[prefix + ".running_mean"])),
        "var": jnp.asarray(np.asarray(sd[prefix + ".running_var"])),
    }


def torch_resnet_to_flax(sd: Mapping[str, Any],
                         stage_sizes=(2, 2, 2, 2),
                         include_fc: bool = True) -> Dict[str, Dict]:
    """state_dict (torch tensors or numpy) → {'params':…,'batch_stats':…}.

    Handles both BasicBlock (18/34) and Bottleneck (50/101/152)
    checkpoints — the block type is detected from the presence of
    ``layer1.0.conv3.weight``.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    bottleneck = "layer1.0.conv3.weight" in sd
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    _bn("bn1", sd, params, stats, "bn1")
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            t = f"layer{stage + 1}.{block}"
            f = f"layer{stage + 1}_{block}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bp["conv1"] = {"kernel": _conv(sd[t + ".conv1.weight"])}
            _bn(t + ".bn1", sd, bp, bs, "bn1")
            bp["conv2"] = {"kernel": _conv(sd[t + ".conv2.weight"])}
            _bn(t + ".bn2", sd, bp, bs, "bn2")
            if bottleneck:
                bp["conv3"] = {"kernel": _conv(sd[t + ".conv3.weight"])}
                _bn(t + ".bn3", sd, bp, bs, "bn3")
            if t + ".downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[t + ".downsample.0.weight"])}
                _bn(t + ".downsample.1", sd, bp, bs, "downsample_bn")
            params[f] = bp
            stats[f] = bs
    if include_fc and "fc.weight" in sd:
        params["fc"] = {"kernel": _dense(sd["fc.weight"]),
                        "bias": jnp.asarray(np.asarray(sd["fc.bias"]))}
    return {"params": params, "batch_stats": stats}


def inflate_stem_for_flow(variables: Dict[str, Dict],
                          stack: int) -> Dict[str, Dict]:
    """Cross-modality init for the flow stream (Wang et al. 2016):
    average the RGB stem kernel over its input channels and replicate it
    across the 2*stack flow channels, preserving response scale."""
    out = {"params": dict(variables["params"]),
           "batch_stats": dict(variables["batch_stats"])}
    k = np.asarray(out["params"]["conv1"]["kernel"])  # (7,7,3,64)
    mean_k = k.mean(axis=2, keepdims=True)            # (7,7,1,64)
    inflated = np.repeat(mean_k, 2 * stack, axis=2)
    out["params"] = {**out["params"],
                     "conv1": {"kernel": jnp.asarray(inflated)}}
    return out


_BN_FOR_CONV = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                "downsample_conv": "downsample_bn"}


def fold_batchnorm(variables: Dict[str, Dict],
                   eps: float = 1e-5) -> Dict[str, Dict]:
    """Fold inference BatchNorms into the preceding convs (VERDICT r4
    task 4): at use_running_average=True, BN is the per-channel affine
    y = s·x + (bias − mean·s) with s = scale/√(var+ε), which composes
    EXACTLY (in f32) with a bias-free conv: W'[..., o] = W[..., o]·s[o],
    b'[o] = bias[o] − mean[o]·s[o].  Consumes an unfolded
    {'params', 'batch_stats'} tree from this module's naming scheme
    (convK ↔ bnK, downsample_conv ↔ downsample_bn) and returns
    {'params'} for the fold_bn=True model form (models/resnet.py) —
    the pointwise normalize pass disappears from the compiled program.
    """
    def walk(p: Mapping[str, Any], s: Mapping[str, Any]) -> Dict:
        out: Dict[str, Any] = {}
        for k, v in p.items():
            bn_key = _BN_FOR_CONV.get(k)
            if bn_key is not None and bn_key in p:
                bn, st = p[bn_key], s[bn_key]
                sc = (bn["scale"].astype(jnp.float32)
                      / jnp.sqrt(st["var"].astype(jnp.float32) + eps))
                out[k] = {
                    "kernel": v["kernel"].astype(jnp.float32) * sc,
                    "bias": (bn["bias"].astype(jnp.float32)
                             - st["mean"].astype(jnp.float32) * sc),
                }
            elif k in _BN_FOR_CONV.values():
                continue                      # consumed by its conv
            elif isinstance(v, Mapping) and "kernel" not in v \
                    and "scale" not in v:
                out[k] = walk(v, s.get(k, {}))
            else:
                out[k] = v                    # fc / anything unpaired
        return out

    return {"params": walk(dict(variables["params"]),
                           dict(variables.get("batch_stats", {})))}
