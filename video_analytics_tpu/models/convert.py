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
