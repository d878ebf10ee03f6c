"""Convert pytorch-fid InceptionV3 weights to the Flax FID model.

Input: the ``pt_inception-2015-12-05-6726825d.pth`` state dict used by the
reference (eval/inception.py:13). Output: a params pytree matching
:class:`lcgan_tpu.eval.inception.InceptionV3FID`.

BatchNorm (eps=1e-3) is folded into per-channel scale/bias:
    scale = gamma / sqrt(running_var + eps)
    bias  = beta - running_mean * scale
Conv kernels transpose OIHW -> HWIO.

torch (CPU-only wheel, present in this image) is used purely as the .pth
reader; nothing from torch enters the compute path.
"""

from __future__ import annotations

import numpy as np

_BN_EPS = 1e-3

# BasicConv2d module paths inside each top-level torch module
_TOP_LEVEL = [
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1", "Conv2d_4a_3x3",
    "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b", "Mixed_6c", "Mixed_6d",
    "Mixed_6e", "Mixed_7a", "Mixed_7b", "Mixed_7c",
]


def _fold_basic_conv(sd, prefix: str) -> dict:
    w = sd[f"{prefix}.conv.weight"].numpy()  # OIHW
    gamma = sd[f"{prefix}.bn.weight"].numpy()
    beta = sd[f"{prefix}.bn.bias"].numpy()
    mean = sd[f"{prefix}.bn.running_mean"].numpy()
    var = sd[f"{prefix}.bn.running_var"].numpy()
    scale = gamma / np.sqrt(var + _BN_EPS)
    bias = beta - mean * scale
    return {
        "weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32),  # HWIO
        "bn_scale": scale.astype(np.float32),
        "bn_bias": bias.astype(np.float32),
    }


def convert_torch_inception(pth_path: str) -> dict:
    """Load the pytorch-fid checkpoint and emit Flax params."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    params: dict = {}
    # group state-dict keys by BasicConv2d prefix (everything before .conv/.bn)
    prefixes = sorted({k.rsplit(".conv.", 1)[0] for k in sd if ".conv.weight" in k})
    for prefix in prefixes:
        top = prefix.split(".")[0]
        if top not in _TOP_LEVEL:
            continue  # fc / AuxLogits — not used for pool3 features
        folded = _fold_basic_conv(sd, prefix)
        if "." in prefix:  # e.g. Mixed_5b.branch1x1
            _, branch = prefix.split(".", 1)
            params.setdefault(top, {})[branch.replace(".", "_")] = folded
        else:  # stem convs: the BasicConv2d IS the flax module
            params[top] = folded
    return params


def save_params_npz(params: dict, path: str):
    flat = {}

    def rec(tree, pre):
        for k, v in tree.items():
            if isinstance(v, dict):
                rec(v, pre + k + "/")
            else:
                flat[pre + k] = v

    rec(params, "")
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    flat = dict(np.load(path))
    params: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return params
