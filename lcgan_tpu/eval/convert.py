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

import hashlib

import numpy as np

_BN_EPS = 1e-3

# torch.hub convention: the filename's -6726825d suffix is the first 8 hex
# chars of the file's SHA-256 (load_state_dict_from_url verifies the same
# prefix). Reference checkpoint: pt_inception-2015-12-05-6726825d.pth
# (/root/reference/eval/inception.py:13).
EXPECTED_SHA256_PREFIX = "6726825d"


def verify_checkpoint(pth_path: str, strict: bool = False) -> bool:
    """Check the .pth against the pinned reference fingerprint."""
    h = hashlib.sha256()
    with open(pth_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    ok = h.hexdigest().startswith(EXPECTED_SHA256_PREFIX)
    if not ok:
        msg = (
            f"{pth_path}: sha256 {h.hexdigest()[:16]}… does not start with "
            f"{EXPECTED_SHA256_PREFIX} — not the reference pytorch-fid "
            "checkpoint; the resulting FID will not follow the reference protocol"
        )
        if strict:
            raise ValueError(msg)
        print(f"WARNING: {msg}")
    return ok

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


def convert_torch_inception(pth_path: str, verify: bool = True) -> dict:
    """Load the pytorch-fid checkpoint and emit Flax params."""
    import torch

    if verify:
        verify_checkpoint(pth_path)
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


def main(argv=None):
    """One-shot .pth → .npz conversion (README 'FID with real weights'):

        python -m lcgan_tpu.eval.convert pt_inception-2015-12-05-6726825d.pth \
            inception_fid.npz

    The npz loads ~instantly and torch-free on TPU hosts; pass it (or the
    .pth itself) as --inception_weights.
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("pth", help="pytorch-fid pt_inception .pth checkpoint")
    ap.add_argument("npz", help="output .npz path")
    ap.add_argument("--strict", action="store_true", help="fail on fingerprint mismatch")
    args = ap.parse_args(argv)
    verify_checkpoint(args.pth, strict=args.strict)
    # verify=False: the ~100MB file was just hashed above (incl. --strict)
    save_params_npz(convert_torch_inception(args.pth, verify=False), args.npz)
    print(f"wrote {args.npz}")


if __name__ == "__main__":
    main()
