"""Import reference PyTorch Generator weights into this framework.

The reference saves ``best_model.pth`` bundles with a ``model_state_dict``
(``/root/reference/src/training/trainer.py:410-417``) but ships no loader at all.
This tool maps that state_dict onto our flax param pytree so existing reference
checkpoints keep working:

reference module                         -> our param path (kernel HWIO)
---------------------------------------------------------------------------
init_conv.{weight,bias}                  -> init_conv/{kernel,bias}
cell{k}.conv.{weight,bias}               -> recurrence/cell{k}/{kernel,bias}
dem_attn.conv.0 / .2                     -> dem_attn/conv_reduce / conv_gate
lu_attn.conv.0 / .2                      -> lu_attn/conv_reduce / conv_gate
upsample_blocks.{i}.conv                 -> upsample_{i}/conv
post_process.0 / .2                      -> post_conv1 / post_conv2

Conv weights transpose OIHW -> HWIO; biases pass through. The ConvLSTM gate order
(i|f|o|g along the output-channel axis) is identical on both sides, so cell kernels
need only the layout transpose.

Usage:
    python -m pl_convlstm_gan_tpu.tools.import_torch_checkpoint \
        --pth best_model.pth --out converted_ckpt
"""
from __future__ import annotations

import argparse
from typing import Dict

import numpy as np

from ..ops.nn import hwio_from_oihw, oihw_from_hwio


def _conv(sd: Dict, name: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)
    out = {"kernel": hwio_from_oihw(w)}                    # OIHW -> HWIO
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"], dtype=np.float32)
    return out


def convert_state_dict(sd: Dict) -> Dict:
    """Reference Generator state_dict -> our flax params dict ({'params': ...})."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {"init_conv": _conv(sd, "init_conv"), "recurrence": {}}

    cells = sorted({k.split(".")[0] for k in sd if k.startswith("cell")})
    for cell in cells:
        params["recurrence"][cell] = _conv(sd, f"{cell}.conv")

    for ours, theirs in (("dem_attn", "dem_attn"), ("lu_attn", "lu_attn")):
        params[ours] = {"conv_reduce": _conv(sd, f"{theirs}.conv.0"),
                        "conv_gate": _conv(sd, f"{theirs}.conv.2")}

    i = 0
    while f"upsample_blocks.{i}.conv.weight" in sd:
        params[f"upsample_{i}"] = {"conv": _conv(sd, f"upsample_blocks.{i}.conv")}
        i += 1

    params["post_conv1"] = _conv(sd, "post_process.0")
    params["post_conv2"] = _conv(sd, "post_process.2")
    return {"params": params}


def export_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (our params -> reference-style state_dict); used for
    round-trip testing and for handing weights back to torch users."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}

    def put(name, leaf):
        sd[f"{name}.weight"] = oihw_from_hwio(np.asarray(leaf["kernel"]))
        if "bias" in leaf:
            sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    put("init_conv", p["init_conv"])
    for cell, leaf in p["recurrence"].items():
        put(f"{cell}.conv", leaf)
    for ours, theirs in (("dem_attn", "dem_attn"), ("lu_attn", "lu_attn")):
        put(f"{theirs}.conv.0", p[ours]["conv_reduce"])
        put(f"{theirs}.conv.2", p[ours]["conv_gate"])
    i = 0
    while f"upsample_{i}" in p:
        put(f"upsample_blocks.{i}.conv", p[f"upsample_{i}"]["conv"])
        i += 1
    put("post_process.0", p["post_conv1"])
    put("post_process.2", p["post_conv2"])
    return sd


def load_pth(path: str) -> Dict:
    """Load a reference .pth bundle (or bare state_dict) via torch."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model_state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True, help="reference best_model.pth")
    ap.add_argument("--out", required=True, help="output orbax checkpoint dir")
    args = ap.parse_args()

    from ..train.checkpoint import save_checkpoint

    params = convert_state_dict(load_pth(args.pth))
    save_checkpoint(args.out, {"params": params},
                    {"source": args.pth, "format": "imported-torch"})
    print(f"converted {args.pth} -> {args.out}")


if __name__ == "__main__":
    main()
