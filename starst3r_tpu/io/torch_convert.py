"""Best-effort converter: public MASt3R ``.pth`` checkpoints -> our params.

The reference loads `MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth`
via `AsymmetricMASt3R.from_pretrained` (reference main.py:46,
docs/install.rst:24-31). This module maps that state_dict naming
(CroCo/DUSt3R/MASt3R lineage: patch_embed / enc_blocks / enc_norm /
decoder_embed / dec_blocks / dec_blocks2 / dec_norm / downstream heads)
onto our flax parameter tree (models/vit.py, models/mast3r.py).

Torch (CPU build) is used only here, only at conversion time — the runtime
never imports it. Conversion is necessarily best-effort for the DPT heads
(the vendored head code is not in the reference snapshot — SURVEY header
note on the missing submodule); unmapped keys are reported so a user with
the real checkpoint can extend `EXTRA_RULES`.

Usage:
    python -m starst3r_tpu.io.torch_convert in.pth out.npz --preset large
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ("convert_state_dict", "convert_file")


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _dense(sd, key):
    """torch Linear (out,in) -> flax Dense {kernel (in,out), bias}."""
    out = {"kernel": _t(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _ln(sd, key):
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def _conv_patch(sd, key):
    """torch Conv2d (out,in,kh,kw) -> flax Conv {kernel (kh,kw,in,out)}."""
    w = _t(sd[f"{key}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _t(sd[f"{key}.bias"])}


def _enc_block(sd, i):
    p = f"enc_blocks.{i}"
    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "attn": {"qkv": _dense(sd, f"{p}.attn.qkv"),
                 "proj": _dense(sd, f"{p}.attn.proj")},
        "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2")},
    }


def _dec_block(sd, prefix, i):
    p = f"{prefix}.{i}"
    blk = {
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "norm3": _ln(sd, f"{p}.norm3"),
        "self_attn": {"qkv": _dense(sd, f"{p}.attn.qkv"),
                      "proj": _dense(sd, f"{p}.attn.proj")},
        "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2")},
    }
    # CroCo cross attention: projq/projk/projv/proj
    blk["cross_attn"] = {
        "q": _dense(sd, f"{p}.cross_attn.projq"),
        "k": _dense(sd, f"{p}.cross_attn.projk"),
        "v": _dense(sd, f"{p}.cross_attn.projv"),
        "proj": _dense(sd, f"{p}.cross_attn.proj"),
    }
    return blk


def convert_state_dict(sd: Dict[str, Any], enc_depth: int,
                       dec_depth: int) -> Tuple[Dict[str, Any], List[str]]:
    """Returns (partial flax params {'params': ...}, unmapped torch keys).

    The encoder/decoder trunk maps exactly; DPT + descriptor heads are left
    random-init unless EXTRA_RULES handles them (their source is in the
    missing vendored submodule; SURVEY §2b row "AsymmetricMASt3R heads").
    """
    used = set()

    def take(fn, *args):
        before = dict(sd)
        out = fn(before, *args)

        def mark(d, key):
            for k in d:
                if isinstance(d[k], dict):
                    mark(d[k], key)
            return d
        return out

    params: Dict[str, Any] = {}

    # encoder
    enc = {"patch_embed": {"proj": _conv_patch(sd, "patch_embed.proj")},
           "norm": _ln(sd, "enc_norm")}
    for i in range(enc_depth):
        enc[f"block{i}"] = _enc_block(sd, i)
    params["encoder"] = enc
    used.update(k for k in sd if k.startswith(("patch_embed.", "enc_blocks.",
                                               "enc_norm.")))

    # decoders: the reference shares one decoder_embed for both streams
    for view, prefix in (("1", "dec_blocks"), ("2", "dec_blocks2")):
        dec = {"embed": _dense(sd, "decoder_embed"),
               "embed_other": _dense(sd, "decoder_embed"),
               "norm": _ln(sd, "dec_norm")}
        for i in range(dec_depth):
            dec[f"block{i}"] = _dec_block(sd, prefix, i)
        params[f"decoder{view}"] = dec
    used.update(k for k in sd if k.startswith(
        ("decoder_embed.", "dec_blocks.", "dec_blocks2.", "dec_norm.")))

    unmapped = sorted(k for k in sd if k not in used and
                      not k.startswith(("downstream_head", "mask_token",
                                        "head_local_features")))
    return {"params": params}, unmapped


def convert_file(pth_path: str, out_path: str, preset: str = "large",
                 verbose: bool = True) -> List[str]:
    import torch  # CPU build; conversion-time only

    from ..config import model_preset
    from ..models.mast3r import Mast3rModel

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    cfg = model_preset(preset)
    mapped, unmapped = convert_state_dict(sd, cfg.enc_depth, cfg.dec_depth)

    # start from a random init (for heads) and overwrite the mapped trunk
    model = Mast3rModel.init_random(cfg, image_hw=(224, 224))
    params = model.params

    def overwrite(dst, src, path=""):
        bad = []
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst and isinstance(dst[k], dict):
                    bad += overwrite(dst[k], v, f"{path}/{k}")
                else:
                    bad.append(f"{path}/{k} (missing in target)")
            else:
                if k in dst and tuple(np.shape(dst[k])) == tuple(v.shape):
                    dst[k] = np.asarray(v, np.float32)
                else:
                    have = tuple(np.shape(dst.get(k, ()))) if k in dst else None
                    bad.append(f"{path}/{k} shape {v.shape} vs {have}")
        return bad

    import flax
    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") \
        else params
    mismatches = overwrite(params["params"], mapped["params"])
    model = Mast3rModel(cfg, params)
    model.save_pretrained(out_path)
    if verbose:
        print(f"converted trunk -> {out_path}")
        if mismatches:
            print(f"{len(mismatches)} mismatched leaves (first 10):")
            for m in mismatches[:10]:
                print("  ", m)
        if unmapped:
            print(f"{len(unmapped)} unmapped torch keys (first 10):")
            for m in unmapped[:10]:
                print("  ", m)
        print("NOTE: DPT/descriptor heads keep random init unless mapped — "
              "validate against the real checkpoint before production use.")
    return mismatches + unmapped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pth")
    ap.add_argument("out")
    ap.add_argument("--preset", default="large")
    args = ap.parse_args()
    convert_file(args.pth, args.out, args.preset)


if __name__ == "__main__":
    main()
