"""The asymmetric two-view pointmap + descriptor network, and its user-facing
wrapper (`Mast3rModel`).

Capability parity target (SURVEY §2b rows 1-2; reference call-sites
starster/__init__.py:3, main.py:46): given an image pair (I1, I2) predict
  - X11: dense 3D points of I1 in I1's camera frame, + confidence C11
  - X21: dense 3D points of I2 in I1's camera frame, + confidence C21
  - D1, D2: dense local descriptor maps + descriptor confidences
with a shared ViT encoder, two cross-attention decoders (asymmetric — one per
view role), a DPT pointmap head per view and a descriptor head per view.

TPU-first: inference is batched over pairs — `batched_inference` stacks many
pairs into one (2B, H, W, 3) forward so the MXU sees large GEMMs; the same
jitted function is reused for every same-resolution bucket. Symmetric pairs
(i,j),(j,i) are two rows of the same batch, not special cases.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, model_preset
from ..utils.checkpoint import restore_pytree, save_pytree
from .heads import DescriptorHead, DPTHead, postprocess_pointmap
from .vit import Encoder, InterleavedDecoder, patch_positions

__all__ = ("TwoViewNet", "Mast3rModel", "PairPrediction")


def _dtype_of(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


def _dpt_hooks(depth: int) -> Tuple[int, int]:
    """The two MID-decoder hook indices (into the states list, where
    states[i] is decoder block i's output). The full DPT hook set is
    [encoder_out, states[hooks[0]], states[hooks[1]], states[depth]] —
    the reference's hooks_idx=[0, 2L/4, 3L/4, L] over [enc]+dec states."""
    return (max(1, depth // 2), max(1, (3 * depth) // 4))


class TwoViewNet(nn.Module):
    """Flax module for one pair direction: predicts view1-frame pointmaps for
    both images plus descriptors."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray):
        """img1, img2: (B, H, W, 3) normalized to [-1, 1].

        Returns a dict of float32 outputs:
          pts1/pts2 (B, H, W, 3), conf1/conf2 (B, H, W),
          desc1/desc2 (B, H, W, desc_dim), desc_conf1/desc_conf2 (B, H, W)
        """
        cfg = self.cfg
        dt = _dtype_of(cfg)
        b, h, w, _ = img1.shape
        hp, wp = h // cfg.patch_size, w // cfg.patch_size
        pos = patch_positions(hp, wp)[None]

        encoder = Encoder(cfg.enc_depth, cfg.enc_dim, cfg.enc_heads,
                          cfg.patch_size, cfg.mlp_ratio, cfg.rope_base, dt,
                          name="encoder")
        # one batched encode for both views (2B rows on the MXU)
        feats = encoder(jnp.concatenate([img1, img2], axis=0))
        f1, f2 = feats[:b], feats[b:]

        h1, h2 = _dpt_hooks(cfg.dec_depth)
        # the CroCo interleaved two-stream decoder (checkpoint topology:
        # shared decoder_embed/dec_norm, dec_blocks + dec_blocks2 lockstep)
        dec = InterleavedDecoder(cfg.dec_depth, cfg.dec_dim, cfg.dec_heads,
                                 cfg.enc_dim, cfg.mlp_ratio, cfg.rope_base,
                                 dt, name="decoder")
        states1, states2 = dec(f1, f2, pos, pos)
        outs = {}
        for view, (fs, states) in (("1", (f1, states1)),
                                   ("2", (f2, states2))):
            # DPT hooks: raw ENCODER tokens + two mid-decoder states +
            # final normalized decoder tokens (checkpoint hook layout)
            hook_states = [fs, states[h1], states[h2], states[-1]]
            raw = DPTHead(4, cfg.dpt_feature_dim, cfg.dpt_layer_dims,
                          cfg.dpt_last_dim, cfg.patch_size, dt,
                          name=f"head{view}")(hook_states, hp, wp, h, w)
            pts, conf = postprocess_pointmap(raw, cfg.pointmap_mode)
            desc, desc_conf = DescriptorHead(
                cfg.desc_dim, cfg.patch_size, cfg.desc_hidden_factor, dt,
                name=f"desc_head{view}")(fs, states[-1], hp, wp)
            outs[f"pts{view}"] = pts
            outs[f"conf{view}"] = conf
            outs[f"desc{view}"] = desc
            outs[f"desc_conf{view}"] = desc_conf
        return outs


@dataclass
class PairPrediction:
    """Host-side container for one inference direction (i -> j): points of
    both images in image i's frame (the reference pair dict analog,
    call-site reconstruct.py:97-99)."""

    idx1: int
    idx2: int
    pts1: np.ndarray       # (H, W, 3) image idx1's points, frame idx1
    conf1: np.ndarray      # (H, W)
    pts2: np.ndarray       # (H, W, 3) image idx2's points, frame idx1
    conf2: np.ndarray      # (H, W)
    desc1: np.ndarray      # (H, W, D)
    desc2: np.ndarray
    desc_conf1: np.ndarray
    desc_conf2: np.ndarray


class Mast3rModel:
    """User-facing model wrapper (reference-compat name: the reference pins
    `Mast3rModel = mast3r.model.AsymmetricMASt3R`, starster/__init__.py:3).

    Holds (config, params) and exposes jitted batched inference. Checkpoints
    use the framework's own .npz pytree format.
    """

    def __init__(self, cfg: ModelConfig, params: Any):
        self.cfg = cfg
        self.net = TwoViewNet(cfg)
        self.params = params
        self._jitted: Dict[Tuple[int, int, int], Any] = {}

    # ---------------- construction ----------------
    @classmethod
    def init_random(cls, cfg: Optional[ModelConfig] = None, seed: int = 0,
                    image_hw: Tuple[int, int] = (64, 64)) -> "Mast3rModel":
        cfg = cfg or ModelConfig.tiny()
        h, w = image_hw
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        params = TwoViewNet(cfg).init(jax.random.PRNGKey(seed), dummy, dummy)
        return cls(cfg, params)

    @classmethod
    def from_pretrained(cls, path: str,
                        cfg: Optional[ModelConfig] = None) -> "Mast3rModel":
        """Load a checkpoint saved by `save_pretrained`. The model geometry is
        read from the sidecar config entry unless ``cfg`` is given."""
        import json
        with np.load(path, allow_pickle=False) as data:
            cfg_json = bytes(data["__config__"].tolist()).decode()
        loaded = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in json.loads(cfg_json).items()}
        saved_cfg = ModelConfig(**loaded)
        cfg = cfg or saved_cfg
        model = cls.init_random(cfg)
        model.params = restore_pytree_npz(path, model.params)
        return model

    def save_pretrained(self, path: str):
        import json
        from ..utils.checkpoint import _flatten  # reuse flattening
        flat = _flatten(self.params)
        cfg_json = json.dumps(self.cfg.__dict__)
        np.savez(path, __config__=np.frombuffer(cfg_json.encode(),
                                                dtype=np.uint8), **flat)

    # ---------------- inference ----------------
    def _forward_fn(self, batch: int, h: int, w: int):
        key = (batch, h, w)
        if key not in self._jitted:
            @jax.jit
            def fwd(params, img1, img2):
                return self.net.apply(params, img1, img2)
            self._jitted[key] = fwd
        return self._jitted[key]

    def infer_pair_batch(self, img1: jnp.ndarray, img2: jnp.ndarray):
        """img1/img2: (B, H, W, 3) [-1,1] float32. Returns the raw output
        dict (on device)."""
        b, h, w, _ = img1.shape
        return self._forward_fn(b, h, w)(self.params, img1, img2)

    def infer_pairs(self, images: Sequence[np.ndarray],
                    pair_indices: Sequence[Tuple[int, int]],
                    batch_size: int = 8,
                    sharding=None) -> List[PairPrediction]:
        """Run pairwise inference over a pair graph.

        images: list of (3, H, W) preprocessed images (all same shape — one
        resolution bucket). Pairs are stacked ``batch_size`` at a time into
        one forward (pad to full batch so only one program is compiled).
        ``sharding`` optionally places the batch over a mesh data axis
        (pair-parallel inference, SURVEY §2c row 1).
        """
        if not pair_indices:
            return []
        imgs_hwc = np.stack([np.asarray(im).transpose(1, 2, 0)
                             for im in images])  # (N, H, W, 3)
        results: List[PairPrediction] = []
        n = len(pair_indices)
        # under a sharding the batch must stay divisible by the mesh axis,
        # so keep the full batch and let the tail pad
        bs = batch_size if sharding is not None else min(batch_size, n)
        for start in range(0, n, bs):
            chunk = list(pair_indices[start: start + bs])
            pad = bs - len(chunk)
            chunk_p = chunk + [chunk[-1]] * pad
            i_idx = np.array([p[0] for p in chunk_p])
            j_idx = np.array([p[1] for p in chunk_p])
            img1 = jnp.asarray(imgs_hwc[i_idx])
            img2 = jnp.asarray(imgs_hwc[j_idx])
            if sharding is not None:
                img1 = jax.device_put(img1, sharding)
                img2 = jax.device_put(img2, sharding)
            out = self.infer_pair_batch(img1, img2)
            out = jax.tree_util.tree_map(np.asarray, out)
            for k, (i, j) in enumerate(chunk):
                results.append(PairPrediction(
                    idx1=i, idx2=j,
                    pts1=out["pts1"][k], conf1=out["conf1"][k],
                    pts2=out["pts2"][k], conf2=out["conf2"][k],
                    desc1=out["desc1"][k], desc2=out["desc2"][k],
                    desc_conf1=out["desc_conf1"][k],
                    desc_conf2=out["desc_conf2"][k]))
        return results


def restore_pytree_npz(path: str, like: Any) -> Any:
    """Restore a params pytree from an npz written by `save_pretrained`."""
    from ..utils.checkpoint import _path_str
    with np.load(path, allow_pickle=False) as data:
        flat_saved = {k: data[k] for k in data.files
                      if not k.startswith("__")}
    paths_like, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_like, leaf in paths_like:
        key = "/".join(_path_str(p) for p in path_like)
        if key not in flat_saved:
            raise KeyError(f"checkpoint {path!r} missing leaf {key!r}")
        leaves.append(flat_saved[key].astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
