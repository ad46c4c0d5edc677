"""Checkpoint conversion: the full MASt3R catmlpdpt layout must map with
ZERO unmapped keys, every mapped leaf must land on a real model leaf with
the right shape, and the nontrivial re-layouts (transposed-conv -> Dense +
pixel-shuffle, fc2 pixel-shuffle column permutation, stride-2 conv padding)
must be numerically exact against torch."""

import numpy as np
import pytest

import starst3r_tpu as st
from starst3r_tpu.config import ModelConfig
from starst3r_tpu.io.torch_convert import (_convT_as_dense_up,
                                           _fc_pixelshuffle, _Rec,
                                           convert_state_dict)

torch = pytest.importorskip("torch")

CFG = ModelConfig.tiny()
IDIM = CFG.enc_dim + CFG.dec_dim
P = CFG.patch_size
FD = CFG.dpt_feature_dim
LD = CFG.dpt_layer_dims
LAST = CFG.dpt_last_dim


def _synthetic_state_dict(rng):
    """A state dict with the public MASt3R checkpoint layout at tiny
    geometry (layout per mast3r/catmlp_dpt_head.py + croco/dpt_block.py)."""
    sd = {}

    def add(key, *shape):
        sd[key] = rng.normal(size=shape).astype(np.float32)

    add("patch_embed.proj.weight", CFG.enc_dim, 3, P, P)
    add("patch_embed.proj.bias", CFG.enc_dim)
    add("enc_norm.weight", CFG.enc_dim)
    add("enc_norm.bias", CFG.enc_dim)
    for i in range(CFG.enc_depth):
        pfx = f"enc_blocks.{i}"
        for n in ("norm1", "norm2"):
            add(f"{pfx}.{n}.weight", CFG.enc_dim)
            add(f"{pfx}.{n}.bias", CFG.enc_dim)
        add(f"{pfx}.attn.qkv.weight", 3 * CFG.enc_dim, CFG.enc_dim)
        add(f"{pfx}.attn.qkv.bias", 3 * CFG.enc_dim)
        add(f"{pfx}.attn.proj.weight", CFG.enc_dim, CFG.enc_dim)
        add(f"{pfx}.attn.proj.bias", CFG.enc_dim)
        hid = int(CFG.enc_dim * CFG.mlp_ratio)
        add(f"{pfx}.mlp.fc1.weight", hid, CFG.enc_dim)
        add(f"{pfx}.mlp.fc1.bias", hid)
        add(f"{pfx}.mlp.fc2.weight", CFG.enc_dim, hid)
        add(f"{pfx}.mlp.fc2.bias", CFG.enc_dim)

    dd = CFG.dec_dim
    add("decoder_embed.weight", dd, CFG.enc_dim)
    add("decoder_embed.bias", dd)
    add("dec_norm.weight", dd)
    add("dec_norm.bias", dd)
    for blocks in ("dec_blocks", "dec_blocks2"):
        for i in range(CFG.dec_depth):
            pfx = f"{blocks}.{i}"
            for n in ("norm1", "norm2", "norm3", "norm_y"):
                add(f"{pfx}.{n}.weight", dd)
                add(f"{pfx}.{n}.bias", dd)
            add(f"{pfx}.attn.qkv.weight", 3 * dd, dd)
            add(f"{pfx}.attn.qkv.bias", 3 * dd)
            add(f"{pfx}.attn.proj.weight", dd, dd)
            add(f"{pfx}.attn.proj.bias", dd)
            for n in ("projq", "projk", "projv", "proj"):
                add(f"{pfx}.cross_attn.{n}.weight", dd, dd)
                add(f"{pfx}.cross_attn.{n}.bias", dd)
            hid = int(dd * CFG.mlp_ratio)
            add(f"{pfx}.mlp.fc1.weight", hid, dd)
            add(f"{pfx}.mlp.fc1.bias", hid)
            add(f"{pfx}.mlp.fc2.weight", dd, hid)
            add(f"{pfx}.mlp.fc2.bias", dd)

    dims_tokens = (CFG.enc_dim, dd, dd, dd)
    for v in ("1", "2"):
        dpt = f"downstream_head{v}.dpt"
        for i in range(4):
            add(f"{dpt}.act_postprocess.{i}.0.weight",
                LD[i], dims_tokens[i], 1, 1)
            add(f"{dpt}.act_postprocess.{i}.0.bias", LD[i])
        add(f"{dpt}.act_postprocess.0.1.weight", LD[0], LD[0], 4, 4)
        add(f"{dpt}.act_postprocess.0.1.bias", LD[0])
        add(f"{dpt}.act_postprocess.1.1.weight", LD[1], LD[1], 2, 2)
        add(f"{dpt}.act_postprocess.1.1.bias", LD[1])
        add(f"{dpt}.act_postprocess.3.1.weight", LD[3], LD[3], 3, 3)
        add(f"{dpt}.act_postprocess.3.1.bias", LD[3])
        for j in range(1, 5):
            add(f"{dpt}.scratch.layer{j}_rn.weight", FD, LD[j - 1], 3, 3)
            rp = f"{dpt}.scratch.refinenet{j}"
            for unit in ("resConfUnit1", "resConfUnit2"):
                for conv in ("conv1", "conv2"):
                    add(f"{rp}.{unit}.{conv}.weight", FD, FD, 3, 3)
                    add(f"{rp}.{unit}.{conv}.bias", FD)
            add(f"{rp}.out_conv.weight", FD, FD, 1, 1)
            add(f"{rp}.out_conv.bias", FD)
        add(f"{dpt}.head.0.weight", FD // 2, FD, 3, 3)
        add(f"{dpt}.head.0.bias", FD // 2)
        add(f"{dpt}.head.2.weight", LAST, FD // 2, 3, 3)
        add(f"{dpt}.head.2.bias", LAST)
        add(f"{dpt}.head.4.weight", 4, LAST, 1, 1)
        add(f"{dpt}.head.4.bias", 4)
        lf = f"downstream_head{v}.head_local_features"
        hid = int(4.0 * IDIM)
        add(f"{lf}.fc1.weight", hid, IDIM)
        add(f"{lf}.fc1.bias", hid)
        add(f"{lf}.fc2.weight", (CFG.desc_dim + 1) * P * P, hid)
        add(f"{lf}.fc2.bias", (CFG.desc_dim + 1) * P * P)

    add("mask_token", 1, 1, dd)
    return sd


def test_zero_unmapped_keys(rng):
    sd = _synthetic_state_dict(rng)
    mapped, unmapped = convert_state_dict(sd, CFG.enc_depth, CFG.dec_depth,
                                          CFG.patch_size, CFG.desc_dim)
    assert unmapped == [], unmapped[:10]


def test_every_mapped_leaf_lands(rng):
    """Every converted leaf must exist in the real model tree at the right
    shape — i.e. the converter output loads with zero mismatches."""
    sd = _synthetic_state_dict(rng)
    mapped, _ = convert_state_dict(sd, CFG.enc_depth, CFG.dec_depth,
                                   CFG.patch_size, CFG.desc_dim)
    model = st.Mast3rModel.init_random(CFG, image_hw=(32, 32))

    def walk(src, dst, path=""):
        bad = []
        for k, v in src.items():
            if k not in dst:
                bad.append(f"{path}/{k} missing")
            elif isinstance(v, dict):
                bad += walk(v, dst[k], f"{path}/{k}")
            elif tuple(np.shape(dst[k])) != tuple(v.shape):
                bad.append(f"{path}/{k} {v.shape} vs {np.shape(dst[k])}")
        return bad

    bad = walk(mapped["params"], model.params["params"])
    assert not bad, bad[:10]


def test_convT_as_dense_upsample_exact(rng):
    """ConvTranspose2d(k==s) == our Dense + pixel-shuffle re-layout."""
    import jax.numpy as jnp
    from starst3r_tpu.models.heads import _DenseUpsample

    cin, cout, r = 6, 5, 4
    conv = torch.nn.ConvTranspose2d(cin, cout, kernel_size=r, stride=r)
    x = rng.normal(size=(2, cin, 3, 7)).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()           # (2, cout, 12, 28)

    sd = _Rec({"up.weight": conv.weight.detach().numpy(),
               "up.bias": conv.bias.detach().numpy()})
    leaves = _convT_as_dense_up(sd, "up", r)
    mod = _DenseUpsample(cout, r, jnp.float32)
    out = mod.apply({"params": leaves},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))  # NHWC
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


def test_fc2_pixelshuffle_permutation_exact(rng):
    """fc2 + F.pixel_shuffle == permuted-fc2 + our (i,j,c) shuffle."""
    import jax.numpy as jnp

    p, c, din = 4, 3, 10
    hp, wp = 2, 3
    lin = torch.nn.Linear(din, c * p * p)
    tok = rng.normal(size=(1, hp * wp, din)).astype(np.float32)
    with torch.no_grad():
        y = lin(torch.from_numpy(tok))                      # (1, T, C*p*p)
        y = y.transpose(-1, -2).view(1, c * p * p, hp, wp)
        want = torch.nn.functional.pixel_shuffle(y, p).numpy()  # (1,c,H,W)

    sd = _Rec({"fc2.weight": lin.weight.detach().numpy(),
               "fc2.bias": lin.bias.detach().numpy()})
    leaves = _fc_pixelshuffle(sd, "fc2", p, c)
    out = jnp.asarray(tok) @ leaves["kernel"] + leaves["bias"]
    out = out.reshape(1, hp, wp, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    out = np.asarray(out.reshape(1, hp * p, wp * p, c))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_stride2_conv_padding_matches_torch(rng):
    """act3_down: torch Conv2d(3x3, s=2, p=1) == flax Conv with explicit
    ((1,1),(1,1)) padding."""
    import jax.numpy as jnp
    import flax.linen as nn

    cin = cout = 5
    conv = torch.nn.Conv2d(cin, cout, 3, stride=2, padding=1)
    x = rng.normal(size=(1, cin, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()

    mod = nn.Conv(cout, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                  dtype=jnp.float32)
    kernel = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    out = mod.apply({"params": {"kernel": kernel,
                                "bias": conv.bias.detach().numpy()}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), want,
                               atol=1e-5)
