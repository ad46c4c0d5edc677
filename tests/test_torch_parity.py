"""End-to-end activation parity against a torch reimplementation of the
CroCo/DUSt3R/MASt3R trunk (the architecture behind the reference's
`MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth` checkpoint,
reference main.py:46, docs/install.rst:24-31).

Both networks load the SAME synthetic state dict (public checkpoint key
layout); every stage must agree to float32 tolerance:
  - encoder tokens,
  - every interleaved-decoder state (both streams),
  - DPT pointmap head outputs (pts3d + conf),
  - catMLP descriptor head outputs (desc + desc_conf).

This is what makes "0 unmapped keys" sufficient: the jax network provably
COMPUTES the same function as the torch reference topology, so a converted
real checkpoint reproduces reference behavior.

The torch model below is written from the public croco/dust3r/mast3r
architecture spec (pos_embed.RoPE2D, blocks.DecoderBlock(norm_mem=True),
dpt_block.DPTOutputAdapter, catmlp_dpt_head.Cat_MLP_LocalFeatures_DPT_Pts3d)
— not copied from any source tree.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import starst3r_tpu as st
from starst3r_tpu.config import ModelConfig
from starst3r_tpu.io.torch_convert import convert_state_dict

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

CFG = ModelConfig.tiny()
H = W = 32
HP, WP = H // CFG.patch_size, W // CFG.patch_size


# --------------------------------------------------------------------------
# torch reference trunk (croco/dust3r/mast3r semantics, checkpoint naming)
# --------------------------------------------------------------------------

class TRoPE2D(nn.Module):
    """croco RoPE2D: head dim halves encode (y, x); within each half,
    concatenated-halves rotate_half pairing with base**(-j/(D/4)) freqs."""

    def __init__(self, base=100.0):
        super().__init__()
        self.base = base

    @staticmethod
    def _rotate_half(x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def _apply_1d(self, tok, pos1d, cos, sin):
        # tok (B, nh, T, D), pos1d (B, T)
        cos = F.embedding(pos1d, cos)[:, None, :, :]
        sin = F.embedding(pos1d, sin)[:, None, :, :]
        return tok * cos + self._rotate_half(tok) * sin

    def forward(self, tokens, positions):
        # tokens (B, nh, T, hd); positions (B, T, 2) int
        D = tokens.size(3) // 2
        seq = int(positions.max()) + 1
        inv = 1.0 / (self.base ** (torch.arange(0, D, 2).float() / D))
        t = torch.arange(seq, dtype=inv.dtype)
        freqs = torch.einsum("i,j->ij", t, inv)
        freqs = torch.cat((freqs, freqs), dim=-1)
        cos, sin = freqs.cos(), freqs.sin()
        y, x = tokens.chunk(2, dim=-1)
        y = self._apply_1d(y, positions[:, :, 0], cos, sin)
        x = self._apply_1d(x, positions[:, :, 1], cos, sin)
        return torch.cat((y, x), dim=-1)


class TAttn(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads, self.rope = heads, rope
        self.scale = (dim // heads) ** -0.5

    def forward(self, x, pos):
        B, T, C = x.shape
        qkv = self.qkv(x).reshape(B, T, 3, self.heads,
                                  C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, k = self.rope(q, pos), self.rope(k, pos)
        a = (q @ k.transpose(-2, -1)) * self.scale
        a = a.softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, T, C))


class TCrossAttn(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.projq = nn.Linear(dim, dim)
        self.projk = nn.Linear(dim, dim)
        self.projv = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.heads, self.rope = heads, rope
        self.scale = (dim // heads) ** -0.5

    def forward(self, x, y, qpos, kpos):
        B, Tq, C = x.shape
        hd = C // self.heads
        q = self.projq(x).reshape(B, Tq, self.heads, hd).permute(0, 2, 1, 3)
        k = self.projk(y).reshape(B, -1, self.heads, hd).permute(0, 2, 1, 3)
        v = self.projv(y).reshape(B, -1, self.heads, hd).permute(0, 2, 1, 3)
        q, k = self.rope(q, qpos), self.rope(k, kpos)
        a = (q @ k.transpose(-2, -1)) * self.scale
        a = a.softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, Tq, C))


class TMlp(nn.Module):
    def __init__(self, dim, ratio):
        super().__init__()
        self.fc1 = nn.Linear(dim, int(dim * ratio))
        self.fc2 = nn.Linear(int(dim * ratio), dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TEncBlock(nn.Module):
    def __init__(self, dim, heads, ratio, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TAttn(dim, heads, rope)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TMlp(dim, ratio)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class TDecBlock(nn.Module):
    def __init__(self, dim, heads, ratio, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TAttn(dim, heads, rope)
        self.cross_attn = TCrossAttn(dim, heads, rope)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.norm_y = nn.LayerNorm(dim)   # croco norm_mem=True
        self.mlp = TMlp(dim, ratio)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, xpos, ypos)
        return x + self.mlp(self.norm3(x))


class TResUnit(nn.Module):
    def __init__(self, fd):
        super().__init__()
        self.conv1 = nn.Conv2d(fd, fd, 3, padding=1)
        self.conv2 = nn.Conv2d(fd, fd, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class TFusion(nn.Module):
    def __init__(self, fd):
        super().__init__()
        self.resConfUnit1 = TResUnit(fd)
        self.resConfUnit2 = TResUnit(fd)
        self.out_conv = nn.Conv2d(fd, fd, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class TInterpolate(nn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=True)


class TScratch(nn.Module):
    def __init__(self, ld, fd):
        super().__init__()
        for j in range(1, 5):
            setattr(self, f"layer{j}_rn",
                    nn.Conv2d(ld[j - 1], fd, 3, padding=1, bias=False))
            setattr(self, f"refinenet{j}", TFusion(fd))


class TDPT(nn.Module):
    """croco DPTOutputAdapter forward semantics, checkpoint param naming."""

    def __init__(self, dims_tokens, ld, fd, last, out_ch):
        super().__init__()
        self.act_postprocess = nn.ModuleList([
            nn.Sequential(nn.Conv2d(dims_tokens[0], ld[0], 1),
                          nn.ConvTranspose2d(ld[0], ld[0], 4, 4)),
            nn.Sequential(nn.Conv2d(dims_tokens[1], ld[1], 1),
                          nn.ConvTranspose2d(ld[1], ld[1], 2, 2)),
            nn.Sequential(nn.Conv2d(dims_tokens[2], ld[2], 1)),
            nn.Sequential(nn.Conv2d(dims_tokens[3], ld[3], 1),
                          nn.Conv2d(ld[3], ld[3], 3, stride=2, padding=1)),
        ])
        self.scratch = TScratch(ld, fd)
        self.head = nn.Sequential(
            nn.Conv2d(fd, fd // 2, 3, padding=1),
            TInterpolate(),
            nn.Conv2d(fd // 2, last, 3, padding=1),
            nn.ReLU(True),
            nn.Conv2d(last, out_ch, 1))

    def forward(self, hooks, hp, wp):
        layers = [h.transpose(1, 2).reshape(h.shape[0], -1, hp, wp)
                  for h in hooks]
        layers = [self.act_postprocess[i](l) for i, l in enumerate(layers)]
        layers = [getattr(self.scratch, f"layer{i + 1}_rn")(l)
                  for i, l in enumerate(layers)]
        p4 = self.scratch.refinenet4(layers[3])
        p3 = self.scratch.refinenet3(p4, layers[2])
        p2 = self.scratch.refinenet2(p3, layers[1])
        p1 = self.scratch.refinenet1(p2, layers[0])
        return self.head(p1)


class TDownstreamHead(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims_tokens = (cfg.enc_dim, cfg.dec_dim, cfg.dec_dim, cfg.dec_dim)
        self.dpt = TDPT(dims_tokens, cfg.dpt_layer_dims, cfg.dpt_feature_dim,
                        cfg.dpt_last_dim, 4)
        idim = cfg.enc_dim + cfg.dec_dim
        self.head_local_features = TMlp(idim, 0)  # replaced below
        self.head_local_features.fc1 = nn.Linear(idim, int(4.0 * idim))
        self.head_local_features.fc2 = nn.Linear(
            int(4.0 * idim), (cfg.desc_dim + 1) * cfg.patch_size ** 2)


class TTrunk(nn.Module):
    """AsymmetricMASt3R-shaped trunk at tiny geometry."""

    def __init__(self, cfg):
        super().__init__()
        rope = TRoPE2D(cfg.rope_base)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, cfg.enc_dim, cfg.patch_size,
                                          cfg.patch_size)
        self.enc_blocks = nn.ModuleList(
            [TEncBlock(cfg.enc_dim, cfg.enc_heads, cfg.mlp_ratio, rope)
             for _ in range(cfg.enc_depth)])
        self.enc_norm = nn.LayerNorm(cfg.enc_dim)
        self.decoder_embed = nn.Linear(cfg.enc_dim, cfg.dec_dim)
        self.dec_blocks = nn.ModuleList(
            [TDecBlock(cfg.dec_dim, cfg.dec_heads, cfg.mlp_ratio, rope)
             for _ in range(cfg.dec_depth)])
        self.dec_blocks2 = nn.ModuleList(
            [TDecBlock(cfg.dec_dim, cfg.dec_heads, cfg.mlp_ratio, rope)
             for _ in range(cfg.dec_depth)])
        self.dec_norm = nn.LayerNorm(cfg.dec_dim)
        self.downstream_head1 = TDownstreamHead(cfg)
        self.downstream_head2 = TDownstreamHead(cfg)
        self.mask_token = nn.Parameter(torch.zeros(1, 1, cfg.dec_dim))
        self.cfg = cfg

    def encode(self, img, pos):
        x = self.patch_embed.proj(img).flatten(2).transpose(1, 2)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x)

    def decode(self, f1, f2, pos):
        s1 = [self.decoder_embed(f1)]
        s2 = [self.decoder_embed(f2)]
        for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
            n1 = b1(s1[-1], s2[-1], pos, pos)
            n2 = b2(s2[-1], s1[-1], pos, pos)
            s1.append(n1)
            s2.append(n2)
        s1[-1] = self.dec_norm(s1[-1])
        s2[-1] = self.dec_norm(s2[-1])
        return s1, s2

    def head(self, which, f, states, hp, wp):
        cfg = self.cfg
        L = cfg.dec_depth
        h1, h2 = max(1, L // 2), max(1, (3 * L) // 4)
        hooks = [f, states[h1], states[h2], states[-1]]
        dh = self.downstream_head1 if which == 1 else self.downstream_head2
        raw = dh.dpt(hooks, hp, wp).permute(0, 2, 3, 1)  # (B, H, W, 4)
        xyz, c = raw[..., :3], raw[..., 3]
        d = xyz.norm(dim=-1, keepdim=True)
        pts = xyz / d.clip(min=1e-8) * torch.expm1(d)
        conf = 1.0 + c.exp()
        cat = torch.cat([f, states[-1]], dim=-1)
        lf = dh.head_local_features.fc2(
            F.gelu(dh.head_local_features.fc1(cat)))
        B = cat.shape[0]
        lf = lf.transpose(-1, -2).reshape(B, -1, hp, wp)
        lf = F.pixel_shuffle(lf, cfg.patch_size).permute(0, 2, 3, 1)
        desc = F.normalize(lf[..., : cfg.desc_dim], dim=-1)
        desc_conf = 1.0 + lf[..., -1].exp()
        return pts, conf, desc, desc_conf

    def forward(self, img1, img2, pos):
        f1 = self.encode(img1, pos)
        f2 = self.encode(img2, pos)
        s1, s2 = self.decode(f1, f2, pos)
        hp, wp = img1.shape[2] // 16, img1.shape[3] // 16
        out = {}
        for v, (f, s) in ((1, (f1, s1)), (2, (f2, s2))):
            pts, conf, desc, dconf = self.head(v, f, s, hp, wp)
            out[f"pts{v}"], out[f"conf{v}"] = pts, conf
            out[f"desc{v}"], out[f"desc_conf{v}"] = desc, dconf
        return f1, f2, s1, s2, out


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------

def _sane_state_dict(seed=0):
    """Checkpoint-layout state dict with realistic initialization scales
    (LN weights ~1, small conv/linear weights) so activations stay in a
    numerically comparable range through the deep DPT conv stack."""
    torch.manual_seed(seed)
    model = TTrunk(CFG)
    sd = {}
    for k, v in model.state_dict().items():
        g = torch.Generator().manual_seed(abs(hash(k)) % (2 ** 31))
        if k.endswith(".weight") and (".norm" in k or "_norm" in k):
            sd[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
        elif k.endswith(".bias"):
            sd[k] = 0.05 * torch.randn(v.shape, generator=g)
        else:
            fan_in = v.shape[-1] if v.ndim <= 2 else int(np.prod(v.shape[1:]))
            sd[k] = torch.randn(v.shape, generator=g) / max(fan_in, 1) ** 0.5
    return sd


@pytest.fixture(scope="module")
def both_models():
    sd = _sane_state_dict()
    tmodel = TTrunk(CFG)
    tmodel.load_state_dict(sd)
    tmodel.eval()

    np_sd = {k: v.numpy() for k, v in sd.items()}
    mapped, unmapped = convert_state_dict(np_sd, CFG.enc_depth, CFG.dec_depth,
                                          CFG.patch_size, CFG.desc_dim)
    assert unmapped == [], unmapped[:10]
    jmodel = st.Mast3rModel.init_random(CFG, image_hw=(H, W))

    def overwrite(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"{path}/{k} missing in jax tree"
            if isinstance(v, dict):
                overwrite(dst[k], v, f"{path}/{k}")
            else:
                assert tuple(np.shape(dst[k])) == tuple(v.shape), \
                    f"{path}/{k}: {v.shape} vs {np.shape(dst[k])}"
                dst[k] = jnp.asarray(v, jnp.float32)

    params = jmodel.params
    overwrite(params["params"], mapped["params"])
    jmodel.params = params
    return tmodel, jmodel


@pytest.fixture(scope="module")
def images(both_models):
    rng = np.random.default_rng(7)
    img1 = rng.uniform(-1, 1, size=(2, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(-1, 1, size=(2, H, W, 3)).astype(np.float32)
    return img1, img2


def _torch_pos():
    y = torch.arange(HP)
    x = torch.arange(WP)
    pos = torch.cartesian_prod(y, x)          # (T, 2) raster, (y, x)
    return pos[None].expand(2, -1, -1)


# --------------------------------------------------------------------------
# parity tests
# --------------------------------------------------------------------------

def test_encoder_parity(both_models, images):
    tmodel, jmodel = both_models
    img1, _ = images
    with torch.no_grad():
        want = tmodel.encode(torch.from_numpy(img1.transpose(0, 3, 1, 2)),
                             _torch_pos()).numpy()
    from starst3r_tpu.models.vit import Encoder
    enc = Encoder(CFG.enc_depth, CFG.enc_dim, CFG.enc_heads, CFG.patch_size,
                  CFG.mlp_ratio, CFG.rope_base, jnp.float32)
    got = enc.apply({"params": jmodel.params["params"]["encoder"]},
                    jnp.asarray(img1))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_decoder_states_parity(both_models, images):
    """Every interleaved-decoder state of BOTH streams matches — this is
    the round-2 gap (static encoder cross-attention vs true interleaving)
    made impossible to regress."""
    tmodel, jmodel = both_models
    img1, img2 = images
    with torch.no_grad():
        pos = _torch_pos()
        tf1 = tmodel.encode(torch.from_numpy(img1.transpose(0, 3, 1, 2)), pos)
        tf2 = tmodel.encode(torch.from_numpy(img2.transpose(0, 3, 1, 2)), pos)
        ts1, ts2 = tmodel.decode(tf1, tf2, pos)

    from starst3r_tpu.models.vit import InterleavedDecoder, patch_positions
    dec = InterleavedDecoder(CFG.dec_depth, CFG.dec_dim, CFG.dec_heads,
                             CFG.enc_dim, CFG.mlp_ratio, CFG.rope_base,
                             jnp.float32)
    jpos = patch_positions(HP, WP)[None]
    js1, js2 = dec.apply({"params": jmodel.params["params"]["decoder"]},
                         jnp.asarray(tf1.numpy()), jnp.asarray(tf2.numpy()),
                         jpos, jpos)
    assert len(js1) == len(ts1) == CFG.dec_depth + 1
    for i, (tj, tt) in enumerate(zip(js1, ts1)):
        np.testing.assert_allclose(np.asarray(tj), tt.numpy(), atol=3e-4,
                                   rtol=1e-3, err_msg=f"stream1 state {i}")
    for i, (tj, tt) in enumerate(zip(js2, ts2)):
        np.testing.assert_allclose(np.asarray(tj), tt.numpy(), atol=3e-4,
                                   rtol=1e-3, err_msg=f"stream2 state {i}")


def test_full_output_parity(both_models, images):
    """Heads end-to-end: pointmaps, confidences, descriptors, descriptor
    confidences of both views match the torch reference trunk."""
    tmodel, jmodel = both_models
    img1, img2 = images
    with torch.no_grad():
        _, _, _, _, want = tmodel(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)), _torch_pos())
    got = jmodel.infer_pair_batch(jnp.asarray(img1), jnp.asarray(img2))
    for key, atol in (("pts1", 5e-4), ("pts2", 5e-4),
                      ("conf1", 1e-3), ("conf2", 1e-3),
                      ("desc1", 1e-3), ("desc2", 1e-3),
                      ("desc_conf1", 1e-3), ("desc_conf2", 1e-3)):
        np.testing.assert_allclose(np.asarray(got[key]), want[key].numpy(),
                                   atol=atol, rtol=2e-3, err_msg=key)
