import time
import numpy as np
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
from starst3r_tpu.utils import enable_compilation_cache
enable_compilation_cache()
log(f"jax up, devices={jax.devices()}")
from starst3r_tpu.config import SplatConfig
from starst3r_tpu.splat.train import init_gaussians, train_step, render
import importlib
rz = importlib.import_module("starst3r_tpu.splat.rasterize")

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
pts[:, 2] += 3.0
cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
cfg = SplatConfig()
state = init_gaussians(pts, cols, cfg)
gt = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))
w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                       jnp.float32)[None], (n_cams, 1, 1))

p = state.params
args = (p["means"], p["quats"], p["scales"], p["opacities"], p["shN"],
        w2c, K)


def run(impl):
    log(f"compiling rasterize impl={impl} ...")
    rgb, a, _ = rz.rasterize(*args, w, h, impl=impl)
    jax.block_until_ready(rgb)
    log(f"impl={impl} fwd compiled+run")
    t0 = time.time()
    for _ in range(5):
        rgb, a, _ = rz.rasterize(*args, w, h, impl=impl)
        jax.block_until_ready(rgb)
    log(f"impl={impl} fwd steady: {(time.time()-t0)/5*1e3:.1f} ms")
    return rgb


r_ref = run("ref")
r_pal = run("pallas")
log(f"max fwd diff: {float(jnp.max(jnp.abs(r_ref - r_pal))):.3e}")


def gloss(impl):
    @jax.jit
    def f(means, quats, scales, ops, sh):
        rgb, a, _ = rz.rasterize(means, quats, scales, ops, sh, w2c, K,
                                 w, h, impl=impl)
        return jnp.sum(jnp.abs(rgb - gt))
    return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))


for impl in ("ref", "pallas"):
    g = gloss(impl)
    log(f"compiling grad impl={impl} ...")
    out = g(p["means"], p["quats"], p["scales"], p["opacities"], p["shN"])
    jax.block_until_ready(out)
    log(f"impl={impl} grad compiled+run")
    t0 = time.time()
    for _ in range(5):
        out = g(p["means"], p["quats"], p["scales"], p["opacities"],
                p["shN"])
        jax.block_until_ready(out)
    log(f"impl={impl} grad steady: {(time.time()-t0)/5*1e3:.1f} ms")
