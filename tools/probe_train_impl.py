"""Honest ref-vs-pallas comparison of the full 3DGS grad step on the TPU.

Usage: python tools/probe_train_impl.py [ref|pallas|both]
"""

import os
import sys
import time

import numpy as np

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from starst3r_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
from starst3r_tpu.config import SplatConfig  # noqa: E402
from starst3r_tpu.splat.train import init_gaussians  # noqa: E402
import importlib  # noqa: E402

# `starst3r_tpu.splat.__init__` re-exports a function named `rasterize`,
# shadowing the submodule attribute — go through importlib
rz = importlib.import_module("starst3r_tpu.splat.rasterize")  # noqa: E402
from tools.timing import chain_time  # noqa: E402

log(f"jax up, devices={jax.devices()}")

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


def probe(impl):
    @jax.jit
    def gstep(means, x):
        def loss_fn(m):
            rgb, a, _ = rz.rasterize(m, p["quats"], p["scales"],
                                     p["opacities"], p["shN"], w2c, K, w, h,
                                     impl=impl)
            return jnp.sum(jnp.abs(rgb - gt)) + x * 1e-20
        loss, g = jax.value_and_grad(loss_fn)(means)
        return loss + jnp.sum(g) * 1e-20

    holder = [jnp.asarray(0.0)]

    def step():
        holder[0] = gstep(p["means"], holder[0])
        return holder[0]

    log(f"compiling full-grad impl={impl} ...")
    dt = chain_time(step, n=5, warmup=2)
    log(f"full grad impl={impl}: {dt*1e3:.1f} ms / 8 cams")

    @jax.jit
    def fstep(x):
        rgb, a, _ = rz.rasterize(p["means"] + x * 1e-20, p["quats"],
                                 p["scales"], p["opacities"], p["shN"],
                                 w2c, K, w, h, impl=impl)
        return jnp.sum(rgb)

    holder2 = [jnp.asarray(0.0)]

    def step2():
        holder2[0] = fstep(holder2[0])
        return holder2[0]

    log(f"compiling fwd impl={impl} ...")
    dt = chain_time(step2, n=5, warmup=2)
    log(f"fwd impl={impl}: {dt*1e3:.1f} ms / 8 cams")


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("ref", "both"):
    probe("ref")
if which in ("pallas", "both"):
    probe("pallas")
log("done")
