"""Honest-clock probe: render fwd, train_step (ref), pallas fwd, grad parts.

Run on the real TPU:  python tools/probe_timing.py [render|train|pallas|parts]
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
from starst3r_tpu.splat.train import init_gaussians, train_step, render  # noqa: E402
import importlib  # noqa: E402

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

which = sys.argv[1] if len(sys.argv) > 1 else "all"
p = state.params
rast_args = (p["means"], p["quats"], p["scales"], p["opacities"], p["shN"],
             w2c, K)


def probe_render(impl):
    @jax.jit
    def f(x):
        rgb, a, _ = rz.rasterize(p["means"] + 0 * x, p["quats"],
                                 p["scales"], p["opacities"], p["shN"],
                                 w2c, K, w, h, impl=impl)
        return jnp.sum(rgb) + x * 1e-20

    x = jnp.asarray(0.0)
    holder = [x]

    def step():
        holder[0] = f(holder[0])
        return holder[0]

    log(f"compiling render impl={impl} ...")
    dt = chain_time(step, n=10, warmup=2)
    log(f"render impl={impl}: {dt*1e3:.1f} ms / 8 cams")


def probe_train():
    holder = {"s": state}

    def step():
        s, loss = train_step(holder["s"], gt, w2c, K, w, h, cfg, n_cams)
        holder["s"] = s
        return loss

    log("compiling train_step (ref impl) ...")
    dt = chain_time(step, n=10, warmup=2)
    log(f"train_step ref: {dt*1e3:.1f} ms")


def probe_parts():
    """Split the backward: (a) composite-only grad, (b) full grad."""

    @jax.jit
    def grad_full(means, x):
        def loss_fn(m):
            rgb, a, _ = rz.rasterize(m, p["quats"], p["scales"],
                                     p["opacities"], p["shN"], w2c, K, w, h,
                                     impl="ref")
            return jnp.sum(rgb * rgb) + x * 1e-20
        g = jax.grad(loss_fn)(means)
        return jnp.sum(g)

    x = jnp.asarray(0.0)
    holder = [x]

    def step():
        holder[0] = grad_full(p["means"], holder[0])
        return holder[0]

    log("compiling grad(means) ref ...")
    dt = chain_time(step, n=5, warmup=1)
    log(f"grad(means) ref: {dt*1e3:.1f} ms")

    @jax.jit
    def grad_colors(shn, x):
        def loss_fn(s):
            rgb, a, _ = rz.rasterize(p["means"], p["quats"], p["scales"],
                                     p["opacities"], s, w2c, K, w, h,
                                     impl="ref")
            return jnp.sum(rgb * rgb) + x * 1e-20
        g = jax.grad(loss_fn)(shn)
        return jnp.sum(g)

    holder2 = [jnp.asarray(0.0)]

    def step2():
        holder2[0] = grad_colors(p["shN"], holder2[0])
        return holder2[0]

    log("compiling grad(shN) ref ...")
    dt = chain_time(step2, n=5, warmup=1)
    log(f"grad(shN) ref: {dt*1e3:.1f} ms")


if which in ("render", "all"):
    probe_render("ref")
if which in ("pallas", "all"):
    probe_render("pallas")
if which in ("train", "all"):
    probe_train()
if which in ("parts", "all"):
    probe_parts()
log("done")
