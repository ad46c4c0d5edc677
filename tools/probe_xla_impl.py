"""TPU timing probe for the analytic-VJP xla compositing path at bench
scale (50k Gaussians / 8 cams / 224px) vs the autodiff ref path."""
import os
import sys
import time

t00 = time.time()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from starst3r_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
log(f"devices={jax.devices()}")

from starst3r_tpu.config import SplatConfig  # noqa: E402
from starst3r_tpu.splat.train import init_gaussians, train_step  # noqa: E402

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

log("compiling train_step (impl=xla default) ...")
t0 = time.time()
state, loss = train_step(state, gt, w2c, K, w, h, cfg, n_cams)
jax.device_get(loss)
log(f"compiled+run in {time.time()-t0:.1f}s loss={float(loss):.3f}")

t0 = time.time()
iters = 10
for _ in range(iters):
    state, loss = train_step(state, gt, w2c, K, w, h, cfg, n_cams)
jax.device_get(loss)
dt = (time.time() - t0) / iters
log(f"steady step: {dt*1e3:.1f} ms -> {n_g/dt:,.0f} gaussians*steps/s")
