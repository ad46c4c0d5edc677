import time, sys
import numpy as np
t00=time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp
from starst3r_tpu.utils import enable_compilation_cache
enable_compilation_cache()
log(f"jax up, devices={jax.devices()}")
from starst3r_tpu.config import SplatConfig
from starst3r_tpu.splat.train import init_gaussians, train_step, render
rng = np.random.default_rng(0)
n_g = 50_000; n_cams, h, w = 8, 224, 224
pts = rng.normal(size=(n_g,3)).astype(np.float32)*0.5; pts[:,2]+=3.0
cols = rng.uniform(size=(n_g,3)).astype(np.float32)
cfg = SplatConfig()
state = init_gaussians(pts, cols, cfg)
log("init_gaussians done")
gt = jnp.asarray(rng.uniform(size=(n_cams,h,w,3)).astype(np.float32))
w2c = jnp.tile(jnp.eye(4,dtype=jnp.float32)[None],(n_cams,1,1))
K = jnp.tile(jnp.array([[200.0,0,w/2],[0,200.0,h/2],[0,0,1]],jnp.float32)[None],(n_cams,1,1))
log("compiling render...")
rgb,_,_ = render(state.params, w2c, K, w, h, cfg); jax.block_until_ready(rgb)
log("render compiled+run 1")
t0=time.time()
for _ in range(3):
    rgb,_,_ = render(state.params, w2c, K, w, h, cfg); jax.block_until_ready(rgb)
log(f"render steady: {(time.time()-t0)/3*1e3:.1f} ms")
log("compiling train_step...")
s,loss = train_step(state, gt, w2c, K, w, h, cfg, n_cams); jax.block_until_ready(loss)
log(f"train_step compiled+run 1, loss={float(loss):.4f}")
t0=time.time()
for _ in range(3):
    s,loss = train_step(s, gt, w2c, K, w, h, cfg, n_cams); jax.block_until_ready(loss)
log(f"train_step steady: {(time.time()-t0)/3*1e3:.1f} ms")
