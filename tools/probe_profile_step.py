"""Profile the bench train step on TPU; print per-fusion device times.

Uses jax.profiler to capture true device-side op times (wall clocks on the
axon tunnel carry ~2 ms/dispatch RPC overhead; the trace does not).
"""
import collections
import glob
import gzip
import json
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
import starst3r_tpu.splat.train as T  # noqa: E402
from starst3r_tpu.splat.train import (_autobudget_cfg, compute_bins,  # noqa: E402
                                      init_gaussians)


def train_step(state, gt, w2c, K, w, h, cfg, n_cams, bins=None):
    # UNDONATED re-jit of the product step: buffer donation makes the
    # axon-tunnel profiler fail with InvalidArgument (observed r5); math
    # and fusions are identical.
    return _step_nd(state, gt, w2c, K, w, h, T._graph_cfg(cfg), n_cams,
                    bins)


import functools  # noqa: E402
_step_nd = jax.jit(T._train_step.__wrapped__,
                   static_argnames=("width", "height", "cfg", "n_cams"))

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
pts[:, 2] += 3.0
cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
cfg = SplatConfig(rebin_every=4)
state = init_gaussians(pts, cols, cfg)
gt = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))
w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                       jnp.float32)[None], (n_cams, 1, 1))
scfg = _autobudget_cfg(state, w2c, K, w, h, cfg)
log(f"budget mtpg={scfg.max_tiles_per_gaussian} mpt={scfg.max_per_tile}")
bins = compute_bins(state.params, w2c, K, w, h, scfg, n_alive=state.n_alive)
jax.block_until_ready(bins.counts)
s, loss = train_step(state, gt, w2c, K, w, h, scfg, n_cams, bins=bins)
jax.block_until_ready(loss)
log("compiled")

os.system("rm -rf /tmp/jaxtrace_step")
with jax.profiler.trace("/tmp/jaxtrace_step"):
    st = state
    for _ in range(3):
        st, loss = train_step(st, gt, w2c, K, w, h, scfg, n_cams, bins=bins)
    jax.block_until_ready(loss)
    b = compute_bins(st.params, w2c, K, w, h, scfg, n_alive=st.n_alive)
    jax.block_until_ready(b.counts)
log("trace captured")

path = sorted(glob.glob("/tmp/jaxtrace_step/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    d = json.load(f)
ev = d.get("traceEvents", [])
pids = {e["pid"]: e["args"].get("name", "") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
dur = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        dur[e.get("name", "")] += e.get("dur", 0)
total = sum(v for k, v in dur.items() if k.startswith("jit_"))
log(f"total jit device time: {total/1e3:.2f} ms (3 steps + 1 bin)")
for k, v in dur.most_common(40):
    print(f"{v/1e3:10.3f} ms  {k}")
