"""Profile ViT-base pair inference on TPU: per-op device times + MFU."""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:6.1f}] {m}", flush=True)


import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from starst3r_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
log(f"devices={jax.devices()}")

from starst3r_tpu.config import ModelConfig  # noqa: E402
from starst3r_tpu.models.mast3r import Mast3rModel  # noqa: E402

mcfg = ModelConfig.base()
model = Mast3rModel.init_random(mcfg, image_hw=(224, 224))
rng = np.random.default_rng(0)
b = 16
img = jnp.asarray(rng.uniform(-1, 1, size=(b, 224, 224, 3))
                  .astype(np.float32))
out = model.infer_pair_batch(img, img)
jax.device_get(out["pts1"].ravel()[:1])
log("compiled")

t0 = time.perf_counter()
for _ in range(5):
    out = model.infer_pair_batch(img, img)
jax.device_get(out["pts1"].ravel()[:1])
log(f"wall {(time.perf_counter()-t0)/5*1e3:.1f} ms / batch of {b} pairs")

os.system("rm -rf /tmp/jaxtrace_vit")
with jax.profiler.trace("/tmp/jaxtrace_vit"):
    out = model.infer_pair_batch(img, img)
    jax.device_get(out["pts1"].ravel()[:1])
log("traced")

path = sorted(glob.glob(
    "/tmp/jaxtrace_vit/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    d = json.load(f)
ev = d["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
agg = collections.Counter()
names = {}
cat = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        nm = e.get("name", "")
        agg[nm] += e.get("dur", 0)
        args = e.get("args", {})
        if nm not in names and args.get("long_name"):
            names[nm] = args["long_name"][:140]
        c = args.get("hlo_category", "")
        if c:
            cat[c] += e.get("dur", 0)
print("=== categories (one forward) ===")
for k, v in cat.most_common(12):
    print(f"{v/1e3:8.2f} ms  {k}")
print("=== top ops ===")
shown = 0
for nm, tot in agg.most_common(60):
    if nm.startswith("jit_") or nm.isdigit():
        continue
    print(f"{tot/1e3:8.2f} {nm}: {names.get(nm,'')[:120]}")
    shown += 1
    if shown >= 20:
        break
