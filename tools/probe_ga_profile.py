"""Profile the GA optimizer on TPU: device time per Adam step + top ops."""
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
from starst3r_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
log(f"devices={jax.devices()}")

from starst3r_tpu.alignment.ga import run_global_alignment  # noqa: E402
from starst3r_tpu.config import GAConfig  # noqa: E402
from starst3r_tpu.utils.synthetic import synthetic_ga_scene  # noqa: E402

data, mst, gt, _ = synthetic_ga_scene(n_cams=4, hw=128, subsample=4)
cfg = GAConfig(niter1=100, niter2=0)
run_global_alignment(data, mst, cfg)   # compile
log("compiled")

t0 = time.perf_counter()
run_global_alignment(data, mst, cfg)
dt = time.perf_counter() - t0
log(f"100 coarse steps wall: {dt:.2f}s -> {dt*10:.1f} ms/step")

os.system("rm -rf /tmp/jaxtrace_ga")
with jax.profiler.trace("/tmp/jaxtrace_ga"):
    run_global_alignment(data, mst, GAConfig(niter1=10, niter2=0, jit_chunk=10))
log("traced")

path = sorted(glob.glob(
    "/tmp/jaxtrace_ga/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    d = json.load(f)
ev = d["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
agg = collections.Counter()
names = {}
total = 0
for e in ev:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        nm = e.get("name", "")
        agg[nm] += e.get("dur", 0)
        if nm.startswith("jit_"):
            total += e.get("dur", 0)
        args = e.get("args", {})
        if nm not in names and args.get("long_name"):
            names[nm] = args["long_name"][:140]
log(f"device total (10 steps + overhead): {total/1e3:.1f} ms")
shown = 0
for nm, tot in agg.most_common(60):
    if nm.isdigit():
        continue
    print(f"{tot/1e3:8.2f} {nm}: {names.get(nm, '')[:120]}")
    shown += 1
    if shown >= 18:
        break
