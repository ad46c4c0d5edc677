"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: Gaussians-optimized per second (3DGS training throughput on a
synthetic 50k-Gaussian / 8-camera / 224px scene — BASELINE config 3 scale)
at the training loop's steady state (auto-budgeted tile buckets + binning
reuse, splat/train.py run_optim). Aux carries per-stage splat times,
roofline fractions, GA trajectory quality (anchored default + variants),
splat + end-to-end PSNR (train AND holdout), ViT throughput/MFU, and the
distributed-scale blocks (1M-Gaussian step, 200-kf Schur cost curve,
partition balance).

STAGE ORDER (VERDICT r4 #2/#8): headline first, then the highest-value
numbers (1M-Gaussian step, 512px splat, e2e quality) BEFORE repeat stages
whose values barely move between rounds; every stage retries once on
exception so one axon-tunnel flake cannot zero its metrics.

TIMEOUT-PROOF DESIGN (VERDICT r3 #1 — round 3 lost all numbers to a driver
timeout that killed the single end-of-run print):
  - a RECORD is maintained incrementally; after EVERY completed stage it is
    rewritten to BENCH_LOCAL.json and the latest full record is re-printed
    to stdout (last line wins for any consumer that scans the tail);
  - a daemon WATCHDOG thread hard-exits the process with the best record so
    far when the internal wall budget (STARST3R_BENCH_BUDGET_S, default
    1100 s) expires — even if the main thread is wedged inside a blocked
    device RPC (observed on the axon tunnel: rare multi-minute stalls);
  - stages are ordered headline-first and each optional stage is skipped
    (not attempted) when the remaining budget is below its cost estimate;
  - any stage exception is recorded (aux["stage_errors"]) and the run
    continues with the next stage.

TIMING METHODOLOGY (VERDICT r3 #10 — settled by tools/probe_timing.py on
TPU v5e over the axon tunnel): on compute-heavy programs
`jax.block_until_ready` agrees with a data-dependent carry chain AND with
a lax.scan of chained iterations inside one dispatch (3.18 / 3.09 /
3.14 ms/iter on a 4096^3 matmul; ~1.4 ms/dispatch overhead) — but it was
ALSO observed to intermittently return early (0.03 ms for a 100 MB
gather, later 5.6 ms for the identical program). The only sync that can
never lie is a `device_get`: the transfer is queued after the timed
programs on the single in-order TPU core. `_timeit` therefore syncs by
fetching one element of the final output. Headline wall times were
cross-checked against profiler device times (tools/probe_profile_step.py:
108.7 ms wall vs 105.7 ms device for the train step).

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the previous recorded run of this harness (BENCH_LOCAL.json),
1.0 on first run.
"""

import dataclasses
import json
import os
import sys
import threading
import time
import traceback

import numpy as np

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("STARST3R_BENCH_BUDGET_S", "1100"))

# ---- crash-resume (round 5): a TPU worker crash mid-run poisons the
# backend for the REST of the process (every later stage dies instantly
# with FAILED_PRECONDITION — observed after the 1M-Gaussian stage). On
# such an error the bench re-execs itself with the remaining budget and
# the completed-stage list in env; the fresh process reconnects, reloads
# the persisted RECORD, skips completed stages, and continues.
_DONE_STAGES = set(
    s for s in os.environ.get("STARST3R_BENCH_DONE", "").split(",") if s)
_RESTARTS = int(os.environ.get("STARST3R_BENCH_RESTARTS", "0"))
_MAX_RESTARTS = 3


def _reexec_fresh():
    if _RESTARTS >= _MAX_RESTARTS or left() < 60:
        return
    env = dict(os.environ)
    env["STARST3R_BENCH_DONE"] = ",".join(sorted(_DONE_STAGES))
    env["STARST3R_BENCH_RESTARTS"] = str(_RESTARTS + 1)
    env["STARST3R_BENCH_BUDGET_S"] = str(max(left(), 60.0))
    emit()
    print(f"[bench] BACKEND DEAD -> re-exec (restart {_RESTARTS + 1}, "
          f"{left():.0f}s left, done={len(_DONE_STAGES)})",
          file=sys.stderr, flush=True)
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)


def _is_backend_dead(e) -> bool:
    return "FAILED_PRECONDITION" in repr(e)

# steady-state binning reuse measured in aux as the headline operating
# point (gradients stay exact; tile assignment ages <= REBIN-1 steps —
# splat/rasterize.py Bins docstring, parity test tests/test_splat.py)
REBIN = 4

_PREV_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LOCAL.json")

# record holder shared with the watchdog thread
RECORD = {
    "metric": "gaussians_optimized_per_s",
    "value": 0.0,
    "unit": "gaussians*steps/s",
    "vs_baseline": 0.0,
    "aux": {"incomplete": "no stage finished"},
}
_EMIT_LOCK = threading.Lock()


def left() -> float:
    return BUDGET_S - (time.monotonic() - T_START)


def emit(final: bool = False) -> None:
    """Persist + print the current record (stdout; last line wins)."""
    with _EMIT_LOCK:
        try:
            with open(_PREV_PATH + ".tmp", "w") as f:
                json.dump(RECORD, f)
            os.replace(_PREV_PATH + ".tmp", _PREV_PATH)
        except Exception:
            pass
        print(json.dumps(RECORD), flush=True)


def _watchdog():
    while True:
        time.sleep(2.0)
        if left() <= 0:
            RECORD["aux"]["watchdog_fired_s"] = round(
                time.monotonic() - T_START, 1)
            emit(final=True)
            os._exit(0)


def _mark(name: str):
    print(f"[bench] {name} @ +{time.monotonic()-T_START:.0f}s "
          f"(left {left():.0f}s)", file=sys.stderr, flush=True)
    RECORD["aux"]["last_stage"] = name


def _stage(name: str, min_budget_s: float = 0.0):
    """Decorator-ish runner: skip when budget is short, absorb errors.

    Each stage RETRIES ONCE on exception (VERDICT r4 #8: a single
    axon-tunnel flake — e.g. remote_compile HTTP 500 — must not zero a
    stage's metrics; the compile cache makes the retry cheap)."""
    def run(fn):
        if name in _DONE_STAGES:
            return True   # completed before a crash-restart
        if left() < min_budget_s:
            RECORD["aux"].setdefault("stages_skipped", []).append(
                {"stage": name, "reason": f"budget<{min_budget_s:.0f}s"})
            print(f"[bench] SKIP {name} (left {left():.0f}s "
                  f"< {min_budget_s:.0f}s)", file=sys.stderr, flush=True)
            return False
        _mark(name)
        for attempt in (0, 1):
            try:
                fn()
                RECORD["aux"].pop("last_stage", None)
                _DONE_STAGES.add(name)
                emit()
                return True
            except Exception as e:  # noqa: BLE001 — deliberate fail-soft
                traceback.print_exc()
                RECORD["aux"].setdefault("stage_errors", []).append(
                    {"stage": name, "attempt": attempt,
                     "error": repr(e)[:200]})
                emit()
                if _is_backend_dead(e):
                    # the poisoned backend cannot recover in-process
                    _reexec_fresh()
                    break
                if attempt == 0 and left() < min_budget_s / 2:
                    break   # no budget for a retry
        return False
    return run


def _timeit(fn, warmup=2, iters=10):
    """Mean wall time per call, synced by `device_get` of a 1-element slice
    of the last output (see TIMING METHODOLOGY in the module docstring —
    `block_until_ready` was observed to INTERMITTENTLY return early on the
    axon tunnel, e.g. 0.03 ms for a 100 MB gather; a device_get transfer
    cannot complete before every queued program has executed, since the
    single TPU core runs programs in order)."""
    import jax
    import jax.numpy as jnp

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    out = None
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def _device_peaks(device) -> dict:
    """Per-chip peak bf16 matmul FLOP/s and HBM bytes/s (public figures).

    Used for the roofline fractions; recorded in aux so every claim is
    checkable. Unknown device kinds (CPU runs) return zeros and the
    fractions are omitted."""
    kind = getattr(device, "device_kind", str(device)).lower()
    table = [
        ("v5 lite", 197e12, 819e9),   # v5e
        ("v5e", 197e12, 819e9),
        ("v5p", 459e12, 2765e9),
        ("v6 lite", 918e12, 1640e9),  # Trillium
        ("v6e", 918e12, 1640e9),
        ("v4", 275e12, 1228e9),
        ("v3", 123e12, 900e9),
        ("v2", 45e12, 700e9),
    ]
    for key, fl, bw in table:
        if key in kind:
            return {"kind": kind, "peak_bf16_flops": fl, "peak_hbm_Bps": bw}
    return {"kind": kind, "peak_bf16_flops": 0.0, "peak_hbm_Bps": 0.0}


def _vit_pair_flops(mcfg, n_tokens: int) -> float:
    """Analytic FLOPs of one two-view trunk forward (encoder both views +
    interleaved decoders). Heads (DPT/descriptor) are EXCLUDED, so the
    reported MFU is a lower bound. 1 MAC = 2 FLOPs.

    Per token / layer: attention qkvo projections 8d², attention scores+AV
    4·n·d, MLP (ratio r) 4·r·d²; cross-attention adds another 8d² + 4·n·d.
    """
    n = float(n_tokens)
    de, dd = float(mcfg.enc_dim), float(mcfg.dec_dim)
    r = float(mcfg.mlp_ratio)
    enc_layer = n * (8 * de * de + 4 * n * de + 4 * r * de * de)
    dec_layer = n * (16 * dd * dd + 8 * n * dd + 4 * r * dd * dd)
    embed = n * (2 * 3 * mcfg.patch_size ** 2 * de       # patchify
                 + 2 * de * dd)                          # decoder_embed
    per_view = mcfg.enc_depth * enc_layer + mcfg.dec_depth * dec_layer
    return 2 * (per_view + embed)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    if _DONE_STAGES:
        # crash-restart: resume the persisted record (stage results of the
        # previous process live there)
        try:
            with open(_PREV_PATH) as f:
                prev = json.load(f)
            RECORD.update(prev)
            RECORD["aux"] = prev.get("aux", {})
        except Exception:
            pass

    import jax
    import jax.numpy as jnp

    from starst3r_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from starst3r_tpu.config import GAConfig, ModelConfig, SplatConfig
    from starst3r_tpu.ops.ssim import psnr as psnr_fn
    from starst3r_tpu.splat.train import (_autobudget_cfg, compute_bins,
                                          init_gaussians, render, run_optim,
                                          train_step)

    rng = np.random.default_rng(0)
    peaks = _device_peaks(jax.devices()[0])
    aux = RECORD["aux"]
    aux.pop("incomplete", None)
    aux["device"] = str(jax.devices()[0])
    aux["peaks"] = dict(peaks)
    aux["timing"] = "device_get-synced wall (tools/probe_timing.py)"

    # ---------------- 3DGS training throughput (224², 50k, 8 cams) --------
    n_g = 50_000
    n_cams, h, w = 8, 224, 224
    pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
    cfg = SplatConfig(rebin_every=REBIN)
    state = init_gaussians(pts, cols, cfg)
    gt = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))
    w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
    K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                           jnp.float32)[None], (n_cams, 1, 1))
    holder = {"state": state, "scfg": cfg, "bins": None, "entries": 0.0}

    def headline():
        # the training loop's auto-budgeted config (smallest power-of-2
        # tile buckets the scene needs — splat/train.py:_autobudget_cfg)
        scfg = _autobudget_cfg(state, w2c, K, w, h, cfg)
        holder["scfg"] = scfg
        aux["splat_budget"] = {
            "max_tiles_per_gaussian": scfg.max_tiles_per_gaussian,
            "max_per_tile": scfg.max_per_tile, "rebin_every": REBIN}
        bins = compute_bins(state.params, w2c, K, w, h, scfg,
                            n_alive=state.n_alive)
        holder["bins"] = bins
        holder["entries"] = float(jax.device_get(bins.counts.sum()))

        def step_reuse():
            s, loss = train_step(holder["state"], gt, w2c, K, w, h, scfg,
                                 n_cams, bins=bins)
            holder["state"] = s
            return loss

        def bin_once():
            return compute_bins(holder["state"].params, w2c, K, w, h, scfg,
                                n_alive=holder["state"].n_alive).counts

        def fwd_once():
            rgb, _, _ = render(holder["state"].params, w2c, K, w, h, scfg,
                               n_alive=holder["state"].n_alive, bins=bins)
            return rgb

        dt_bin = _timeit(bin_once, warmup=2, iters=10)
        dt_fwd = _timeit(fwd_once, warmup=2, iters=10)
        dt_step_reuse = _timeit(step_reuse, warmup=2, iters=10)
        # steady state of run_optim: one rebin amortized over REBIN steps.
        # run_optim always passes bins (rebinning = compute_bins + reuse
        # step), so rebin-every-step cost is the SUM dt_step_reuse+dt_bin —
        # no separate bins=None compile variant exists in the product loop.
        dt_eff = dt_step_reuse + dt_bin / REBIN
        gauss_per_s = n_g / dt_eff

        aux["splat_stage_ms"] = {
            "bin": round(dt_bin * 1e3, 2),
            "forward": round(dt_fwd * 1e3, 2),
            "step_bins_reused": round(dt_step_reuse * 1e3, 2),
            "step_rebin_every_step": round(
                (dt_step_reuse + dt_bin) * 1e3, 2),
            "step_effective": round(dt_eff * 1e3, 2),
            "backward_plus_adam_approx": round(
                (dt_step_reuse - dt_fwd) * 1e3, 2),
        }
        aux["splat_step_ms"] = round(dt_eff * 1e3, 2)
        aux["n_gaussians"] = n_g
        aux["n_cameras"] = n_cams

        # ------- roofline accounting (analytic counts; VERDICT r3 #4) ----
        n_entries = holder["entries"]
        tile_px = scfg.tile_size ** 2
        f_comp = n_entries * tile_px * 30 * 3.0
        f_proj = 3.0 * n_cams * n_g * 300.0       # fwd+bwd covariance/conic
        param_floats = n_g * (3 + 3 + 4 + 1 + 3 + 3 * scfg.sh_bands)
        f_adam = param_floats * 10.0
        flops_step = f_comp + f_proj + f_adam
        # minimum HBM traffic: gather fwd reads+writes the (L, 9) entry
        # rows, bwd gathers the grads back (4 passes x 36 B); projection
        # reads the params and Adam does 7 passes over params+moments+
        # grads; images make ~6 full passes
        b_gather = n_entries * 36.0 * 4.0
        b_adam = param_floats * 4.0 * 7.0
        b_imgs = n_cams * h * w * 3 * 4.0 * 6.0
        bytes_step = b_gather + b_adam + b_imgs
        b_sort = (n_cams * n_g * scfg.max_tiles_per_gaussian
                  * 8.0 * 2.0 * 2.0)
        # tile-read cost model (the ACHIEVABLE bound for this design):
        # an XLA TPU gather reads a full (8,128) 4 KB tile per gathered
        # row regardless of row width (tools/probe_profile_step.py).
        # fwd gathers C*T*K slot rows; bwd gathers E rows per pool slot.
        # Profiled r5 at this scale: fwd gather runs at ~58% and bwd at
        # ~73% of this model's bandwidth — the byte-count model above is
        # unreachable without an attribute layout that packs multiple
        # entries per tile row.
        t_tiles = (-(-w // scfg.tile_size)) * (-(-h // scfg.tile_size))
        slot_rows = n_cams * t_tiles * scfg.max_per_tile
        cap = int(holder["state"].params["means"].shape[0])
        bw_rows = n_cams * cap * scfg.max_tiles_per_gaussian
        b_tile_model = (slot_rows + bw_rows) * 4096.0
        if peaks["peak_hbm_Bps"]:
            aux["splat_roofline"] = {
                "entries": int(n_entries),
                "step_analytic_gflops": round(flops_step / 1e9, 1),
                "step_min_hbm_mb": round(bytes_step / 1e6, 1),
                "step_hbm_frac": round(bytes_step / dt_step_reuse
                                       / peaks["peak_hbm_Bps"], 3),
                "gather_tile_read_model_mb": round(b_tile_model / 1e6, 1),
                "step_tile_model_frac": round(
                    b_tile_model / dt_step_reuse / peaks["peak_hbm_Bps"],
                    3),
                "step_achieved_gflops_per_s": round(
                    flops_step / dt_step_reuse / 1e9, 1),
                "bin_min_hbm_mb": round(b_sort / 1e6, 1),
                "bin_hbm_frac": round(b_sort / dt_bin
                                      / peaks["peak_hbm_Bps"], 3),
            }

        RECORD["value"] = round(gauss_per_s, 1)
        # vs_baseline anchor: the COMMITTED record of the last judged round
        # (BENCH_BASELINE.json, r02 = the last driver-recorded number);
        # falls back to the rolling local record so repeat local runs still
        # show a ratio.
        vs = 1.0
        base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_BASELINE.json")
        try:
            path = base if os.path.exists(base) else _PREV_PATH
            with open(path) as f:
                prev = json.load(f)
            if prev.get("value"):
                vs = gauss_per_s / float(prev["value"])
        except Exception:
            pass
        RECORD["vs_baseline"] = round(vs, 3)

    _stage("splat_headline")(headline)

    # ---------------- BASELINE config 5: 1M-Gaussian pool step ------------
    # Runs IMMEDIATELY after the headline (VERDICT r4 #2: the two
    # highest-value unlanded numbers — the 1M step and the 512px splat —
    # kept dying to budget/flakes behind repeat stages).
    def config5_1m():
        n1m = 1_000_000
        pts1 = rng.normal(size=(n1m, 3)).astype(np.float32) * 0.8
        pts1[:, 2] += 4.0
        cols1 = rng.uniform(size=(n1m, 3)).astype(np.float32)
        st1 = init_gaussians(pts1, cols1, cfg)
        scfg1 = _autobudget_cfg(st1, w2c, K, w, h, cfg)
        bins1 = compute_bins(st1.params, w2c, K, w, h, scfg1,
                             n_alive=st1.n_alive)
        h1 = {"state": st1}

        def step1m():
            s, loss = train_step(h1["state"], gt, w2c, K, w, h, scfg1,
                                 n_cams, bins=bins1)
            h1["state"] = s
            return loss

        def bin1m():
            return compute_bins(h1["state"].params, w2c, K, w, h, scfg1,
                                n_alive=h1["state"].n_alive).counts

        dt1 = _timeit(step1m, warmup=2, iters=5)
        dtb1 = _timeit(bin1m, warmup=1, iters=3)
        blk = aux.setdefault("config5", {})
        blk["gaussians"] = n1m
        blk["splat_step_ms"] = round((dt1 + dtb1 / REBIN) * 1e3, 2)
        blk["splat_step_reuse_ms"] = round(dt1 * 1e3, 2)
        blk["bin_ms"] = round(dtb1 * 1e3, 2)
        blk["gaussians_per_s"] = round(n1m / (dt1 + dtb1 / REBIN))
        blk["splat_budget"] = {
            "max_tiles_per_gaussian": scfg1.max_tiles_per_gaussian,
            "max_per_tile": scfg1.max_per_tile}
        entries1 = float(jax.device_get(bins1.counts.sum()))
        if peaks["peak_hbm_Bps"]:
            b_gather1 = entries1 * 36.0 * 4.0
            pf1 = n1m * (3 + 3 + 4 + 1 + 3 + 3 * scfg1.sh_bands)
            bytes1 = (b_gather1 + pf1 * 4.0 * 7.0
                      + n_cams * h * w * 3 * 24.0)
            blk["entries"] = int(entries1)
            blk["step_min_hbm_mb"] = round(bytes1 / 1e6, 1)
            blk["step_hbm_frac"] = round(
                bytes1 / dt1 / peaks["peak_hbm_Bps"], 3)
            t_tiles1 = (-(-w // scfg1.tile_size)) * (-(-h // scfg1.tile_size))
            rows1 = (n_cams * t_tiles1 * scfg1.max_per_tile
                     + n_cams * n1m * scfg1.max_tiles_per_gaussian)
            blk["gather_tile_read_model_mb"] = round(rows1 * 4096.0 / 1e6, 1)
            blk["step_tile_model_frac"] = round(
                rows1 * 4096.0 / dt1 / peaks["peak_hbm_Bps"], 3)
        try:
            ms = jax.devices()[0].memory_stats()
            blk["peak_hbm_mb"] = round(ms.get("peak_bytes_in_use", 0) / 1e6)
        except Exception:
            pass

    _stage("config5_1m", min_budget_s=120)(config5_1m)

    # ---------------- 512-px splat block (checkpoint-native res) ----------
    def splat512():
        r = aux.setdefault("res512", {})
        h5 = w5 = 512
        c5 = 4
        gt5 = jnp.asarray(rng.uniform(size=(c5, h5, w5, 3))
                          .astype(np.float32))
        w2c5 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (c5, 1, 1))
        K5 = jnp.tile(jnp.array([[460.0, 0, w5 / 2], [0, 460.0, h5 / 2],
                                 [0, 0, 1]], jnp.float32)[None], (c5, 1, 1))
        st5 = init_gaussians(pts, cols, cfg)
        scfg5 = _autobudget_cfg(st5, w2c5, K5, w5, h5, cfg)
        bins5 = compute_bins(st5.params, w2c5, K5, w5, h5, scfg5,
                             n_alive=st5.n_alive)
        h5d = {"state": st5}

        def step5():
            s, loss = train_step(h5d["state"], gt5, w2c5, K5, w5, h5,
                                 scfg5, c5, bins=bins5)
            h5d["state"] = s
            return loss

        def bin5():
            return compute_bins(h5d["state"].params, w2c5, K5, w5, h5,
                                scfg5, n_alive=h5d["state"].n_alive).counts

        dt_step5 = _timeit(step5, warmup=2, iters=5)
        dt_bin5 = _timeit(bin5, warmup=2, iters=5)
        r["splat_step_ms"] = round((dt_step5 + dt_bin5 / REBIN) * 1e3, 2)
        r["splat_gaussians_per_s"] = round(
            n_g / (dt_step5 + dt_bin5 / REBIN))
        r["splat_budget"] = {
            "max_tiles_per_gaussian": scfg5.max_tiles_per_gaussian,
            "max_per_tile": scfg5.max_per_tile}

    _stage("splat_512", min_budget_s=120)(splat512)

    # ---------------- end-to-end image-space quality ----------------------
    from starst3r_tpu.alignment.ga import run_global_alignment
    from starst3r_tpu.utils.eval import ate_rmse, rpe_rotation_deg
    from starst3r_tpu.utils.synthetic import (synthetic_ga_scene,
                                              synthetic_image_scene)

    def e2e_quality():
        # GA on exact synthetic data recovers poses + core points; 3DGS
        # trains against the rendered images ON THE RECOVERED poses and is
        # evaluated at a held-out middle camera (its image never enters
        # the splat loss and its cells never seed Gaussians). Seeding
        # follows the product recipe (VERDICT r4 #1): hit-masked cells
        # (the synthetic analog of Scene's conf_thres filter — unfiltered
        # background cells plant occluding black splats, the 12 dB cap of
        # rounds 3-4), per-point init scale depth*subsample/focal from the
        # RECOVERED depth, fixed activations, per-param lrs. Records
        # TRAIN-view PSNR alongside holdout (pose error vs fit error).
        sub = 4
        # 10 cameras at 0.2 rad spacing (~11 deg between neighbors) — a
        # realistic object-capture density (the reference demo uses ~10
        # photos of a room); the held-out middle camera interpolates a
        # 23-degree gap between its two neighbors
        n_views = 10
        edata, emst, _egt, _eK, eimgs, ehit = synthetic_image_scene(
            n_cams=n_views, hw=128, subsample=sub, spread=0.2)
        # jit_chunk 10: long single GA kernels exceed the axon tunnel's
        # kernel watchdog (observed "TPU device error" killing the stage)
        eres, _ = run_global_alignment(
            edata, emst, GAConfig(niter1=500, niter2=200, lr2=0.004,
                                  jit_chunk=10))
        hold = n_views // 2
        train_cams = [i for i in range(n_views) if i != hold]
        aux["e2e_setup"] = {"n_views": n_views, "spread_rad": 0.2,
                            "subsample": sub, "holdout": hold}
        core_pix = np.asarray(edata.core_pix).astype(np.int64)  # (S,2) u,v
        m = ehit[train_cams].reshape(-1)
        e_pts = np.asarray(eres.pts3d)[train_cams].reshape(-1, 3)[m]
        e_cols = np.stack([eimgs[i][core_pix[:, 1], core_pix[:, 0]]
                           for i in train_cams]).reshape(-1, 3)[m]
        s_cells = core_pix.shape[0]
        e_scales = (np.asarray(eres.depth)[train_cams].reshape(-1)[m] * sub
                    / np.asarray(eres.K)[train_cams, 0, 0]
                    .repeat(s_cells)[m])
        ecfg = dataclasses.replace(
            cfg, compat_inverted_sh=False, compat_raw_activations=False,
            lr_means=3e-5, lr_quats=1e-3, lr_scales=5e-3,
            lr_opacities=5e-2, lr_sh=2.5e-3, loss_anchor_fac=0.3,
            mcmc_refine_start=300, mcmc_refine_stop=550)
        est = init_gaussians(e_pts, e_cols, ecfg, point_scales=e_scales,
                             pool_size=int(2.0 * e_pts.shape[0]))
        ew2c = np.asarray(eres.w2c)
        eKs = np.asarray(eres.K)
        e_rgb0 = jnp.clip(render(est.params, ew2c[hold:hold + 1],
                                 eKs[hold:hold + 1], 128, 128, ecfg,
                                 n_alive=est.n_alive)[0][0], 0, 1)
        e_psnr0 = float(psnr_fn(jnp.asarray(eimgs[hold]), e_rgb0))
        est, _ = run_optim(est, eimgs[train_cams], ew2c[train_cams],
                           eKs[train_cams], 600, ecfg, enable_pruning=True)
        rgb_tr = jnp.clip(render(est.params, ew2c[train_cams],
                                 eKs[train_cams], 128, 128, ecfg,
                                 n_alive=est.n_alive)[0], 0, 1)
        aux["e2e_psnr_train"] = round(float(np.mean(
            [psnr_fn(jnp.asarray(eimgs[i]), rgb_tr[k])
             for k, i in enumerate(train_cams)])), 2)
        e_rgb = jnp.clip(render(est.params, ew2c[hold:hold + 1],
                                eKs[hold:hold + 1], 128, 128, ecfg,
                                n_alive=est.n_alive)[0][0], 0, 1)
        aux["e2e_psnr"] = round(float(psnr_fn(jnp.asarray(eimgs[hold]),
                                              e_rgb)), 2)
        aux["e2e_psnr_init"] = round(e_psnr0, 2)

    _stage("e2e_quality", min_budget_s=220)(e2e_quality)

    # ---------------- pairwise ViT inference throughput + MFU -------------
    mcfg = ModelConfig.base()

    def vit224():
        import flax.linen as nn

        from starst3r_tpu.models.mast3r import Mast3rModel, _dtype_of
        from starst3r_tpu.models.vit import (Encoder, InterleavedDecoder,
                                             patch_positions)
        model = Mast3rModel.init_random(mcfg, image_hw=(224, 224))
        b = 16   # large pair batch: 196-token GEMMs need >=3k rows for MXU
        img = jnp.asarray(rng.uniform(-1, 1, size=(b, 224, 224, 3))
                          .astype(np.float32))

        def infer():
            return model.infer_pair_batch(img, img)["pts1"]

        dt_inf = _timeit(infer, warmup=2, iters=5)
        aux["vit_base_pairs_per_s_224"] = round(b / dt_inf, 2)

        # trunk-only forward (same params, encoder+decoder submodules):
        # separates trunk MFU from head time — the DPT/descriptor heads
        # take ~half the wall with FLOPs comparable to the trunk, which
        # the analytic model excludes (VERDICT r4 #4 breakdown)
        class _Trunk(nn.Module):
            cfg: ModelConfig

            @nn.compact
            def __call__(self, img1, img2):
                cfg = self.cfg
                dt = _dtype_of(cfg)
                bb, hh, ww, _ = img1.shape
                hp, wp = hh // cfg.patch_size, ww // cfg.patch_size
                pos = patch_positions(hp, wp)[None]
                enc = Encoder(cfg.enc_depth, cfg.enc_dim, cfg.enc_heads,
                              cfg.patch_size, cfg.mlp_ratio, cfg.rope_base,
                              dt, name="encoder")
                feats = enc(jnp.concatenate([img1, img2], axis=0))
                f1, f2 = feats[:bb], feats[bb:]
                dec = InterleavedDecoder(
                    cfg.dec_depth, cfg.dec_dim, cfg.dec_heads, cfg.enc_dim,
                    cfg.mlp_ratio, cfg.rope_base, dt, name="decoder")
                s1, s2 = dec(f1, f2, pos, pos)
                return (s1[-1].astype(jnp.float32).mean(),
                        s2[-1].astype(jnp.float32).mean())

        trunk = _Trunk(mcfg)
        trunk_fwd = jax.jit(lambda p, a, c: trunk.apply(p, a, c))
        dt_trunk = _timeit(lambda: trunk_fwd(model.params, img, img),
                           warmup=2, iters=5)
        tok224 = (224 // mcfg.patch_size) ** 2
        vit_flops = _vit_pair_flops(mcfg, tok224) * b
        aux["vit_trunk_ms_224"] = round(dt_trunk * 1e3, 1)
        aux["vit_heads_wall_frac"] = round(1.0 - dt_trunk / dt_inf, 3)
        if peaks["peak_bf16_flops"]:
            aux["vit_mfu_224"] = round(vit_flops / dt_trunk
                                       / peaks["peak_bf16_flops"], 3)
            aux["vit_mfu_224_incl_heads_lower"] = round(
                vit_flops / dt_inf / peaks["peak_bf16_flops"], 3)
            aux["vit_flops_note"] = (
                "vit_mfu_224 = trunk flops / TRUNK-ONLY time (enc+"
                "interleaved dec); _incl_heads_lower divides the same "
                "trunk flops by the FULL wall — a lower bound since the "
                "DPT+descriptor heads' own flops (comparable to the "
                "trunk's) are uncounted")

    _stage("vit_224", min_budget_s=120)(vit224)

    # ---------------- render-only fps (novel-view path, incl. binning) ----
    def render_fps():
        params = holder["state"].params
        scfg = holder["scfg"]
        if scfg is cfg:
            # headline completed in a previous process (crash-restart):
            # recompute its auto-budgeted config
            scfg = _autobudget_cfg(holder["state"], w2c, K, w, h, cfg)
            holder["scfg"] = scfg

        def render_once():
            rgb, _, _ = render(params, w2c, K, w, h, scfg)
            return rgb

        dt_render = _timeit(render_once, warmup=2, iters=10)
        aux["render_fps_224"] = round(n_cams / dt_render, 1)

    _stage("render_fps", min_budget_s=60)(render_fps)

    # ---------------- quality: GA ATE/RPE on planted scenes ---------------
    def ga_quality():
        # HEADLINE GA metric measures the PRODUCT-DEFAULT configuration
        # (VERDICT r4 #5): anchored sub-pixel endpoints — the path
        # config.MatchingConfig.anchor_refine=True routes through condense.
        data, mst, gt_poses, _ = synthetic_ga_scene(n_cams=4, hw=128,
                                                    subsample=4,
                                                    anchored=True)
        result, _ = run_global_alignment(
            data, mst, GAConfig(niter1=500, niter2=200, lr2=0.004))
        pred = np.asarray(result.cam2w)
        traj_scale = float(np.linalg.norm(
            gt_poses[:, :3, 3] - gt_poses[:, :3, 3].mean(0), axis=1).max())
        aux["ga_ate"] = round(float(ate_rmse(pred, gt_poses)), 5)
        aux["ga_ate_frac_of_traj"] = round(aux["ga_ate"] / traj_scale, 4)
        aux["ga_rpe_rot_deg"] = round(
            float(rpe_rotation_deg(pred, gt_poses)), 3)

    _stage("ga_quality", min_budget_s=120)(ga_quality)

    # ---------------- BASELINE configs 4-5: keyframe Schur BA -------------
    def config4():
        # 50-keyframe incremental Schur-complement BA (BASELINE config 4)
        import sys as _sys
        _sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        from test_schur import _make_seq, _perturb

        from starst3r_tpu.alignment.schur import schur_refine

        d = _make_seq(np.random.default_rng(0), c=50, npts=16, window=3)
        noisy = _perturb(d["cam2w"], np.random.default_rng(1), rot=0.01,
                         tr=0.03)
        schur_refine(noisy, d["focals"], d["pps"], d["depths"],
                     d["core_pix"], d["tracks"], iters=1, opt_focal=False)
        t0 = time.perf_counter()
        _, _, costs = schur_refine(
            noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
            d["tracks"], iters=5, opt_focal=False)
        aux["config4"] = {
            "keyframes": 50,
            "schur_s_per_iter": round((time.perf_counter() - t0) / 5, 3),
            "cost_drop": round(float(costs[0] / max(costs[-1], 1e-12)), 1),
        }

    _stage("config4", min_budget_s=150)(config4)

    def config5_schur():
        # 200-keyframe Schur BA (BASELINE config 5's BA half; the 1M splat
        # half runs as config5_1m right after the headline). Records the
        # full COST-vs-ITERATION curve over 15 iters (VERDICT r4 #6: the
        # 5-iter cost drop of 13x at 200 kf vs 10514x at 50 kf needed
        # either more iterations or a conditioning diagnosis) plus the
        # per-shard valid-observation counts of the 8-way keyframe-block
        # partition (VERDICT r4 #7 work-balance evidence; asserted
        # near-equal in tests/test_distributed.py).
        import sys as _sys
        _sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        from test_schur import _make_seq, _perturb

        from starst3r_tpu.alignment.schur import (schur_partition_sizes,
                                                  schur_refine)

        d = _make_seq(np.random.default_rng(0), c=200, npts=16, window=3)
        noisy = _perturb(d["cam2w"], np.random.default_rng(1), rot=0.01,
                         tr=0.03)
        schur_refine(noisy, d["focals"], d["pps"], d["depths"],
                     d["core_pix"], d["tracks"], iters=1, opt_focal=False)
        t0 = time.perf_counter()
        _, _, costs = schur_refine(
            noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
            d["tracks"], iters=15, opt_focal=False)
        blk = aux.setdefault("config5", {})
        blk["keyframes"] = 200
        blk["schur_s_per_iter"] = round((time.perf_counter() - t0) / 15, 3)
        blk["cost_drop"] = round(float(costs[0] / max(costs[-1], 1e-12)), 1)
        blk["cost_curve"] = [float(f"{c:.6g}") for c in costs]
        blk["partition_obs_8dev"] = schur_partition_sizes(d["tracks"], 8)

    _stage("config5_schur", min_budget_s=150)(config5_schur)

    # ---------------- quality: splat optimization PSNR --------------------
    def splat_psnr():
        qcfg = dataclasses.replace(cfg, init_scale=2e-2)
        tgt_pts = rng.normal(size=(4000, 3)).astype(np.float32) * 0.4
        tgt_pts[:, 2] += 3.0
        tgt_cols = rng.uniform(size=(4000, 3)).astype(np.float32)
        tgt_state = init_gaussians(tgt_pts, tgt_cols, qcfg, seed=1)
        tgt_gt = jnp.clip(render(tgt_state.params, w2c, K, w, h, qcfg)[0],
                          0.0, 1.0)
        opt_state = init_gaussians(
            tgt_pts + rng.normal(size=tgt_pts.shape).astype(np.float32)
            * 0.05,
            rng.uniform(size=(4000, 3)).astype(np.float32), qcfg, seed=2)
        rgb0 = jnp.clip(render(opt_state.params, w2c, K, w, h, qcfg)[0],
                        0, 1)
        psnr0 = float(np.mean([psnr_fn(tgt_gt[i], rgb0[i])
                               for i in range(n_cams)]))
        opt_state, _ = run_optim(opt_state, np.asarray(tgt_gt),
                                 np.asarray(w2c), np.asarray(K), 150, qcfg)
        rgb_opt = jnp.clip(render(opt_state.params, w2c, K, w, h, qcfg)[0],
                           0, 1)
        aux["splat_psnr_150_iters"] = round(float(np.mean(
            [psnr_fn(tgt_gt[i], rgb_opt[i]) for i in range(n_cams)])), 2)
        aux["splat_psnr_init"] = round(psnr0, 2)

    _stage("splat_psnr", min_budget_s=150)(splat_psnr)

    # ---------------- 512-px ViT block (checkpoint-native res) ------------
    def res512():
        from starst3r_tpu.models.mast3r import Mast3rModel
        r = aux.setdefault("res512", {})
        model512 = Mast3rModel.init_random(mcfg, image_hw=(512, 512))
        b512 = 4
        img512 = jnp.asarray(rng.uniform(-1, 1, size=(b512, 512, 512, 3))
                             .astype(np.float32))

        def infer512():
            return model512.infer_pair_batch(img512, img512)["pts1"]

        dt512 = _timeit(infer512, warmup=1, iters=3)
        r["vit_base_pairs_per_s"] = round(b512 / dt512, 2)
        if peaks["peak_bf16_flops"]:
            tok512 = (512 // mcfg.patch_size) ** 2
            r["vit_mfu"] = round(
                _vit_pair_flops(mcfg, tok512) * b512 / dt512
                / peaks["peak_bf16_flops"], 3)

    _stage("res512", min_budget_s=150)(res512)

    # ---------------- GA variants (comparison points) ---------------------
    def ga_variants():
        # snapped (anchor_refine=False product variant) + snap-free
        # (optimizer bound) ATE fractions for comparison with the anchored
        # headline
        data, mst, gtp, _ = synthetic_ga_scene(n_cams=4, hw=128,
                                               subsample=4)
        res, _ = run_global_alignment(data, mst,
                                      GAConfig(niter1=300, niter2=120))
        scale = float(np.linalg.norm(
            gtp[:, :3, 3] - gtp[:, :3, 3].mean(0), axis=1).max())
        aux["ga_ate_frac_snapped"] = round(
            float(ate_rmse(np.asarray(res.cam2w), gtp)) / scale, 6)
        sdata, smst, sgt, _ = synthetic_ga_scene(n_cams=4, hw=128,
                                                 subsample=4,
                                                 snap_free=True)
        sres, _ = run_global_alignment(
            sdata, smst, GAConfig(niter1=500, niter2=200, lr2=0.004))
        aux["ga_ate_frac_snap_free"] = round(
            float(ate_rmse(np.asarray(sres.cam2w), sgt)) / scale, 6)

    _stage("ga_variants", min_budget_s=110)(ga_variants)

    emit(final=True)


if __name__ == "__main__":
    main()
