"""Benchmark: whole-slide sliding-window instance segmentation throughput.

Measures end-to-end megapixels/second/chip through the fused device pipeline
(percentile normalize → 256² sliding-window UNet forward with 0.25 overlap →
softmax → hole/object filtering → connected components), i.e. the full
reference predict.py stack (baseline/predict.py:100-113) including instance
decoding — not just the conv forward.

The model is the TRAINED flagship UNet (assets/bench_unet_3class.ckpt,
val Dice 0.952 on the synthetic held-out set), so the interior-probability
map — and therefore the hole/object-filter + CC decode workload — is
cell-shaped, not noise-shaped. Reported value is the MEDIAN of 5 pipelined
rounds; per-stage device times (normalize / forward / decode) are included.

Baseline: the challenge organizers' runtime budget is 10 s per megapixel
(baseline/cellseg_time_eval.py:78-82, see BASELINE.md), i.e. 0.1 MP/s.
`vs_baseline` is measured MP/s divided by that 0.1 MP/s budget.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def make_slide(H: int = 2048, W: int = 2048, n_cells: int = 2000,
               seed: int = 0, return_labels: bool = False):
    """Synthetic whole-slide surrogate: ~n_cells bright disks on a noisy
    background (the decode stage does realistic instance work)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    img_f = rng.normal(30, 8, (H, W))
    labels = np.zeros((H, W), np.int32) if return_labels else None
    cy = rng.integers(10, H - 10, n_cells)
    cx = rng.integers(10, W - 10, n_cells)
    r = rng.integers(6, 22, n_cells)
    for i in range(n_cells):
        y0, y1 = max(cy[i] - r[i], 0), min(cy[i] + r[i] + 1, H)
        x0, x1 = max(cx[i] - r[i], 0), min(cx[i] + r[i] + 1, W)
        d2 = (yy[y0:y1, x0:x1] - cy[i]) ** 2 + (xx[y0:y1, x0:x1] - cx[i]) ** 2
        inside = d2 <= r[i] ** 2
        img_f[y0:y1, x0:x1] = np.maximum(
            img_f[y0:y1, x0:x1], np.where(inside, 180.0, 0.0))
        if labels is not None:
            blob = labels[y0:y1, x0:x1]
            blob[inside & (blob == 0)] = i + 1
    img = np.clip(img_f, 0, 255).astype(np.uint8)
    # grayscale, like whole-slide brightfield inputs; the predictor uploads
    # one channel and expands to 3 on device (3x less H2D)
    if return_labels:
        return img, labels
    return img


_WATCHDOG_TIMER = None  # cancelled before a retry subprocess takes over

# TPU v5e single-chip peaks (public spec sheet): 197 TFLOP/s dense bf16
# on the MXU, 819 GB/s HBM bandwidth. MFU/roofline figures below are
# measured-vs-these; on a different chip generation they are simply a
# different denominator, the analytic numerators stay valid.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def _cost_analysis(jitted, *args) -> dict:
    """Analytic FLOPs / HBM-bytes of a compiled executable.

    XLA's cost analysis runs on the post-fusion optimized HLO, so
    'bytes accessed' approximates real HBM traffic (fused elementwise
    chains are not double counted) and 'flops' is the analytic conv/
    matmul count — the numerator VERDICT r3 item 3 asks for. Returns {}
    if the backend can't report (never fails the bench)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return dict(ca)
    except Exception as e:  # noqa: BLE001 — strictly best-effort
        print(f"cost_analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return {}


def _mfu(flops: float | None, ms: float) -> float | None:
    """Model FLOPs utilization vs the v5e bf16 peak for a stage that took
    `ms` milliseconds (net of sync)."""
    if not flops or ms <= 0:
        return None
    return round(flops / (ms / 1e3) / V5E_PEAK_BF16_FLOPS, 4)


def _hbm_frac(nbytes: float | None, ms: float) -> float | None:
    """Achieved HBM bandwidth as a fraction of the v5e 819 GB/s peak."""
    if not nbytes or ms <= 0:
        return None
    return round(nbytes / (ms / 1e3) / V5E_HBM_BYTES_PER_S, 4)


def _error_line(metric: str, why: str) -> None:
    print(json.dumps({
        "metric": metric, "value": 0.0,
        "unit": "megapixels/sec/chip", "vs_baseline": 0.0,
        "error": why,
    }), flush=True)


def _watchdog(metric: str, probe_timeout_s: float = 300.0,
              total_timeout_s: float = 3000.0) -> None:
    """Guard against a hung device backend (the axon tunnel has been
    observed to stop responding entirely — even `jax.devices()` blocks
    forever). The driver contract is ONE JSON line on stdout; a silent
    hang loses the round's bench artifact, so probe the backend on a
    daemon thread with a deadline and emit an error line instead of
    blocking. A second (coarser) deadline bounds the whole run."""
    import threading

    def fail(why: str) -> None:
        _error_line(metric, why)
        os._exit(2)

    ready = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp

        float(jnp.asarray(1.0) + 1.0)
        ready.set()

    threading.Thread(target=probe, daemon=True).start()
    if not ready.wait(probe_timeout_s):
        fail(f"device backend unreachable: no response to a trivial op in "
             f"{probe_timeout_s:.0f}s (axon tunnel down?)")
    timer = threading.Timer(
        total_timeout_s,
        lambda: fail(f"bench exceeded {total_timeout_s:.0f}s wall clock "
                     "(backend stalled mid-run?)"))
    timer.daemon = True
    timer.start()
    global _WATCHDOG_TIMER
    _WATCHDOG_TIMER = timer


class _InjectedFault(RuntimeError):
    """Test-only synthetic device fault (see --inject-fault)."""


def _is_device_fault(exc: BaseException) -> bool:
    """Transient device/backend faults worth one fresh-process retry.

    Round 3's driver artifact was lost to exactly this class of error: a
    one-off "TPU worker process crashed or restarted … kernel fault"
    escaped as a traceback and the driver recorded no JSON line, while an
    identical rerun minutes later completed clean (VERDICT r3 item 1).
    """
    tname = type(exc).__name__
    if tname in ("XlaRuntimeError", "JaxRuntimeError", "_InjectedFault"):
        return True
    # the substring heuristic only applies to runtime-ish error types: a
    # deterministic ValueError whose message merely contains "tunnel" must
    # fail fast with the error line instead of burning the single retry on
    # up to 600 s of recovery polling (ADVICE r4)
    if not isinstance(exc, (RuntimeError, OSError, ConnectionError)):
        return False
    s = f"{tname}: {exc}".lower()
    return any(p in s for p in (
        "worker process crashed", "worker crashed", "restarted",
        "kernel fault", "deadline exceeded", "socket closed",
        "unavailable:", "data loss", "tunnel",
    ))


def _run_guarded(fn, metric: str, kw: dict, inject: str | None,
                 watchdog: bool = True) -> int:
    """Run a bench body under the one-JSON-line contract.

    Any exception is converted into a valid error-JSON line (the watchdog
    pattern, matching the reference's defensive per-case guard,
    baseline/cellseg_time_eval.py:96-97). A device-fault error triggers ONE
    retry in a fresh interpreter (fresh backend handle) before giving up;
    CELLSEG_BENCH_ATTEMPT=2 marks the retry so it cannot recurse.
    """
    is_retry = os.environ.get("CELLSEG_BENCH_ATTEMPT") == "2"
    if watchdog:
        _watchdog(metric)
    try:
        if inject == "fatal" or (inject == "transient" and not is_retry):
            raise _InjectedFault(
                "INTERNAL: Accelerator device halted prematurely... TPU "
                "worker process crashed or restarted (injected test fault)")
        return fn(**kw)
    except BaseException as e:  # noqa: BLE001 — the JSON line must survive
        import traceback

        tb_tail = traceback.format_exc().strip().splitlines()[-1]
        err = f"{type(e).__name__}: {e}"
        print(f"bench attempt failed: {err}", file=sys.stderr, flush=True)
        if _is_device_fault(e) and not is_retry:
            # fresh interpreter: a crashed/restarted TPU worker can leave
            # the in-process backend handle permanently wedged
            import subprocess

            if _WATCHDOG_TIMER is not None:
                _WATCHDOG_TIMER.cancel()
            env = dict(os.environ)
            env["CELLSEG_BENCH_ATTEMPT"] = "2"
            # a crashed TPU worker takes minutes to restart; retrying into
            # the still-down backend just burns the one retry (observed on
            # the axon tunnel). Probe with short-lived subprocesses until a
            # trivial op completes (or the recovery budget is spent), THEN
            # launch the retry. Injected test faults skip the wait.
            if not isinstance(e, _InjectedFault):
                _wait_for_backend_recovery(env)
            print("device fault — retrying once in a fresh process",
                  file=sys.stderr, flush=True)
            try:
                # capture the child's stdout so exactly ONE JSON line
                # reaches the driver: the child's line (success OR its own
                # error line) is forwarded verbatim; only a child that
                # produced no JSON at all falls through to the parent line
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)]
                    + sys.argv[1:], env=env, timeout=3000,
                    capture_output=True, text=True)
                sys.stderr.write(proc.stderr)
                child_json = [ln for ln in proc.stdout.splitlines()
                              if ln.startswith("{")]
                if child_json:
                    print(child_json[-1], flush=True)
                    return proc.returncode
                err += f" (retry rc={proc.returncode}, no JSON)"
            except subprocess.TimeoutExpired:
                err += " (retry timed out)"
        _error_line(metric, f"{err} | {tb_tail}")
        return 2


def _wait_for_backend_recovery(env: dict, budget_s: float = 600.0,
                               probe_timeout_s: float = 90.0,
                               sleep_s: float = 30.0) -> bool:
    """Poll the device backend in short-lived subprocesses until a trivial
    jitted op completes; give up after `budget_s`. Each probe is its own
    interpreter (a crashed worker wedges in-process handles), bounded by
    `probe_timeout_s` so a hung tunnel can't stall the watchdog-less
    retry path forever. Returns True if a probe succeeded."""
    import subprocess

    probe_src = ("import jax, jax.numpy as jnp;"
                 "x = jnp.ones((128, 128));"
                 "print(float((x @ x).sum()))")
    deadline = time.time() + budget_s
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe_src], env=env,
                timeout=probe_timeout_s, capture_output=True, text=True)
            if proc.returncode == 0:
                print(f"backend probe ok (attempt {attempt})",
                      file=sys.stderr, flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"backend probe {attempt} failed; sleeping {sleep_s:.0f}s "
              f"({deadline - time.time():.0f}s of recovery budget left)",
              file=sys.stderr, flush=True)
        time.sleep(min(sleep_s, max(deadline - time.time(), 0)))
    print("backend recovery budget spent — retrying anyway",
          file=sys.stderr, flush=True)
    return False


def main_selftest() -> int:
    """Cheap no-device body for exercising the guard machinery in tests."""
    print(json.dumps({"metric": "bench_selftest", "value": 1.0,
                      "unit": "ok", "vs_baseline": 1.0}))
    return 0


def _stage_timer(sync):
    import time as _t

    def bench(fn, *args, n=7):
        ts = []
        for _ in range(n):
            t0 = _t.perf_counter()
            float(sync(fn(*args)))
            ts.append(_t.perf_counter() - t0)
        return round(float(np.median(ts)) * 1e3, 2)

    return bench


def main_distance(H: int = 2048):
    """Distance (KIT-GE) pipeline: DUNet forward + watershed decode at
    4.2 MP. Decode runs on REALISTIC predictions (per-nucleus EDT targets
    of a dense synthetic label world) so the seed/flood workload is
    cell-shaped. Reference stack: postprocessing.py:46-185."""
    from cellseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from cellseg_tpu.decode.distance import _flood, _seeds_and_mask, decode_distance
    from cellseg_tpu.models import build_model
    from cellseg_tpu.pipeline.distance_labels import distance_label_2d

    W = H
    mp = H * W / 1e6
    n_cells = max(8, int(1200 * (H * W) / (2048 * 2048)))
    _, labels = make_slide(H, W, n_cells=n_cells, seed=0, return_labels=True)
    cell_t, neigh_t = distance_label_2d(labels, cell_radius=25,
                                        neighbor_radius=50)
    border_d = jnp.asarray(neigh_t.astype(np.float32))
    cell_d = jnp.asarray(cell_t.astype(np.float32))

    model = build_model("dunet", dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 256, 256, 1), jnp.float32))
    x = jnp.asarray((labels > 0).astype(np.float32)[..., None])

    # MXU-batched 512²-tile forward (DistancePredictor tile_threshold
    # path): the whole-image DUNet at 2048² moves 48.7 GB (74.8 ms,
    # 79.5% of HBM roofline) while tile batches lift AI 41 → 152 and run
    # 3.1× faster — scripts/roofline_dunet.py, BASELINE.md round 5.
    from cellseg_tpu.infer.sliding_window import (balanced_sw_batch,
                                                  sliding_window_inference,
                                                  tile_origins)

    _roi = 512
    _n_tiles = (len(tile_origins(H, _roi, 0.25))
                * len(tile_origins(W, _roi, 0.25)))
    _swb = balanced_sw_batch(_n_tiles, max(1, int(128 * (256 / _roi) ** 2)))

    def _tiles_fn(p, t):
        border, cell = model.apply(p, t)
        return jnp.concatenate([border, cell], axis=-1)

    @jax.jit
    def fwd(p, x):
        out = sliding_window_inference(_tiles_fn, p, x, roi=_roi,
                                       sw_batch=_swb, overlap=0.25,
                                       out_channels=2)
        # single synced output; both heads are still computed + blended
        return out[..., 0] + out[..., 1]

    sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    th_cell, th_seed = jnp.float32(0.07), jnp.float32(0.45)
    # warmup / compile + instance sanity count
    fwd(params, x)
    n_instances = int(decode_distance(np.asarray(border_d),
                                      np.asarray(cell_d)).max())
    cell_s, mask, seeds = _seeds_and_mask(cell_d, border_d, th_cell, th_seed)
    float(sync(_flood(cell_s, seeds, mask)))

    bench = _stage_timer(sync)
    stages = {
        "sync_overhead": bench(lambda a: a, cell_d),
        "forward": bench(lambda: fwd(params, x)),
        "decode_seeds": bench(
            lambda: _seeds_and_mask(cell_d, border_d, th_cell, th_seed)[2]),
        "decode_flood": bench(lambda: _flood(cell_s, seeds, mask)),
    }
    sync_ms = stages["sync_overhead"]
    compute_ms = sum(max(v - sync_ms, 0.0) for k, v in stages.items()
                     if k != "sync_overhead")
    mps = round(mp / max(compute_ms, 1e-6) * 1e3, 2)
    fcost = _cost_analysis(fwd, params, x)
    flood_j = jax.jit(_flood)
    dcost = _cost_analysis(flood_j, cell_s, seeds, mask)
    print(json.dumps({
        "metric": "distance_pipeline_throughput",
        "value": mps,
        "unit": "megapixels/sec/chip (device compute)",
        "vs_baseline": round(mps / 0.1, 2),
        "instances_decoded": n_instances,
        "stage_ms_at_4.2MP": stages,
        "mfu": _mfu(fcost.get("flops"),
                    max(stages["forward"] - sync_ms, 1e-6)),
        "roofline": {
            "forward_tflops_analytic": round(
                fcost.get("flops", 0.0) / 1e12, 3),
            "flood_hbm_gb_analytic": round(
                dcost.get("bytes accessed", 0.0) / 1e9, 2),
            "flood_hbm_frac_of_peak": _hbm_frac(
                dcost.get("bytes accessed"),
                max(stages["decode_flood"] - sync_ms, 1e-6)),
        },
        # sync RTT >100 ms means heavy ambient tunnel contention: the
        # net-of-sync stage times (and thus the MP/s) are then unreliable
        "contended": bool(sync_ms > 100.0),
    }))
    return 0


def main_flow(H: int = 2048):
    """Flow (cellpose) pipeline: FlowNet forward + pointer-doubling
    gradient-tracking decode at 4.2 MP on realistic flow fields.
    Reference workload: cellpose eval wrappers (test_cellpose_cyto2_grey.py)."""
    from cellseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from cellseg_tpu.decode.flow import decode_flow
    from cellseg_tpu.models import build_model
    from cellseg_tpu.pipeline.flow_labels import masks_to_flows

    W = H
    mp = H * W / 1e6
    n_cells = max(8, int(1200 * (H * W) / (2048 * 2048)))
    _, labels = make_slide(H, W, n_cells=n_cells, seed=0, return_labels=True)
    flows, mask = masks_to_flows(labels)
    flow_d = jnp.asarray(np.moveaxis(flows, 0, -1).astype(np.float32))
    prob_d = jnp.asarray(np.where(mask, 8.0, -8.0).astype(np.float32))

    model = build_model("flownet", dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 256, 256, 1), jnp.float32))
    x = jnp.asarray((labels > 0).astype(np.float32)[None, ..., None])

    @jax.jit
    def fwd(p, x):
        flow, cellprob = model.apply(p, x)
        return flow[0]

    sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    fwd(params, x)
    dec = decode_flow(flow_d, prob_d)
    n_instances = int(jax.device_get(jnp.max(dec)))

    bench = _stage_timer(sync)
    stages = {
        "sync_overhead": bench(lambda a: a, prob_d),
        "forward": bench(lambda: fwd(params, x)),
        "decode_track": bench(lambda: decode_flow(flow_d, prob_d)),
    }
    sync_ms = stages["sync_overhead"]
    compute_ms = sum(max(v - sync_ms, 0.0) for k, v in stages.items()
                     if k != "sync_overhead")
    mps = round(mp / max(compute_ms, 1e-6) * 1e3, 2)
    fcost = _cost_analysis(fwd, params, x)
    dcost = _cost_analysis(decode_flow, flow_d, prob_d)  # already jitted
    print(json.dumps({
        "metric": "flow_pipeline_throughput",
        "value": mps,
        "unit": "megapixels/sec/chip (device compute)",
        "vs_baseline": round(mps / 0.1, 2),
        "instances_decoded": n_instances,
        "stage_ms_at_4.2MP": stages,
        "mfu": _mfu(fcost.get("flops"),
                    max(stages["forward"] - sync_ms, 1e-6)),
        "roofline": {
            "forward_tflops_analytic": round(
                fcost.get("flops", 0.0) / 1e12, 3),
            "track_hbm_gb_analytic": round(
                dcost.get("bytes accessed", 0.0) / 1e9, 2),
            "track_hbm_frac_of_peak": _hbm_frac(
                dcost.get("bytes accessed"),
                max(stages["decode_track"] - sync_ms, 1e-6)),
        },
        "contended": bool(sync_ms > 100.0),
    }))
    return 0


def main_train(batch: int = 8, steps: int = 30):
    """Training-step throughput for the flagship 3-class loop: one jitted
    step = on-device augmentation + UNet fwd/bwd (DiceCE) + AdamW update
    (reference loop: model_training_3class.py:238-341, batch 8, 256² ROI —
    which syncs loss to host EVERY step; here the host fetches once at the
    end, so the chip never idles between steps)."""
    from cellseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from cellseg_tpu.models import build_model
    from cellseg_tpu.train.steps import TrainState, make_train_step

    model = build_model("unet", num_class=3, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 256, 256, 3), jnp.float32))
    tx = optax.adamw(6e-4)
    state = TrainState.create(
        lambda p, x, train=False: model.apply(p, x), params, tx)
    step = make_train_step(num_classes=3)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                    dtype=np.uint8))
    lbls = jnp.asarray(rng.integers(0, 3, (batch, 256, 256),
                                    dtype=np.int32))
    key = jax.random.PRNGKey(1)

    # compile + warmup (donated state: thread it through)
    state, loss = step(state, imgs, lbls, key)
    float(loss)  # force materialization (tunnel: block_until_ready lies)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, imgs, lbls,
                           jax.random.fold_in(key, i))
    final = float(loss)  # one sync for the whole run
    dt = time.perf_counter() - t0
    steps_s = steps / dt
    px_s = steps_s * batch * 256 * 256
    # analytic FLOPs of the whole jitted step (aug + fwd + bwd + AdamW)
    # vs the v5e bf16 peak (VERDICT r3 item 3). Wall-clock per step here
    # includes dispatch, so this MFU is a lower bound on device MFU.
    scost = _cost_analysis(step, state, imgs, lbls, key)

    # scan-fused measurement: the dispatch loop above pays one tunnel
    # round-trip PER step (~110 ms/step measured vs ~1 ms of device
    # compute), so its MFU reads the link, not the chip. Fusing the same
    # `steps` steps into ONE lax.scan dispatch removes every per-step
    # host interaction and measures the device-side training roofline
    # (fixed batch — the data feed is not what is being measured).
    # (the original `params` were donated into the dispatch loop's state;
    # seed the scan from the loop's final live params instead)
    fresh = TrainState.create(
        lambda p, x, train=False: model.apply(p, x), state.params, tx)
    inner = make_train_step(num_classes=3, donate=False)

    @jax.jit
    def scan_steps(s0, im, lb, k):
        def body(s, i):
            s2, loss = inner(s, im, lb, jax.random.fold_in(k, i))
            return s2, loss
        return jax.lax.scan(body, s0, jnp.arange(steps))

    s_out, losses = scan_steps(fresh, imgs, lbls, key)
    float(losses[-1])  # compile + warmup
    t0 = time.perf_counter()
    s_out, losses = scan_steps(fresh, imgs, lbls, key)
    scan_final = float(losses[-1])  # one sync for the whole scan
    scan_dt = time.perf_counter() - t0
    scan_steps_s = steps / scan_dt

    print(json.dumps({
        "metric": "train_step_throughput_3class",
        "value": round(px_s / 1e6, 3),
        "unit": (f"megapixels/sec/chip (train, batch {batch} x 256^2, "
                 "aug+fwd+bwd+AdamW)"),
        "vs_baseline": None,  # reference publishes no steps/s
        "steps_per_sec": round(steps_s, 2),
        "step_tflops_analytic": round(scost.get("flops", 0.0) / 1e12, 3),
        "mfu": _mfu(scost.get("flops"), 1e3 / max(steps_s, 1e-9)),
        "final_loss": round(final, 4),
        "steps_per_sec_scan_fused": round(scan_steps_s, 2),
        "mps_scan_fused": round(
            scan_steps_s * batch * 256 * 256 / 1e6, 3),
        "mfu_scan_fused": _mfu(scost.get("flops"),
                               1e3 / max(scan_steps_s, 1e-9)),
        "final_loss_scan": round(scan_final, 4),
    }))
    return 0


def main():
    from cellseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from cellseg_tpu.infer.predictor import Predictor
    from cellseg_tpu.models import build_model
    from cellseg_tpu.train.checkpoint import load_checkpoint

    # Flagship config: reference-equivalent UNet, bf16 activations,
    # trained weights (synthetic set, val Dice 0.952).
    model = build_model("unet", num_class=3, dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)
    ckpt = os.path.join(HERE, "assets", "bench_unet_3class.ckpt")
    from flax import serialization

    payload = load_checkpoint(ckpt)
    params = serialization.from_state_dict(params, payload["params"])
    params = jax.device_put(params)  # host numpy otherwise: re-upload/call

    H = W = 2048
    img = make_slide(H, W)
    mp = H * W / 1e6

    # balanced per-step tile batches against a 128-tile MXU-fill budget:
    # the 2176² uniform grid is 11×11 = 121 tiles; one scan step of
    # exactly 121 runs every tile once (a fixed 128 would pad 7 duplicate
    # forwards; on non-square slides the fixed batch can waste up to ~2×
    # — see sliding_window.balanced_sw_batch)
    from cellseg_tpu.infer.sliding_window import balanced_sw_batch

    sw_batch = balanced_sw_batch(11 * 11)
    pred = Predictor(
        lambda p, t: model.apply(p, t), params,
        roi=256, sw_batch=sw_batch, overlap=0.25, bucket=256,
    )

    # compile + warmup (also sanity-check the decode finds real instances)
    labels = pred.predict(img)
    n_instances = int(labels.max())
    pred.predict(img)

    # end-to-end throughput over a pipelined stream of slides (H2D/compute/
    # D2H overlapped by async dispatch); median of 5 rounds. Per-round
    # contention detection (VERDICT r4 item 9): a sync-RTT watermark is
    # probed before each round; rounds whose RTT is well above the
    # session's floor ran during ambient tunnel contention and are dropped
    # from the median (the raw list + flags are still reported, so
    # round-over-round deltas stay auditable).
    n_imgs = 8
    probe = jax.jit(lambda a: jnp.sum(a))
    probe_arg = jnp.zeros((8,), jnp.float32)
    float(probe(probe_arg))
    rates, round_rtt_ms = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        float(probe(probe_arg))
        round_rtt_ms.append(round((time.perf_counter() - t0) * 1e3, 1))
        t0 = time.perf_counter()
        for out in pred.predict_many([img] * n_imgs):
            pass
        dt = (time.perf_counter() - t0) / n_imgs
        rates.append(mp / dt)
    rtt_floor = min(round_rtt_ms)
    round_contended = [r > max(2.0 * rtt_floor, rtt_floor + 25.0)
                       for r in round_rtt_ms]
    clean = [r for r, c in zip(rates, round_contended) if not c]
    mps = float(np.median(clean if clean else rates))

    # per-stage device budget at steady state. On the axon tunnel,
    # block_until_ready does NOT wait for remote completion, so each
    # timing forces materialization through a scalar fetch; the pure
    # sync overhead is measured separately and reported.
    from cellseg_tpu.decode.threeclass import decode_interior_prob
    from cellseg_tpu.infer.sliding_window import sliding_window_inference
    from cellseg_tpu.pipeline.normalize import normalize_image_jax

    @jax.jit
    def stage_norm(u8):
        norm = normalize_image_jax(u8).astype(jnp.float32)
        if norm.shape[-1] == 1:  # device-side channel expansion
            norm = jnp.repeat(norm, 3, axis=-1)
        return norm / jnp.maximum(jnp.max(norm), 1e-8)

    @jax.jit
    def stage_forward(p, x):
        logits = sliding_window_inference(
            lambda pp, t: model.apply(pp, t), p, x, roi=256,
            sw_batch=sw_batch, overlap=0.25, out_channels=3)
        return jax.nn.softmax(logits, axis=-1)[..., 1]

    stage_decode = jax.jit(decode_interior_prob)
    sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

    dev_img = jnp.asarray(img[..., None])  # 1-channel upload
    stages = {}
    x = stage_norm(dev_img)
    fwd = stage_forward(params, x)
    dec = stage_decode(fwd)
    float(sync(dec))
    for name, fn, arg in (("sync_overhead", lambda a: a, dev_img),
                          ("normalize", stage_norm, dev_img),
                          ("forward_softmax", lambda a: stage_forward(params, a), x),
                          ("decode", stage_decode, fwd)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(sync(fn(arg)))
            ts.append(time.perf_counter() - t0)
        stages[name] = round(float(np.median(ts)) * 1e3, 2)  # ms

    budget_mps = 0.1  # organizers' 10 s/MP rank-time budget
    # device-compute-only throughput from the stage budget (net of the
    # sync RTT): insensitive to the dev tunnel's ambient transfer
    # contention, which swings the e2e number ~4x hour to hour
    sync_ms = stages.get("sync_overhead", 0.0)
    compute_ms = sum(max(v - sync_ms, 0.0) for k, v in stages.items()
                     if k != "sync_overhead")
    compute_mps = round(mp / max(compute_ms, 1e-6) * 1e3, 1)

    # Roofline accounting (VERDICT r3 items 3+5): analytic FLOPs for the
    # MXU-bound forward → MFU vs the v5e bf16 peak; analytic HBM bytes for
    # the sort/propagation-bound decode → fraction of the 819 GB/s peak.
    fcost = _cost_analysis(stage_forward, params, x)
    dcost = _cost_analysis(stage_decode, fwd)
    fwd_net_ms = max(stages.get("forward_softmax", 0.0) - sync_ms, 1e-6)
    dec_net_ms = max(stages.get("decode", 0.0) - sync_ms, 1e-6)
    roofline = {
        "forward_tflops_analytic": round(fcost.get("flops", 0.0) / 1e12, 3),
        "mfu_forward": _mfu(fcost.get("flops"), fwd_net_ms),
        "decode_hbm_gb_analytic": round(
            dcost.get("bytes accessed", 0.0) / 1e9, 2),
        "decode_hbm_frac_of_peak": _hbm_frac(
            dcost.get("bytes accessed"), dec_net_ms),
    }
    print(json.dumps({
        "metric": "sliding_window_instance_seg_throughput",
        "value": round(mps, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mps / budget_mps, 2),
        "instances_decoded": n_instances,
        "stage_ms_at_4.2MP": stages,
        "device_compute_only_mps": compute_mps,
        "mfu": roofline["mfu_forward"],
        "roofline": roofline,
        "stats": "median of uncontended pipelined rounds, trained model",
        "rates_all_rounds": [round(r, 2) for r in rates],
        "round_sync_rtt_ms": round_rtt_ms,
        "round_contended": round_contended,
        "n_rounds_dropped": int(sum(round_contended)),
        "contended": bool(sync_ms > 100.0),
    }))
    return 0


if __name__ == "__main__":
    # driver contract: bare `python bench.py` prints the flagship 3-class
    # line; --pipeline distance|flow|train bench the other families
    # (VERDICT r2 item 3). Every mode runs under _run_guarded: a crash
    # emits an error-JSON line, a transient device fault retries once in
    # a fresh process (VERDICT r3 item 1).
    _METRICS = {"distance": "distance_pipeline_throughput",
                "flow": "flow_pipeline_throughput",
                "train": "train_step_throughput_3class",
                "3class": "sliding_window_instance_seg_throughput",
                "selftest": "bench_selftest"}
    _MAINS = {"distance": main_distance, "flow": main_flow,
              "train": main_train, "3class": main,
              "selftest": main_selftest}
    which = "3class"
    if "--selftest" in sys.argv:
        which = "selftest"
    elif "--pipeline" in sys.argv:
        which = sys.argv[sys.argv.index("--pipeline") + 1]
    kw = {}
    if "--size" in sys.argv and which in ("distance", "flow"):
        kw["H"] = int(sys.argv[sys.argv.index("--size") + 1])
    inject = None
    if "--inject-fault" in sys.argv:
        inject = sys.argv[sys.argv.index("--inject-fault") + 1]
    sys.exit(_run_guarded(_MAINS[which], _METRICS[which], kw, inject,
                          watchdog=(which != "selftest")))
