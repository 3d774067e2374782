"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): LIBOR Market Model ATM swaption calibration at
100,000 paths on one TPU chip — the reference's north-star workload
(LIBORMarketModelCalibrationATMTest; published LMM rows: CPU 364.42 s at
81,920 paths / 719.33 s at 163,840, GTX-1080 GPU 49.46 s / 51.70 s,
/root/reference/README.md:242-255).

vs_baseline = finmath CPU seconds (interpolated to 100k paths from the
published 81,920/163,840 rows: ~443 s) / our wall-clock. >20 means the
north-star ">=20x vs CPU" is met.

Measurement methodology matches the reference: its timed region
(millisCalibrationStart..End, ATM test :342-360) begins AFTER the CUDA
context is initialized and the PTX is JIT-compiled (a throwaway
RandomVariableCuda is created when the Brownian motion is built, :152-153,
:283). We therefore compile the residual/Jacobian programs once (untimed,
reported as compile_s in detail) and then time the complete calibration —
LM loop, simulations, Jacobians, implied-vol inversions — from the initial
parameter vector. The persistent XLA compilation cache (enabled at package
import, ~/.cache/finmath_tpu/jax) now works cross-process on this backend
— verified: jit_residuals logs "Persistent compilation cache hit" on a
repeat run — so compile_s on a warm cache measures mostly remote-service
round-trip latency, which varies enormously with the tunnel's day
(observed 5.5 s to 570 s for the same cached program set; the PTX-cache
analog is JCudaUtils.java:50-53).
"""

import json
import logging
import os
import signal
import threading
import time

# ---------------------------------------------------------------------------
# driver-proof emission (round-3 VERDICT item 1)
#
# Round 3 produced ZERO driver-captured numbers (BENCH_r03: rc=124,
# parsed=null) because the 13 sequential legs printed their summary only
# after the last one and the remote compile service (5-570 s per program)
# blew the driver's timeout. The fix is structural:
#   * the compact summary line is (re-)emitted after the HEADLINE leg and
#     again after EVERY subsequent leg — the driver's tail-parse always
#     finds the latest complete detail+summary snapshot, whatever happens
#     afterwards;
#   * a global elapsed-time budget (FINMATH_TPU_BENCH_BUDGET_S, default
#     1500 s) after which remaining legs are recorded as skipped_budget
#     instead of run;
#   * SIGTERM (what `timeout` sends first) flushes the current snapshot
#     and exits 0;
#   * a watchdog thread hard-exits (after flushing) if a single leg wedges
#     inside a blocking remote compile past the budget + grace, where the
#     Python-level SIGTERM handler cannot run.
# The reference ships its perf tables in the README
# (/root/reference/README.md:199-257); this is the channel equivalent.
# ---------------------------------------------------------------------------

_START = time.monotonic()
BUDGET_S = float(os.environ.get("FINMATH_TPU_BENCH_BUDGET_S", "1500"))
HARD_EXIT_S = float(os.environ.get("FINMATH_TPU_BENCH_HARD_EXIT_S",
                                   str(BUDGET_S + 420.0)))
# RLock: SIGTERM can arrive on the main thread WHILE _emit() holds the
# lock mid-print; the handler re-enters _emit() on the same thread and a
# plain Lock would self-deadlock instead of flushing
_EMIT_LOCK = threading.RLock()
_STATE = {"summary": None, "detail": {}}


def _elapsed() -> float:
    return time.monotonic() - _START


def _emit():
    """Print the full detail line followed by the compact summary line
    (the REQUIRED final line) and rewrite BENCH_DETAIL.json. Reentrant-
    safe: called after every leg, from the SIGTERM handler, and from the
    watchdog thread."""
    with _EMIT_LOCK:
        summary = _STATE["summary"]
        if summary is None:
            summary = {"metric": "lmm_atm_swaption_calibration_100k_paths_wall",
                       "value": None, "unit": "s", "vs_baseline": None,
                       "error": "headline leg did not complete"}
        detail = dict(_STATE["detail"])
        detail["bench_elapsed_s"] = round(_elapsed(), 1)
        detail["bench_budget_s"] = BUDGET_S
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_DETAIL.json"), "w") as fh:
                json.dump({"summary": summary, "detail": detail}, fh, indent=1)
        except OSError:
            pass
        print(json.dumps(detail), flush=True)
        print(json.dumps(summary), flush=True)


def _install_deadline_guards():
    def on_term(signum, frame):  # noqa: ARG001
        _emit()
        os._exit(0)

    try:
        signal.signal(signal.SIGTERM, on_term)
        signal.signal(signal.SIGINT, on_term)
    except ValueError:
        pass  # non-main thread (embedded use) — watchdog still covers us

    def watchdog():
        remaining = HARD_EXIT_S - _elapsed()
        while remaining > 0:
            time.sleep(min(remaining, 30.0))
            remaining = HARD_EXIT_S - _elapsed()
        _emit()
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()


# --- persistent-compile-cache observability (round-3 VERDICT item 5) ----
# jax logs hits/misses at DEBUG on jax._src.compiler
# (log_persistent_cache_hit/miss); counting them per leg answers "did the
# cache actually protect this leg" without guessing from compile_s.

class _CacheCounter(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.hits = 0
        self.misses = 0

    def emit(self, record):
        msg = record.getMessage().lower()
        if "compilation cache hit" in msg:
            self.hits += 1
        elif "compilation cache miss" in msg:
            self.misses += 1
        elif record.levelno >= logging.WARNING:
            # propagate=False silences this logger's console route; real
            # compiler warnings/errors (e.g. cache-write failures) must
            # still surface
            logging.lastResort.handle(record)


_CACHE_COUNTER = _CacheCounter()
_cache_logger = logging.getLogger("jax._src.compiler")
_cache_logger.addHandler(_CACHE_COUNTER)
if _cache_logger.level == logging.NOTSET or _cache_logger.level > logging.DEBUG:
    _cache_logger.setLevel(logging.DEBUG)
# counting needs DEBUG records, but they must NOT reach the console: the
# driver tail-parses combined output, and a DEBUG flood would push the
# summary lines out of its buffer
_cache_logger.propagate = False


# --- roofline accounting v2 (round-5 VERDICT item 6) ---------------------
# XLA's own cost model (compiled.cost_analysis()) supplies flops; its
# bytes-accessed counts a scan body ONCE, and round 4's trip-count
# multiply of WHOLE-program bytes over-counted VMEM-resident state
# (utilization "1.4-1.6" — unfalsifiable). v2 makes both axes honest:
#
# * bytes = program-level bytes (once) + an ANALYTIC per-trip loop model
#   supplied by each leg: scan carries round-trip HBM every iteration
#   (write + read), streamed xs rows are read once, and — the dominant
#   term for the LMM engine — the drift cumsum is a FUSION BARRIER, so
#   its [libors, factors, paths] operand and result materialize to HBM
#   (the Pallas kernels exist precisely to delete this term).
# * wall splits into measured tunnel RTT (cached min of tiny reads) and
#   device wall = wall - rtt; achieved rates use the device wall.
# * compute peak for the bound label is the VPU f32 peak (these are
#   elementwise f32 Monte-Carlo kernels, not bf16 MXU matmuls):
#   8 sublanes x 128 lanes x 4 SIMD units x 2 flops x 0.94 GHz = 7.7
#   TFLOP/s. XLA counts a transcendental as one flop, so mfu stays a
#   LOWER bound; mfu_vs_bf16_peak is kept for cross-round trend only.

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_VPU_F32_TFLOPS = 7.7
V5E_PEAK_HBM_GBS = 819.0
TUNNEL_RTT_S = 0.030            # static fallback; _measured_rtt is used

_RTT_CACHE: dict = {}


def _measured_rtt() -> float:
    """Measured per-call tunnel floor: min over 7 tiny device->host
    reads of a committed array (dispatch + completion + transfer)."""
    import jax
    import jax.numpy as jnp

    key = jax.default_backend()
    if key not in _RTT_CACHE:
        x = (jnp.zeros((8,), jnp.float32) + 1.0)
        x.block_until_ready()
        import numpy as _np

        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _np.asarray(x + 1.0)
            ts.append(time.perf_counter() - t0)
        _RTT_CACHE[key] = min(ts)
    return _RTT_CACHE[key]


def _xla_cost(jitted, *args, **kwargs):
    """flops / bytes-accessed of a jitted program via AOT lowering; None
    when the backend or a custom call (Pallas) hides them."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        d = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(d.get("flops", 0.0))
        bytes_ = float(d.get("bytes accessed", 0.0))
        if flops <= 0.0 and bytes_ <= 0.0:
            return None
        return {"flops": flops, "bytes_accessed": bytes_}
    except Exception:
        return None


def _roofline(cost, wall_s, flops_override=None, trip_count=1,
              loop_bytes_per_trip=None):
    """Achieved rates + bound label for one leg (v2 — see the block
    comment above). ``flops_override`` lets a leg supply an analytic
    count when XLA's is unavailable (Pallas). ``trip_count``: XLA's
    cost model counts a while/scan body ONCE (measured: identical flops
    for 10- and 100-step scans), so scan-dominated programs pass their
    iteration count; flops multiply by it. ``loop_bytes_per_trip``: the
    leg's analytic per-iteration HBM traffic (carry round trips +
    streamed xs + fusion-barrier intermediates) — bytes are then
    program-level bytes (ONCE) + trips x this model, falsifiable and
    never above peak by construction error. Without a loop model,
    program-level bytes are reported unscaled as an explicit lower
    bound."""
    if cost is None and flops_override is None:
        return None
    flops = flops_override if flops_override is not None else cost["flops"]
    flops *= trip_count
    rtt = _measured_rtt()
    device_s = max(wall_s - rtt, 1e-5)
    # a wall at/under the RTT floor leaves no resolvable device time:
    # achieved rates would be meaningless division noise
    floor_hit = wall_s <= rtt * 1.08 or device_s < 2e-3
    if loop_bytes_per_trip is not None:
        bytes_ = ((cost["bytes_accessed"] if cost else 0.0)
                  + float(loop_bytes_per_trip) * trip_count)
        bytes_kind = "program_once_plus_loop_model"
    elif cost:
        bytes_ = cost["bytes_accessed"]
        bytes_kind = "program_once_lower_bound"
    else:
        bytes_ = None
        bytes_kind = None
    out = {"flops": flops, "trip_count": trip_count,
           "wall_s": round(wall_s, 5),
           "rtt_s": round(rtt, 5),
           "device_wall_s": round(device_s, 5)}
    if flops and not floor_hit:
        tflops = flops / device_s / 1e12
        out["achieved_tflops"] = round(tflops, 3)
        out["mfu_vs_vpu_f32_peak"] = round(
            tflops / V5E_PEAK_VPU_F32_TFLOPS, 5)
        out["mfu_vs_bf16_peak"] = round(tflops / V5E_PEAK_BF16_TFLOPS, 5)
    if bytes_:
        out["bytes_accessed"] = bytes_
        out["bytes_model"] = bytes_kind
        if not floor_hit:
            gbs = bytes_ / device_s / 1e9
            out["achieved_hbm_gbs"] = round(gbs, 2)
            out["hbm_utilization"] = round(gbs / V5E_PEAK_HBM_GBS, 4)
    # bound label against the DEVICE wall: rtt when the wall sits at the
    # tunnel floor OR both chip-time estimates are small next to it;
    # otherwise whichever estimate dominates, with measured headroom
    # (1 - t/device — how far off the roofline the leg actually runs)
    t_mem = (bytes_ / (V5E_PEAK_HBM_GBS * 1e9)) if bytes_ else 0.0
    t_cmp = flops / (V5E_PEAK_VPU_F32_TFLOPS * 1e12) if flops else 0.0
    if floor_hit or (max(t_mem, t_cmp) < 0.5 * device_s
                     and wall_s < 2.2 * rtt):
        out["bound"] = "rtt"
        if floor_hit:
            out["note_rates"] = ("wall at the tunnel RTT floor: no "
                                 "resolvable device time, rates omitted")
    elif t_mem >= t_cmp:
        out["bound"] = "hbm"
        out["hbm_headroom"] = round(1.0 - min(t_mem / device_s, 1.0), 3)
    else:
        out["bound"] = "compute"
        out["compute_headroom"] = round(1.0 - min(t_cmp / device_s, 1.0), 3)
    return out



def _lmm_engine_loop_bytes(n_libors: int, num_factors: int, paths: int,
                           injected_factors: int = 0) -> float:
    """Per-scan-trip HBM traffic model of the LMM engine (roofline v2):
    carry round trips (L [n, paths] f32 + N, V [paths] f64, write+read)
    + the drift cumsum's fusion-barrier intermediates ([n, F, paths]
    operand and result, write+read each) + streamed injected-increment
    rows. The Pallas kernels keep all of this VMEM-resident — deleting
    the barrier term is exactly why they are 1.7-3x faster and now
    carry the production calibration path (roofline acted on)."""
    carry = 2 * 4 * n_libors * paths + 2 * 8 * 2 * paths
    barrier = 4 * 4 * n_libors * num_factors * paths
    xs = injected_factors * 4 * paths
    return float(carry + barrier + xs)


def _warm_concurrently(legs):
    """Compile-warm independent programs in parallel threads (the remote
    compile service handles concurrent requests; measured 35.5 s vs 497 s
    serial for four fresh programs). Exceptions are captured and re-raised
    on the caller thread — a silently dead warm leg would shift its
    compile cost (or its error) into the timed region."""
    import threading

    errors = []

    def run(f):
        try:
            f()
        except Exception as exc:  # noqa: BLE001 - re-raised below
            errors.append(exc)

    threads = [threading.Thread(target=run, args=(f,)) for f in legs]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if errors:
        raise errors[0]


# finmath CPU baseline interpolated to 100k paths from README.md:242,254
# (364.42 s @ 81,920 paths, 719.33 s @ 163,840 paths, linear in paths).
REF_CPU_AT_100K_S = 364.42 + (719.33 - 364.42) * (100_000 - 81_920) / (163_840 - 81_920)
REF_GPU_S = 49.46  # GTX 1080 at 81,920 paths, README.md:243


def bench_lmm_atm_calibration():
    import numpy as np

    import jax

    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

    t0 = time.perf_counter()
    # residuals at the full 100k paths; the LM Jacobian (which only steers
    # the step) on a 5k-path subsample — standard inexact-Jacobian LM,
    # identical converged quality (measured: same 3 iterations, same
    # rms_dev 7.62e-5, mean_dev 1.3e-6 vs 8.8e-7 at 10k; wall 1.21 s vs
    # 1.63 s). Fused scan mode: the calibration converges in ~3 LM
    # iterations, so the one-time compile dominates cold start — the
    # fused program compiles 6.3 s vs up to 466 s (segmented) over this
    # remote-compile tunnel for ~25% warm-runtime cost.
    setup = build_atm_calibration(num_paths=100_000, num_factors=1,
                                  seed=31415, jacobian_paths=5_000,
                                  scan_mode="fused")
    # round 5: the full-path residual sweep runs on the Pallas kernel
    # backend (identical Threefry paths — the backend replicates the
    # engine's stream); the reduced-path jacfwd Jacobian and the engine-
    # oracle quality reporting are unchanged
    from finmath_tpu.models.lmm.kernel_backend import ATMKernelCalibration

    kb = ATMKernelCalibration(setup.engine)
    build_s = time.perf_counter() - t0
    _aot_setup = setup.load_aot()   # skip tracing+lowering when exported
    _aot_kb = kb.load_programs()
    aot_loaded = _aot_setup and _aot_kb

    # one-time compilation, untimed (see module docstring for why); the
    # independent programs compile concurrently
    p0 = setup.covariance.initial_parameters
    analytic = setup.analytic_engine  # build the lazy property ON the main
    # thread: two threads racing the getattr-then-assign would warm a
    # discarded instance and push its compile into the timed region
    t0 = time.perf_counter()
    _warm_concurrently([
        lambda: kb.residuals(p0),
        lambda: setup.engine.implied_vols(p0),   # deviations oracle
        lambda: (setup.jacobian_engine or setup.engine).jacobian(p0),
        lambda: analytic.residuals(p0),
        lambda: analytic.jacobian(p0),
    ])
    compile_s = time.perf_counter() - t0

    # the timed region is the complete two-stage calibration procedure:
    # analytic-approximation pre-calibration (no Monte Carlo) to warm-start
    # the Monte-Carlo Levenberg-Marquardt; quality is measured on the
    # full-resolution MC engine exactly as before
    # best of two complete timed calibrations (the same min-of-reps
    # methodology as every other leg): a one-off remote-service stall
    # inside the single timed region was observed to turn 0.6 s into
    # 6.9 s — the procedure itself is deterministic, so the min is the
    # honest steady-state figure
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        result = setup.calibrate(max_iterations=60, accuracy=1e-7,
                                 warm_start="analytic", residual_backend=kb)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)

    dev = setup.deviations(result.parameters)
    if not _aot_setup:
        setup.export_aot()          # untimed; next process skips lowering
    if not _aot_kb:
        kb.export_programs()
    return {
        "metric": "lmm_atm_swaption_calibration_100k_paths_wall",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(REF_CPU_AT_100K_S / wall, 2),
        "detail": {
            "paths": 100_000,
            "aot_programs": "loaded" if aot_loaded else "exported",
            "backend": "pallas kernel residuals + 5k-path jacfwd Jacobian",
            "products": len(setup.products),
            "parameters": int(setup.covariance.n_params),
            "iterations": result.iterations,
            "warm_start": "analytic",
            "rms_error": float(result.rms_error),
            "mean_deviation": float(np.mean(dev)),
            "rms_deviation": float(np.sqrt(np.mean(dev**2))),
            "build_s": round(build_s, 3),
            "compile_s": round(compile_s, 3),
            "reference_cpu_100k_s": round(REF_CPU_AT_100K_S, 2),
            "reference_gpu_81920_s": REF_GPU_S,
            "vs_reference_gpu": round(REF_GPU_S / wall, 2),
            "device": str(jax.devices()[0]),
        },
    }


def bench_lmm_atm_calibration_1m():
    """Scale row (round-5 VERDICT item 9): the full ATM calibration at
    1,000,000 paths — 10x the headline, 12x the reference's largest
    published path count. Same procedure as the headline (analytic warm
    start, kernel-backend full-path residuals, 5k-path jacfwd Jacobian);
    the reference CPU comparison extrapolates its published walls
    linearly in paths (its own observed scaling, README.md:254-255)."""
    import numpy as np

    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.kernel_backend import ATMKernelCalibration

    setup = build_atm_calibration(num_paths=1_000_000, num_factors=1,
                                  seed=31415, jacobian_paths=5_000,
                                  scan_mode="fused")
    kb = ATMKernelCalibration(setup.engine)
    _aot_kb = kb.load_programs()
    p0 = setup.covariance.initial_parameters
    analytic = setup.analytic_engine
    t0 = time.perf_counter()
    _warm_concurrently([
        lambda: kb.residuals(p0),
        lambda: setup.engine.implied_vols(p0),
        lambda: (setup.jacobian_engine or setup.engine).jacobian(p0),
        lambda: analytic.residuals(p0),
        lambda: analytic.jacobian(p0),
    ])
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(2):      # min of 2 complete runs (headline methodology)
        t0 = time.perf_counter()
        result = setup.calibrate(max_iterations=60, accuracy=1e-7,
                                 warm_start="analytic", residual_backend=kb)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    dev = setup.deviations(result.parameters)
    if not _aot_kb:
        kb.export_programs()
    ref_cpu = REF_CPU_AT_100K_S * 10.0     # linear in paths
    return {
        "paths": 1_000_000,
        "backend": "pallas kernel residuals + 5k-path jacfwd Jacobian",
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 3),
        "iterations": result.iterations,
        "rms_deviation": float(np.sqrt(np.mean(dev ** 2))),
        "mean_deviation": float(np.mean(dev)),
        "reference_cpu_extrapolated_s": round(ref_cpu, 1),
        "vs_reference_cpu": round(ref_cpu / wall, 1),
        "scale_note": "10x the headline path count; reference CPU wall "
                      "extrapolated linearly from its published scaling",
    }


def bench_mc_black_scholes():
    """Secondary config: MC Black-Scholes 1M paths x 100 steps
    (reference: 0.09 s GPU / 4.0 s CPU, README.md:212-215). Reports both
    the XLA-scan pricer and the fused Pallas kernel."""
    import jax
    import jax.numpy as jnp

    from finmath_tpu.models.black_scholes import (_mc_bs_price_kernel,
                                                  mc_european_call_price)
    from finmath_tpu.ops.kernels import mc_european_call_price_pallas

    n_paths, n_steps = 1_000_000, 100
    args = (1.0, 0.05, 0.30, 1.0, 1.05)
    out = {}
    for name, fn in (("scan", mc_european_call_price),
                     ("pallas", mc_european_call_price_pallas)):
        fn(0, n_paths, n_steps, *args)  # compile
        times = []
        for seed in range(1, 4):
            t0 = time.perf_counter()
            price = fn(seed, n_paths, n_steps, *args)
            times.append(time.perf_counter() - t0)
        out[name] = {"wall_s": round(min(times), 5), "price": round(price, 6)}
    # roofline (round-3 VERDICT item 4): XLA cost model of the fused scan
    # program; the Pallas kernel computes the same math, so its row reuses
    # the flops count (its bytes differ — VMEM-resident, so less HBM).
    cost = _xla_cost(_mc_bs_price_kernel, jax.random.PRNGKey(1), n_paths,
                     n_steps, jnp.dtype(jnp.float32),
                     *(jnp.float64(a) for a in args))
    # loop model: the scan carry (log S, [paths] f32) round-trips HBM
    # each step; normals are Threefry on-chip
    out["roofline_scan"] = _roofline(cost, out["scan"]["wall_s"],
                                     trip_count=n_steps,
                                     loop_bytes_per_trip=8.0 * n_paths)
    if cost is not None:
        out["roofline_pallas"] = _roofline(
            None, out["pallas"]["wall_s"], flops_override=cost["flops"],
            trip_count=n_steps, loop_bytes_per_trip=0.0)
        out["roofline_pallas"]["note"] = (
            "flops from the equivalent XLA scan program (same math); "
            "bytes not comparable — the Pallas kernel keeps paths in VMEM")
    out["reference_gpu_s"] = 0.09
    out["reference_cpu_s"] = 4.00
    return out


def bench_stochvol_calibration(num_paths):
    """The reference's published benchmark (LIBORMarketModelCalibrationTest,
    README.md:240-257): stochastic-vol LMM smile calibration.
    Reference rows — 81,920 paths: CPU 364.42 s / GPU 49.46 s, RMS 0.198%;
    163,840 paths: CPU 719.33 s / GPU 51.70 s, RMS 0.480%. The reference
    divides the RMS by all 19 products although only 15 fit the 20Y grid
    (its valuation loop swallows the 4 failures but keeps the denominator),
    so rms19 is the comparable number; rms15 is the honest per-fitted-quote
    figure."""
    import numpy as np

    from finmath_tpu.models.lmm.benchmark_calibration import (
        build_benchmark_calibration,
    )

    # 409,600: BEYOND the reference's published table (it stops at
    # 163,840, README.md:254-255, where the GTX 1080's scaling had gone
    # flat) — CPU wall extrapolated linearly in paths, GPU wall and the
    # quality gate held at its largest published row (51.70 s, 0.480%):
    # the row exists to show the TPU curve still flattening where the
    # reference's stopped
    ref = {81_920: (364.42, 49.46, 0.00198),
           163_840: (719.33, 51.70, 0.00480),
           409_600: (719.33 * 409_600 / 163_840, 51.70, 0.00480)}[num_paths]

    # round-3: calibrate on the reference's OWN Brownian realization (the
    # bit-exact commons-math3 Mersenne stream its factory-injection tests
    # use) — wall AND fit are then same-paths comparable, not merely
    # same-seed-convention. Host stream generation is one-time setup,
    # excluded from the timed region like compilation.
    from finmath_tpu.models.lmm.kernel_backend import (
        StochVolKernelCalibration)

    setup = build_benchmark_calibration(num_paths=num_paths, seed=314151,
                                        brownian="finmath_mersenne")
    # round 5: the full-path hot loop (ranking + polish) runs on the
    # Pallas kernel backend over the SAME injected Mersenne realization;
    # gate/report quality stays on the engine oracle
    kb = StochVolKernelCalibration(setup.engine, [setup.engine._inc_np])
    # AOT program persistence (round 4, utils/aot.py): a previous
    # process's exported StableHLO skips tracing+lowering entirely;
    # load is best-effort and the artifacts are written back after the
    # timed region when absent (no short-circuit: both loads must run)
    _aot_setup = setup.load_aot()
    _aot_kb = kb.load_programs()
    aot_loaded = _aot_setup and _aot_kb
    # one-time compilation, untimed (same methodology as the headline);
    # the multistart's reduced-path sweep engine is warmed too. The
    # independent programs compile concurrently (see _warm_concurrently).
    p0 = setup.covariance.initial_parameters
    sweep = setup.sweep_engine()
    # stage 1's lognormal analytic pre-fit compiles its own jitted
    # programs; without this warm leg that compile (8-60 s through the
    # remote service) lands INSIDE the timed stage1_s (measured 21 s of
    # a 44.7 s wall in BENCH_r03's predecessor run)
    analytic = setup.analytic_engine()
    t0 = time.perf_counter()
    _warm_concurrently([
        lambda: kb.residuals(p0),
        lambda: kb.residuals_and_jacobian(p0),
        lambda: setup.engine.values(p0),  # rms19 targets go via values()
        lambda: setup.engine.implied_vols(p0),  # gate/polish rms19 path
        lambda: sweep.residuals(p0),
        lambda: sweep.jacobian(p0),
        lambda: analytic.residuals(p0),
        lambda: analytic.jacobian(p0),
    ])
    compile_s = time.perf_counter() - t0

    # wall = time for OUR full procedure to reach (at least) the reference's
    # published calibration quality — further starts are skipped once the
    # reference RMS is matched, like the reference stops at its LM optimum
    t0 = time.perf_counter()
    result = setup.calibrate_multistart(target_rms19=ref[2],
                                        kernel_backend=kb)
    wall = time.perf_counter() - t0
    dev = setup.deviations(result.parameters)
    rms15 = float(np.sqrt(np.mean(dev ** 2)))
    rms19 = float(np.sqrt(np.sum(dev ** 2) / 19))
    if not _aot_setup:
        setup.export_aot()           # untimed; next process skips lowering
    if not _aot_kb:
        kb.export_programs()
    return {
        "paths": num_paths,
        "aot_programs": "loaded" if aot_loaded else "exported",
        **({"scale_note": "beyond the reference's published table "
                          "(stops at 163,840): CPU extrapolated linearly, "
                          "GPU wall + quality gate held at its largest "
                          "published row"} if num_paths > 163_840 else {}),
        "brownian": "finmath_mersenne(314151) — the reference's exact realization",
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 3),
        "rms15": round(rms15, 6),
        "rms19": round(rms19, 6),
        "mean_deviation": round(float(np.mean(dev)), 6),
        "reference_cpu_s": ref[0],
        "reference_gpu_s": ref[1],
        "reference_rms19": ref[2],
        "vs_reference_cpu": round(ref[0] / wall, 2),
        "vs_reference_gpu": round(ref[1] / wall, 2),
        # per-stage timings + candidate counts so the row is
        # self-explaining (gate -> stage1 -> sweep -> rank -> polish)
        "stages": {k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in result.stages.items()},
        "history_rms": [round(h, 6) for h in result.history[:40]],
    }


def bench_stochvol_matched(paths=81_920, n_scramblings=3, n_restarts=4):
    """The matched-quality pursuit row: close the fit gap to the
    reference's published rms19 0.198% while staying far under its
    49.46 s wall (81,920 paths). At 409,600 paths (the scale attempt,
    reduced scrambling/restart counts) the same procedure reports its
    achieved fit honestly — in-sample adaptation is structurally weaker
    with 5x the paths, so the published-81,920-row fit level is NOT the
    expectation there; the wall/fit pair simply extends the curve.

    Round-5 procedure (pre-registered, fully timed): the calibration hot
    loop runs on the Pallas kernel backend (models/lmm/kernel_backend.py)
    — residuals are one multi-product VMEM-resident path sweep, the
    Jacobian is central finite differences under common random numbers
    batched into ONE kernel launch (measured 84 ms vs the scan engine's
    208 ms jacfwd, which also NaNs at the calibrated basin; the FD
    Jacobian does not and agrees to 2.4e-4 column-scaled elsewhere).
    Because realizations are a traced argument of one compiled program,
    the K independent Owen scramblings polish CONCURRENTLY (threads
    overlap the ~30 ms tunnel RTT), then 4 jittered trust-region
    restarts dig into the winner's sub-basins, also concurrent.

    Quality is reported on BOTH oracles: ``best_rms19`` is the
    f64-collection scan ENGINE's implied vols at the final parameters
    (the independent oracle — strongest claim), ``best_rms19_kernel``
    the kernel's own in-sample fit (the objective the optimizer saw;
    the reference's 0.198% is likewise its own engine's in-sample
    figure). The two differ by the chaotic-basin decorrelation envelope
    (~1e-4, BASELINE.md round-4 scope). All candidates are ranked by
    the engine oracle at the end (a handful of 38 ms calls). Sobol
    generation is one-time setup excluded from the wall like
    compilation (same methodology as the Mersenne rows)."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from scipy.optimize import least_squares

    from finmath_tpu.models.lmm.benchmark_calibration import (
        CURATED_BASINS, build_benchmark_calibration)
    from finmath_tpu.models.lmm.kernel_backend import (
        StochVolKernelCalibration)
    from finmath_tpu.models.qmc import sobol_brownian_increments

    PATHS, K = paths, n_scramblings
    setup = build_benchmark_calibration(num_paths=PATHS, brownian="sobol",
                                        seed=0)
    eng = setup.engine
    incs = [eng._inc_np] + [np.asarray(sobol_brownian_increments(
        np.full(40, 0.5), eng._n_rng_factors, PATHS, seed=k))
        for k in range(1, K)]
    kb = StochVolKernelCalibration(eng, incs)
    aot_loaded = kb.load_programs()
    aot_engine = eng.load_programs()

    p0 = setup.covariance.initial_parameters
    t0 = time.perf_counter()
    _warm_concurrently([
        lambda: kb.residuals(p0),
        lambda: kb.residuals_and_jacobian(p0),
        lambda: eng.implied_vols(p0),     # final-ranking oracle
    ])
    compile_s = time.perf_counter() - t0

    W = np.asarray(kb._weight)

    def rms19_k(r):
        return float(np.sqrt(np.sum((r / W) ** 2) / 19.0))

    def rms19_engine(x):
        d = setup.deviations(x)
        return float(np.sqrt(np.sum(d ** 2) / 19))

    def make_funs(k):
        def fun(x):
            return np.nan_to_num(kb.residuals(x, k), nan=1e3, posinf=1e3,
                                 neginf=-1e3)

        def jac(x):
            return np.nan_to_num(kb.jacobian(x, k), nan=0.0, posinf=0.0,
                                 neginf=0.0)
        return fun, jac

    starts = [np.asarray(c) for c in CURATED_BASINS[:2]]

    def chain(k):
        """Score the shipped basins, two-stage trust-region polish on
        realization k (all evaluations on the kernel backend)."""
        fun, jac = make_funs(k)
        scores = [float(np.sqrt(np.mean(fun(x) ** 2))) for x in starts]
        cand = starts[int(np.argmin(scores))]
        r1 = least_squares(fun, cand, jac=jac, method="trf", x_scale="jac",
                           max_nfev=40)
        r2 = least_squares(fun, r1.x, jac=jac, method="trf", x_scale="jac",
                           max_nfev=250, ftol=1e-15, xtol=1e-15, gtol=1e-15)
        e1, e2 = rms19_k(fun(r1.x)), rms19_k(fun(r2.x))
        x, e = (r1.x, e1) if e1 <= e2 else (r2.x, e2)
        return x, e, int(r1.nfev) + int(r2.nfev)

    t_all = time.perf_counter()
    with ThreadPoolExecutor(max_workers=K) as ex:
        chains = list(ex.map(chain, range(K)))
    per_seed = [round(e, 6) for _, e, _ in chains]
    best_k = int(np.argmin([e for _, e, _ in chains]))
    best_x, best_kernel = chains[best_k][0], chains[best_k][1]
    phase_a_s = time.perf_counter() - t_all

    # deepening stage: jittered trust-region restarts around the incumbent
    # on the BEST realization — the sharp basin has nearby sub-basins the
    # single polish trajectory misses; independent, so concurrent
    fun_b, jac_b = make_funs(best_k)
    rng = np.random.default_rng(11)
    jit_starts = [best_x * (1 + rng.normal(0.0, 0.01, best_x.shape[0]))
                  for _ in range(n_restarts)]

    def restart(w):
        rr = least_squares(fun_b, w, jac=jac_b, method="trf", x_scale="jac",
                           max_nfev=120, ftol=1e-15, xtol=1e-15)
        return rr.x, rms19_k(fun_b(rr.x))

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=max(n_restarts, 1)) as ex:
        restarts = list(ex.map(restart, jit_starts))
    per_restart = [round(e, 6) for _, e in restarts]
    # final ranking by the independent engine oracle over every candidate
    # produced on the best realization (incumbent + restarts)
    candidates = [(best_x, best_kernel)] + list(restarts)
    ranked = [(rms19_engine(x), ek, x) for x, ek in candidates]
    ranked.sort(key=lambda t: t[0])
    best_rms, best_kernel, best_x = ranked[0]
    phase_b_s = time.perf_counter() - t0
    wall = time.perf_counter() - t_all
    if not aot_loaded:
        kb.export_programs()         # untimed; next process skips lowering
    if not aot_engine:
        eng.export_programs()
    return {
        "paths": PATHS,
        "aot_programs": "loaded" if (aot_loaded and aot_engine)
                        else "exported",
        "backend": "pallas kernel (residuals + CRN central-FD Jacobian)",
        "best_realization": best_k,
        "per_restart_rms19_kernel": per_restart,
        "estimator": "scrambled Sobol + Brownian bridge "
                     f"({K} independent Owen scramblings, concurrent + "
                     f"{n_restarts} concurrent jittered restarts on the "
                     "best)",
        "wall_s": round(wall, 3),
        "phase_chains_s": round(phase_a_s, 3),
        "phase_restarts_s": round(phase_b_s, 3),
        "compile_s": round(compile_s, 3),
        "best_rms19": round(best_rms, 6),
        "best_rms19_kernel": round(best_kernel, 6),
        "quality_oracle": "scan engine f64-collection implied vols at the "
                          "kernel-calibrated optimum (independent oracle); "
                          "best_rms19_kernel is the kernel's own in-sample "
                          "fit",
        "per_realization_rms19_kernel": per_seed,
        "reference_gpu_s": REF_GPU_S,
        "reference_rms19": 0.00198,
        "vs_reference_gpu_wall": round(REF_GPU_S / wall, 2),
        "fit_vs_reference": round(best_rms / 0.00198, 3),
        "same_realization_floor": "0.2195% on the reference's own "
                                  "bit-exact paths (BENCHMARKS.md)",
    }


def bench_brownian_generation():
    """Reference BrownianMotionTest (README.md:199-204): 100 repetitions of
    generating 1M paths x 10 time steps of Brownian increments and checking
    their moments. Reference: all-GPU 2.325 s, GPU-RNG/host 4.633 s,
    host MT19937 49.057 s, java LCG 65.558 s. Device leg runs the full 100
    reps; the host MT19937 leg (native C++ MT + AS241 ICDF) runs 10 reps
    and reports the honest x10 extrapolation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_paths, n_steps, reps = 1_000_000, 10, 100
    dt = 0.1

    @jax.jit
    def gen_and_stats(key):
        z = jax.random.normal(key, (n_steps, n_paths), dtype=jnp.float32)
        inc = z * np.float32(np.sqrt(dt))
        mean = jnp.mean(inc.astype(jnp.float64), axis=1)
        var = jnp.var(inc.astype(jnp.float64), axis=1)
        return mean, var

    mean, var = gen_and_stats(jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(mean)
    t0 = time.perf_counter()
    for rep in range(reps):
        mean, var = gen_and_stats(jax.random.PRNGKey(rep))
    jax.block_until_ready(mean)
    device_s = time.perf_counter() - t0
    max_var_err = float(jnp.max(jnp.abs(var - dt)))

    out = {
        "reps": reps, "paths": n_paths, "steps": n_steps,
        "device_threefry_s": round(device_s, 3),
        "device_max_var_err": round(max_var_err, 6),
        "reference_all_gpu_s": 2.325,
        "reference_cpu_mersenne_s": 49.057,
        "vs_reference_gpu": round(2.325 / device_s, 2),
    }
    try:
        from finmath_tpu.native.host_rng import HostRandomGenerator, native_available
        if native_available():
            host_reps = 10
            t0 = time.perf_counter()
            for rep in range(host_reps):
                g = HostRandomGenerator(1234 + rep, "mersenne")
                g.normals(n_paths * n_steps, stddev=float(np.sqrt(dt)))
            host_s = (time.perf_counter() - t0) * (reps / host_reps)
            out["host_mersenne_100rep_s"] = round(host_s, 3)
            out["host_mersenne_measured_reps"] = host_reps
    except Exception as exc:
        out["host_mersenne_error"] = str(exc)
    return out


def bench_eager_ops():
    """BASELINE config 1: RandomVariable elementwise ops + getAverage on a
    100k-path vector, eager object API (per-op dispatch — the reference's
    RandomVariableGPUTest oracle-sweep shape), TPU vs the CPU float
    oracle."""
    import numpy as np

    from finmath_tpu.ops.random_variable import RandomVariableTPU
    from finmath_tpu.ops.random_variable_float import RandomVariableFloat

    import jax.numpy as jnp

    vals = np.random.default_rng(0).uniform(0.5, 2.0, 100_000).astype(np.float32)

    def rv_chain(x):
        # a representative elementwise chain (reduction applied by caller)
        y = x.mult(1.01).add(0.02).exp().log().discount(x, 0.5)
        return y.add_product(x, x).cap(3.0).floor(0.1).sqrt()

    def chain(x):
        return rv_chain(x).get_average()

    from finmath_tpu.ops.lazy import RandomVariableTPULazy, averages

    out = {}
    for name, cls in (("tpu_eager", RandomVariableTPU),
                      ("tpu_lazy", RandomVariableTPULazy),
                      ("cpu_float", RandomVariableFloat)):
        x = cls(0.0, vals)
        chain(x)  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            avg = chain(x)
            ts.append(time.perf_counter() - t0)
        out[name] = {"wall_ms": round(float(min(ts)) * 1000, 3),
                     "avg": float(avg)}

    # lazy-eager batching across K independent chains: ONE flush for all
    # pending work (a portfolio-wide dispatch) — with the recorded-op API
    # the number of device round trips is decoupled from the op count,
    # restoring the reference's eager break-even story on TPU
    # (/root/reference/README.md:24-28) structurally instead of per-op.
    # The leaves are device-resident (uploaded once, like any production
    # portfolio's path ensembles) — constructing from a host array inside
    # the timed region would measure K uploads, not the flush.
    K = 8
    leaves = [RandomVariableTPULazy(0.0, vals) for _ in range(K)]
    for leaf in leaves:
        leaf.cache()
    def lazy_batched():
        return averages(*[rv_chain(leaf) for leaf in leaves])
    lazy_batched()  # warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        avgs = lazy_batched()
        ts.append(time.perf_counter() - t0)
    out["tpu_lazy_8chains_1flush"] = {
        "wall_ms": round(float(min(ts)) * 1000, 3),
        "per_chain_ms": round(float(min(ts)) * 1000 / K, 3),
        "avg": float(avgs[0])}

    # the framework's prescribed usage: the same chain under jit — ONE
    # dispatch, XLA fuses the elementwise ops (eager per-op dispatch over
    # this TPU's remote tunnel pays ~10 ms RPC per op, the same
    # launch-overhead disease the reference's tiny CUDA kernels had)
    import jax

    @jax.jit
    def fused(v):
        y = rv_chain(RandomVariableTPU(0.0, v))
        # get_average() casts to a host float, which cannot trace — apply
        # the same f64-accumulated mean to the raw realizations
        return jnp.mean(y._values.astype(jnp.float64))

    fused(vals)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        avg = float(fused(vals))
        ts.append(time.perf_counter() - t0)
    out["tpu_jit_fused"] = {"wall_ms": round(float(min(ts)) * 1000, 3),
                            "avg": avg}
    # the eager break-even story (reference README.md:24-28: CPU/GPU
    # break even ~5k paths over PCIe): through this WAN tunnel the
    # lazy-eager wall is FLAT at the ~30 ms dispatch RTT while the CPU
    # float oracle scales linearly with paths — same structure, larger
    # fixed cost, crossover ~600k paths (with a locally-attached TPU the
    # RTT is sub-ms and the crossover returns to the reference's regime)
    sweep = {}
    for paths in (500_000, 1_000_000, 4_000_000):
        big = np.random.default_rng(1).uniform(
            0.5, 2.0, paths).astype(np.float32)
        row = {}
        for name, cls in (("tpu_lazy", RandomVariableTPULazy),
                          ("cpu_float", RandomVariableFloat)):
            x = cls(0.0, big)
            if name == "tpu_lazy":
                x.cache()
            chain(x)  # warm
            ts2 = []
            for _ in range(3):
                t0 = time.perf_counter()
                chain(x)
                ts2.append(time.perf_counter() - t0)
            row[name] = round(float(min(ts2)) * 1000, 3)
        row["tpu_vs_cpu"] = round(row["cpu_float"] / row["tpu_lazy"], 2)
        sweep[str(paths)] = row
    out["break_even_sweep"] = sweep

    out["agree"] = bool(
        abs(out["tpu_eager"]["avg"] - out["cpu_float"]["avg"]) < 1e-5)
    out["note"] = ("this TPU is reached through a remote tunnel adding "
                   "~30 ms dispatch RTT per call; on-chip compute for the "
                   "fused chain is sub-ms (see the 1M-path BS rows where "
                   "compute amortizes the RTT)")
    return out


def bench_bermudan():
    """BASELINE config 3: Longstaff-Schwartz Bermudan swaption via
    on-device conditional-expectation regression (the reference CANNOT run
    this on GPU — its choose() returns null)."""
    import numpy as np

    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.bermudan import (BermudanSwaption,
                                                 BermudanSwaptionPricer)

    setup = build_atm_calibration(num_paths=100_000, num_factors=1)
    product = BermudanSwaption(exercise_indices=(4, 8, 12, 16),
                               maturity_index=20, strike=0.01)
    pricer = BermudanSwaptionPricer(setup.model, product, 100_000, 1)
    p0 = setup.covariance.initial_parameters
    v = pricer.get_value(p0)  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        v = pricer.get_value(p0)
        ts.append(time.perf_counter() - t0)
    return {"paths": 100_000, "exercises": 4, "wall_ms": round(min(ts) * 1000, 2),
            "value": round(v, 6)}


def bench_lmm_pricer_kernels():
    """VMEM-resident Pallas path kernels vs the XLA scan engine, pricing a
    single swaption at 409,600 paths (the fast-revaluation path of a
    calibrated model). Two configurations: the one-factor ATM model
    (ops/lmm_kernel.py) and the 5-factor stoch-vol benchmark model
    (ops/lmm_stochvol_kernel.py)."""
    import numpy as np

    import jax.numpy as jnp

    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.benchmark_calibration import (
        build_benchmark_calibration,
    )
    from finmath_tpu.models.lmm.model import LMMValuationEngine, SwaptionProduct
    from finmath_tpu.ops.lmm_kernel import lmm_swaption_kernel
    from finmath_tpu.ops.lmm_stochvol_kernel import lmm_stochvol_swaption_kernel

    PATHS = 409_600
    out = {"paths": PATHS}

    def best_of(f, reps=5):
        f()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            v = float(f())  # float() blocks on the async device result
            ts.append(time.perf_counter() - t0)
        return v, min(ts)

    # ---- one-factor ATM configuration (5Y x 10Y ATM swaption) ----------
    a = build_atm_calibration(num_paths=256, num_factors=1)
    cov = a.model.covariance
    p0 = np.asarray(cov.initial_parameters)
    prep = cov.prepare(jnp.asarray(p0))
    vol_table = np.asarray(cov.vol_table(prep)) * np.asarray(
        cov.factor_matrix(prep))[:, 0][None, :]
    e, periods = 10, 20
    strike = next(p.strike for p in a.products
                  if p.exercise_index == e and p.num_periods == periods)
    eng1 = LMMValuationEngine(
        a.model, [SwaptionProduct(e, periods, strike, 0.0, value_unit="VALUE")],
        PATHS, 1, 99, scan_mode="segmented")
    v_eng, t_eng = best_of(lambda: eng1.values(p0)[0])
    v_k, t_k = best_of(lambda: lmm_swaption_kernel(
        7, PATHS, a.model.num_libors, e, periods, e, vol_table,
        np.asarray(a.model.initial_forwards), np.asarray(a.model.deltas),
        0.5, strike))
    cost1 = _xla_cost(eng1._values_fn, jnp.asarray(p0, dtype=jnp.float64))
    out["atm_1f"] = {
        "engine_ms": round(t_eng * 1000, 2), "kernel_ms": round(t_k * 1000, 2),
        "speedup": round(t_eng / t_k, 2),
        "rel_dev": round(abs(v_k - v_eng) / abs(v_eng), 5),
        "roofline_engine": _roofline(
            cost1, t_eng, trip_count=e,
            loop_bytes_per_trip=_lmm_engine_loop_bytes(
                a.model.num_libors, 1, PATHS)),
        "roofline_kernel": None if cost1 is None else dict(
            _roofline(None, t_k, flops_override=cost1["flops"],
                      trip_count=e, loop_bytes_per_trip=0.0),
            note="flops from the equivalent XLA engine program; state "
                 "VMEM-resident (loop bytes ~ 0)"),
    }

    # ---- stoch-vol benchmark configuration (5 factors + V process) -----
    b = build_benchmark_calibration(num_paths=256)
    cov = b.model.covariance
    p0 = np.asarray(cov.initial_parameters)
    prep = cov.prepare(jnp.asarray(p0))
    vol_table = np.asarray(cov.vol_table(prep))
    R = np.asarray(cov.factor_matrix(prep))
    nu, rho = [float(np.asarray(x)) for x in cov.stoch_vol_params(prep)]
    strike = next(p.strike for p in b.products if p.exercise_index == e
                  and abs(p.strike - b.engine._fwd0[
                      b.engine.products.index(p)]) < 1e-10)
    eng5 = LMMValuationEngine(
        b.model, [SwaptionProduct(e, periods, strike, 0.0, value_unit="VALUE")],
        PATHS, R.shape[1], 99, scan_mode="segmented")
    v_eng, t_eng = best_of(lambda: eng5.values(p0)[0])
    v_k, t_k = best_of(lambda: lmm_stochvol_swaption_kernel(
        7, PATHS, b.model.num_libors, R.shape[1], e, periods, e, vol_table,
        R, np.asarray(b.model.initial_forwards), np.asarray(b.model.deltas),
        0.5, strike, float(p0[5]), nu, rho))

    # same-normals validation at FULL size (round-2 VERDICT item 5): ONE
    # shared standard-normal block drives both the Pallas kernel and the
    # scan engine (injected-increments mode), so the comparison is pure
    # arithmetic — the former 0.33-0.38% bound was Monte-Carlo noise
    # between two different PRNG streams masking any tile-level bug
    # smaller than that; this asserts agreement at the f32-arithmetic
    # level on all 409,600 paths.
    from finmath_tpu.ops.lmm_stochvol_kernel import (
        lmm_stochvol_swaption_kernel_with_normals)

    F1 = R.shape[1] + 1
    z = np.random.default_rng(123).standard_normal(
        (e * F1, PATHS)).astype(np.float32)
    inc_sn = (z.reshape(e, F1, PATHS) * np.float32(np.sqrt(0.5)))
    eng_sn = LMMValuationEngine(
        b.model, [SwaptionProduct(e, periods, strike, 0.0, value_unit="VALUE")],
        PATHS, R.shape[1], 99, scan_mode="segmented", increments=inc_sn)
    v_eng_sn = float(eng_sn.values(p0)[0])
    v_k_sn = float(lmm_stochvol_swaption_kernel_with_normals(
        jnp.asarray(z), b.model.num_libors, R.shape[1], e, periods,
        vol_table, R, np.asarray(b.model.initial_forwards),
        np.asarray(b.model.deltas), 0.5, strike, float(p0[5]), nu, rho))
    same_normals_rel = abs(v_k_sn - v_eng_sn) / abs(v_eng_sn)

    cost5 = _xla_cost(eng5._values_fn, jnp.asarray(p0, dtype=jnp.float64))
    out["stochvol_5f"] = {
        "engine_ms": round(t_eng * 1000, 2), "kernel_ms": round(t_k * 1000, 2),
        "speedup": round(t_eng / t_k, 2),
        "rel_dev": round(abs(v_k - v_eng) / abs(v_eng), 5),
        "same_normals_rel_dev": float(same_normals_rel),
        "same_normals_pass": bool(same_normals_rel < 1e-5),
        "roofline_engine": _roofline(
            cost5, t_eng, trip_count=e,
            loop_bytes_per_trip=_lmm_engine_loop_bytes(
                b.model.num_libors, R.shape[1], PATHS)),
        "roofline_kernel": None if cost5 is None else dict(
            _roofline(None, t_k, flops_override=cost5["flops"],
                      trip_count=e, loop_bytes_per_trip=0.0),
            note="flops from the equivalent XLA engine program; state "
                 "VMEM-resident (loop bytes ~ 0)"),
    }
    return out


def bench_aad_greeks():
    """BASELINE secondary config: AAD greeks, both framework-native routes
    — (1) reverse-mode jax.grad through the fused 1M-path MC pricer (the
    TPU-first replacement for finmath's AAD) and (2) the finmath-style
    eager tape (RandomVariableDifferentiable, priority-30 dispatch), each
    cross-checked against the closed-form Black-Scholes delta/vega."""
    import math

    import numpy as np

    import jax
    import jax.numpy as jnp

    from finmath_tpu.models.black_scholes import _mc_bs_price_kernel
    from finmath_tpu.ops.aad import RandomVariableDifferentiable
    from finmath_tpu.ops.random_variable import RandomVariableTPU

    S0, R, SIGMA, T, K = 1.0, 0.05, 0.30, 1.0, 1.05
    N_PATHS, N_STEPS = 1_000_000, 100

    def price(s0, sigma):
        return _mc_bs_price_kernel(jax.random.PRNGKey(7), N_PATHS, N_STEPS,
                                   jnp.dtype(jnp.float32), s0,
                                   jnp.float64(R), sigma, jnp.float64(T),
                                   jnp.float64(K))

    grad_fn = jax.jit(jax.grad(price, argnums=(0, 1)))
    args = (jnp.float64(S0), jnp.float64(SIGMA))
    jax.block_until_ready(grad_fn(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d, v = jax.block_until_ready(grad_fn(*args))
        ts.append(time.perf_counter() - t0)

    d1 = (math.log(S0 / K) + (R + SIGMA ** 2 / 2) * T) / (SIGMA * math.sqrt(T))
    delta_an = 0.5 * (1.0 + math.erf(d1 / math.sqrt(2.0)))
    vega_an = S0 * math.exp(-d1 * d1 / 2) / math.sqrt(2 * math.pi) * math.sqrt(T)

    out = {
        "jax_grad_1m": {"wall_ms": round(min(ts) * 1000, 2),
                        "delta": round(float(d), 6), "vega": round(float(v), 6)},
        "analytic": {"delta": round(delta_an, 6), "vega": round(vega_an, 6)},
    }

    # eager tape AAD: pathwise delta on a pre-drawn terminal growth factor
    # (the reference's RandomVariableDifferentiableAAD usage shape; the
    # per-op dispatch pays the tunnel RTT, like eager_ops_100k)
    z = np.random.default_rng(0).standard_normal(500_000).astype(np.float32)
    growth = RandomVariableTPU(0.0, np.exp(
        (R - SIGMA ** 2 / 2) * T + SIGMA * math.sqrt(T) * z).astype(np.float32))

    def tape_delta():
        s0 = RandomVariableDifferentiable(RandomVariableTPU(0.0, S0))
        val = s0.mult(growth).sub(K).floor(0.0).mult(
            math.exp(-R * T)).average()
        return val.get_gradient([s0])[s0.get_id()].double_value()

    tape_delta()  # warm
    ts2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        dt = tape_delta()
        ts2.append(time.perf_counter() - t0)
    out["tape_aad_500k"] = {"wall_ms": round(min(ts2) * 1000, 2),
                            "delta": round(float(dt), 6)}
    out["agree"] = bool(abs(float(d) - delta_an) < 0.02
                        and abs(float(v) - vega_an) < 0.05
                        and abs(float(dt) - delta_an) < 0.02)

    # (3) LMM bucketed delta ladder: ONE reverse-mode pass through the
    # full 40y Euler sweep (measure drift, payoff, numeraire) yields
    # dV/dL_i(0) for all 80 forward-curve buckets of the equal-weight
    # 144-swaption ATM portfolio at 100k paths. finmath's tape would
    # record ~100k device ops for this; here it is one fused XLA program
    # with jax.checkpoint bounding the adjoint's live memory.
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

    a = build_atm_calibration(num_paths=100_000, num_factors=1, seed=3141)
    pa = np.asarray(a.covariance.initial_parameters)
    t0 = time.perf_counter()
    _, g0 = a.engine.forward_deltas(pa)
    cold = time.perf_counter() - t0
    ts3 = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, g0 = a.engine.forward_deltas(pa)
        ts3.append(time.perf_counter() - t0)
    out["lmm_delta_ladder_atm_100k"] = {
        "cold_s": round(cold, 1),
        "warm_ms": round(min(ts3) * 1000, 1),
        "buckets": int(g0.shape[0]),
        "finite": bool(np.all(np.isfinite(g0)) and np.any(g0 != 0.0)),
    }
    return out


def bench_parity_1e6():
    """North-star parity on the real device: f32 production prices vs the
    f64 oracle mode on the identical Brownian stream (1e-6 relative,
    BASELINE.md; full test coverage in tests/test_price_parity.py)."""
    import jax.numpy as jnp
    import numpy as np

    from finmath_tpu.models.black_scholes import mc_european_call_price
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

    _t_bs = time.perf_counter()
    args = (7, 1_000_000, 100, 1.0, 0.05, 0.30, 1.0, 1.05)
    p32 = mc_european_call_price(*args)
    _bs32_s = round(time.perf_counter() - _t_bs, 1)
    _t_bs = time.perf_counter()
    p64 = mc_european_call_price(*args, dtype=jnp.float64)
    _bs64_s = round(time.perf_counter() - _t_bs, 1)
    bs_rel = abs(p32 - p64) / abs(p64)

    # round 5 restructure (VERDICT item 3: 245 s / 289 cache misses ->
    # target < 60 s / < 30): every diagnostic engine is built in FUSED
    # scan mode (one-shot consumers — ~4x cheaper lowering/compiles than
    # the calibration loops' segmented mode), pathwise_values is ONE
    # jitted program per engine instead of an eager per-op dispatch
    # storm, only the programs the leg actually uses are AOT'd (targeted
    # values/pathwise artifacts, not whole engine sets), and every
    # TPU-side computation warms concurrently.
    _phases = {"bs32_s": _bs32_s, "bs64_s": _bs64_s}
    _t = time.perf_counter()
    s32 = build_atm_calibration(num_paths=10_000, num_factors=1, seed=31415,
                                scan_mode="fused")
    s64 = build_atm_calibration(num_paths=10_000, num_factors=1, seed=31415,
                                dtype=jnp.float64, scan_mode="fused")
    p0 = s32.covariance.initial_parameters

    from finmath_tpu.models.lmm.benchmark_calibration import (
        CURATED_BASINS, build_benchmark_calibration)

    # parity at the CALIBRATED stoch-vol optimum (round-3 addition): the
    # basin |nu_eff|~0.7, blend~1.4 is where f32 is actually stressed —
    # overflow clamps and heavy tails live there, not at the initial point
    sv32 = build_benchmark_calibration(num_paths=16_384, seed=314151,
                                       scan_mode="fused")
    sv64 = build_benchmark_calibration(num_paths=16_384, seed=314151,
                                       dtype=jnp.float64, scan_mode="fused")
    sv64h = build_benchmark_calibration(
        num_paths=16_384, seed=314151, dtype=jnp.float64,
        brownian="finmath_mersenne", scan_mode="fused")
    big32 = build_benchmark_calibration(num_paths=409_600, seed=314151,
                                        scan_mode="fused")
    big64 = build_benchmark_calibration(num_paths=409_600, seed=314151,
                                        dtype=jnp.float64, scan_mode="fused")
    p_cal = CURATED_BASINS[0]

    # targeted AOT (the CPU-f64 oracle stays on the jit path — artifacts
    # pin the TPU platform and the loader refuses them from a CPU
    # context); misses are exported after the results are in
    _aot_values = [s32.engine, s64.engine, sv32.engine, sv64.engine,
                   big32.engine, big64.engine]
    _aot_pathwise = [sv32.engine, sv64.engine, sv64h.engine]
    _phases["build_s"] = round(time.perf_counter() - _t, 1)
    _t = time.perf_counter()
    # artifact deserialization is ~1.8 s each (9 artifacts): load them
    # concurrently like the compile warms
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=9) as _ex:
        _vres = list(_ex.map(
            lambda e: (e, e.load_program_by_name("values")), _aot_values))
        _pres = list(_ex.map(
            lambda e: (e, e.load_pathwise_program()), _aot_pathwise))
    _missing_values = [e for e, ok in _vres if not ok]
    _missing_pathwise = [e for e, ok in _pres if not ok]
    _phases["aot_load_s"] = round(time.perf_counter() - _t, 1)
    _phases["aot_missing"] = len(_missing_values) + len(_missing_pathwise)
    _t = time.perf_counter()

    # ONE concurrent warm phase stands up every TPU program (and lets
    # the remote compile service parallelize the cold misses)
    _warm_concurrently([
        lambda: s32.engine.values(p0),
        lambda: s64.engine.values(p0),
        lambda: sv32.engine.values(p_cal),
        lambda: sv64.engine.values(p_cal),
        lambda: big32.engine.values(p_cal),
        lambda: big64.engine.values(p_cal),
        lambda: sv32.engine.pathwise_values(p_cal),
        lambda: sv64.engine.pathwise_values(p_cal),
        lambda: sv64h.engine.pathwise_values(p_cal),
    ])

    _phases["warm_s"] = round(time.perf_counter() - _t, 1)
    _t = time.perf_counter()
    v32 = np.asarray(s32.engine.values(p0))
    v64 = np.asarray(s64.engine.values(p0))
    rel = np.abs(v32 - v64) / np.abs(v64)

    # STRICT tier (round-3 VERDICT item 3, contract in BASELINE.md): the
    # f64-evolution engine — the documented strict-parity production mode
    # for stressed stoch-vol regimes — against an INDEPENDENT
    # double-precision CPU evaluation of the bit-identical injected
    # finmath-Mersenne realization, UNTRIMMED: the calibrated basin's
    # chaos (measured amplification ~1e7) blows any f32 rounding to O(1)
    # on tail paths, but amplifies the ~1e-16 cross-platform f64
    # rounding only to ~1e-9 — every path stays glued.
    import jax

    strict = {}
    try:
        ct = np.asarray(sv64h.engine.pathwise_values(p_cal),
                        dtype=np.float64)
        _phases["strict_tpu_s"] = round(time.perf_counter() - _t, 1)
        _t = time.perf_counter()
        with jax.default_device(jax.devices("cpu")[0]):
            sv64c = build_benchmark_calibration(
                num_paths=16_384, seed=314151, dtype=jnp.float64,
                brownian="finmath_mersenne", scan_mode="fused")
            cc = np.asarray(sv64c.engine.pathwise_values(p_cal),
                            dtype=np.float64)
        wt, wc = ct.mean(axis=1), cc.mean(axis=1)
        strict_rel = np.abs(wt - wc) / np.abs(wc)
        # measured (round 4): TPU float64 is SOFTWARE-EMULATED, not
        # bit-IEEE — its transcendentals differ from the CPU's
        # correctly-rounded ones by ~1e-10, which the basin's ~1e7
        # Lyapunov amplification blows past the 1e-3 gap threshold on
        # EVERY path over the 40 steps. This is the evidence block that
        # closes the strict-parity question (BASELINE.md): pathwise
        # cross-implementation agreement at a chaotic basin is
        # impossible at ANY finite precision that differs between the
        # two programs (the reference's CPU-vs-GPU floats included);
        # the contract at this basin is the SAME-PLATFORM trimmed +
        # bounded-decorrelation criterion asserted above.
        _phases["strict_cpu_s"] = round(time.perf_counter() - _t, 1)
        _t = time.perf_counter()
        gap64 = np.abs(ct - cc).max(axis=0)
        strict = {
            "untrimmed_max_rel_dev": float(strict_rel.max()),
            "max_pathwise_gap": float(np.abs(ct - cc).max()),
            "paths_beyond_1e3_gap": int((gap64 >= 1e-3).sum()),
            "median_pathwise_gap": float(np.median(gap64)),
            "oracle": "XLA:CPU float64, same injected Mersenne stream",
            "conclusion": "evidence block, not a contract: emulated-f64"
                          " TPU transcendentals x ~1e7 amplification"
                          " decorrelate every path from the CPU f64"
                          " oracle — see BASELINE.md round-4 scope",
        }
        # cost of the strict mode on chip: f32 vs f64 values() wall at
        # 16k and 409k paths, best of 3 warm (all engines pre-warmed in
        # the concurrent phase)
        for paths, engines in (
                (16_384, {"f32": sv32.engine, "f64": sv64.engine}),
                (409_600, {"f32": big32.engine, "f64": big64.engine})):
            walls = {}
            for name, eng in engines.items():
                # already warmed in the concurrent phase
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    eng.values(p_cal)
                    ts.append(time.perf_counter() - t0)
                walls[name] = min(ts)
            strict[f"cost_{paths}"] = {
                "f32_ms": round(walls["f32"] * 1000, 2),
                "f64_ms": round(walls["f64"] * 1000, 2),
                "f64_over_f32": round(walls["f64"] / walls["f32"], 2)}
    except Exception as exc:  # noqa: BLE001 — strict tier must not kill the leg
        strict["error"] = str(exc)
    _phases["cost_s"] = round(time.perf_counter() - _t, 1)
    _t = time.perf_counter()
    for _e in _missing_values:
        try:
            _e.export_program("values")   # next process skips lowering
        except Exception:  # noqa: BLE001 — persistence is best-effort
            pass
    for _e in _missing_pathwise:
        try:
            _e.export_pathwise_program()
        except Exception:  # noqa: BLE001 — persistence is best-effort
            pass
    # At the calibrated basin (|nu_eff|~0.7, blend~1.4) a handful of
    # heavy-tail paths DYNAMICALLY DECORRELATE between f32 and f64: the
    # SDE's local Lyapunov amplification (lam ~ vol*L*sqrt(V) compounding
    # over 40 steps) blows one ULP of storage rounding up to O(1), so
    # their two trajectories are independent samples of the same huge-vol
    # path law — an intrinsic property of ANY f32 path storage (the
    # reference's GPU floats included), not of the arithmetic. Measured
    # (BENCHMARKS.md round-3 parity study): 6 of 16,384 paths carry the
    # ENTIRE f32-vs-f64 deviation; their per-path contribution gaps are
    # O(1) while the 7th-largest gap is 5e-6 — five orders of magnitude
    # of separation, so the 1e-3 splitting threshold is unambiguous
    # (XLA:CPU rounds differently and decorrelates 26/8,192 — the count
    # is backend-dependent, the structure is not). The parity contract
    # therefore asserts (a) strict 1e-6 agreement on every
    # non-decorrelated path's mean AND (b) that decorrelation stays a
    # <0.5% tail phenomenon.
    _phases["aot_export_s"] = round(time.perf_counter() - _t, 1)
    _t = time.perf_counter()
    c32 = np.asarray(sv32.engine.pathwise_values(p_cal), dtype=np.float64)
    c64 = np.asarray(sv64.engine.pathwise_values(p_cal), dtype=np.float64)
    w32, w64 = c32.mean(axis=1), c64.mean(axis=1)
    rel_cal = np.abs(w32 - w64) / np.abs(w64)
    path_gap = np.abs(c32 - c64).max(axis=0)          # worst product per path
    keep = path_gap < 1e-3
    rel_trim = (np.abs(c32[:, keep].mean(axis=1) - c64[:, keep].mean(axis=1))
                / np.abs(c64[:, keep].mean(axis=1)))
    n_decorr = int((~keep).sum())
    _phases["trim_s"] = round(time.perf_counter() - _t, 1)

    # STRICT criterion (round-2 VERDICT item 2): max < 1e-6 everywhere —
    # enabled by the compensated-f32 bond-ratio cumprod + f64 collection
    # (engine collect_dtype), which removes the payoff-cancellation
    # amplification that round 2's 4.8e-6 tail came from.
    return {
        "bs_mc_rel_dev": float(bs_rel),
        "lmm_swaptions_max_rel_dev": float(rel.max()),
        "lmm_swaptions_median_rel_dev": float(np.median(rel)),
        "lmm_swaptions_max_abs_dev": float(np.max(np.abs(v32 - v64))),
        "stochvol_calibrated_max_rel_dev": float(rel_cal.max()),
        "stochvol_calibrated_median_rel_dev": float(np.median(rel_cal)),
        "stochvol_calibrated_trimmed_max_rel_dev": float(rel_trim.max()),
        "stochvol_decorrelated_paths": n_decorr,
        "stochvol_decorrelated_fraction": float(n_decorr / c32.shape[1]),
        "contract": 1e-6,
        # formally re-scoped contract (BASELINE.md round-4):
        # pass_strict_f32 is the UNTRIMMED f32 criterion at the chaotic
        # calibrated basin — honestly false for ANY f32 evolution (the
        # reference's floats included); the documented contract there is
        # the same-platform trimmed criterion + bounded decorrelation
        # tail. cross_platform_f64_study (below) is the measurement that
        # closes the question: even emulated-f64-vs-CPU-f64 decorrelates
        # every path at this basin, so no stricter cross-implementation
        # contract exists at any precision.
        "pass_strict_f32": bool(rel_cal.max() < 1e-6),
        "pass": bool(bs_rel < 1e-6 and rel.max() < 1e-6
                     and rel_trim.max() < 1e-6
                     and n_decorr < 5e-3 * c32.shape[1]),
        "cross_platform_f64_study": strict,
        "cpu_oracle_tests": "tests/test_price_parity.py asserts <1e-6 per product",
        "phases": _phases,
    }


def bench_exposure():
    """Counterparty exposure + CVA (round-3 capabilities-plus layer, like
    QMC): the full 19-date EE/ENE/PFE profile of a 10Y par payer swap at
    50,000 paths in ONE device dispatch — the exposure collector rides
    the pricer's fused simulation instead of re-simulating per
    observation date (finmath-lib's ExposureEstimator re-values the
    product per date through the eager op stack)."""
    import numpy as np

    from finmath_tpu.models.curves import par_swap_rate
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.models.lmm.exposure import SwapExposureEngine

    paths = 50_000
    setup = build_atm_calibration(num_paths=paths, num_factors=1)
    model = setup.model
    p0 = setup.covariance.initial_parameters
    par = par_swap_rate(model.forward_curve, model.discount_curve,
                        model.tenor_times[4:21])
    eng = SwapExposureEngine(model, first_index=4, last_index=20,
                             strike=float(par), num_paths=paths,
                             num_factors=1, quantiles=(0.95, 0.99))
    t0 = time.perf_counter()
    prof = eng.profile(p0)  # compile + run
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        prof = eng.profile(p0)
        ts.append(time.perf_counter() - t0)
    martingale_err = float(np.max(np.abs(
        prof.forward_value - eng.analytic_forward_values())))

    # netting set: 20 mixed trades — the per-date annuity work becomes ONE
    # [20, 80] @ [80, paths] MXU matmul; netted + standalone EE in the
    # same pass
    from finmath_tpu.models.lmm.exposure import (NettingSetExposureEngine,
                                                 SwapTrade)

    rng = np.random.default_rng(7)
    trades = []
    for k in range(20):
        first = int(rng.integers(1, 20))
        last = int(rng.integers(first + 1, 40))
        trades.append(SwapTrade(first, last,
                                float(rng.uniform(0.0, 0.02)),
                                payer=bool(k % 2),
                                notional=float(rng.uniform(0.5, 2.0))))
    nset = NettingSetExposureEngine(model, trades, num_paths=paths,
                                    num_factors=1)
    t0 = time.perf_counter()
    nprof = nset.profile(p0)
    n_compile_s = time.perf_counter() - t0
    ts_n = []
    for _ in range(5):
        t0 = time.perf_counter()
        nprof = nset.profile(p0)
        ts_n.append(time.perf_counter() - t0)
    n_mart = float(np.max(np.abs(
        nprof.forward_value - nset.analytic_forward_values())))
    return {
        "paths": paths,
        "observation_dates": len(prof.times),
        "wall_ms": round(float(min(ts)) * 1000, 3),
        "compile_s": round(compile_s, 3),
        "peak_ee": float(np.max(prof.ee)),
        "peak_pfe99": float(prof.max_pfe(0.99)),
        "cva_100bp": float(eng.cva(p0, hazard_rate=0.01)),
        "martingale_max_abs_err": martingale_err,
        "martingale_pass": bool(martingale_err < 1e-3),
        "netting_set_20_trades": {
            "observation_dates": len(nprof.times),
            "wall_ms": round(float(min(ts_n)) * 1000, 3),
            "compile_s": round(n_compile_s, 3),
            "peak_netted_ee": float(np.max(nprof.ee)),
            "peak_standalone_ee": float(np.max(nprof.ee_standalone)),
            "peak_netting_benefit": float(np.max(nprof.netting_benefit)),
            "martingale_max_abs_err": n_mart,
            "martingale_pass": bool(n_mart < 2e-3),
        },
        "cva_delta_ladder": bench_cva_deltas(eng, p0),
    }


def bench_cva_deltas(eng, p0):
    """dCVA/dL0 for every forward-curve bucket in ONE reverse-mode pass
    through simulation + exposure (adjoint-safe log-form bond scan; the
    finding that motivated it is documented in BENCHMARKS.md). The
    matured-bucket gradients double as an on-chip adjoint-integrity
    gate: they are mathematically zero, so any cross-bucket VJP leak
    (the failure mode fixed in round 3) trips ``tail_exact_zero``."""
    import numpy as np

    t0 = time.perf_counter()
    cva, grad = eng.cva_forward_deltas(p0, hazard_rate=0.012)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        cva, grad = eng.cva_forward_deltas(p0, hazard_rate=0.012)
        ts.append(time.perf_counter() - t0)
    tail = np.abs(grad[eng.trades[0].last_index:])
    return {
        "buckets": int(grad.shape[0]),
        "wall_ms": round(float(min(ts)) * 1000, 3),
        "compile_s": round(compile_s, 3),
        "cva_120bp": float(cva),
        "finite": bool(np.all(np.isfinite(grad))),
        "tail_exact_zero": bool(float(tail.max(initial=0.0)) == 0.0),
    }


def bench_model_zoo():
    """Round-3 model families: one fused pricing program each, validated
    against its analytic oracle in the same leg (warm wall = best of 3
    after an untimed compile call). Sizes chosen to keep the leg's
    cold-compile budget ~1-2 min."""
    import numpy as np

    from finmath_tpu.models import (
        BermudanOption, HestonParams, HullWhiteModel, HullWhiteSimulation,
        MertonParams, VarianceGammaParams, crr_american_price,
        heston_characteristic_prices, mc_heston_european_prices,
        mc_merton_european_prices, mc_vg_european_prices,
        merton_series_prices, vg_analytic_prices)
    from finmath_tpu.models.black_scholes import (
        BlackScholesModel, MonteCarloBlackScholesModel)
    from finmath_tpu.models.curves import DiscountCurve
    from finmath_tpu.models.time_discretization import TimeDiscretization

    ks = np.array([80.0, 90.0, 100.0, 110.0, 125.0])
    out = {}

    def best_of(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            ts.append(time.perf_counter() - t0)
        return r, round(min(ts) * 1000, 2)

    hp = HestonParams(100.0, 0.03, v0=0.04, kappa=1.5, theta=0.05,
                      xi=0.6, rho=-0.7)
    h_ref = heston_characteristic_prices(hp, 1.5, ks)
    (px, fwd, _), ms = best_of(lambda: mc_heston_european_prices(
        hp, 1.5, ks, num_paths=1_000_000, num_steps=64, scheme="qe",
        antithetic=True))
    out["heston_qe_1m_x64"] = {
        "wall_ms": ms, "max_rel_dev_vs_cf": float(
            np.abs(px - h_ref).max() / h_ref.min()),
        "fwd_err": round(fwd - 100.0, 4)}

    mp = MertonParams(100.0, 0.05, 0.2, jump_intensity=0.6,
                      jump_size_mean=-0.15, jump_size_std=0.25)
    m_ref = merton_series_prices(mp, 1.0, ks)
    (px, _), ms = best_of(lambda: mc_merton_european_prices(
        mp, 1.0, ks, num_paths=1_000_000, num_steps=16, antithetic=True))
    out["merton_1m_x16"] = {
        "wall_ms": ms, "max_rel_dev_vs_series": float(
            np.abs(px - m_ref).max() / m_ref.min())}

    vp = VarianceGammaParams(100.0, 0.04, sigma=0.18, theta=-0.14,
                             nu=0.25)
    v_ref = vg_analytic_prices(vp, 1.25, ks)
    (px, _), ms = best_of(lambda: mc_vg_european_prices(
        vp, 1.25, ks, num_paths=1_000_000, num_steps=16, antithetic=True))
    out["variance_gamma_1m_x16"] = {
        "wall_ms": ms, "max_rel_dev_vs_fourier": float(
            np.abs(px - v_ref).max() / v_ref.min())}

    pil = np.array([0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0, 15.0, 20.0])
    z = np.array([0.010, 0.012, 0.015, 0.017, 0.020, 0.022, 0.024,
                  0.025, 0.0255])
    hw = HullWhiteModel(DiscountCurve(list(pil), list(np.exp(-z * pil))),
                        0.12, [0.010, 0.014, 0.008],
                        vol_times=[0.0, 2.0, 5.0])
    sim = HullWhiteSimulation(
        hw, TimeDiscretization(initial=0.0, num_steps=20, step=0.5),
        num_paths=1_000_000, seed=7, antithetic=True)
    pts = [3.0, 3.5, 4.0, 4.5, 5.0]
    an = hw.swaption(2.0, pts, 0.02)
    mc, ms = best_of(lambda: sim.mc_swaption_price(2.0, pts, 0.02))
    out["hull_white_swaption_1m"] = {
        "wall_ms": ms, "rel_dev_vs_jamshidian": float((mc - an) / an),
        "curve_fit_rel_10y": float(
            sim.mc_bond_price(10.0) / float(hw.df(10.0)) - 1.0)}

    bs_sim = MonteCarloBlackScholesModel(
        TimeDiscretization(initial=0.0, num_steps=50, step=0.02),
        1_000_000, BlackScholesModel(100.0, 0.05, 0.3), seed=77)
    opt = BermudanOption([i * 0.02 for i in range(1, 51)], 110.0,
                         is_call=False)
    crr = crr_american_price(100.0, 0.05, 0.3, 1.0, 110.0,
                             is_call=False, num_steps=4000)
    (v, err), ms = best_of(lambda: opt.get_value_and_error(bs_sim))
    out["american_ls_put_1m_x50"] = {
        "wall_ms": ms, "value": round(v, 5), "stderr": round(err, 5),
        "crr_oracle": round(crr, 5)}
    return out


def bench_exotics():
    """Round-3 exotic product layer: one fused program per product over
    shared path facades (one 1M x 250 BS simulation serves all four
    path-dependent products; one 3-asset 1M simulation serves the
    rainbows). Each leg reports warm wall + oracle deviation."""
    import numpy as np

    from finmath_tpu.models import (
        AsianOption, BarrierOption, BasketOption, DigitalOption,
        ExchangeOption, LookbackOption, RainbowOption, SABRParams,
        mc_sabr_implied_vols)
    from finmath_tpu.models.analytic import (
        barrier_option_value, digital_option_value)
    from finmath_tpu.models.black_scholes import (
        BlackScholesModel, MonteCarloBlackScholesModel)
    from finmath_tpu.models.multi_asset import (
        MonteCarloMultiAssetBlackScholesModel, MultiAssetBlackScholesModel,
        margrabe_exchange_value, stulz_rainbow_value)
    from finmath_tpu.models.sabr import sabr_lognormal_implied_volatility
    from finmath_tpu.models.time_discretization import TimeDiscretization

    out = {}
    s0, r, sig, t = 100.0, 0.05, 0.3, 1.0
    n = 250
    td = TimeDiscretization(initial=0.0, num_steps=n, step=t / n)
    sim = MonteCarloBlackScholesModel(td, 1_000_000,
                                      BlackScholesModel(s0, r, sig),
                                      seed=42)

    def best_of(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn()
            ts.append(time.perf_counter() - t0)
        return res, round(min(ts) * 1000, 2)

    (v, e), ms = best_of(
        lambda: DigitalOption(t, 105.0).get_value_and_error(sim))
    out["digital_1m"] = {
        "wall_ms": ms,
        "dev_vs_cf": v - digital_option_value(s0, r, sig, t, 105.0),
        "stderr": e}

    dates = [round((i + 1) * t / 12 / (t / n)) * (t / n)
             for i in range(12)]
    (vp, ep), _ = best_of(
        lambda: AsianOption(dates, 100.0).get_value_and_error(sim))
    (vc, ec), ms = best_of(lambda: AsianOption(
        dates, 100.0, control_variate="geometric")
        .get_value_and_error(sim))
    out["asian_cv_1m_x12"] = {
        "wall_ms": ms, "stderr_reduction": round(ep / ec, 1),
        "plain_vs_cv_dev": vp - vc}

    (v, e), ms = best_of(lambda: BarrierOption(
        t, 100.0, 130.0, "up-out", monitoring="bridge")
        .get_value_and_error(sim))
    out["barrier_bridge_1m_x250"] = {
        "wall_ms": ms, "stderr": e,
        "dev_vs_continuous_cf": v - barrier_option_value(
            s0, r, sig, t, 100.0, 130.0, "up-out")}

    (v, e), ms = best_of(
        lambda: LookbackOption(t, "floating-call")
        .get_value_and_error(sim))
    out["lookback_1m_x250"] = {"wall_ms": ms, "value": round(v, 4),
                               "stderr": e}

    # portfolio-batched pricing (round-5 VERDICT item 7): a 20-product
    # mixed book on the SAME 1M-path facade through price_portfolio —
    # every product's kernel dispatches asynchronously and ONE stacked
    # [20, 2] transfer carries the book back, vs 20 serial per-product
    # reads each paying the ~30 ms tunnel RTT floor
    from finmath_tpu.models import price_portfolio
    from finmath_tpu.models.black_scholes import EuropeanOption

    book = []
    for i in range(8):
        book.append(EuropeanOption(t, 85.0 + 5.0 * i, is_call=i % 2 == 0))
    book += [DigitalOption(t, 95.0 + 5.0 * i) for i in range(4)]
    book += [AsianOption(dates, 90.0 + 10.0 * i) for i in range(3)]
    book += [BarrierOption(t, 100.0, 125.0 + 10.0 * i, "up-out")
             for i in range(3)]
    book += [LookbackOption(t, "floating-call"),
             LookbackOption(t, "fixed-put", strike=100.0)]
    assert len(book) == 20
    port, ms_port = best_of(lambda: price_portfolio(sim, book))

    def serial_book():
        return [p.get_value_and_error(sim) for p in book]

    serial, ms_serial = best_of(serial_book)
    for (a, _), (b, _) in zip(port, serial):
        assert abs(a - b) < 1e-12, "portfolio path must equal per-product"
    out["portfolio_20_products_1m"] = {
        "wall_ms": ms_port,
        "serial_wall_ms": ms_serial,
        "speedup": round(ms_serial / ms_port, 2),
        "per_product_incremental_ms": round(
            (ms_port - out["digital_1m"]["wall_ms"]) / (len(book) - 1), 2),
        "note": "one stacked [20, 2] transfer vs 20 per-product reads",
    }

    s0v = [100.0, 95.0, 105.0]
    vols = [0.25, 0.35, 0.2]
    corr = [[1.0, 0.4, 0.2], [0.4, 1.0, 0.5], [0.2, 0.5, 1.0]]
    td3 = TimeDiscretization(initial=0.0, num_steps=30, step=1.5 / 30)
    sim3 = MonteCarloMultiAssetBlackScholesModel(
        td3, 1_000_000, MultiAssetBlackScholesModel(s0v, r, vols, corr),
        seed=11)
    (v, e), ms = best_of(
        lambda: ExchangeOption(1.5, 0, 1).get_value_and_error(sim3))
    out["exchange_1m"] = {
        "wall_ms": ms, "stderr": e,
        "dev_vs_margrabe": v - margrabe_exchange_value(
            s0v[0], s0v[1], vols[0], vols[1], 0.4, 1.5)}
    (v, e), ms = best_of(lambda: RainbowOption(
        1.5, 100.0, "call-on-min", asset_indices=[0, 1])
        .get_value_and_error(sim3))
    out["rainbow_min_1m"] = {
        "wall_ms": ms, "stderr": e,
        "dev_vs_stulz": v - stulz_rainbow_value(
            s0v[0], s0v[1], r, vols[0], vols[1], 0.4, 1.5, 100.0,
            "call-on-min")}
    (v, e), ms = best_of(lambda: BasketOption(
        1.5, [0.4, 0.3, 0.3], 100.0, control_variate="geometric")
        .get_value_and_error(sim3))
    out["basket_cv_1m"] = {"wall_ms": ms, "value": round(v, 4),
                           "stderr": e}

    p = SABRParams(alpha=0.035, beta=0.5, rho=-0.3, nu=0.4)
    ks = np.array([0.025, 0.03, 0.035])
    mc, ms = best_of(lambda: mc_sabr_implied_vols(
        p, 0.03, 2.0, ks, num_paths=1_000_000, num_steps=64, seed=5))
    hag = np.array([sabr_lognormal_implied_volatility(p, 0.03, k, 2.0)
                    for k in ks])
    out["sabr_smile_1m_x64"] = {
        "wall_ms": ms,
        "max_vol_dev_vs_hagan": float(np.abs(mc - hag).max())}

    from finmath_tpu.models.analytic import black_scholes_option_value
    from finmath_tpu.models.importance_sampling import (
        mc_european_price_importance_sampled)
    (vi, ei), ms = best_of(lambda: mc_european_price_importance_sampled(
        13, 1_000_000, s0, r, sig, t, 3.0 * s0))
    _, ep = mc_european_price_importance_sampled(
        13, 1_000_000, s0, r, sig, t, 3.0 * s0, drift_shift=0.0)
    out["importance_sampling_3x_1m"] = {
        "wall_ms": ms,
        "dev_vs_cf": vi - black_scholes_option_value(s0, r, sig, t,
                                                     3.0 * s0),
        "stderr_reduction": round(ep / ei, 1)}

    # Hull-White Bermudan swaption: fused LS vs the Crank-Nicolson PDE
    from finmath_tpu.models.curves import DiscountCurve
    from finmath_tpu.models.hedging import (
        DeltaHedgedPortfolio, VarianceSwap)
    from finmath_tpu.models.hull_white import (
        HullWhiteModel, HullWhiteSimulation)
    from finmath_tpu.models.hw_bermudan import (
        BermudanSwaption, hw_bermudan_swaption_pde)

    ts = np.arange(0.5, 20.1, 0.5)
    hw = HullWhiteModel(DiscountCurve(list(ts), list(np.exp(-0.022 * ts))),
                        0.1, [0.01])
    ex = [2.0 + 0.5 * i for i in range(10)]
    hwtd = TimeDiscretization(initial=0.0, num_steps=14, step=0.5)
    hws = HullWhiteSimulation(hw, hwtd, num_paths=1_000_000, seed=11,
                              antithetic=True)
    prod = BermudanSwaption(ex, 7.0, 0.025)
    (v, e), ms = best_of(lambda: prod.get_value_and_error(hws))
    pde = hw_bermudan_swaption_pde(hw, ex, 7.0, 0.025, nx=601,
                                   steps_per_year=100)
    out["hw_bermudan_ls_1m_x10"] = {
        "wall_ms": ms, "stderr": e, "pde_oracle": round(pde, 6),
        "dev_sigma": round((v - pde) / e, 2)}

    res, ms = best_of(lambda: DeltaHedgedPortfolio(t, 105.0)
                      .simulate(sim))
    out["delta_hedge_1m_x250"] = {
        "wall_ms": ms,
        "replication_dev": res["value"] - res["premium"],
        "hedge_error_mean": res["hedge_error_mean"],
        "hedge_error_std": res["hedge_error_std"]}
    k, ms = best_of(lambda: VarianceSwap(t).fair_strike(sim))
    out["variance_swap_1m_x250"] = {
        "wall_ms": ms, "fair_strike": k,
        "dev_vs_sigma2": k - sig * sig}
    return out


def bench_slv():
    """Heston-SLV particle method: the leverage function E[V|S] is
    regressed INSIDE the Euler scan (models/slv.py), so calibration and
    simulation are one fused program. Full vol-of-vol (xi=0.8,
    rho=-0.7) against a skewed SSVI surface; quality = the Black-implied
    smile of the MC vanillas vs the input surface (Gyongy round trip)."""
    import math

    import numpy as np

    from finmath_tpu.models.analytic import black_implied_volatility
    from finmath_tpu.models.heston import HestonParams
    from finmath_tpu.models.local_vol import (SSVISurface,
                                              european_call_values)
    from finmath_tpu.models.slv import (HestonSLVModel,
                                        MonteCarloHestonSLVModel)
    from finmath_tpu.models.time_discretization import TimeDiscretization

    surf = SSVISurface(sigma0=0.22, sigma_inf=0.20, tau=2.0, rho=-0.65,
                       eta=0.6, gamma=0.4)
    hp = HestonParams(100.0, 0.03, v0=0.04, kappa=1.5, theta=0.06,
                      xi=0.8, rho=-0.7)
    td = TimeDiscretization(initial=0.0, num_steps=100, step=0.01)
    model = HestonSLVModel(hp, surf, td)   # shared => jit cache is warm
    strikes = [85.0, 100.0, 115.0]
    seed = iter(range(21, 40))

    def run():
        mc = MonteCarloHestonSLVModel(td, 409_600, model,
                                      seed=next(seed))
        return european_call_values(mc, strikes, [1.0])

    run()                                  # untimed compile
    ts, out = [], None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        ts.append(time.perf_counter() - t0)
    fwd, df = 100.0 * math.exp(0.03), math.exp(-0.03)
    devs = []
    for j, k in enumerate(strikes):
        iv_mc = black_implied_volatility(fwd, k, 1.0, out[0, j, 0] / df)
        iv_in = float(surf.implied_volatility(
            np.log(k / fwd), 1.0))
        devs.append(iv_mc - iv_in)
    # roofline of the particle scan itself (the in-scan E[V|S] regression
    # is where the MXU moments live)
    import jax.numpy as jnp

    from finmath_tpu.models.process import _euler_scan_jit

    mc = MonteCarloHestonSLVModel(td, 409_600, model, seed=99)
    cost = _xla_cost(
        _euler_scan_jit, model, model.initial_state(409_600),
        mc.brownian.increments,
        jnp.asarray(td.get_step_sizes()))
    return {"paths": 409_600, "steps": 100,
            "wall_ms": round(min(ts) * 1000, 1),
            "max_abs_iv_dev": round(float(np.abs(devs).max()), 5),
            "iv_devs": [round(d, 5) for d in devs],
            # loop model: (S, V) carry round trips + increment rows +
            # the in-scan E[V|S] hat-basis regression's fusion-barrier
            # intermediates (~6 path-length f32 arrays, write+read)
            "roofline_scan": _roofline(
                cost, min(ts), trip_count=100,
                loop_bytes_per_trip=48.0 * 409_600)}


def bench_credit_wwr():
    """Wrong-way-risk CVA (models/credit.py): joint Hull-White x CIR++
    scan at 500,000 paths x 20 semiannual dates x 4 CIR substeps with
    rho=0.6, ONE packed transfer (CVA, independent control, 20 bucket
    contributions, 20 survival diagnostics). finmath-lib's exposure/CVA
    examples stop at deterministic hazards; this is the doubly-stochastic
    extension."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from finmath_tpu.models.credit import (CIRPPIntensityModel,
                                           WrongWayRiskCVAEngine, _wwr_scan,
                                           bootstrap_survival_curve,
                                           par_swap_rate)
    from finmath_tpu.models.curves import DiscountCurve
    from finmath_tpu.models.hull_white import HullWhiteModel

    t_grid = np.arange(0.0, 31.0)
    dc = DiscountCurve(t_grid, np.exp(-0.03 * t_grid))
    curve = bootstrap_survival_curve(
        dc, [1.0, 3.0, 5.0, 7.0, 10.0],
        [0.006, 0.009, 0.012, 0.014, 0.016], recovery=0.4)
    intensity = CIRPPIntensityModel(curve, kappa=0.5, theta=0.015,
                                    sigma=0.08, y0=0.01)
    hw = HullWhiteModel(dc, mean_reversion=0.1, volatility=0.01)
    pay = np.arange(1, 21) * 0.5
    k = par_swap_rate(dc, pay)
    eng = WrongWayRiskCVAEngine(hw, intensity, pay, k, num_paths=500_000,
                                correlation=0.6, recovery=0.4, seed=31,
                                antithetic=True, substeps=4)
    t0 = time.perf_counter()
    res = eng.compute()                    # compile + run
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = eng.compute()
        ts.append(time.perf_counter() - t0)
    wall = min(ts)
    surv_err = float(np.max(np.abs(
        res.expected_survival
        - curve.get_survival_probability(res.observation_times))))
    im = eng.intensity
    cost = _xla_cost(_wwr_scan, jax.random.PRNGKey(eng.seed),
                     eng.num_paths, eng.substeps, eng.antithetic,
                     *eng._consts, jnp.float64(eng.rho),
                     jnp.float64(im.kappa), jnp.float64(im.theta),
                     jnp.float64(im.sigma), jnp.float64(im.y0))
    return {
        "paths": 500_000, "observation_dates": 20, "cir_substeps": 4,
        "wall_ms": round(wall * 1000, 2), "compile_s": round(compile_s, 3),
        "cva_bp": round(1e4 * res.cva, 3),
        "cva_independent_bp": round(1e4 * res.cva_independent, 3),
        "wwr_ratio": round(res.wwr_ratio, 4),
        "survival_diag_max_err": surv_err,
        "contributions_sum_to_cva": bool(
            abs(float(np.sum(res.contributions)) - res.cva)
            < 1e-12 + 1e-9 * abs(res.cva)),
        # trips = the 20 scan steps (the 4 CIR substeps are unrolled
        # INSIDE the body, which XLA's cost model already counts); loop
        # model: (x, Y, y) f32 + Lambda f64 carry round trips + the
        # per-step (x, Y, Lambda) history writes
        "roofline_scan": _roofline(
            cost, wall, trip_count=20,
            loop_bytes_per_trip=56.0 * eng.num_paths),
    }


def bench_portfolio_credit():
    """One-factor Gaussian-copula portfolio credit (models/
    portfolio_credit.py): 125 names x 1,000,000 paths, 10 horizons of
    (tranche ETL + stderr + 3 kth-to-default probabilities) from ONE
    latent matrix in one packed transfer; MC validated against the exact
    Andersen-Sidenius-Basu recursion in-leg."""
    import numpy as np

    from finmath_tpu.models.credit import SurvivalCurve
    from finmath_tpu.models.portfolio_credit import (GaussianCopulaPortfolio,
                                                     GaussianCopulaSimulation)

    rng = np.random.default_rng(1)
    hazards = rng.uniform(0.005, 0.06, 125)
    betas = rng.uniform(0.3, 0.7, 125)
    pf = GaussianCopulaPortfolio(
        [SurvivalCurve([0.0], [h]) for h in hazards], betas=betas,
        recoveries=0.4, notionals=np.full(125, 1 / 125))
    sim = GaussianCopulaSimulation(pf, num_paths=1_000_000, seed=7)
    times = np.arange(1.0, 11.0)

    t0 = time.perf_counter()
    st = sim.tranche_statistics(times, 0.03, 0.07, ks=(1, 5, 10))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        st = sim.tranche_statistics(times, 0.03, 0.07, ks=(1, 5, 10))
        ts.append(time.perf_counter() - t0)
    ex5 = pf.expected_tranche_loss(5.0, 0.03, 0.07)
    dev_sigma = abs(st["etl"][4] - ex5) / max(st["etl_stderr"][4], 1e-12)
    return {
        "names": 125, "paths": 1_000_000, "horizons": 10,
        "wall_ms": round(min(ts) * 1000, 2), "compile_s": round(compile_s, 3),
        "etl_5y": float(st["etl"][4]), "etl_5y_exact": float(ex5),
        "etl_dev_sigma_vs_exact_recursion": round(float(dev_sigma), 2),
        "kth_prob_5y": [round(float(p), 6) for p in st["kth_prob"][4]],
    }


def bench_cross_currency():
    """Exact two-economy cross-currency model (models/cross_currency.py):
    1,000,000 paths x 20 semiannual steps of 5-state closed-form joint
    transitions; FX option strikes vs the hump-vol closed form and the
    float-float CCS par identities, each ONE fused program + one packed
    transfer."""
    import numpy as np

    from finmath_tpu.models.cross_currency import (CrossCurrencyModel,
                                                   CrossCurrencySimulation)
    from finmath_tpu.models.curves import DiscountCurve
    from finmath_tpu.models.hull_white import HullWhiteModel
    from finmath_tpu.models.time_discretization import TimeDiscretization

    t_grid = np.arange(0.0, 31.0)
    dc_d = DiscountCurve(t_grid, np.exp(-0.03 * t_grid))
    dc_f = DiscountCurve(t_grid, np.exp(-0.01 * t_grid))
    m = CrossCurrencyModel(HullWhiteModel(dc_d, 0.1, 0.01),
                           HullWhiteModel(dc_f, 0.05, 0.008),
                           fx_spot=1.25, fx_vol=0.10, rho_df=0.3,
                           rho_dx=-0.2, rho_fx=0.25)
    td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
    t0 = time.perf_counter()
    sim = CrossCurrencySimulation(m, td, num_paths=1_000_000, seed=5,
                                  antithetic=True)
    strikes = [1.0, 1.25, 1.5]
    fwd, prices, se = sim.mc_fx_option_prices(5.0, strikes)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fwd, prices, se = sim.mc_fx_option_prices(5.0, strikes)
        ts.append(time.perf_counter() - t0)
    cf = np.array([m.fx_option(5.0, kk) for kk in strikes])
    dev_sigma = float(np.max(np.abs(np.asarray(prices) - cf)
                             / np.maximum(np.asarray(se), 1e-12)))
    t0 = time.perf_counter()
    dom, fgn = sim.mc_ccs_legs(np.arange(1, 11) * 1.0)
    ccs_first_s = time.perf_counter() - t0
    ts2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        dom, fgn = sim.mc_ccs_legs(np.arange(1, 11) * 1.0)
        ts2.append(time.perf_counter() - t0)
    return {
        "paths": 1_000_000, "steps": 20,
        "fx_option_wall_ms": round(min(ts) * 1000, 2),
        "compile_s": round(compile_s, 3),
        "fx_option_max_dev_sigma_vs_closed_form": round(dev_sigma, 2),
        "fx_forward_rel_err": float(fwd / m.fx_forward(5.0) - 1.0),
        "ccs_wall_ms": round(min(ts2) * 1000, 2),
        "ccs_first_call_s": round(ccs_first_s, 3),
        "ccs_domestic_leg_par_dev": float(dom - 1.0),
        "ccs_foreign_leg_par_dev": float(fgn / 1.25 - 1.0),
    }


def _leg(key, fn, attempts=2):
    """Run one bench leg with the driver-proofing contract:
    * skipped entirely (recorded as skipped_budget) once the global
      elapsed budget is spent — compile latency through the remote
      service is unpredictable (5-570 s per program), so later legs must
      never be able to starve the already-collected evidence;
    * one retry on failure (the service occasionally drops a response
      mid-body — 'INTERNAL: remote_compile: response body closed before
      all bytes were read' — and the retry recompiles from the
      persistent cache);
    * per-leg wall + persistent-cache hit/miss counts recorded;
    * the full detail+summary snapshot is re-emitted after EVERY leg so
      the driver's tail-parse always sees the latest complete state."""
    detail = _STATE["detail"]
    if _elapsed() > BUDGET_S:
        detail[key] = {"skipped_budget": round(_elapsed(), 1)}
        _emit()
        return
    h0, m0 = _CACHE_COUNTER.hits, _CACHE_COUNTER.misses
    t0 = time.monotonic()
    for attempt in range(attempts):
        try:
            if attempt and _STATE.get("_backend_dead"):
                # a TPU worker crash poisons the in-process runtime: every
                # later dispatch returns UNAVAILABLE. Drop the dead client
                # and let the next dispatch re-establish the tunnel (the
                # worker restarts server-side; observed recovery ~70 s).
                import jax.extend.backend as _jb

                _jb.clear_backends()
                _STATE["_backend_dead"] = False
            res = fn()
            if isinstance(res, dict):
                res["leg_wall_s"] = round(time.monotonic() - t0, 1)
                res["persistent_cache"] = {
                    "hits": _CACHE_COUNTER.hits - h0,
                    "misses": _CACHE_COUNTER.misses - m0}
            detail[key] = res
            break
        except Exception as exc:  # noqa: BLE001 — report, don't crash
            detail[f"{key}_error"] = f"attempt {attempt + 1}: {exc}"
            if "UNAVAILABLE" in str(exc) or "crashed or restarted" in str(exc):
                _STATE["_backend_dead"] = True
    _emit()


def main():
    _install_deadline_guards()
    for attempt in range(2):     # headline retry: same transient-compile
        try:                     # failure mode as the secondary legs
            result = bench_lmm_atm_calibration()
            break
        except Exception as exc:
            if attempt:
                _STATE["detail"]["headline_error"] = str(exc)
                _emit()
                raise
    detail = result.pop("detail")
    detail["persistent_cache_headline"] = {
        "hits": _CACHE_COUNTER.hits, "misses": _CACHE_COUNTER.misses}
    _STATE["summary"] = result
    _STATE["detail"] = detail
    _emit()                      # driver-visible from this point onward

    # priority order (round-3 VERDICT item 1d/9): the reference's own
    # benchmark and the parity contract first, then the strongest
    # round-3 capability legs, then the rest — whatever the compile
    # service does, the captured prefix is the evidence that matters.
    _leg("stochvol_calibration_81920",
         lambda: bench_stochvol_calibration(81_920))
    _leg("stochvol_matched_quality_81920", bench_stochvol_matched)
    _leg("parity_1e6", bench_parity_1e6)
    _leg("slv_particle_409600_x100", bench_slv)
    _leg("credit_wwr_cva_500k_x20", bench_credit_wwr)
    _leg("portfolio_credit_125n_1m", bench_portfolio_credit)
    _leg("cross_currency_1m_x20", bench_cross_currency)
    _leg("mc_black_scholes_1m_100steps", bench_mc_black_scholes)
    _leg("stochvol_calibration_163840",
         lambda: bench_stochvol_calibration(163_840))
    # scale rows (round-5): past the reference's published table
    _leg("stochvol_calibration_409600",
         lambda: bench_stochvol_calibration(409_600))
    _leg("stochvol_matched_attempt_409600",
         lambda: bench_stochvol_matched(paths=409_600, n_scramblings=2,
                                        n_restarts=2))
    _leg("lmm_atm_calibration_1m", bench_lmm_atm_calibration_1m)
    _leg("lmm_pricer_kernels_409600", bench_lmm_pricer_kernels)
    _leg("brownian_generation_100x_1m_x10", bench_brownian_generation)
    _leg("eager_ops_100k", bench_eager_ops)
    _leg("bermudan_ls_100k", bench_bermudan)
    _leg("aad_greeks", bench_aad_greeks)
    _leg("exposure_cva", bench_exposure)
    _leg("model_zoo", bench_model_zoo)
    _leg("exotics", bench_exotics)
    _emit()


if __name__ == "__main__":
    main()
