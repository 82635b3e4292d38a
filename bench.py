"""Benchmark: redshift-steps/sec at 500 energy bins (BASELINE.json metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs on whatever platform JAX selects (the driver provides the real TPU).
The workload is the BASELINE.json metric point: 500 energy bins spanning
5 decades, zmax = 5 => N_steps_z = 79 (nuSIprop.hpp:124). The headline
number is batched throughput — the engine's unit of work is a batched
parameter-grid scan (one compiled launch evolving many (g, mphi) points),
which is how the reference's serial scan loop is meant to be replaced.

vs_baseline compares against the serial C++ reference wallclock per point.
The reference repo publishes no numbers and does not compile here (GSL
absent); ``native/serial_baseline`` is a faithful s-channel-only C++
re-implementation (same algorithm, -O3) measured on this host — see
BASELINE_MEASURED.json. Until that file exists, vs_baseline is reported
as 0.0 (unknown).
"""

import json
import os
import pathlib
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache: the f64-emulated nested-scan program
    # takes minutes to compile on the tunneled TPU; cache across runs.
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import nusiprop_tpu as nu
    from nusiprop_tpu.config import Config
    from nusiprop_tpu.models import grids
    from nusiprop_tpu.models.transport import _resolve_march as transport_march

    # Default: the free-streaming-preconditioned NATIVE-f32 march
    # (march="rank1_f32") — no f64 emulation on TPU. Validated against
    # the CPU-f64 engine to 5.1e-6 max relative error on every bin
    # within 10 decades of peak at exactly this workload
    # (tools/tpu_crosscheck.py --f32; physics gate is 1e-3).
    # BENCH_F32=0 falls back to the emulated-f64 march.
    nr = bool(int(os.environ.get("BENCH_NON_RESONANT", "0")))
    march = ("rank1_f32" if int(os.environ.get("BENCH_F32", "1")) and not nr
             else "auto")
    cfg = Config(
        N_bins_E=500,
        lEmin=4.0,
        lEmax=9.0,
        zmax=5.0,
        non_resonant=nr,
        phiphi=False,
        march=march,
        march_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
    )
    nz = grids.n_steps_z(cfg)

    # Default batch = the BASELINE north-star config (1e3-point grid
    # scan on one chip). The tunneled TPU carries a ~28 ms fixed
    # dispatch+sync round-trip per call (measured; BENCH_NOTES.md), so
    # throughput numbers include that latency — bigger batches amortize
    # it (device compute is ~19 us/point at batch 1024). The
    # non-resonant path is compute-bound per point (emulated-f64
    # channel tables), so it keeps a small batch.
    batch = int(os.environ.get(
        "BENCH_BATCH", "8" if cfg.non_resonant else "1024"))
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    # Non-resonant coupling kept at 1e-3: at g=1e-2 the lowest-mphi scan
    # points cascade-amplify the number flux to ~1e34 (CPU-f64-verified,
    # loop == trisolve), whose solve intermediates exceed the f32
    # exponent window TPU f64-emulation carries. Timing is identical
    # (same program, data-independent).
    g0 = 1e-3 if cfg.non_resonant else 1e-2
    params = nu.param_grid(
        np.geomspace(1e5, 1e8, batch), [g0], mntot=mntot, si=2.0, norm=6.0
    )

    # BENCH_PALLAS=1: run the fused double-single Pallas march instead of
    # the XLA rank1 march (s-channel configs only; ops/march_ds.py)
    use_pallas = (bool(int(os.environ.get("BENCH_PALLAS", "0")))
                  and not cfg.non_resonant)
    if use_pallas:
        from nusiprop_tpu.ops.march_ds import evolve_pallas

        run = lambda p: evolve_pallas(p, cfg)
    else:
        run = lambda p: nu.grid_scan(p, cfg).flux

    # warmup/compile. NOTE: on the tunneled TPU, block_until_ready does not
    # reliably block; a scalar reduction materialized to host is the only
    # trustworthy fence, so all timings include that fence.
    warm = run(params)
    if not bool(jnp.isfinite(warm).all()):
        raise SystemExit("bench aborted: non-finite flux — refusing to time garbage")
    float(jnp.sum(warm))

    reps = int(os.environ.get("BENCH_REPS", "3"))
    times = []
    for r in range(reps):
        p = jax.tree.map(lambda x: x * (1.0 + 1e-12 * (r + 1)), params)
        t0 = time.perf_counter()
        float(jnp.sum(run(p)))
        times.append(time.perf_counter() - t0)
    wall = min(times)

    zsteps_per_sec = (nz - 1) * batch / wall

    baseline_file = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    vs_baseline = 0.0
    if baseline_file.exists() and not cfg.non_resonant:
        # the measured serial-C++ denominator is the s-channel-only
        # algorithm (the reference's benchmark path); comparing a
        # non-resonant run against it would be apples-to-oranges
        base = json.loads(baseline_file.read_text())
        base_zsps = base.get("serial_cpp_zsteps_per_sec_500bins")
        if base_zsps:
            vs_baseline = zsteps_per_sec / base_zsps

    print(
        json.dumps(
            {
                "metric": "redshift-steps/sec at 500 energy bins",
                "value": round(zsteps_per_sec, 3),
                "unit": "z-steps/sec",
                "vs_baseline": round(vs_baseline, 3),
                "batch": batch,
                "wall_sec_per_batch": round(wall, 4),
                "device": str(jax.devices()[0]),
                "march": ("pallas-ds" if use_pallas else transport_march(cfg)),
            }
        )
    )


if __name__ == "__main__":
    main()
