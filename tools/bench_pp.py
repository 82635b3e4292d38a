"""Batch-scaling probe for the phi-phi bench regime.

The pp regime (reference full channel set: non_resonant + the
nu nu -> phi phi production channel via the interpolation tables,
nuSIprop.hpp:166-170) ran at BENCH_PP_BATCH=8 in round 2 because the
per-pair 64-point-stencil pp alpha program faulted the TPU device at
batch 64. The separable grid build (kernels.alpha_pp_grid) replaced
that program in round 3; this probe measures the batch envelope —
results in BENCH_NOTES.md (batch 32 is the sweet spot and the bench
default).

Each batch size runs in its OWN subprocess: a device fault (observed
failure mode: UNAVAILABLE at materialization, which can wedge the
tunneled backend for the whole process) must kill only that probe
point, not the sweep. Usage:

    python tools/bench_pp.py [batch ...]        # default: 8 16 32
    python tools/bench_pp.py --one 16           # internal: one point
"""

import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def one(batch):
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    import nusiprop_tpu as nu
    from nusiprop_tpu.models import pp_tables

    tables = pp_tables.load_default()
    cfg = bench._cfg(True, "auto", phiphi=True)
    run = lambda p: nu.grid_scan(p, cfg, pp_tables=tables).flux
    t0 = time.perf_counter()
    zsps, wall = bench._time_regime(cfg, batch, 1e-3, 2, run=run)
    print(json.dumps({
        "batch": batch,
        "zsteps_per_sec": round(zsps, 1),
        "wall_per_evolve_s": round(wall / batch, 4),
        "total_incl_compile_s": round(time.perf_counter() - t0, 1),
    }), flush=True)


def main(argv):
    if len(argv) >= 2 and argv[0] == "--one":
        one(int(argv[1]))
        return
    batches = [int(a) for a in argv] or [8, 16, 32]
    for b in batches:
        print(f"--- pp batch {b}", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", str(b)],
                cwd=ROOT, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # A wedged tunneled backend hangs the child to the timeout —
            # exactly the failure the per-point subprocess isolates.
            # Report and move on to the next batch size.
            print(json.dumps({"batch": b, "error": "timeout"}), flush=True)
            continue
        if r.returncode != 0:
            print(json.dumps({"batch": b, "error": f"rc={r.returncode}"}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
