"""Measure the serial C++ baseline and write BASELINE_MEASURED.json.

The reference publishes no performance numbers and does not compile here
(GSL absent), so bench.py's vs_baseline denominator comes from
native/serial_baseline.cpp — a cross-validated (tests/test_serial_baseline.py,
agreement ~1e-15/bin with the JAX engine) single-threaded -O3 C++
implementation of the same algorithm, including the reference's
alpha_cum fast path for the benchmark configuration.

Usage: python tools/measure_baseline.py [--bins 500] [--reps 5]
"""

import argparse
import json
import pathlib
import platform
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
SRC = ROOT / "native" / "serial_baseline.cpp"
BIN = ROOT / "native" / "serial_baseline"


def build():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-o", str(BIN),
         str(SRC)],
        check=True)


def measure_phiphi(bins, lEmin, lEmax, zmax, reps):
    """Serial C++ NR + phi-phi evolve at the NR bench point.

    Driven through the ctypes binding because the pp spline weight
    tensors are marshalled from Python (native_binding._push_pp_table);
    the timed evolve itself is the same single-thread C++ engine the
    other denominators use (table push happens once, in the ctor).
    """
    import time

    from nusiprop_tpu.native_binding import NativeEvolver

    ev = NativeEvolver(1e6, 1e-3, 0.1, 2.0, norm=6.0, non_resonant=True,
                       phiphi=True, N_bins_E=bins, lEmin=lEmin, lEmax=lEmax,
                       zmax=zmax, source="dsnb")
    nz = ev.n_steps_z if hasattr(ev, "n_steps_z") else None
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ev.evolve()
        best = min(best, time.perf_counter() - t0)
    if nz is None:
        nz = int(ev._lib.nusi_n_steps_z(ev._h))
    return {"wall_sec_per_evolve": round(best, 6),
            "zsteps_per_sec": round((nz - 1) / best, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=500)
    ap.add_argument("--lEmin", type=float, default=4.0)
    ap.add_argument("--lEmax", type=float, default=9.0)
    ap.add_argument("--zmax", type=float, default=5.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--only-phiphi", action="store_true",
                    help="merge just the phi-phi keys into the existing "
                         "BASELINE_MEASURED.json (keeps the min-wall "
                         "s-channel/NR numbers already recorded)")
    args = ap.parse_args()

    out_path = ROOT / "BASELINE_MEASURED.json"
    if args.only_phiphi:
        payload = json.loads(out_path.read_text())
        res_pp = measure_phiphi(args.bins, args.lEmin, args.lEmax,
                                args.zmax, max(2, args.reps // 2))
        payload["serial_cpp_wall_sec_per_evolve_phiphi"] = (
            res_pp["wall_sec_per_evolve"])
        payload["serial_cpp_zsteps_per_sec_500bins_phiphi"] = (
            res_pp["zsteps_per_sec"])
        out_path.write_text(json.dumps(payload, indent=2) + "\n")
        print(json.dumps(payload, indent=2))
        return

    if not BIN.exists() or BIN.stat().st_mtime < SRC.stat().st_mtime:
        build()
    out = subprocess.run(
        [str(BIN), str(args.bins), str(args.lEmin), str(args.lEmax),
         str(args.zmax), str(args.reps)],
        check=True, capture_output=True, text=True).stdout
    res = json.loads(out)
    # the reference's DEFAULT channel set (non_resonant=true,
    # nuSIprop.hpp:63-65): full t/u/tu/st/su tables + O(NE^2)-per-step
    # regeneration march; far fewer reps — each evolve is seconds
    out_nr = subprocess.run(
        [str(BIN), str(args.bins), str(args.lEmin), str(args.lEmax),
         str(args.zmax), str(max(2, args.reps // 2)), "--non-resonant"],
        check=True, capture_output=True, text=True).stdout
    res_nr = json.loads(out_nr)
    # phi-phi on top of the NR channel set (spline-table kernels)
    res_pp = measure_phiphi(args.bins, args.lEmin, args.lEmax, args.zmax,
                            max(2, args.reps // 2))

    payload = {
        "description": (
            "Serial C++ re-implementation of the reference algorithm "
            "(s-channel kernels + alpha_cum fast path, power-law source; "
            "the _nonresonant numbers add the t/u/tu/st/su channels and "
            "the full O(NE^2)-per-step regeneration sum, dsnb source), "
            "-O3 -march=native, single thread. Cross-validated against "
            "the JAX engine to ~1e-14 per bin "
            "(tests/test_serial_baseline.py)."),
        "config": {
            "N_bins_E": args.bins, "lEmin": args.lEmin,
            "lEmax": args.lEmax, "zmax": args.zmax,
            "non_resonant": False, "source": "powerlaw",
        },
        "n_steps_z": res["n_steps_z"],
        "serial_cpp_wall_sec_per_evolve": res["wall_sec_per_evolve"],
        "serial_cpp_zsteps_per_sec_500bins": res["zsteps_per_sec"],
        "serial_cpp_wall_sec_per_evolve_nonresonant":
            res_nr["wall_sec_per_evolve"],
        "serial_cpp_zsteps_per_sec_500bins_nonresonant":
            res_nr["zsteps_per_sec"],
        "serial_cpp_wall_sec_per_evolve_phiphi":
            res_pp["wall_sec_per_evolve"],
        "serial_cpp_zsteps_per_sec_500bins_phiphi":
            res_pp["zsteps_per_sec"],
        "host": platform.platform(),
    }
    out_path.write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
