"""Run the per-round real-TPU validation battery and write the
machine-readable evidence artifact (CROSSCHECK_rNN.json).

Covers (VERDICT r3 item 6 — validation claims must be committed JSON,
not prose):
  * tpu_crosscheck --f32            s-channel strong coupling
  * tpu_crosscheck --f32 --g 1e-6   s-channel golden/weak coupling
  * tpu_crosscheck --nr             non-resonant all-f32 vs CPU-f32
  * tpu_crosscheck --nr --pallas    fused Pallas trisolve march vs its
                                    same-order CPU twin (round 5)
  * tpu_crosscheck --pp             full channel set (phi-phi tables,
                                    kinematically-open window + the
                                    tables-matter gate; round 5)
  * tpu_crosscheck --pp --pallas    ditto through the fused march
  * tpu_battery                     config families (Dirac/IO/...)
  * weak-coupling finiteness canary g = 1e-12 non-resonant ON TPU
    (the ADVICE r3 NaN regression; specfun.log1p_sq_ratio guard)

Usage: python tools/validate_round.py OUT.json [--quick]
  --quick: crosscheck s-channel modes only (for mid-round spot checks)
"""

import datetime
import json
import pathlib
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]

_CANARY = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[2])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import nusiprop_tpu as nu
from nusiprop_tpu.config import Config

# The run_exclusion free-streaming mock: g = 1e-12 with the full
# non-resonant channel set, on the REAL TPU (the emulated-f64 backend
# whose f32 exponent window NaN-poisoned the st channels pre-guard).
# Batch matches the warm bench shape so no fresh compile is paid.
cfg = Config(N_bins_E=500, lEmin=4.0, lEmax=9.0, zmax=5.0,
             non_resonant=True, phiphi=False, march="auto")
mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
batch = int(sys.argv[3])
params = nu.param_grid(np.geomspace(1e5, 1e8, batch), [1e-12],
                       mntot=mntot, si=2.0, norm=6.0)
res = nu.grid_scan(params, cfg)
flux = np.asarray(res.flux_fla)
health = np.asarray(res.health)
ok = bool(np.isfinite(flux).all())
rec = {"finite": ok,
       "nonfinite_count": int((~np.isfinite(flux)).sum()),
       "worst_rel_neg": float(health[..., 0].min()),
       "health_nonfinite": float(health[..., 1].max()),
       "device": str(jax.devices()[0])}
import json as _json
print("CANARY_JSON " + _json.dumps(rec))
sys.exit(0 if ok else 1)
"""


def _run(cmd, timeout=7000):
    print("+", " ".join(cmd), flush=True)
    try:
        return subprocess.run(cmd, cwd=ROOT, timeout=timeout,
                              capture_output=True, text=True)
    except subprocess.TimeoutExpired as exc:
        print(f"TIMEOUT after {timeout}s: {' '.join(cmd)}", flush=True)
        return subprocess.CompletedProcess(cmd, returncode=124,
                                           stdout=str(exc.stdout or ""),
                                           stderr="timeout")


def main():
    out = pathlib.Path(sys.argv[1])
    quick = "--quick" in sys.argv[2:]
    py = sys.executable
    records = []

    def crosscheck(*flags):
        r = _run([py, "tools/tpu_crosscheck.py", *flags,
                  "--json", str(out)])
        print(r.stdout[-2000:])
        if r.returncode != 0:
            print(r.stderr[-2000:])
            records.append({"tool": "tpu_crosscheck", "flags": flags,
                            "error": f"rc={r.returncode}"})

    crosscheck("--f32")
    crosscheck("--f32", "--g", "1e-6")
    if not quick:
        crosscheck("--nr", "--batch", "8")
        # the fused Pallas trisolve march (ops/march_tri) vs its CPU
        # twin — the production NR path since round 5
        crosscheck("--nr", "--batch", "8", "--pallas")
        crosscheck("--pp", "--batch", "8")
        crosscheck("--pp", "--batch", "8", "--pallas")
        r = _run([py, "tools/tpu_battery.py", "--json", str(out)])
        print(r.stdout[-3000:])
        if r.returncode != 0:
            print(r.stderr[-2000:])
            records.append({"tool": "tpu_battery",
                            "error": f"rc={r.returncode}"})

        # weak-coupling TPU canary (warm bench shape: batch 64)
        r = _run([py, "-c", _CANARY, "-", str(ROOT / ".jax_cache"), "64"])
        line = [l for l in r.stdout.splitlines()
                if l.startswith("CANARY_JSON ")]
        rec = (json.loads(line[0][len("CANARY_JSON "):]) if line
               else {"error": r.stderr[-500:]})
        rec.update({"tool": "weak_coupling_canary", "g": 1e-12,
                    "passed": bool(rec.get("finite", False)),
                    "utc": datetime.datetime.now(datetime.timezone.utc)
                           .isoformat(timespec="seconds")})
        records.append(rec)

    if records:
        hist = json.loads(out.read_text()) if out.exists() else []
        hist.extend(records)
        out.write_text(json.dumps(hist, indent=1) + "\n")
    print(f"validation artifact: {out}")
    try:
        final = json.loads(out.read_text())
    except FileNotFoundError:
        raise SystemExit("no records were written")
    bad = [r for r in final if not r.get("passed", False)]
    if bad:
        raise SystemExit(f"FAIL: {len(bad)}/{len(final)} records failed")
    print(f"OK: all {len(final)} records passed")


if __name__ == "__main__":
    main()
