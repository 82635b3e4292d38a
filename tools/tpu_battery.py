"""Run every engine configuration family on the real TPU vs CPU f64.

The pytest suite runs on CPU (conftest forces it); tpu_crosscheck
covers the two bench configs. This battery sweeps the remaining
configuration families — phi-phi production, non-diagonal flavor
couplings, Dirac, inverted ordering, powerlaw source, IO+Dirac combos —
each as a small evolve on the attached TPU and on CPU float64, and
reports worst-case gated disagreement per family. Catches the class of
bug where the TPU's emulated-f64 exponent window silently flushes an
intermediate in a path the bench configs never exercise.

Usage: python tools/tpu_battery.py [--family NAME]
"""

import argparse
import json
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

# Each family: (name, config kwargs, params kwargs, needs_pp, general_Q)
FAMILIES = {
    "dirac": (dict(majorana=False, non_resonant=False, phiphi=False),
              dict(mphi=5e6, g=1e-4, mntot=0.0587, si=2.0, norm=6.0), False,
              None),
    "inverted": (dict(normal_ordering=False, non_resonant=False,
                      phiphi=False),
                 dict(mphi=5e6, g=1e-4, mntot=0.1, si=2.0, norm=6.0), False,
                 None),
    "powerlaw": (dict(source="powerlaw", non_resonant=False, phiphi=False,
                      lEmin=9.0, lEmax=14.0),
                 dict(mphi=6e5, g=1e-3, mntot=0.1, si=2.5, norm=1.0), False,
                 None),
    "flav_e": (dict(flav=0, non_resonant=False, phiphi=False),
               dict(mphi=5e6, g=1e-4, mntot=0.0587, si=2.0, norm=6.0), False,
               None),
    "nonres_dirac": (dict(majorana=False, non_resonant=True, phiphi=False,
                          lEmin=9.0, lEmax=14.0, source="powerlaw"),
                     dict(mphi=6e5, g=1e-3, mntot=0.1, si=2.5, norm=1.0),
                     False, None),
    "phiphi": (dict(non_resonant=True, phiphi=True, lEmin=9.0, lEmax=14.0,
                    source="powerlaw"),
               dict(mphi=6e5, g=1e-3, mntot=0.1, si=2.5, norm=1.0), True,
               None),
    "general_mu_tau": (dict(non_resonant=False, phiphi=False),
                       dict(mphi=5e6, g=1e-4, mntot=0.0587, si=2.0,
                            norm=6.0), False, "mu_tau"),
}

_WORKER = r"""
import json
import sys
import numpy as np
platform = sys.argv[1]
fam = sys.argv[2]
out_path = sys.argv[3]

import jax
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    # XLA:CPU AOT executables are host-ISA-specific; the package's
    # persistent cache may hold entries from a different host
    # (cpu_aot_loader feature-mismatch warnings / SIGILL hazard —
    # same guard as tests/conftest.py)
    jax.config.update("jax_enable_compilation_cache", False)

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import transport

sys.path.insert(0, %r)
from tools.tpu_battery import FAMILIES

cfg_kw, p_kw, needs_pp, general = FAMILIES[fam]
base = dict(N_bins_E=60, lEmin=4.0, lEmax=9.0, zmax=5.0)
base.update(cfg_kw)
cfg = Config(**base)
p = PhysicsParams.create(**p_kw)

pp_tables = None
if needs_pp:
    from nusiprop_tpu.models import pp_tables as ppt
    pp_tables = ppt.load_npz(%r)

if general is not None:
    G = np.zeros((3, 3))
    G[1, 1] = 0.5
    G[2, 2] = 1.0
    Q = nu.flavor_coupling_to_Q(G)
    res = transport.evolve_general(p, Q, cfg)
else:
    res = transport.evolve(p, cfg, pp_tables=pp_tables)
flux = np.asarray(res.flux_fla)
np.save(out_path, flux)
print(platform, "done:", fam)
""" % (str(ROOT), str(ROOT / "data" / "pp_tables_small.npz"))


def run(platform, fam, out):
    subprocess.run([sys.executable, "-c", _WORKER, platform, fam, out],
                   check=True, cwd=ROOT, timeout=3000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None)
    ap.add_argument("--json", type=str, default="",
                    help="append the per-family residual record to this "
                         "JSON file (committed round artifacts)")
    args = ap.parse_args()
    fams = [args.family] if args.family else list(FAMILIES)

    results = {}
    for fam in fams:
        with tempfile.TemporaryDirectory() as td:
            tf, cf = f"{td}/t.npy", f"{td}/c.npy"
            run("tpu", fam, tf)
            run("cpu", fam, cf)
            tpu, cpu = np.load(tf), np.load(cf)
        pk = np.abs(cpu).max()
        gate = np.abs(cpu) > pk * 1e-10
        rel = np.abs(tpu - cpu)[gate] / np.abs(cpu)[gate]
        results[fam] = dict(max_rel=float(rel.max()),
                            mean_rel=float(rel.mean()),
                            gated=int(gate.sum()))
        status = "OK" if rel.max() < 1e-3 else "FAIL"
        print(f"{fam:>16}: max rel {rel.max():.3e}  mean {rel.mean():.3e} "
              f" ({gate.sum()} gated bins)  {status}")

    worst = max(r["max_rel"] for r in results.values())
    print(json.dumps({"worst_max_rel": worst, "families": results}))
    if args.json:
        import datetime

        rec = {
            "tool": "tpu_battery",
            "worst_max_rel": worst,
            "gate": 1e-3,
            "passed": bool(worst <= 1e-3),
            "families": results,
            "utc": datetime.datetime.now(datetime.timezone.utc)
                   .isoformat(timespec="seconds"),
        }
        p = pathlib.Path(args.json)
        hist = json.loads(p.read_text()) if p.exists() else []
        hist.append(rec)
        p.write_text(json.dumps(hist, indent=1) + "\n")
        print(f"record appended to {p}")
    if worst > 1e-3:
        raise SystemExit("FAIL: at least one family beyond the physical gate")


if __name__ == "__main__":
    main()
