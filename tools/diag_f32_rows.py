"""Diagnose the TPU-vs-CPU divergence of the rank1_f32 march.

Computes the _rank1_f32_rows coefficient arrays (and the tables they are
built from) on both platforms and reports per-row max relative
disagreement, then runs the f32 scan on the CPU using the TPU-built rows
(and vice versa) to localize the error to 'rows' vs 'scan'.

Usage: python tools/diag_f32_rows.py [batch]
"""

import pathlib
import subprocess
import sys
import tempfile

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

_WORKER = r"""
import sys
import numpy as np
platform = sys.argv[1]
out_path = sys.argv[2]
batch = int(sys.argv[3])

import jax
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", %r)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config
from nusiprop_tpu.models import grids, kernels, masses, mixing, sources
from nusiprop_tpu.models import transport

cfg = Config(N_bins_E=500, lEmin=4.0, lEmax=9.0, zmax=5.0,
             non_resonant=False, phiphi=False, march="rank1_f32")
mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
params = nu.param_grid(np.geomspace(1e5, 1e8, batch), [1e-2],
                       mntot=mntot, si=2.0, norm=6.0)
gr = grids.build(cfg)
Wf = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))[cfg.flav]

@jax.jit
def rows_of(p):
    def one(q):
        mn = masses.mass_spectrum(q.mntot, cfg.normal_ordering)
        kw = dict(majorana=cfg.majorana, non_resonant=False, phiphi=False)
        tblG = kernels.gamma_table(gr.Emin_ext, gr.Emax_ext, mn, q.g,
                                   q.mphi, Wf, **kw)
        tblAt = kernels.alphatilde_table(gr.Emin_ext, gr.Emax_ext, mn,
                                         q.g, q.mphi, Wf, **kw)
        rho = kernels.alpha_s_rho(gr.Emin_ext, gr.Emax_ext, mn, q.g,
                                  q.mphi, Wf, majorana=cfg.majorana)
        norm_total = q.norm / sources.flux_fs_e0(q.si, gr.zmax_eff)
        xs, scale = transport._rank1_f32_rows(
            cfg, gr, q, norm_total, tblG, tblAt, rho,
            gr.Emax_ext - gr.Emin_ext)
        return xs + (scale, tblG, tblAt, rho)
    return jax.vmap(one)(p)

out = rows_of(params)
np.savez(out_path, **{f"r{i}": np.asarray(a) for i, a in enumerate(out)})
print("device:", jax.devices()[0])
""" % str(ROOT / ".jax_cache")


def run(platform, out, batch):
    subprocess.run(
        [sys.executable, "-c", _WORKER, platform, out, str(batch)],
        check=True, cwd=ROOT, timeout=3000)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = ["PG", "PAt", "CO", "R0", "S0", "CF", "PD", "scale",
             "tblG", "tblAt", "rho"]
    out = pathlib.Path("/tmp/diag_rows")
    out.mkdir(exist_ok=True)
    tf, cf = str(out / "t.npz"), str(out / "c.npz")
    run("tpu", tf, batch)
    run("cpu", cf, batch)
    t = np.load(tf)
    c = np.load(cf)
    for i, nm in enumerate(names):
        a, b = t[f"r{i}"], c[f"r{i}"]
        denom = np.maximum(np.abs(b), np.abs(b).max() * 1e-30 + 1e-300)
        rel = np.abs(a.astype(np.float64) - b.astype(np.float64)) / denom
        print(f"{nm:>6}: max rel {rel.max():.3e}  mean {rel.mean():.3e} "
              f" (|b| range {np.abs(b)[b!=0].min() if (b!=0).any() else 0:.2e}"
              f" .. {np.abs(b).max():.2e})")

    # Swap test: run the f32 scan ON CPU with each platform's rows; if
    # CPU-scan(TPU rows) reproduces the f64 truth, the TPU rows are
    # self-consistent and the divergence lives in the TPU scan; if it
    # reproduces the (wrong) TPU flux, the row construction is broken.
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import nusiprop_tpu as nu
    from nusiprop_tpu.config import Config
    from nusiprop_tpu.models import mixing, transport

    cfg64 = Config(N_bins_E=500, lEmin=4.0, lEmax=9.0, zmax=5.0,
                   non_resonant=False, phiphi=False, march="rank1")
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    params = nu.param_grid(np.geomspace(1e5, 1e8, batch), [1e-2],
                           mntot=mntot, si=2.0, norm=6.0)
    truth = np.asarray(nu.grid_scan(params, cfg64).flux)  # differential
    Wf = jnp.asarray(mixing.pmns_sq(True))[2]
    import nusiprop_tpu.models.grids as grids
    gr = grids.build(cfg64)
    inv_dE = np.asarray(1.0 / (gr.Emax - gr.Emin))

    def scan_counts(rows):
        xs = tuple(jnp.asarray(rows[f"r{i}"]) for i in range(7))
        scale = jnp.asarray(rows["r7"])
        phi = jax.vmap(
            lambda *x: transport._rank1_f32_scan(tuple(x[:-1]), Wf, 500)
            .astype(jnp.float64) * x[-1][None, :])(*xs, scale)
        return np.asarray(phi) * inv_dE[None, None, :]

    for tag, rows in (("tpu-rows", t), ("cpu-rows", c)):
        got = scan_counts(rows)
        peak = np.max(np.abs(truth), axis=(1, 2), keepdims=True)
        gmask = np.abs(truth) > 1e-10 * peak
        rel = np.abs(got - truth) / np.maximum(np.abs(truth), 1e-300)
        print(f"cpu-scan({tag}): gated max rel {rel[gmask].max():.3e} "
              f"mean {rel[gmask].mean():.3e}")


if __name__ == "__main__":
    main()
