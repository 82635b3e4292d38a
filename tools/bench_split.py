"""Split the headline-bench wallclock into kernel-table build vs march.

s-channel mode (default): the rank1_f32 march runs natively in
float32; this times (a) the full evolve, (b) a tables-only program,
on the bench shapes, to show where the remaining wall goes.

--nr mode: stage split of the non-resonant trisolve_f32 evolve — each
staged per-channel table program individually (NOTE: each fenced call
pays the full ~28 ms tunnel round-trip, while inside grid_scan the
staged programs dispatch asynchronously and their RTTs overlap, so the
per-stage walls here deliberately over-count; subtract ~28 ms per line
for device time), the f32 alpha build, and the march with tables
precomputed.

Usage: python tools/bench_split.py [--nr] [batch]
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def nr_split(batch):
    """Stage split of the non-resonant trisolve_f32 evolve."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import nusiprop_tpu as nu
    from nusiprop_tpu.config import Config
    from nusiprop_tpu.models import transport

    cfg = Config(N_bins_E=500, lEmin=4.0, lEmax=9.0, zmax=5.0,
                 non_resonant=True, phiphi=False, march="auto")
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    params = nu.param_grid(np.geomspace(1e5, 1e8, batch), [1e-3],
                           mntot=mntot, si=2.0, norm=6.0)
    print("march:", transport._resolve_march(cfg), "batch:", batch)

    def fence(x):
        return float(jnp.sum(jnp.asarray(x, dtype=jnp.float32)))

    def timeit(name, fn, reps=3):
        jax.tree.map(fence, fn())  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.tree.map(fence, fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(ts)*1e3:9.1f} ms")

    timeit("full grid_scan evolve", lambda: nu.grid_scan(params, cfg).flux)
    for table in ("gamma", "alphatilde"):
        for ch in transport._channels(cfg):
            fn = transport._channel_builder_jit(cfg, table, ch, True, False)
            timeit(f"{table}:{ch}", lambda fn=fn: fn(params, None))
    timeit("alpha f32 (raw)",
           lambda: transport._alpha_f32_builder_jit(cfg, True, True)(params))

    tables = transport.build_tables(params, cfg, batched=True)
    jax.tree.map(fence, tables)
    ev = jax.jit(lambda p, t: jax.vmap(
        lambda q, tt: transport.evolve_core(q, cfg, tables=tt))(p, t).flux)
    timeit("march only (tables precomputed)", lambda: ev(params, tables))


def pp_split(batch):
    """Stage split of the full-channel-set (non_resonant + phiphi)
    trisolve_f32 evolve: which program carries the pp regime's cost."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import nusiprop_tpu as nu
    from nusiprop_tpu.config import Config
    from nusiprop_tpu.models import pp_tables as ppt
    from nusiprop_tpu.models import transport

    cfg = Config(N_bins_E=500, lEmin=4.0, lEmax=9.0, zmax=5.0,
                 non_resonant=True, phiphi=True, march="auto")
    tables = ppt.load_default()
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    params = nu.param_grid(np.geomspace(1e5, 1e8, batch), [1e-3],
                           mntot=mntot, si=2.0, norm=6.0)
    print("march:", transport._resolve_march(cfg), "batch:", batch)

    def fence(x):
        return float(jnp.sum(jnp.asarray(x, dtype=jnp.float32)))

    def timeit(name, fn, reps=3):
        jax.tree.map(fence, fn())  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.tree.map(fence, fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(ts)*1e3:9.1f} ms", flush=True)

    timeit("full grid_scan evolve",
           lambda: nu.grid_scan(params, cfg, pp_tables=tables).flux)
    t32 = transport._pp_f32(tables)
    timeit("alpha pp norm (separable grid)",
           lambda: transport._pp_norm_builder_jit(cfg, True)(params, t32))
    for table in ("gamma", "alphatilde"):
        for ch in transport._channels(cfg):
            fn = transport._channel_builder_jit(cfg, table, ch, True, False)
            arg = t32 if ch == "pp" else None
            timeit(f"{table}:{ch}", lambda fn=fn, arg=arg: fn(params, arg))
    timeit("alpha f32 (raw)",
           lambda: transport._alpha_f32_builder_jit(cfg, True, True)(params))

    built = transport.build_tables(params, cfg, pp_tables=tables,
                                   batched=True)
    jax.tree.map(fence, built)
    ev = jax.jit(lambda p, t: jax.vmap(
        lambda q, tt: transport.evolve_core(q, cfg, tables=tt))(p, t).flux)
    timeit("march only (tables precomputed)", lambda: ev(params, built))


def main():
    args = [a for a in sys.argv[1:] if a not in ("--nr", "--pp")]
    batch_arg = int(args[0]) if args else None
    if "--pp" in sys.argv[1:]:
        pp_split(batch_arg or 32)
        return
    if "--nr" in sys.argv[1:]:
        nr_split(batch_arg or 8)
        return
    batch = batch_arg or 256

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
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

    from nusiprop_tpu.models import kernels_f32

    f32_tables = cfg.table_dtype in ("auto", "f32")

    def one_tables(q):
        mn = masses.mass_spectrum(q.mntot, cfg.normal_ordering)
        if f32_tables:
            tblG, tblAt, rho, prefs = kernels_f32.s_channel_tables_f32(
                gr.Emin_ext, gr.Emax_ext, mn, q.g, q.mphi, Wf,
                majorana=cfg.majorana)
            return tblG, tblAt, rho, prefs
        kw = dict(majorana=cfg.majorana, non_resonant=False, phiphi=False)
        tblG = kernels.gamma_table(gr.Emin_ext, gr.Emax_ext, mn, q.g,
                                   q.mphi, Wf, **kw)
        tblAt = kernels.alphatilde_table(gr.Emin_ext, gr.Emax_ext, mn,
                                         q.g, q.mphi, Wf, **kw)
        rho = kernels.alpha_s_rho(gr.Emin_ext, gr.Emax_ext, mn, q.g,
                                  q.mphi, Wf, majorana=cfg.majorana)
        return tblG, tblAt, rho, None

    @jax.jit
    def tables_only(p):
        out = jax.vmap(lambda q: one_tables(q)[:3])(p)
        return sum(jnp.sum(t.astype(jnp.float64)) for t in out)

    @jax.jit
    def tables_and_rows(p):
        def one(q):
            tblG, tblAt, rho, prefs = one_tables(q)
            norm_total = q.norm / sources.flux_fs_e0(q.si, gr.zmax_eff)
            xs, scale = transport._rank1_f32_rows(
                cfg, gr, q, norm_total, tblG, tblAt, rho,
                gr.Emax_ext - gr.Emin_ext, prefs=prefs)
            return sum(jnp.sum(x) for x in xs) + jnp.sum(scale)

        return jax.vmap(one)(p)

    def timeit(fn, arg, label):
        out = fn(arg)
        float(jnp.sum(out))  # fence (see bench.py note)
        times = []
        for r in range(3):
            p = jax.tree.map(lambda x: x * (1.0 + 1e-12 * (r + 1)), arg)
            t0 = time.perf_counter()
            float(jnp.sum(fn(p)))
            times.append(time.perf_counter() - t0)
        print(f"{label:>12}: {min(times)*1e3:8.2f} ms  (batch {batch})")
        return min(times)

    full = timeit(lambda p: nu.grid_scan(p, cfg).flux, params, "full evolve")
    tab = timeit(tables_only, params, "tables only")
    rows = timeit(tables_and_rows, params, "tables+rows")
    print(f"{'rows only':>12}: {(rows - tab)*1e3:8.2f} ms  (difference)")
    print(f"{'scan only':>12}: {(full - rows)*1e3:8.2f} ms  (difference)")


if __name__ == "__main__":
    main()
