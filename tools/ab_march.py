"""Same-session A/B of the non-resonant march implementations on TPU.

Times, at the bench shapes (batch, NE=500), each as its own fenced
program with tables/rows precomputed where applicable:
  1. f32 alpha-table build (the other half of the NR wall)
  2. full evolve, march='trisolve_f32'  (XLA blocked-Neumann march)
  3. full evolve, march='trisolve_pallas' (fused Pallas march)
  4. march-only walls for both (tables + rows precomputed)

Usage: python tools/ab_march.py [batch] [--pp]
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128
    pp = "--pp" in sys.argv

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import nusiprop_tpu as nu
    from nusiprop_tpu.config import Config
    from nusiprop_tpu.models import transport
    from nusiprop_tpu.ops import march_tri

    kw = dict(N_bins_E=500, lEmin=4.0, lEmax=9.0, zmax=5.0,
              non_resonant=True, phiphi=pp)
    cfg_f = Config(march="trisolve_f32", **kw)
    cfg_p = Config(march="trisolve_pallas", **kw)
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    params = nu.param_grid(np.geomspace(1e5, 1e8, batch), [1e-3],
                           mntot=mntot, si=2.0, norm=6.0)
    pp_tables = None
    if pp:
        from nusiprop_tpu.models import pp_tables as ppt
        pp_tables = ppt.load_default()
    gr = None

    def fence(x):
        return float(jnp.sum(jnp.asarray(x, dtype=jnp.float32)))

    def timeit(name, fn, reps=3):
        jax.tree.map(fence, fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.tree.map(fence, fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name:40s} {min(ts)*1e3:9.1f} ms", flush=True)
        return min(ts)

    print(f"batch {batch}  NE 500  pp={pp}  device {jax.devices()[0]}",
          flush=True)
    timeit("alpha f32 build (raw)",
           lambda: transport._alpha_f32_builder_jit(cfg_f, True, True)(params))
    t_f = timeit("full evolve trisolve_f32",
                 lambda: nu.grid_scan(params, cfg_f,
                                     pp_tables=pp_tables).flux)
    t_p = timeit("full evolve trisolve_pallas",
                 lambda: nu.grid_scan(params, cfg_p,
                                     pp_tables=pp_tables).flux)

    # march-only: tables precomputed and fenced outside the timer
    tables = transport.build_tables(params, cfg_f, pp_tables=pp_tables,
                                    batched=True)
    jax.tree.map(fence, tables)
    ev = jax.jit(lambda p, t: jax.vmap(
        lambda q, tt: transport.evolve_core(q, cfg_f, tables=tt))(p, t).flux)
    m_f = timeit("march only trisolve_f32",
                 lambda: ev(params, tables))

    from nusiprop_tpu.models import grids
    gr = grids.build(cfg_p)
    Nz = gr.N_steps_z
    n_steps = (Nz - 1) * batch
    # pallas march-only: time the full fused evolve minus its own
    # table-build stage is not separable inside one jit; instead time
    # the pallas call with prepared inputs
    tblG, tblAt, (A32, prefA) = tables
    from nusiprop_tpu.models import sources as src

    def rows_one(p, G, At, pf):
        norm_total = p.norm / src.flux_fs_e0(p.si, gr.zmax_eff)
        ret, scale = transport._trisolve_f32_rows(
            cfg_p, gr, p, norm_total, G, At, pf)
        return tuple(ret[:7]), scale

    NE = 500
    NEXT = gr.Emin_ext.shape[0]
    NXP = march_tri._round_up(NEXT, 128)
    Bpad = march_tri._round_up(batch, march_tri._BC)

    @jax.jit
    def prep(params, tblG, tblAt, prefA, A32):
        xs, scale = jax.vmap(rows_one)(params, tblG, tblAt, prefA)
        xs_p = tuple(
            jnp.pad(x, ((0, Bpad - batch), (0, 0), (0, NXP - NE)))
            .transpose(1, 0, 2) for x in xs)
        A_t = jnp.pad(A32, ((0, Bpad - batch), (0, 0), (0, NXP - NEXT))
                      ).transpose(1, 0, 2)
        return xs_p, A_t

    xs_p, A_t = prep(params, tblG, tblAt, prefA, A32)
    jax.tree.map(fence, (xs_p, A_t))
    Wf = march_tri.mixing.pmns_sq(cfg_p.normal_ordering)
    W_static = tuple(float(w) for w in np.asarray(Wf)[cfg_p.flav])
    pm = jax.jit(lambda a, x: march_tri._pallas_march(a, x, W_static,
                                                     NE, Nz))
    m_p = timeit("march only trisolve_pallas (kernel)",
                 lambda: pm(A_t, xs_p))

    print(f"\nsummary: full evolve {t_f*1e3:.1f} -> {t_p*1e3:.1f} ms "
          f"({t_f/t_p:.2f}x); march {m_f*1e3:.1f} -> {m_p*1e3:.1f} ms "
          f"({m_f/m_p:.2f}x)")
    print(f"march ms/z-step: f32 {m_f/ (Nz-1)*1e3:.3f}  "
          f"pallas {m_p/(Nz-1)*1e3:.3f}")
    print(f"z-steps/s full evolve: f32 {n_steps/t_f:,.0f}  "
          f"pallas {n_steps/t_p:,.0f}")


if __name__ == "__main__":
    main()
