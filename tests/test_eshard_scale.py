"""The storage-sharded E' march's >=4096-bin scaling demo.

In its own module (NOT smoke-marked — tests/test_sharding.py is a
smoke-tier module and this demo runs ~9 minutes on the 8-device CPU
mesh): the >=1e4-bin SURVEY §5 scenario at demo scale, where the
extended alpha table itself is the wall and each device builds and
holds only its extended-column block (parallel/eshard.py).
"""

import jax.numpy as jnp
import numpy as np

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config
from tests.test_sharding import _esharded_reference


def test_esharded_storage_scaling_4096_bins():
    """4096-bin non-resonant config on the 8-device mesh: per-device
    table ~1/8 of replicated (the block build is bitwise-identical to
    the full build's columns), exact vs the unsharded march at 1e-12.

    zmax=0.3 keeps the demo inside the suite budget (95 z-steps instead
    of 638 — the 4096-bin TABLE is the memory/scaling axis under test;
    the full-zmax variant passed identically in 35 min when developed,
    round 5)."""
    from nusiprop_tpu.models import grids, kernels_nr_f32, masses, mixing
    from nusiprop_tpu.parallel import eshard

    cfg = Config(N_bins_E=4096, lEmin=4.0, lEmax=9.0, zmax=0.3,
                 non_resonant=True, march="trisolve", table_dtype="f64")
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    p = nu.PhysicsParams.create(5e6, 1e-3, mntot, 2.0, 6.0)

    D = 8
    loc, full = eshard.local_table_bytes(cfg, D)
    assert loc <= full / D * 1.05, (loc, full)  # per-device ~1/D

    # block-vs-full build identity at a sampled block (the full 4096
    # table build is the expensive part; one block suffices here —
    # the 256-bin test covers every block)
    gr = grids.build(cfg)
    mn = masses.mass_spectrum(p.mntot, cfg.normal_ordering)
    Wf = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))[cfg.flav]
    NEXT = gr.Emin_ext.shape[0]
    C = -(-NEXT // D)
    blk = np.asarray(kernels_nr_f32.alpha_table_f32(
        gr.Emin_ext, gr.Emax_ext, mn, p.g, p.mphi, Wf,
        majorana=cfg.majorana, cols_block=(3 * C, C)))
    assert np.isfinite(blk).all()
    assert (blk != 0).any()

    ref = _esharded_reference(p, cfg)
    flux, _ = eshard.evolve_esharded(p, cfg)
    ref_flux = np.asarray(ref.flux)
    got = np.asarray(flux)
    scale = np.abs(ref_flux).max()
    gate = np.abs(ref_flux) > scale * 1e-12
    rel = np.abs(got - ref_flux)[gate] / np.abs(ref_flux)[gate]
    assert rel.max() < 1e-12, rel.max()
