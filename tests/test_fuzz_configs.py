"""Seeded random-configuration sweep: march cross-agreement + sanity.

test_march pins march equivalence on hand-picked configurations; this
sweep draws random (grid, toggle, parameter) combinations and asserts,
for each, that (a) the fast march agrees with the reference-shaped
``loop`` oracle, (b) the flux is finite and non-negative on every bin.
Seeded, so failures are reproducible; the draw ranges stay inside the
physically sane envelope (couplings/masses of the reference's own
example drivers).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import transport

N_DRAWS = 6


def _draw(rng):
    non_resonant = bool(rng.integers(2))
    # phi-phi production only acts alongside the non-resonant channels
    # (reference gate nuSIprop.hpp:166-170); draw it there
    phiphi = non_resonant and bool(rng.integers(2))
    lEmin = float(rng.uniform(4.0, 11.0))
    return dict(
        cfg=Config(
            N_bins_E=int(rng.integers(16, 40)),
            lEmin=lEmin,
            lEmax=lEmin + float(rng.uniform(2.0, 5.0)),
            zmax=float(rng.uniform(1.0, 5.0)),
            non_resonant=non_resonant,
            phiphi=phiphi,
            majorana=bool(rng.integers(2)),
            normal_ordering=bool(rng.integers(2)),
            flav=int(rng.integers(3)),
            source="powerlaw" if rng.integers(2) else "dsnb",
            march="loop",
        ),
        params=PhysicsParams.create(
            mphi=10.0 ** rng.uniform(5.0, 7.0),
            g=10.0 ** rng.uniform(-4.0, -2.0),
            mntot=float(rng.choice([0.0587, 0.1, 0.3])),
            si=float(rng.uniform(2.1, 2.9)),
            norm=1.0,
        ),
    )


@pytest.mark.parametrize("seed", range(N_DRAWS))
def test_random_config_march_agreement(seed):
    d = _draw(np.random.default_rng(20250817 + seed))
    cfg, p = d["cfg"], d["params"]
    ppt = None
    if cfg.phiphi:
        from nusiprop_tpu.models import pp_tables

        ppt = pp_tables.load_default()

    oracle = np.asarray(transport.evolve(p, cfg, pp_tables=ppt).flux_fla)
    fast_march = "trisolve" if cfg.non_resonant else "rank1"
    fast = np.asarray(transport.evolve(
        p, dataclasses.replace(cfg, march=fast_march),
        pp_tables=ppt).flux_fla)

    assert np.isfinite(oracle).all(), cfg
    assert (oracle >= 0.0).all(), cfg
    pk = np.abs(oracle).max()
    assert pk > 0.0, cfg
    gate = np.abs(oracle) > pk * 1e-10
    rel = np.abs(fast - oracle)[gate] / np.abs(oracle)[gate]
    assert rel.max() < 1e-9, (cfg, float(rel.max()))
