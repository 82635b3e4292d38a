"""Checkpointed grid scan: chunking, resume, and equivalence to grid_scan."""

import numpy as np
import pytest

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))


@pytest.fixture(scope="module")
def cfg():
    return Config(N_bins_E=24, lEmin=4.0, lEmax=9.0, non_resonant=False,
                  phiphi=False)


@pytest.fixture(scope="module")
def params():
    return nu.param_grid(np.geomspace(1e5, 1e8, 5), [1e-6, 1e-5],
                         mntot=MNTOT, si=2.0, norm=6.0)  # 10 points


def test_matches_grid_scan(tmp_path, cfg, params):
    out = nu.checkpointed_grid_scan(params, cfg, tmp_path / "scan.npz",
                                    chunk_size=4)  # 3 chunks, ragged tail
    ref = nu.grid_scan(params, cfg)
    np.testing.assert_allclose(out["flux_fla"], np.asarray(ref.flux_fla),
                               rtol=1e-13)
    assert out["flux"].shape == (10, 3, 24)
    assert (tmp_path / "scan.npz").exists()
    # chunk files cleaned up after the merge
    assert not list(tmp_path.glob("*.chunk*.npz"))


def test_resume_skips_complete_chunks(tmp_path, cfg, params):
    path = tmp_path / "scan.npz"

    class Preempt(Exception):
        pass

    def die_after_two(c, n):
        if c == 2:
            raise Preempt

    with pytest.raises(Preempt):
        nu.checkpointed_grid_scan(params, cfg, path, chunk_size=4,
                                  progress=die_after_two)
    assert len(list(tmp_path.glob("*.chunk*.npz"))) == 2

    # resume: only the remaining chunk is computed
    visited = []
    out = nu.checkpointed_grid_scan(params, cfg, path, chunk_size=4,
                                    progress=lambda c, n: visited.append(c))
    assert visited == [3]
    ref = nu.grid_scan(params, cfg)
    np.testing.assert_allclose(out["flux_fla"], np.asarray(ref.flux_fla),
                               rtol=1e-13)
