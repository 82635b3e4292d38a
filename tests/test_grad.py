"""Differentiability of the evolve (nusiprop_tpu.fit).

The reference engine has no gradient capability at all (serial C++,
finite-difference scans would be the only option). Here reverse-mode
jax.grad flows through the ENTIRE pipeline — kernel tables with their
dilogarithm chains and jnp.where Taylor guards, the mass-spectrum
bisection, the implicit lax.scan march and its per-step solves — and
is checked against central finite differences.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import transport

# strong-coupling s-channel point: absorption + regeneration both
# shape the spectrum, so d(flux)/d(log g) is O(1) and well-conditioned
CFG = Config(N_bins_E=40, lEmin=4.0, lEmax=9.0, zmax=5.0,
             non_resonant=False, phiphi=False)
LOG_G, LOG_MPHI = -2.0, np.log10(6e5)


def _loss(log_g, log_mphi):
    p = PhysicsParams.create(10.0 ** log_mphi, 10.0 ** log_g,
                             0.0587, 2.0, 6.0)
    f = transport.evolve(p, CFG).flux_fla
    pk = jnp.max(f)
    return jnp.sum(jnp.log(jnp.maximum(f, pk * 1e-12)))


def test_grad_matches_finite_differences():
    val, grads = jax.value_and_grad(_loss, argnums=(0, 1))(LOG_G, LOG_MPHI)
    assert np.isfinite(val)
    eps = 1e-5
    fd = (
        (_loss(LOG_G + eps, LOG_MPHI) - _loss(LOG_G - eps, LOG_MPHI))
        / (2 * eps),
        (_loss(LOG_G, LOG_MPHI + eps) - _loss(LOG_G, LOG_MPHI - eps))
        / (2 * eps),
    )
    for g_ad, g_fd in zip(grads, fd):
        assert abs(float(g_ad) / float(g_fd) - 1.0) < 1e-5, (grads, fd)


def test_fit_recovers_coupling():
    """Hide g*, evolve a target spectrum, recover g by Adam from a
    4x-off initialization — one compiled lax.scan of grad steps."""
    true = PhysicsParams.create(6e5, 1e-2, 0.0587, 2.0, 6.0)
    target = transport.evolve(true, CFG).flux_fla
    init = PhysicsParams.create(6e5, 10.0 ** -2.6, 0.0587, 2.0, 6.0)
    res = nu.fit(CFG, target, init, fit_fields=("g",), steps=60,
                 learning_rate=0.1)
    assert abs(float(jnp.log10(res.params.g)) - (-2.0)) < 0.02, (
        float(res.params.g), float(res.loss))
    assert float(res.loss) < 1e-3
    # history is the recorded per-step loss curve
    assert res.history.shape == (60,)


def test_fit_input_validation():
    init = PhysicsParams.create(6e5, 1e-2, 0.0587, 2.0, 6.0)
    with pytest.raises(ValueError, match="unknown fit fields"):
        nu.fit(CFG, np.ones((3, 40)), init, fit_fields=("gee",))
    with pytest.raises(ValueError, match="f32"):
        nu.fit(Config(N_bins_E=40, lEmin=4.0, lEmax=9.0,
                      non_resonant=True, march="trisolve_f32"),
               np.ones((3, 40)), init)


def test_fisher_flags_the_degeneracy_ridge():
    """At the sub-resonance point the Fisher matrix in (log10 g,
    log10 mphi) must be near-singular along the (1, 1) ridge direction
    (equal log shifts preserve the spectrum — see examples/run_fit.py)."""
    p = PhysicsParams.create(6e5, 1e-2, 0.0587, 2.0, 6.0)
    F, cov = nu.fisher(CFG, p, fit_fields=("g", "mphi"))
    w, v = np.linalg.eigh(np.asarray(F))
    assert w[0] / w[1] < 1e-3, w          # near-singular
    ridge = v[:, 0] / np.linalg.norm(v[:, 0])
    assert abs(abs(ridge @ np.array([1.0, 1.0]) / np.sqrt(2)) - 1) < 1e-2
    assert np.asarray(cov).shape == (2, 2)


def test_fit_multistart_batched_init():
    true = PhysicsParams.create(6e5, 1e-2, 0.0587, 2.0, 6.0)
    target = transport.evolve(true, CFG).flux_fla
    inits = nu.stack_params([
        PhysicsParams.create(6e5, 10.0 ** lg, 0.0587, 2.0, 6.0)
        for lg in (-3.0, -2.4, -1.4)])
    res = nu.fit(CFG, target, inits, fit_fields=("g",), steps=60,
                 learning_rate=0.1)
    assert abs(float(jnp.log10(res.params.g)) - (-2.0)) < 0.02
    assert res.history.shape == (60,)


def test_fisher_rejects_f32_march():
    p = PhysicsParams.create(6e5, 1e-2, 0.0587, 2.0, 6.0)
    with pytest.raises(ValueError, match="f32"):
        nu.fisher(Config(N_bins_E=40, lEmin=4.0, lEmax=9.0,
                         non_resonant=True, march="trisolve_f32"), p)


def test_fit_multistart_rejects_partially_batched_init():
    """Every PhysicsParams leaf must share the leading start axis; a
    hand-built init with a scalar leaf among batched ones would
    otherwise vmap inconsistently."""
    import dataclasses

    inits = nu.stack_params([
        PhysicsParams.create(6e5, 1e-3, 0.0587, 2.0, 6.0),
        PhysicsParams.create(6e5, 1e-2, 0.0587, 2.0, 6.0)])
    mixed = dataclasses.replace(inits, si=2.0)
    with pytest.raises(ValueError, match="common leading axis"):
        nu.fit(CFG, np.ones((3, 40)), mixed, fit_fields=("g",))


def test_fit_multistart_rejects_varying_frozen_field():
    inits = nu.stack_params([
        PhysicsParams.create(6e5, 1e-2, 0.0587, 2.0, 6.0),
        PhysicsParams.create(7e5, 1e-2, 0.0587, 2.0, 6.0)])
    with pytest.raises(ValueError, match="varies across starts"):
        nu.fit(CFG, np.ones((3, 40)), inits, fit_fields=("g",))


def test_grad_nonresonant_matches_finite_differences():
    """The non-resonant kernel chains (dilog closed forms incl. the
    alpha_tu where-guards) must be reverse-mode differentiable: pins
    the _log1p representable-floor fix (a -1.0+1e-30 floor is == -1.0
    in f64, so log1p(-1) = -inf leaked 0*inf = NaN into d/dmphi)."""
    cfg = Config(N_bins_E=24, lEmin=9.0, lEmax=14.0, non_resonant=True,
                 phiphi=False, source="powerlaw")

    def loss(lg, lm):
        p = PhysicsParams.create(10.0 ** lm, 10.0 ** lg, 0.1, 2.5, 1.0)
        f = transport.evolve(p, cfg).flux_fla
        pk = jnp.max(f)
        return jnp.sum(jnp.log(jnp.maximum(f, pk * 1e-12)))

    lg, lm = -2.0, float(np.log10(6e5))
    grads = jax.grad(loss, argnums=(0, 1))(lg, lm)
    eps = 1e-5
    fd = ((loss(lg + eps, lm) - loss(lg - eps, lm)) / (2 * eps),
          (loss(lg, lm + eps) - loss(lg, lm - eps)) / (2 * eps))
    for g_ad, g_fd in zip(grads, fd):
        assert np.isfinite(float(g_ad))
        assert abs(float(g_ad) / float(g_fd) - 1.0) < 1e-5, (grads, fd)


def test_grad_phiphi_matches_finite_differences():
    """The phi-phi channel (threshold-clamped closed forms + spline
    tables) must also be reverse-mode differentiable: pins the _sqrt
    representable floor (sqrt(0) at the s=4 clamp made 0*inf = NaN)."""
    from nusiprop_tpu.models import pp_tables

    cfg = Config(N_bins_E=24, lEmin=9.0, lEmax=14.0, non_resonant=True,
                 phiphi=True, source="powerlaw")
    ppt = pp_tables.load_default()

    def loss(lg, lm):
        p = PhysicsParams.create(10.0 ** lm, 10.0 ** lg, 0.1, 2.5, 1.0)
        f = transport.evolve(p, cfg, pp_tables=ppt).flux_fla
        pk = jnp.max(f)
        return jnp.sum(jnp.log(jnp.maximum(f, pk * 1e-12)))

    lg, lm = -2.0, float(np.log10(6e5))
    grads = jax.grad(loss, argnums=(0, 1))(lg, lm)
    eps = 1e-5
    fd = ((loss(lg + eps, lm) - loss(lg - eps, lm)) / (2 * eps),
          (loss(lg, lm + eps) - loss(lg, lm - eps)) / (2 * eps))
    for g_ad, g_fd in zip(grads, fd):
        assert np.isfinite(float(g_ad))
        assert abs(float(g_ad) / float(g_fd) - 1.0) < 1e-4, (grads, fd)


def test_grad_general_coupling_matches_finite_differences():
    """Non-diagonal flavor couplings (evolve_general, per-state tables)
    are reverse-mode differentiable as well."""
    import nusiprop_tpu as nu2

    cfg = Config(N_bins_E=24, lEmin=9.0, lEmax=14.0, non_resonant=True,
                 phiphi=False, source="powerlaw")
    G = np.zeros((3, 3))
    G[1, 1], G[2, 2] = 0.5, 1.0
    Q = nu2.flavor_coupling_to_Q(G)

    def loss(lg, lm):
        p = PhysicsParams.create(10.0 ** lm, 10.0 ** lg, 0.1, 2.5, 1.0)
        f = transport.evolve_general(p, Q, cfg).flux_fla
        pk = jnp.max(f)
        return jnp.sum(jnp.log(jnp.maximum(f, pk * 1e-12)))

    lg, lm = -2.0, float(np.log10(6e5))
    grads = jax.grad(loss, argnums=(0, 1))(lg, lm)
    eps = 1e-5
    fd = ((loss(lg + eps, lm) - loss(lg - eps, lm)) / (2 * eps),
          (loss(lg, lm + eps) - loss(lg, lm - eps)) / (2 * eps))
    for g_ad, g_fd in zip(grads, fd):
        assert np.isfinite(float(g_ad))
        assert abs(float(g_ad) / float(g_fd) - 1.0) < 1e-4, (grads, fd)
