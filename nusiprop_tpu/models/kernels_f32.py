"""Native-float32 s-channel kernel tables for the rank1_f32 march.

The emulated-f64 table build dominates the headline evolve wallclock
(~75-90% measured; BENCH_NOTES.md). For the s-channel (the reference's
benchmark path, nuSIprop.hpp:779-791, 956-970, 1264-1275) the closed
forms can run in the TPU's native float32 with full accuracy where it
matters, because the march only consumes kernel entries through
O(1)-ish row coefficients: a relative error eps on an entry whose
per-step optical depth / regeneration weight is q contributes ~q*eps
to the flux, so precision is only needed on the DOMINANT entries —
exactly the ones far from catastrophic cancellation.

Design (full derivation in docs/DESIGN.md):

1. **Coordinates in f64, transcendentals in f32.** s-1 and 1+t (the
   distance to the resonance) and the exact bin-width difference
   d = sp-sm are precomputed in (emulated) f64 — a handful of
   elementwise ops — and cast. Computing s-1 in f32 would carry a
   1e-7*s absolute error that atan((s-1)/gr) amplifies by 1/gr for bin
   edges landing near the resonance.
2. **Difference-form arctans.** atan(x) - atan(y) evaluates as
   atan((x-y)/(1+xy)) + pi*[xy < -1] (x > y always holds here), with
   x-y supplied exactly from d: uniformly ~1e-7 relative. The separate
   atans would cancel catastrophically for adjacent bin edges (2.3%
   apart).
3. **Factorized log terms.** log1p(A sp(sp-2)) - log1p(A sm(sm-2)) ==
   log((gr^2+sp1^2)/(gr^2+sm1^2)), evaluated as log1p of the exactly-
   factored difference near ratio 1 and as a plain log otherwise (the
   log1p argument itself can round to -1 in f32 at ratio ~ 1e-8).
4. **Joint small-s series.** Far below resonance the Taylor core and
   the log term cancel to O(s*d) out of O(d) pieces, so computing them
   separately leaves 1e-7/s relative noise in f32 — the residual is a
   sympy-derived degree-5 joint series of (core + ga*logterm), switched
   at s < 1e-2 (series error <~6e-7 there; mpmath-validated in f32).
5. **Prefactors factored out.** The assembled tables for weak
   couplings sit below the f32 exponent window (rho ~ 1e-39 at the
   golden g = 1e-6 — which the emulated-f64 TPU build silently flushes
   too!). The builders return NORMALIZED tables with the per-table
   prefactor returned separately as an f64 scalar, applied inside the
   f64 row groupings of transport._rank1_f32_rows where the exponent
   window machinery (pairing small with large factors) already lives.

Validated against the f64 build end-to-end (tests/test_march.py) and
on real TPU by tools/tpu_crosscheck.py --f32.
"""

import math

import jax.numpy as jnp

from nusiprop_tpu.models.kernels import scalar_width, _shift_near_minus1

PI = math.pi
F32 = jnp.float32


def _atandiff32(u, xy):
    """atan(x) - atan(y) for x > y, given u = (x-y)/(1+xy) and xy."""
    return jnp.arctan(u) + jnp.where(xy < -1.0, jnp.float32(PI),
                                     jnp.float32(0.0))


def _logratio32(d_num, m1_sq_gr, ratio):
    """log(ratio) with ratio = (gr^2+p1^2)/(gr^2+m1^2), given the exact
    log1p argument d_num/m1_sq_gr == ratio - 1. Switches to the plain
    log when the ratio is far from 1 (where the f32 log1p argument can
    round to -1 and produce -inf)."""
    arg = d_num / m1_sq_gr
    return jnp.where(jnp.abs(arg) < 0.5, jnp.log1p(arg), jnp.log(ratio))


def _series_gamma(sm, d, gr2, iG):
    """Joint degree-5 series of (core_exact + ga*lt)/(mphi*gr) for
    Gamma, sm = s_minus, d = sp-sm, iG = 1/(1+gr^2). sympy-derived from
    the TRUE arctan core via atan((1-s)/gr) = pi/2 - atan(gr/(1-s));
    mpmath-validated to <~1e-7 in f32 for s <= 1e-2 (docstring item 4)."""
    iG2 = iG * iG
    iG3 = iG2 * iG
    iG4 = iG2 * iG2
    e8 = (8.0 - 8.0 * gr2) * iG4
    e62 = (6.0 - 2.0 * gr2) * iG3
    c5 = 0.2 * e8
    c4 = sm * e8 + (1.5 - 0.5 * gr2) * iG3
    c3 = sm * (sm * (2.0 * e8) + e62) + (4.0 / 3.0) * iG2
    c2 = sm * (sm * (sm * (2.0 * e8) + (9.0 - 3.0 * gr2) * iG3)
               + 4.0 * iG2) + iG
    c1 = sm * (sm * (sm * (sm * e8 + e62) + 4.0 * iG2) + 2.0 * iG)
    return d * (c1 + d * (c2 + d * (c3 + d * (c4 + d * c5))))


def _series_alphatilde(um, d, gr2, iG):
    """Joint degree-5 series for alphaTilde, um = -t_minus, d = tm-tp.
    The d^1 coefficient is EXACTLY zero — a second cancellation level
    the separate-pieces evaluation cannot survive in f32."""
    iG2 = iG * iG
    iG3 = iG2 * iG
    iG4 = iG2 * iG2
    e8 = (8.0 - 8.0 * gr2) * iG4
    c5 = 0.2 * e8
    c4 = um * (6.0 - 6.0 * gr2) * iG4 + (1.5 - 0.5 * gr2) * iG3
    c3 = um * (um * e8 + (4.0 - (4.0 / 3.0) * gr2) * iG3) + (4.0 / 3.0) * iG2
    c2 = um * (um * (um * (4.0 - 4.0 * gr2) * iG4
                     + (3.0 - gr2) * iG3) + 2.0 * iG2) + iG
    return d * d * (c2 + d * (c3 + d * (c4 + d * c5)))


# switch to the joint series below this sp (the separate exact pieces
# carry ~1e-7/s relative cancellation noise in f32; the series is
# <~6e-7 up to here)
S_SWITCH = 1e-2


def s_channel_tables_f32(Emin_ext, Emax_ext, mn, g, mphi, Wf, *,
                         majorana: bool, width_factor=None):
    """Normalized s-channel tables in native float32.

    Returns ``(tblG, tblAt, rho, (pref_G, pref_At, pref_rho))``: three
    (N,) float32 arrays and their float64 scalar prefactors, such that
    ``pref_* * tbl_*`` equals the corresponding f64 builder output
    (kernels.gamma_table / alphatilde_table / alpha_s_rho restricted to
    channel="s"). Dirac halving and the near-resonance coordinate shift
    (nuSIprop.hpp:949-954) match the f64 builders exactly.
    """
    ga = scalar_width(g, mphi, majorana)
    if width_factor is not None:
        ga = ga * width_factor

    # ---- f64 coordinate precompute (cheap elementwise) ----
    mn_c = mn[:, None]
    inv_m2 = 1.0 / (mphi * mphi)
    s_m = 2.0 * mn_c * Emin_ext[None, :] * inv_m2
    s_p = 2.0 * mn_c * Emax_ext[None, :] * inv_m2
    d64 = 2.0 * mn_c * (Emax_ext - Emin_ext)[None, :] * inv_m2
    sm1_64 = s_m - 1.0
    sp1_64 = s_p - 1.0
    tm64 = _shift_near_minus1(-s_m)
    tp64 = _shift_near_minus1(-s_p)
    tm1_64 = 1.0 + tm64
    tp1_64 = 1.0 + tp64
    dt64 = tm64 - tp64  # == d64 except where the shift fired

    gr64 = ga / mphi
    f = lambda a: jnp.asarray(a).astype(F32)
    sm1, sp1, tm1, tp1 = f(sm1_64), f(sp1_64), f(tm1_64), f(tp1_64)
    d, dt = f(d64), f(dt64)
    sp32, smf = f(s_p), f(s_m)
    umf, upf = f(-tm64), f(-tp64)
    gr = f(gr64)
    inv_gr = f(1.0 / gr64)
    mphi32 = f(mphi)
    ga32 = f(ga)
    gr2 = gr * gr
    G2 = 1.0 + gr2
    iG = 1.0 / G2

    # ---- shared resonance factor R = atandiff((sp-1)/gr, (sm-1)/gr) ----
    x_p = sp1 * inv_gr
    x_m = sm1 * inv_gr
    xy_s = x_p * x_m
    u_s = (d * inv_gr) / (1.0 + xy_s)
    R_exact = _atandiff32(u_s, xy_s)
    R_taylor = (gr * (G2 + 2.0 * smf) / (G2 * G2) * d
                + gr / (G2 * G2) * d * d)
    R = jnp.where(sp32 < 1e-5, R_taylor, R_exact)

    # ---- Gamma (nuSIprop.hpp:779-791): pref_G*(2 mphi R + ga lt) ----
    sm1_sq_gr = gr2 + sm1 * sm1
    ratio_G = (gr2 + sp1 * sp1) / sm1_sq_gr
    lt_G = _logratio32(d * (sp1 + sm1), sm1_sq_gr, ratio_G)
    G_exact = 2.0 * mphi32 * R_exact + ga32 * lt_G
    G_small = (mphi32 * gr) * _series_gamma(smf, d, gr2, iG)
    tblG_e = jnp.where(sp32 < S_SWITCH, G_small, G_exact)

    # ---- alphaTilde (nuSIprop.hpp:956-970) ----
    y_m = tm1 * inv_gr
    y_p = tp1 * inv_gr
    xy_t = y_m * y_p
    u_t = (dt * inv_gr) / (1.0 + xy_t)
    core_t = 2.0 * mphi32 * tm1 * _atandiff32(u_t, xy_t)
    tm1_sq_gr = gr2 + tm1 * tm1
    ratio_t = (gr2 + tp1 * tp1) / tm1_sq_gr
    lt_t = _logratio32(-dt * (tp1 + tm1), tm1_sq_gr, ratio_t)
    At_exact = core_t + ga32 * lt_t
    At_small = (mphi32 * gr) * _series_alphatilde(umf, dt, gr2, iG)
    tblAt_e = jnp.where(upf < S_SWITCH, At_small, At_exact)

    # ---- rho: source factor of the rank-one alpha (kernels.alpha_s_rho,
    #      nuSIprop.hpp:1264-1269) ----
    rho_e = dt * R

    if not majorana:
        tblAt_e = tblAt_e * 0.5
        rho_e = rho_e * 0.5

    # eigenstate reduction |U|^2 / (2 mn); weights precomputed in f64
    w_e = f(Wf[:, None] / (2.0 * mn_c))
    tblG = jnp.sum(w_e * tblG_e, axis=0)
    tblAt = jnp.sum(w_e * tblAt_e, axis=0)
    inv_dE = f(1.0 / (Emax_ext - Emin_ext))
    rho = jnp.sum(w_e * rho_e, axis=0) * inv_dE

    # f64 scalar prefactors, range-safe order (g^2/denom)*g^2
    g64 = jnp.asarray(g, jnp.float64)
    g2_64 = g64 * g64
    pref_G = g2_64 / (32.0 * PI * ga) * g2_64
    pref_At = g2_64 / (16.0 * PI * ga) * g2_64
    pref_rho = (g2_64 / (8.0 * PI * ga) * g2_64) * mphi
    return tblG, tblAt, rho, (pref_G, pref_At, pref_rho)
