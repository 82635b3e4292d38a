"""Self-interaction kernel tables: absorption Gamma, same-bin regeneration
alphaTilde, and bin-to-bin regeneration alpha.

The reference computes these as ~(NE+Nz)^2/2 scalar calls into ~800 lines
of closed-form channel integrals (nuSIprop.hpp:759-1520). Here each channel
is an elementwise float64 JAX expression evaluated over whole bin-edge
arrays at once: the absorption/same-bin tables are (3, NEXT) evaluations
and the bin-to-bin table is a (3, NEXT, NEXT) evaluation, all fused by XLA
into a single device program — this precompute is the dominant cost of an
evolve() and is embarrassingly parallel, which is exactly what the VPU
wants.

Channel inventory (per eigenstate, cf. reference lines):
  s                 — resonant Breit-Wigner           (:779-791, :956-970, :1264-1275)
  t + u             — non-resonant                    (:796-816, :975-1069, :1280-1367)
  t-u interference  —                                 (:818-840, :1071-1132, :1369-1425)
  s-t interference  — needs complex dilogarithms      (:842-872, :1134-1186, :1427-1467)
  s-u interference  — = s-t for Majorana, else 0      (:874-878, :1188-1192, :1469-1474)
  phi-phi           — double scalar production        (:880-907, :1194-1213, :1476-1503)

Every closed form carries the reference's Taylor-expansion guards and its
"negative => 3-point Gauss-Legendre rescue" fallbacks, expressed as
compute-both + jnp.where.

Conventions: all dimensionless integration limits are in units of mphi^2,
  splus/sminus   = +2 mn E / mphi^2 (absorption; source bins of alpha)
  tplus/tminus   = -2 mn E / mphi^2 (regeneration target bins)

RANGE SAFETY (TPU): the f64 emulation on TPU carries float32 exponent
range (~1e+/-38). The reference's literal factor groupings overflow it
(g^4 alone underflows for g < 1e-9; mphi^4/(2 mn) reaches 1e50 for a
floored massless eigenstate). Each channel here therefore returns the
reference value PRE-MULTIPLIED by mphi^2 (Gamma) or mphi^4 (alpha,
alphaTilde) — cancelling those powers symbolically against the channel's
own 1/mphi^k — and prefactors are evaluated in the order
(g^2 / denom) * g^2 so no intermediate leaves the safe range. The table
builders then apply only |U|^2 / (2 mn).
"""

import math

import jax.numpy as jnp
from jax import lax

from nusiprop_tpu.ops import specfun as sf
from nusiprop_tpu.ops.quadrature import GL3_W, GL3_X

PI = math.pi

# Pair-chunk size for the spline-backed pp alpha build (see alpha_table):
# one chunk body is what the TPU compiler sees, so this bounds compiler
# memory; runtime cost is unchanged (elementwise work, same total).
_PP_CHUNK = 8192


def scalar_width(g, mphi, majorana: bool):
    """Scalar decay width (nuSIprop.hpp:748-757)."""
    if majorana:
        return g * g * mphi / (16.0 * PI)
    return g * g * mphi / (8.0 * PI)


def _shift_near_minus1(t):
    """Avoid exact division by zero at t == -1 (nuSIprop.hpp:949-954)."""
    return jnp.where(jnp.abs(t + 1.0) < 1e-7, t + t * 1e-6, t)


# ---------------------------------------------------------------------------
# s-channel (resonant) closed forms
# ---------------------------------------------------------------------------

def gamma_s(sm, sp, g, mphi, ga):
    """s-channel absorption integral over one bin (nuSIprop.hpp:779-791).

    Returns mphi^2 * Gamma_s, without the |U|^2 weight and the 1/(2 mn)
    prefactor (see RANGE SAFETY above).
    """
    gr = ga / mphi
    pref = (g * g) / (32.0 * PI * ga) * (g * g)
    logterm = jnp.log1p(
        mphi * mphi / (mphi * mphi + ga * ga) * sp * (sp - 2.0)
    ) - jnp.log1p(mphi * mphi / (mphi * mphi + ga * ga) * sm * (sm - 2.0))
    d = sp - sm
    taylor = 2.0 * mphi * (
        gr * (1.0 + gr * gr + 2.0 * sm) / (1.0 + gr * gr) ** 2 * d
        + gr / (1.0 + gr * gr) ** 2 * d * d
    )
    exact = 2.0 * mphi * sf.atandiff(mphi * (sp - 1.0) / ga, mphi * (sm - 1.0) / ga)
    core = jnp.where(sp < 1e-5, taylor, exact)
    return pref * (core + ga * logterm)


def alphatilde_s(tm, tp, g, mphi, ga):
    """s-channel same-bin regeneration, times mphi^4 (nuSIprop.hpp:956-965)."""
    gr = ga / mphi
    pref = (g * g) / (16.0 * PI * ga) * (g * g)
    logterm = jnp.log1p(
        mphi * mphi / (mphi * mphi + ga * ga) * tp * (tp + 2.0)
    ) - jnp.log1p(mphi * mphi / (mphi * mphi + ga * ga) * tm * (tm + 2.0))
    d = tp - tm
    taylor = (
        2.0
        * mphi
        * (1.0 + tm)
        * (
            -(gr * (1.0 + gr * gr - 2.0 * tm) * d) / (1.0 + gr * gr) ** 2
            + gr * d * d / (1.0 + gr * gr) ** 2
        )
    )
    exact = (
        2.0
        * mphi
        * (1.0 + tm)
        * sf.atandiff(mphi * (1.0 + tm) / ga, mphi * (1.0 + tp) / ga)
    )
    core = jnp.where(jnp.abs(tp) < 1e-5, taylor, exact)
    return pref * (core + ga * logterm)


def alpha_s(tm, tp, smp, spp, g, mphi, ga):
    """s-channel bin-to-bin regeneration (nuSIprop.hpp:1264-1269).

    Separable: (tm - tp) from the target bin times a resonance factor of
    the source bin — the basis of the reference's alpha_cum fast path.
    Returns mphi^4 * alpha_s.
    """
    gr = ga / mphi
    pref = (g * g) / (8.0 * PI * ga) * (g * g) * mphi
    d = spp - smp
    taylor = (
        gr * (1.0 + gr * gr + 2.0 * smp) / (1.0 + gr * gr) ** 2 * d
        + gr / (1.0 + gr * gr) ** 2 * d * d
    )
    exact = sf.atandiff(mphi * (spp - 1.0) / ga, mphi * (smp - 1.0) / ga)
    return pref * (tm - tp) * jnp.where(spp < 1e-5, taylor, exact)


# ---------------------------------------------------------------------------
# Table builders
# ---------------------------------------------------------------------------

def gamma_table(Em, Ep, mn, g, mphi, Wf, *, majorana, non_resonant, phiphi,
                pp_tables=None, channel="all", width_factor=None):
    """Absorption table: sum_j int_Em^Ep sigma_j dE / |U_f i|^2.

    Em/Ep: (N,) extended bin edges; mn: (3,); Wf: (3,) = |U[flav]|^2.
    Returns (N,). ``channel`` restricts to one contribution ("s" or a
    kernels_nr channel name) so the staged builder can compile each as a
    separate XLA program.
    """
    ga = scalar_width(g, mphi, majorana)
    if width_factor is not None:  # general couplings: width ~ sum(Q)
        ga = ga * width_factor
    mn_c = mn[:, None]
    sp = 2.0 * mn_c * Ep[None, :] / (mphi * mphi)
    sm = 2.0 * mn_c * Em[None, :] / (mphi * mphi)

    if channel in ("all", "s"):
        tot = gamma_s(sm, sp, g, mphi, ga)
    else:
        tot = jnp.zeros_like(sm)
    if non_resonant and channel != "s":
        from nusiprop_tpu.models import kernels_nr

        tot = tot + kernels_nr.gamma_nonresonant(
            sm, sp, g, mphi, ga, majorana=majorana, phiphi=phiphi,
            pp_tables=pp_tables, channel=channel,
        )
    # channels return mphi^2 * Gamma_ch, so only |U|^2/(2 mn_j) remains
    if Wf is None:  # per-bath-eigenstate table for non-diagonal couplings
        return tot / (2.0 * mn_c)
    return jnp.sum(Wf[:, None] / (2.0 * mn_c) * tot, axis=0)


def alphatilde_table(Em, Ep, mn, g, mphi, Wf, *, majorana, non_resonant,
                     phiphi, pp_tables=None, channel="all", width_factor=None):
    """Same-bin regeneration table (N,)."""
    ga = scalar_width(g, mphi, majorana)
    if width_factor is not None:  # general couplings: width ~ sum(Q)
        ga = ga * width_factor
    mn_c = mn[:, None]
    tp = -2.0 * mn_c * Ep[None, :] / (mphi * mphi)
    tm = -2.0 * mn_c * Em[None, :] / (mphi * mphi)
    tm = _shift_near_minus1(tm)
    tp = _shift_near_minus1(tp)

    if channel in ("all", "s"):
        tot = alphatilde_s(tm, tp, g, mphi, ga)
        if not majorana:
            tot = tot / 2.0  # one of the final Dirac neutrinos is sterile
    else:
        tot = jnp.zeros_like(tm)
    if non_resonant and channel != "s":
        from nusiprop_tpu.models import kernels_nr

        tot = tot + kernels_nr.alphatilde_nonresonant(
            tm, tp, g, mphi, ga, majorana=majorana, phiphi=phiphi,
            pp_tables=pp_tables, channel=channel,
        )
    if Wf is None:
        return tot / (2.0 * mn_c)
    return jnp.sum(Wf[:, None] / (2.0 * mn_c) * tot, axis=0)


def _pairs_chunked(fn, tm, tp, smp, spp):
    """Evaluate ``fn(tm, tp, smp, spp)`` over flattened (3, NT) pair
    coordinates, ``lax.map``'d over fixed ``_PP_CHUNK``-pair blocks when
    NT is large.

    The spline-backed pp program over all N(N-1)/2 pairs fuses a
    64-point 3-D gather stencil with the three Taylor-tail branches; at
    production bin counts in (TPU-emulated) f64 that single fused graph
    crashes the TPU compiler (observed: remote compile-helper death at
    500 bins x batch 64 after ~7 min). lax.map over fixed-size pair
    chunks compiles ONE chunk body and bounds compiler memory;
    elementwise => bitwise-identical (up to fusion-dependent last-ulp
    rounding, see tests/test_staged_tables.py)."""
    NT = tm.shape[-1]
    if NT <= _PP_CHUNK:
        return fn(tm, tp, smp, spp)
    pad = (-NT) % _PP_CHUNK
    K = (NT + pad) // _PP_CHUNK

    def _chunk(c):
        return fn(c[0], c[1], c[2], c[3])

    coords = jnp.stack([
        jnp.pad(a, ((0, 0), (0, pad)), mode="edge")
        .reshape(3, K, _PP_CHUNK).swapaxes(0, 1)
        for a in (tm, tp, smp, spp)], axis=1)      # (K, 4, 3, C)
    tot = lax.map(_chunk, coords)                  # (K, 3, C)
    return tot.swapaxes(0, 1).reshape(3, K * _PP_CHUNK)[:, :NT]


def alpha_table(Em, Ep, mn, g, mphi, Wf, *, majorana, non_resonant, phiphi,
                pp_tables=None, channel="all", width_factor=None):
    """Bin-to-bin regeneration table (N, N): rows = target bin, cols =
    source bin, strictly-upper-triangular (source above target), zero
    elsewhere — the march's masked contraction relies on those zeros.
    """
    import numpy as _np

    ga = scalar_width(g, mphi, majorana)
    if width_factor is not None:  # general couplings: width ~ sum(Q)
        ga = ga * width_factor
    N = Em.shape[0]
    mn_c = mn[:, None]
    # Only the strict upper triangle (source bin above target bin) is
    # physical — evaluate the transcendental-heavy channels on the
    # flattened N(N-1)/2 pairs and scatter, HALVING the dominant cost of
    # a non-resonant evolve. Indices are static (shapes fix them).
    rows, cols = _np.triu_indices(N, k=1)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    # target-bin limits from rows, source-bin limits from cols: (3, NT)
    tp = -2.0 * mn_c * Ep[rows][None, :] / (mphi * mphi)
    tm = -2.0 * mn_c * Em[rows][None, :] / (mphi * mphi)
    tm = _shift_near_minus1(tm)
    tp = _shift_near_minus1(tp)
    spp = 2.0 * mn_c * Ep[cols][None, :] / (mphi * mphi)
    smp = 2.0 * mn_c * Em[cols][None, :] / (mphi * mphi)

    def _tot(tm, tp, smp, spp):
        if channel in ("all", "s"):
            tot = alpha_s(tm, tp, smp, spp, g, mphi, ga)
            if not majorana:
                tot = tot / 2.0
        else:
            tot = jnp.zeros_like(tm)
        if non_resonant and channel != "s":
            from nusiprop_tpu.models import kernels_nr

            tot = tot + kernels_nr.alpha_nonresonant(
                tm, tp, smp, spp, g, mphi, ga, majorana=majorana,
                phiphi=phiphi, pp_tables=pp_tables, channel=channel,
            )
        return tot

    if channel == "pp":
        tot = _pairs_chunked(_tot, tm, tp, smp, spp)
    else:
        tot = _tot(tm, tp, smp, spp)
    tot = tot / (2.0 * mn_c)
    if Wf is None:
        out = jnp.zeros((3, N, N), dtype=tot.dtype)
        return out.at[:, rows, cols].set(tot)
    res = jnp.sum(Wf[:, None] * tot, axis=0)  # (NT,)
    out = jnp.zeros((N, N), dtype=res.dtype)
    return out.at[rows, cols].set(res)


def alpha_pp_table_norm(Em, Ep, mn, mphi, Wf, *, majorana, pp_tables):
    """NORMALIZED phi-phi alpha channel table: alpha_table(channel="pp")
    WITHOUT the g^4 coupling prefactor, in the spline-values dtype.

    For the native-f32 march's normalized-table fold (pref = g^4,
    kernels_nr_f32.alpha_table_f32 raw=True): folding the pp channel as
    (g^4 * val) / g^4 would materialize weak-coupling intermediates
    (~1e-60) below the exponent window the TPU's emulated f64 carries;
    here g^4 never touches the values. With f32-cast tables
    (ops/interp.SplineND.astype) the 64-point 3-D stencil contraction —
    the pp channel's dominant op count — runs in native f32
    (kernels_nr.alpha_pp_val), which is also what makes the program
    small enough to compile and run at production bin counts x batch.
    """
    import numpy as _np

    from nusiprop_tpu.models import kernels_nr

    N = Em.shape[0]
    mn_c = mn[:, None]
    rows, cols = _np.triu_indices(N, k=1)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    tp = _shift_near_minus1(-2.0 * mn_c * Ep[rows][None, :] / (mphi * mphi))
    tm = _shift_near_minus1(-2.0 * mn_c * Em[rows][None, :] / (mphi * mphi))
    spp = 2.0 * mn_c * Ep[cols][None, :] / (mphi * mphi)
    smp = 2.0 * mn_c * Em[cols][None, :] / (mphi * mphi)

    def _fn(tm, tp, smp, spp):
        return kernels_nr.alpha_pp_norm(
            tm, tp, smp, spp, majorana=majorana, pp_tables=pp_tables)

    tot = _pairs_chunked(_fn, tm, tp, smp, spp)       # (3, NT)
    if Wf is None:  # per-state (3, N, N) for general couplings
        res = jnp.asarray(1.0 / (2.0 * mn_c), tot.dtype) * tot
        out = jnp.zeros((3, N, N), dtype=res.dtype)
        return out.at[:, rows, cols].set(res)
    w_e = jnp.asarray(Wf[:, None] / (2.0 * mn_c), tot.dtype)
    res = jnp.sum(w_e * tot, axis=0)                  # (NT,)
    out = jnp.zeros((N, N), dtype=res.dtype)
    return out.at[rows, cols].set(res)


def alpha_s_rho(Em, Ep, mn, g, mphi, Wf, *, majorana, width_factor=None,
                scaled=False):
    """Source-side factor of the (exactly rank-one) s-channel alpha table.

    alpha_s (nuSIprop.hpp:1264-1269) factorizes as (tm - tp)_target x
    R(source); under the table builder's |U|^2/(2 mn) eigenstate sum the
    mn-dependence of the target factor cancels, so the s-channel-only
    alpha table is exactly

        alpha_table[j, m] = (Ep[j] - Em[j]) * rho[m]      (j < m).

    This is the TPU-native form of the reference's ``alpha_cum`` O(N)
    fast path (nuSIprop.hpp:261-264, 273-278). rho is recovered from the
    same-bin diagonal evaluation divided by the bin width — exactly how
    the reference's accumulator uses alpha_jj — which keeps the
    near-resonance shift (nuSIprop.hpp:949-954) semantics identical.

    ``scaled=True`` returns rho * 2^100 (exact power of two): the raw
    values sit at ~1e-37 and below — for weak couplings the WHOLE table
    drops under the f32 exponent floor that TPU f64 emulation carries
    and would flush in storage, before any consumer-side rescale can
    act. The transport marches consume the scaled form and pair the
    compensating 2^-100 with the (tiny) accumulation weights.

    Returns (N,) for (N,) bin-edge arrays.
    """
    ga = scalar_width(g, mphi, majorana)
    if width_factor is not None:  # general couplings: width ~ sum(Q)
        ga = ga * width_factor
    mn_c = mn[:, None]
    tp = -2.0 * mn_c * Ep[None, :] / (mphi * mphi)
    tm = -2.0 * mn_c * Em[None, :] / (mphi * mphi)
    tm = _shift_near_minus1(tm)
    tp = _shift_near_minus1(tp)
    spp = 2.0 * mn_c * Ep[None, :] / (mphi * mphi)
    smp = 2.0 * mn_c * Em[None, :] / (mphi * mphi)
    diag = alpha_s(tm, tp, smp, spp, g, mphi, ga)
    if not majorana:
        diag = diag / 2.0
    if scaled:
        diag = diag * 2.0**100  # exact; lifts storage above the window
    diag = jnp.sum(Wf[:, None] / (2.0 * mn_c) * diag, axis=0)
    return diag / (Ep - Em)
