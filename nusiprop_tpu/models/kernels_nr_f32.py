"""Native-float32 non-resonant bin-to-bin (alpha) kernel table.

The (NE+Nz)^2/2-pair alpha table is ~99% of a non-resonant evolve's
wallclock on TPU when built with the emulated-f64 closed forms
(BENCH_NOTES.md): every pair evaluates dilogarithm-heavy antiderivative
differences (kernels_nr.py, after nuSIprop.hpp:1280-1474). This module
replaces that build — for the alpha table only; the N-sized Gamma and
alphaTilde tables are ~300x cheaper and stay in f64 — with fixed-order
Gauss-Legendre quadrature of the MATRIX-ELEMENT-LEVEL integrands over
the narrow (2.3% x 2.3%) bin-pair domains, evaluated in the TPU's
native float32:

* The doubly-differential integrands are simple rationals with no
  cancellation anywhere: the t/u/tu shapes are the reference's own
  GL-rescue integrands (nuSIprop.hpp:1286-1304; kernels_nr._a_rect_quad),
  and the s-t/s-u interference factorizes through the amplitude product
  M_s M_t* into

      F_st(y, x) = 2 y (x-1) / (x ((x-1)^2 + gr^2) (y-1))
      F_su(y, x) = 2 u (x-1) / (x ((x-1)^2 + gr^2) (u-1)),  u = -x-y

  verified against the f64 closed forms to 1e-12 (Dirac alpha_st = the
  F_st integral / 32 pi; Majorana = (F_st + F_su) integral / 32 pi —
  numerically calibrated against kernels_nr.alpha_st).
* A GL3(^2) rule on a narrow bin-pair domain of these integrands is
  accurate to ~1e-9 relative (degree-5 exactness; the integrands are
  near-polynomial over a 2.3% window) — the reference itself accepts the
  same tensor-GL3 evaluation as its rescue path.
* The only sharp feature is the s-channel resonance factor
  (x-1)/((x-1)^2+gr^2) in F_st/F_su. Where the resonance sits within
  ~20 source-bin widths, the x-integral switches to EXACT moments
  (difference-safe log-ratio / w-atan(w) forms, cf. kernels_f32) against
  a quadratic fit of the smooth cofactor through the GL nodes.
* Cancellation-prone quantities (x-1, bin widths, x+y — which vanishes
  exactly at adjacent bin pairs) are precomputed in float64 and cast,
  exactly as kernels_f32 does for the s-channel.
* The phi-phi channel (spline tables + asymptotic tails) is NOT built
  here; callers add kernels_nr's f64 "pp" channel when phiphi is on.

The returned table is float64 (the trisolve march consumes f64), equal
to kernels.alpha_table(non_resonant=True, channels s+t_u+tu+st) with
~1e-7 f32 round-off; prefactors are applied in the range-safe
(g^2/denom)*g^2 grouping.
"""

import math

import jax.numpy as jnp
import numpy as _np

from nusiprop_tpu.models.kernels import scalar_width, _shift_near_minus1

PI = math.pi
F32 = jnp.float32

# 3-point Gauss-Legendre on [0, 1]: nodes as interval fractions, weights
# summing to 1 (same rule as the reference rescues, aux.hpp:53-54).
_SQ06 = math.sqrt(0.6)
_GL3_C = (0.5 * (1.0 - _SQ06), 0.5, 0.5 * (1.0 + _SQ06))
_GL3_W = (5.0 / 18.0, 8.0 / 18.0, 5.0 / 18.0)

# 5-point Gauss-Legendre on [0, 1] (resonance-factor x-integrals: the
# 1/((x-1)^2+gr^2) variation needs the higher order once the pole is
# within a few bin widths; error ~ ((w/2)/dist)^10)
_X5 = 0.5384693101056831
_X9 = 0.9061798459386640
_GL5_C = (0.5 * (1.0 - _X9), 0.5 * (1.0 - _X5), 0.5,
          0.5 * (1.0 + _X5), 0.5 * (1.0 + _X9))
_GL5_W = (0.5 * 0.23692688505618908, 0.5 * 0.47862867049936647, 0.5 * 0.5688888888888889,
          0.5 * 0.47862867049936647, 0.5 * 0.23692688505618908)

# resonance within 2 source-bin widths => exact-moment branch (there the
# s-channel dominates the entry, so the moment branch's O((w/2x)^3)
# cofactor-fit error is immaterial; beyond 2 widths GL5 is ~1e-6)
_T_NEAR = 2.0

# geometric panels per trapezoid segment of the q-sliced tensor
# integrals (resolves the u ~ -1 structure of near-diagonal
# wide-coordinate pairs; see tensor comment). 3 panels measured
# indistinguishable from 5 at the stressed high-coordinate config
# (max table error 2.709e-6 vs f64 closed forms for BOTH — f32
# round-off dominates) while cutting the build ~20%; the scipy-referee
# and flux-level gates (test_kernels_nr_f32) pin the accuracy.
_NPANEL = 3

# matches kernels_nr._COORD_FLOOR zeroing of sub-floor entries
_COORD_FLOOR = 1e-8


def _atandiff32(u, xy):
    """atan(x) - atan(y) for x > y, given u = (x-y)/(1+xy) and xy."""
    return jnp.arctan(u) + jnp.where(xy < -1.0, jnp.float32(PI),
                                     jnp.float32(0.0))


def _logratio32(d_num, den_m, ratio):
    """log(ratio) given the exact log1p argument d_num/den_m == ratio-1."""
    arg = d_num / den_m
    return jnp.where(jnp.abs(arg) < 0.5, jnp.log1p(arg), jnp.log(ratio))


def _dG32(wm, wp, dw, xy_w):
    """G(wp) - G(wm) with G(w) = w - atan(w), difference-safe.

    dw = wp - wm (exact from the f64 bin width). For small |w| the
    direct form cancels (G ~ w^3/3); the series uses homogeneous sums
    S_k = (wp^{k+1}-wm^{k+1})/dw, which are positive-definite for even
    k, so every term is a clean product.
    """
    wms = jnp.clip(wm, -0.55, 0.55)
    wps = jnp.clip(wp, -0.55, 0.55)
    # homogeneous sums S_k = sum_{i+j=k} wp^i wm^j (clamped inputs)
    S1 = wps + wms
    S2 = wps * S1 + wms * wms
    S3 = wps * S2 + wms * wms * wms
    m4 = (wms * wms) * (wms * wms)
    S4 = wps * S3 + m4
    S5 = wps * S4 + m4 * wms
    S6 = wps * S5 + m4 * wms * wms
    S7 = wps * S6 + m4 * wms * wms * wms
    S8 = wps * S7 + m4 * m4
    S9 = wps * S8 + m4 * m4 * wms
    S10 = wps * S9 + m4 * m4 * wms * wms
    S11 = wps * S10 + m4 * m4 * wms * wms * wms
    S12 = wps * S11 + m4 * m4 * m4
    series = dw * (S2 / 3.0 - S4 / 5.0 + S6 / 7.0 - S8 / 9.0
                   + S10 / 11.0 - S12 / 13.0)
    direct = dw - _atandiff32(dw / (1.0 + xy_w), xy_w)
    small = jnp.maximum(jnp.abs(wm), jnp.abs(wp)) < 0.3
    return jnp.where(small, series, direct)


def _x_res_integral(hs, vm, vp, vsum, ds, gr, inv_gr, near):
    """int over the source bin of h(x) * (x-1)/((x-1)^2 + gr^2) dx.

    hs: the smooth cofactor h at the five GL5 x-nodes.
    vm/vp = sm-1 / sp-1 (f64-precomputed, cast), vsum = vm+vp exact,
    ds = bin width, near = pole within _T_NEAR bin widths. Far: GL5 of
    the full integrand. Near: exact moments V1..V3 of v^k/D against the
    quadratic through the (outer, center, outer) nodes.
    """
    gr2 = gr * gr

    # ---- far branch: GL5 ----
    far = jnp.zeros_like(hs[0])
    for c, w, h in zip(_GL5_C, _GL5_W, hs):
        v = vm + F32(c) * ds
        far = far + F32(w) * h * v / (v * v + gr2)
    far = far * ds

    # ---- near branch: quadratic h x exact moments ----
    den_m = gr2 + vm * vm
    ratio = (gr2 + vp * vp) / den_m
    V1 = 0.5 * _logratio32(ds * vsum, den_m, ratio)
    wm = vm * inv_gr
    wp = vp * inv_gr
    V2 = gr * _dG32(wm, wp, ds * inv_gr, wm * wp)
    V3 = 0.5 * ds * vsum - gr2 * V1

    vc = 0.5 * vsum  # = xc - 1
    hw = 0.5 * ds
    xi = 2.0 * _GL5_C[4] - 1.0  # outer-node position in (x-xc)/hw units
    c0 = hs[2]
    c1 = (hs[4] - hs[0]) / (2.0 * F32(xi))
    c2 = (hs[0] + hs[4] - 2.0 * hs[2]) / (2.0 * F32(xi * xi))
    J0 = V1
    J1 = (V2 - vc * V1) / hw
    J2 = (V3 - 2.0 * vc * V2 + vc * vc * V1) / (hw * hw)
    moment = c0 * J0 + c1 * J1 + c2 * J2
    return jnp.where(near, moment, far)


def alpha_table_f32(Em, Ep, mn, g, mphi, Wf, *, majorana: bool,
                    raw: bool = False, width_factor=None):
    """Non-resonant alpha table (s + t/u + tu + st/su channels) in
    native float32.

    Default: returned as the float64 (N, N) strict-upper table the f64
    trisolve march consumes (prefactor applied). ``raw=True`` returns
    ``(table32, pref)`` — the NORMALIZED float32 table plus its float64
    g^4 prefactor — for the native-f32 trisolve march, which folds the
    prefactor into its range-safe per-node row scales.

    ``Wf=None`` skips the |U|^2 eigenstate reduction and returns the
    per-state (3, N, N) f64 table (kernels.alpha_table per_state
    contract — general non-diagonal couplings); ``width_factor`` scales
    the scalar width by sum(Q) there (evolve_general).

    Matches kernels.alpha_table(..., non_resonant=True, phiphi=False)
    to f32 round-off; the phi-phi channel is added separately by the
    caller (transport.build_tables) in f64 when enabled.
    """
    ga = scalar_width(g, mphi, majorana)
    if width_factor is not None:
        ga = ga * width_factor
    N = Em.shape[0]
    rows, cols = _np.triu_indices(N, k=1)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)

    # ---- f64 coordinate precompute (cheap elementwise) ----
    mn_c = mn[:, None]
    inv_m2 = 1.0 / (mphi * mphi)
    tp64 = _shift_near_minus1(-2.0 * mn_c * Ep[rows][None, :] * inv_m2)
    tm64 = _shift_near_minus1(-2.0 * mn_c * Em[rows][None, :] * inv_m2)
    smp64 = 2.0 * mn_c * Em[cols][None, :] * inv_m2
    spp64 = 2.0 * mn_c * Ep[cols][None, :] * inv_m2
    ok = (-tp64 >= _COORD_FLOOR) & (spp64 >= _COORD_FLOOR)
    # floored coordinates for the NR channels (kernels_nr floor semantics)
    tm_f = jnp.minimum(tm64, -_COORD_FLOOR)
    tp_f = jnp.minimum(tp64, -_COORD_FLOOR)
    smp_f = jnp.maximum(smp64, _COORD_FLOOR)
    spp_f = jnp.maximum(spp64, _COORD_FLOOR)

    dt64 = tm_f - tp_f                    # > 0 (target-bin width in t)
    ds64 = spp_f - smp_f                  # > 0 (source-bin width in s)
    xy0_64 = smp_f + tp_f                 # x+y at the (xm, tp) corner:
    # exactly 0 for adjacent pairs (Em[col] == Ep[row] on the ladder)
    sm1_64 = smp_f - 1.0
    sp1_64 = spp_f - 1.0
    vsum64 = sm1_64 + sp1_64
    gr64 = ga / mphi

    f = lambda a: jnp.asarray(a).astype(F32)
    tp_, dt = f(tp_f), f(dt64)
    smp, ds = f(smp_f), f(ds64)
    xy0 = f(xy0_64)
    vm, vp, vsum = f(sm1_64), f(sp1_64), f(vsum64)
    gr = f(gr64)
    inv_gr = f(1.0 / gr64)
    gr2 = gr * gr

    dirac_half = 1.0 if majorana else 0.5

    # ---- node grids (separable st factor) ----
    ys = [tp_ + F32(c) * dt for c in _GL3_C]             # y (t) nodes

    # Is the x-resonance within _T_NEAR source-bin widths of this pair?
    crossing = vm * vp < 0.0
    vmin_r = jnp.where(crossing, 0.0, jnp.minimum(jnp.abs(vm), jnp.abs(vp)))
    near_res = (vmin_r * vmin_r + gr2) <= (F32(_T_NEAR) * ds) ** 2

    # ---- tensor channels: t/u, tu interference, and (far-resonance) su --
    #
    # The u-dependent factors (u = -x-y) have O(1)-scale structure around
    # u ~ -1 while near-diagonal pairs at large coordinates span many
    # units of u IN BOTH bin directions, so no fixed-order rule over the
    # (x, y) rectangle resolves them. The integral is therefore sliced
    # along lines of CONSTANT u: with q = 1 + x + y = 1 - u (q >= 1 on
    # the strict upper triangle) and Delta = q - qA measured from the
    # exact corner qA = 1 + smp + tp,
    #
    #   int dx dy F = int_0^{ds+dt} dDelta  int_{x-slice(Delta)} dx F,
    #
    # where the slice is x-offset in [max(0, Delta-dt), min(ds, Delta)]
    # (a trapezoid: ramp / flat / ramp segments with kinks at
    # min(ds,dt) and max(ds,dt)). The OUTER Delta-integral runs each
    # segment over _NPANEL geometric panels in q (GL5 per panel), which
    # resolves the u-structure; the INNER x-integral of the remaining
    # smooth factors is GL3. All offsets are nonnegative exact-structured
    # products, so u - 1 = -(qA + Delta) and y = tp + (Delta - x_offset)
    # keep full f32 accuracy. For narrow bins everything degenerates to
    # a composite rule on the rectangle.
    #
    # Majorana:  2*(t_term + u_term) + interf   [1/16pi]
    #            + 2*(F_st + F_su)              [1/32pi; F_st separable,
    #                                            F_su in the tensor]
    # Dirac:     t_term [1/16pi] + F_st [1/32pi]
    # per-segment exact f64 bases (cast): segment edges in Delta, the
    # Delta-dt offset base, the mt-Delta base, and the -u corner base
    m1_64 = jnp.minimum(ds64, dt64)
    m2_64 = jnp.maximum(ds64, dt64)
    mt_64 = ds64 + dt64
    zero64 = jnp.zeros_like(ds64)
    segs = []
    for dlo64, dhi64 in ((zero64, m1_64), (m1_64, m2_64), (m2_64, mt_64)):
        segs.append((
            f(dlo64),                    # dlo
            f((dhi64 - dlo64) / (1.0 + xy0_64 + dlo64)),  # q-ratio - 1
            f(1.0 + xy0_64 + dlo64),     # qlo (exact)
            f(dlo64 - dt64),             # d_a: Delta-dt = dD + d_a
            f(mt_64 - dlo64),            # mtref: mt-Delta = mtref - dD
            f(xy0_64 + dlo64),           # mu base: -u = mu0 + dD
        ))
    m1c = f(m1_64)
    zero = jnp.zeros_like(ds)
    acc_tu = jnp.zeros_like(dt)
    acc_su = jnp.zeros_like(dt)
    for dlo, ratm1, qlo, d_a, mtref, mu0 in segs:
        # log-substituted outer integral: int f dq = int f(q) q dxi over
        # xi = ln(q/qlo), GL5 on _NPANEL uniform xi-panels; node weight
        # is wq * lnrho * q_node
        lnrho = jnp.log1p(ratm1) * F32(1.0 / _NPANEL)
        # GL3 per panel: measured identical to GL5 at the stressed
        # high-coordinate config (2.709e-6 max either way, f32
        # round-off bound) — 9 q-nodes per segment instead of 15
        for k in range(_NPANEL):
            for cq, wq in zip(_GL3_C, _GL3_W):
                dD = qlo * jnp.expm1((F32(k) + F32(cq)) * lnrho)
                Delta = dlo + dD
                a = jnp.maximum(zero, dD + d_a)     # x-slice start
                mtmd = mtref - dD                   # mt - Delta
                wx = jnp.maximum(
                    jnp.minimum(jnp.minimum(Delta, mtmd), m1c), 0.0)
                dY = jnp.minimum(dt, Delta)         # Delta - a (exact)
                mu = mu0 + dD                       # = -u, slice-constant
                qv = 1.0 + mu                       # = 1 - u
                wgt_q = F32(wq) * lnrho * (qlo + dD) * wx
                row_tu = zero
                row_su = zero
                for cx, wxw in zip(_GL3_C, _GL3_W):
                    step = F32(cx) * wx
                    x = smp + (a + step)
                    y = tp_ + (dY - step)
                    ym1 = y - 1.0
                    inv_x2 = 1.0 / (x * x)
                    t_term = (y * y) * inv_x2 / (ym1 * ym1)
                    if majorana:
                        u_term = (mu * mu) * inv_x2 / (qv * qv)
                        interf = 2.0 * y * mu * inv_x2 / (ym1 * qv)
                        val = 2.0 * (t_term + u_term) + interf
                        v_x = vm + (a + step)       # x - 1 (f64-derived)
                        row_su = row_su + F32(wxw) * (
                            2.0 * mu / qv * v_x / ((v_x * v_x + gr2) * x))
                    else:
                        val = t_term
                    row_tu = row_tu + F32(wxw) * val
                acc_tu = acc_tu + wgt_q * row_tu
                acc_su = acc_su + wgt_q * row_su
    ch_tu = acc_tu * F32(1.0 / (16.0 * PI))

    # ---- st (+ su) interference ----
    # F_st factorizes: T_st = int 2y/(y-1) dy  x  X_st = int (x-1)/(x D) dx
    T_st = jnp.zeros_like(dt)
    for wj, y in zip(_GL3_W, ys):
        T_st = T_st + F32(wj) * 2.0 * y / (y - 1.0)
    T_st = T_st * dt
    xs5 = [smp + F32(c) * ds for c in _GL5_C]
    inv_xs5 = [1.0 / x for x in xs5]
    X_st = _x_res_integral(inv_xs5, vm, vp, vsum, ds, gr, inv_gr,
                           near_res)
    ch_st = T_st * X_st
    if majorana:
        # su: near the resonance the tensor's 3-node x-sampling cannot
        # resolve (x-1)/D — use the exact-moment x-integral there (such
        # pairs sit at s ~ 1 where bins are narrow, so the plain GL3
        # y-integral over the 5-node-x cofactor is accurate)
        acc_su_near = jnp.zeros_like(dt)
        for cj, wj in zip(_GL3_C, _GL3_W):
            hs = []
            for ci, inv_x in zip(_GL5_C, inv_xs5):
                u = -(xy0 + F32(ci) * ds + F32(cj) * dt)
                hs.append(2.0 * u / (u - 1.0) * inv_x)
            acc_su_near = acc_su_near + F32(wj) * _x_res_integral(
                hs, vm, vp, vsum, ds, gr, inv_gr, near_res)
        su = jnp.where(near_res, acc_su_near * dt, acc_su)
        ch_st = 2.0 * (ch_st + su)  # dispatcher x2 for Majorana
    ch_st = ch_st * F32(1.0 / (32.0 * PI))

    nr_sum = jnp.where(ok, ch_tu + ch_st, 0.0)

    # ---- s channel (nuSIprop.hpp:1264-1269): separable, UNfloored ----
    # alpha_s/g^4 = dt * Q / (8 pi), Q = R/gr with
    # R = atandiff((sp'-1)/gr, (sm'-1)/gr), Taylor for spp < 1e-5.
    dt_s64 = tm64 - tp64                   # unfloored width
    sm1s64 = smp64 - 1.0
    sp1s64 = spp64 - 1.0
    ds_s64 = spp64 - smp64
    vm_s, vp_s = f(sm1s64), f(sp1s64)
    ds_s = f(ds_s64)
    xw_m = vm_s * inv_gr
    xw_p = vp_s * inv_gr
    xy_s = xw_p * xw_m
    u_s = (ds_s * inv_gr) / (1.0 + xy_s)
    Q_exact = _atandiff32(u_s, xy_s) * inv_gr
    G2 = 1.0 + gr2
    smp_s = f(smp64)
    Q_taylor = ((G2 + 2.0 * smp_s) / (G2 * G2)) * ds_s + ds_s * ds_s / (G2 * G2)
    Q = jnp.where(f(spp64) < 1e-5, Q_taylor, Q_exact)
    ch_s = f(dt_s64) * Q * F32(dirac_half / (8.0 * PI))

    tot = nr_sum + ch_s

    # ---- eigenstate reduction and assembly ----
    g64 = jnp.asarray(g, jnp.float64)
    pref = (g64 * g64) * (g64 * g64)
    if Wf is None:  # per-state (3, N, N) for general couplings
        res_s = (f(1.0 / (2.0 * mn_c)) * tot).astype(jnp.float64) * pref
        out = jnp.zeros((3, N, N), dtype=jnp.float64)
        return out.at[:, rows, cols].set(res_s)
    w_e = f(Wf[:, None] / (2.0 * mn_c))
    res32 = jnp.sum(w_e * tot, axis=0)  # (NT,) f32, normalized by g^4
    if raw:
        out32 = jnp.zeros((N, N), dtype=F32)
        return out32.at[rows, cols].set(res32), pref
    res = res32.astype(jnp.float64) * pref
    out = jnp.zeros((N, N), dtype=jnp.float64)
    return out.at[rows, cols].set(res)
