"""Fused Pallas TPU kernel for IQ synthesis.

Same mathematical contract as ops/synth_jnp.py (the per-sample hot loop of
gpssim.c:2190-2264 in closed form), but hand-fused: one kernel instance
synthesizes TILE_ROWS sub-blocks of samples for all channels with every
intermediate in VMEM/registers -- no HBM round-trips between the
per-channel chains, which is where the XLA-fused version loses time.

Layout (v2, measured +65% over the original where-tree/polynomial form on
TPU v5e): per-(sub-block, channel) parameters are packed into a
[ROWS, C*32] int32 array (32 lanes per channel, see _P* indices) and
streamed through SMEM, so every parameter is a true scalar operand fused
into the VPU ops -- no [rows, 1] strided loads or lane broadcasts. Each
sub-block is computed as a (SUBBLOCK/128, 128) slab, which makes every
table lookup a single in-register `tpu.dynamic_gather` (lane-indexed,
exact-shape `jnp.take_along_axis`):

 - the C/A chip word (32 bit-packed words/channel) is one gather instead
   of a 31-select where-tree;
 - sin/cos come from ONE gather of a 128-entry quarter-folded table whose
   entries pack sinTable512|cosTable512<<16 (gpssim.c:15-83): for table
   index i = q*128 + r, the identity sinT[127-r] = cosT[r] (first
   quadrant) means lane r (q even) or 127-r (q odd) yields the
   (sin, cos) magnitude pair directly, with quadrant signs applied by
   xor-sub. Exact table values by construction -- no polynomial, no
   per-backend rounding corrections.

dynamic_gather constraints probed on this chip: int32 only, lane axis
exactly 128, any sublane count; hence the 128-lane slab geometry.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gps_sdr_sim_tpu.constants import CA_SEQ_LEN, SUBBLOCK
from gps_sdr_sim_tpu.ops.plan import DeviceBatch
from gps_sdr_sim_tpu.ops.tables import COS_TABLE512, SIN_TABLE512

# Parameter lane assignment within a channel's 32-lane strip.
#
# Phase limbs are 2 x 20-bit (fractional phase bits [16, 36) and [36, 56)
# of the 2^56-scaled value): with r < 2^11 and limbs < 2^20 the chain
# p1 + r*s1 + carry peaks at exactly INT32_MAX (2047*(2^20-1) + (2^20-1)
# + 2047 = 2^31-1), so two limbs replace the previous three 16-bit ones
# with zero headroom to spare — one fewer add+carry per ramp per sample.
# The code step's integer part (bits >= 56; nonzero below ~1.023 Msps)
# rides a third step lane applied directly to the chip count.
_P_CODE_P = 0  # 0..1: code-phase base limbs (20-bit)
_P_CARR_P = 2  # 2..3: carrier-phase base limbs (20-bit)
_P_TBASE = 4
_P_CODE_S = 5  # 5..6: code-step limbs (20-bit); 7: step bits >= 56 (chips)
_P_CARR_S = 8  # 8..9: carrier-step limbs (20-bit)
_P_M0 = 10
_P_B0 = 11
_P_NAVBITS = 12
_P_GAIN = 13
PARAM_LANES = 32

# Sub-blocks per kernel instance. Perf-tuning knob like SUBBLOCK; grid
# tiles are independent so any multiple of 8 (the SMEM block-row rule) is
# correct. Measured on the target v5e: 8 and 16 within noise.
import os as _os

_TILE_ROWS = int(_os.environ.get("GPS_SDR_SIM_TILE_ROWS", "16"))
if _TILE_ROWS % 8:
    raise ValueError("GPS_SDR_SIM_TILE_ROWS must be a multiple of 8 "
                     "(SMEM block rows)")
_SLAB = SUBBLOCK // 128  # 128-lane rows per sub-block
_INV1023 = np.float32(1.0 / 1023.0)


def _interpret() -> bool:
    """Pallas has no CPU backend; tests on CPU run the interpreter."""
    return jax.default_backend() == "cpu"


# Cost-attribution knob for tools/profile_kernel.py ONLY. A comma list of
# {no_ca_gather, no_trig_gather, no_nav_walk, no_nav_gather} stubs that
# cost center out of the kernel with a same-shape stand-in, so timing
# deltas against the full kernel attribute its cycles (standalone a
# tpu.dynamic_gather costs ~42 ALU-op equivalents — VPU_PEAK.json — but
# in this kernel the two gathers' measured marginal cost is ~7% of kernel
# time together: most of their latency hides under the ALU chains).
# Ablated kernels produce WRONG samples; nothing outside the profiler may
# set this. The profiler passes explicit `ablate` sets to _get_pallas_fn
# (cache-keyed) so all variants can be timed INTERLEAVED in one process /
# one device-weather window; the env knob remains as the default for
# whole-subprocess ablation.
_ABLATE = frozenset(
    filter(None, _os.environ.get("GPS_SDR_SIM_ABLATE", "").split(",")))

_INV20 = np.float32(1.0 / 20.0)


def nav_gather_enabled() -> bool:
    """Opt-in switch for the nav mask-table gather kernel variant.

    Read dynamically (not at import) so tests can exercise both paths in
    one process; _get_epoch_fn keys its cache on the resolved value."""
    return _os.environ.get("GPS_SDR_SIM_NAV_GATHER", "0") == "1"

# _select32/_trig_formula (shared with ops/synth_jnp.py) are not used by
# the gather kernel, but the quarter-fold identity below is derived from
# the same table rule, so the packed table is built from the exact arrays.

# 128-entry quarter-folded lookup table: entry r packs the first-quadrant
# pair sinTable512[r] (low 16) | cosTable512[r] << 16 (gpssim.c:15-83).
# The remaining quadrants follow from sin(pi/2+x)=cos(x) etc.; see
# _make_kernel.
_PACKED_Q0 = ((SIN_TABLE512[:128].astype(np.int64) & 0xFFFF)
              | (COS_TABLE512[:128].astype(np.int64) << 16)).astype(np.int32)


# Output-format packing support (fmt kernels): samples per int32 output
# word. fmt=16 packs one interleaved I/Q pair per word (bytewise identical
# to the SC16 int16 stream), fmt=8 packs 2 pairs (the reference's >>4
# bytes, gpssim.c:2278-2284), fmt=1 packs 16 pairs (sign bits MSB-first,
# 4 pairs/byte, gpssim.c:2266-2277). Packing in the kernel epilogue means
# the 1-bit stream never writes int16 to HBM at the full sample rate.
PACK_DIV = {16: 1, 8: 2, 1: 16}


def packed_supported(fmt: int) -> bool:
    """Can the kernel epilogue pack this format at the current SUBBLOCK?

    The epilogue emits whole 128-word output rows per sub-block, so the
    slab row count must divide evenly into output rows. Env kill-switch
    GPS_SDR_SIM_PACKED=0 forces the legacy two-ref + XLA-pack path for
    A/B ablation."""
    if _os.environ.get("GPS_SDR_SIM_PACKED", "1") == "0":
        return False
    return _pack_div_ok(fmt)


def _pack_div_ok(fmt: int | None) -> bool:
    """Structural support (independent of the A/B kill-switch)."""
    return fmt in PACK_DIV and _SLAB % PACK_DIV[fmt] == 0


def _row_select(scratch, g, levels: int, base_bit: int):
    """Collapse 2^levels consecutive rows by lane-indexed bit selection.

    g[r, w] holds, replicated across lane groups, the output word whose
    final row is r >> levels and whose source row within the group is bits
    [base_bit, base_bit+levels) of the lane index w. Returns
    final[p, w] = g[(p << levels) + ((w >> base_bit) & (2^levels - 1)), w].

    Even/odd row extraction bounces through a VMEM scratch ref: Mosaic
    supports sublane-STRIDED ref loads but not strided value slices (a
    stride-2 vector.extract_strided_slice fails verification, and jnp's
    g[0::2] lowers to an unsupported gather).
    """
    for j in range(levels):
        rows = g.shape[0]
        scratch[0:rows, :] = g
        a = scratch[0:rows:2, :]
        b = scratch[1:rows:2, :]
        bit = (jax.lax.broadcasted_iota(jnp.int32, (rows // 2, 128), 1)
               >> (base_bit + j)) & 1
        g = jnp.where(bit == 0, a, b)
    return g


def _make_kernel(n_chan: int, tile_rows: int, quantize: bool = True,
                 uniform: bool = False, premult: bool = False,
                 int_step: bool = True, fmt: int | None = None,
                 nav_gather: bool = False, int_m: bool = False,
                 ablate: frozenset = frozenset(), int_nav: bool = True,
                 nowrap: bool = True, tree: bool = False):
    """quantize=False emits the raw int32 accumulators (pre-(acc+64)>>7)
    so a channel-sharded caller can psum partial sums over ICI before
    quantizing — the reference sums ALL channels first (gpssim.c:2192-2259),
    so reduction placement is correctness-relevant.

    uniform=True promises every row of a tile shares one epoch's
    parameters (the caller epoch-aligns the row layout — see
    _wire_to_params(align=True)), so the six per-channel `r*step` limb
    multiplies — vector int32 multiply is emulated on the VPU — hoist
    out of the per-sub-block loop and are paid once per tile instead of
    once per row.

    premult=True (requires uniform) additionally folds the per-epoch gain
    into a per-channel copy of the packed trig table once per tile
    (sin*g | cos*g<<16 — exact int16 rails while gain <= 32767//250; the
    caller gates on that, see stage_epochs), removing the last per-sample
    vector multiplies from the kernel entirely.

    int_step=False promises every code step is < 1 chip/sample (its 2^56
    bits >= 56 are zero — true at every sample rate above ~1.023 Msps;
    the caller gates on the actual limbs), skipping the integer-step lane
    and its per-sample add.

    fmt in {16, 8, 1} (requires quantize) replaces the two int16 outputs
    with ONE int32 word stream that is bytewise the final SC16/SC08/SC01
    file format (see PACK_DIV) — the output packer of gpssim.c:2266-2288
    fused into the epilogue, so nothing downstream re-reads the samples.

    nav_gather=True (requires uniform) adds a per-(epoch, channel) input
    of 128 nav-sign masks indexed by the in-epoch code-period count M
    (nav_masks below): the per-sample nav window walk — mg, the
    floor((mg+0.5)/20) bit index, the window shift (gpssim.c:2233-2241)
    — collapses to ONE extra lane gather. MEASURED SLOWER on the target
    chip: an interleaved same-window A/B (2026-08-19, 400-epoch batch,
    best-of-7 x 3 reps) put the gather variant at 0.0406 s vs 0.0379 s
    for the walk — the third dynamic_gather costs ~7% where the walk's
    ~9 ALU ops cost ~4%. Kept behind GPS_SDR_SIM_NAV_GATHER=1 for
    re-evaluation on other chip generations; default stays the walk.

    int_m=True computes the code-period count M and the chip wrap by the
    exact integer identity T = 1023*(T>>10) + (T&1023) + (T>>10): with
    q0 = T>>10 and r0 = (T&1023) + q0 < 2046 (one conditional fold),
    M = q0 + (r0 >= 1023) and chip = r0 - 1023*(r0 >= 1023) — no
    int<->float converts and no multiply-by-1023, exact for
    -1 <= T < 1023*1024 (epoch-rebased T is < ~110k chips; goldens and
    the A/B equality check enforce parity). A/B-able variant
    (tools/ab_kernel.py); see the M computation below for the default.

    int_nav=True computes the nav-walk bit index by exact integers:
    j = floor((mg+0.5)/20) = floor(mg/20) for integer mg (the +0.5
    never crosses an integer boundary over 20ths), and floor(mg/20) =
    floor(floor(mg/4)/5) = ((mg>>2)*104858)>>19 — exact (and int32
    overflow-free) for -1 <= mg < 81920, far beyond the reachable domain
    [-1, 148): _P_M0 now carries m0 mod 20 (folded in _wire_to_params,
    saving a broadcast + subtract), in-epoch M < ~128, and mg = -1 only
    when T = -1. One small int multiply replaces the second f32
    convert/floor round trip; A/B-able like int_m.

    nowrap=True (the DEFAULT, adopted by measurement) gathers with
    mode="promise_in_bounds": jnp.take_along_axis otherwise inserts a
    negative-index wrap (cmp slt 0 / add size / select — 3 vector ops) in
    front of EVERY tpu.dynamic_gather, but all eight gather sites in this
    kernel bound their indices by construction (chip in [0, 1023) so
    chip>>5 < 32; tl is &127; the opt-in nav gather masks M & 127 — M is
    < 128 in-epoch but M = -1 is reachable when T = -1, and the mask maps
    it to 127 exactly like the legacy wrap lowering did; the
    epilogue lane rotations are &127/&63/&7 masked), so the wrap is 6
    dead vector ops per channel-sample (tools/op_budget.py counted them:
    cmp 2.0 + select 2.0 + 2 of the adds). Bit-identical by construction
    AND by the A/B equality gate; interleaved same-window A/B (2026-08-20,
    400-epoch batch, best-of-9 x 5 reps) measured 0.0629 s vs 0.0643 s —
    a 2.2% kernel win, every rep faster. nowrap=False (tools/ab_kernel.py
    variant "wrap") keeps the legacy lowering for re-evaluation.

    tree=True accumulates the per-channel contributions by pairwise
    tree reduction instead of the serial iacc += chain: int32 addition
    is associative mod 2^32, so the result is bit-identical, but the
    serial chain is a loop-carried dependency n_chan adds deep where
    the tree is ceil(log2(n_chan)) — a pure critical-path experiment
    (same op count, more live slabs). MEASURED NEUTRAL (1.007x,
    interleaved A/B 2026-08-20, AB_TREE_r04.json): the scheduler
    already fills the serial chain's latency with the independent
    per-channel chains, so the default stays serial."""
    assert not (premult and not uniform), "premult requires uniform tiles"
    assert not (nav_gather and not uniform), "nav_gather requires uniform"
    assert fmt is None or (quantize and _pack_div_ok(fmt))

    def kernel(params_ref, ca_ref, tbl_ref, *refs):
        if nav_gather:
            nav_ref, *refs = refs
        i_ref = refs[0]
        q_ref = refs[1] if len(refs) > 1 else None
        # For fmt 8/1 the trailing ref is the row-select VMEM scratch
        # (scratch_shapes), not a second output.
        scratch = q_ref if fmt in (8, 1) else None

        def ga(a, i):
            """Lane gather; nowrap skips the negative-index wrap ops."""
            if nowrap:
                return jnp.take_along_axis(a, i, axis=1,
                                           mode="promise_in_bounds")
            return jnp.take_along_axis(a, i, axis=1)

        shape = (_SLAB, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # sample index within the sub-block
        r = jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 + lane
        if fmt == 1:
            # In-word bit position of each lane's I sign bit: byte
            # k = (lane%16)//4 of the little-endian word, MSB-first
            # {I0,Q0,I1,Q1,I2,Q2,I3,Q3} within the byte.
            shift_i = 8 * ((lane & 15) >> 2) + 7 - 2 * (lane & 3)
        tbl_b = jnp.broadcast_to(tbl_ref[0:1, :], shape)
        ca_b = [jnp.broadcast_to(ca_ref[c:c + 1, :], shape)
                for c in range(n_chan)]
        if nav_gather:
            nav_b = [jnp.broadcast_to(nav_ref[c:c + 1, :], shape)
                     for c in range(n_chan)]

        if uniform:
            # Steps are per-epoch constants; with epoch-aligned tiles the
            # ramp slopes r*S are tile-invariant.
            hoist = []
            for c in range(n_chan):
                base = c * PARAM_LANES

                def p0(lane, base=base):
                    return params_ref[0, base + lane]

                if premult:
                    # Gain-scaled table, built once per (tile, channel):
                    # rails stay exact int16 (|sin|,|cos| <= 250, gain
                    # <= 131 by the caller's gate), so one gather yields
                    # the already-mixed pair.
                    g = p0(_P_GAIN)
                    sg = ((tbl_b << 16) >> 16) * g
                    cg = (tbl_b >> 16) * g
                    tbl_c = (sg & 0xFFFF) | (cg << 16)
                else:
                    tbl_c = None
                hoist.append((
                    tuple(r * p0(_P_CODE_S + k)
                          for k in range(3 if int_step else 2)),
                    tuple(r * p0(_P_CARR_S + k) for k in range(2)),
                    tbl_c))

        def _treesum(parts):
            while len(parts) > 1:
                odd = [parts[-1]] if len(parts) % 2 else []
                parts = [a + b for a, b in
                         zip(parts[0::2], parts[1::2])] + odd
            return parts[0]

        for s in range(tile_rows):
            iparts: list = []
            qparts: list = []
            iacc = jnp.zeros(shape, jnp.int32)
            qacc = jnp.zeros(shape, jnp.int32)
            for c in range(n_chan):
                base = c * PARAM_LANES

                def p(lane):
                    return params_ref[s, base + lane]  # SMEM scalar

                if uniform:
                    rs, ws, tbl_c = hoist[c]
                else:
                    rs = tuple(r * p(_P_CODE_S + k)
                               for k in range(3 if int_step else 2))
                    ws = tuple(r * p(_P_CARR_S + k) for k in range(2))
                    tbl_c = None

                # --- code-phase ramp: 2 x 20-bit limbs + integer step ---
                v0 = p(_P_CODE_P + 0) + rs[0]
                v1 = p(_P_CODE_P + 1) + rs[1] + (v0 >> 20)
                T = p(_P_TBASE) + (v1 >> 20)
                if int_step:
                    T = T + rs[2]

                if int_m:
                    # Exact integer M + chip (see docstring): one shift
                    # fold of 2^10 = 1023 + 1, then a single >= 1023
                    # correction via an arithmetic-shift mask.
                    q0 = T >> 10
                    r0 = (T & 1023) + q0
                    wrap = (1022 - r0) >> 31  # -1 iff r0 >= 1023
                    M = q0 - wrap
                    chip = r0 + (wrap & -CA_SEQ_LEN)
                else:
                    M = jnp.floor((T.astype(jnp.float32) + 0.5)
                                  * _INV1023).astype(jnp.int32)
                    chip = T - CA_SEQ_LEN * M

                # C/A chip: one lane-gather of the bit-packed word
                if "no_ca_gather" in ablate:
                    word = chip + lane  # profiler stand-in (WRONG samples)
                else:
                    word = ga(ca_b[c], chip >> 5)
                ca_bit = (word >> (chip & 31)) & 1

                if nav_gather:
                    # Opt-in variant: the nav sign for code period M from
                    # one gather of the per-epoch mask table instead of
                    # the 9-op window walk below (measured ~3% slower
                    # end-to-end on this chip — see _make_kernel doc).
                    if "no_nav_gather" in ablate:
                        nav_mask = -(M & 1)  # profiler stand-in (WRONG)
                    else:
                        # & 127 bounds the index for promise_in_bounds:
                        # M = -1 is reachable (exactly when T = -1, see
                        # the int_nav domain note), and the legacy wrap
                        # lowering sends -1 to 127 too, so the mask is
                        # bit-identical to the wrapped gather.
                        nav_mask = ga(nav_b[c], M & 127)
                    # data sign: -1 iff ca_bit XOR nav bit (masks compose
                    # by XOR; (x^m)-m negates exactly, mod 2^32 like C).
                    dsign = (-ca_bit) ^ nav_mask
                elif "no_nav_walk" in ablate:
                    dsign = -ca_bit  # profiler stand-in (WRONG samples)
                else:
                    # _P_M0 holds m0 mod 20 (folded in _wire_to_params),
                    # so the floor IS the window bit index j — no b0
                    # broadcast/subtract.
                    mg = p(_P_M0) + M
                    if int_nav:
                        # floor(mg/20) by nested exact division (see
                        # docstring); bit-identical to the f32 walk for
                        # every reachable mg in [-1, 2^17).
                        j = ((mg >> 2) * 104858) >> 19
                    else:
                        j = jnp.floor((mg.astype(jnp.float32) + 0.5)
                                      * _INV20).astype(jnp.int32)
                    nav_bit = (p(_P_NAVBITS) >> j) & 1
                    dsign = -(ca_bit ^ nav_bit)

                # --- carrier-phase ramp: 2 x 20-bit limbs ---
                # (the carrier step is < 1 cycle/sample by construction,
                # so there is no integer-step lane)
                w0 = p(_P_CARR_P + 0) + ws[0]
                w1 = p(_P_CARR_P + 1) + ws[1] + (w0 >> 20)
                # The 9-bit table index is fractional bits [47, 56) = bits
                # [11, 20) of the upper limb (carry bits >= 20 are phase
                # mod 1 and fold away): index = qq*128 + rr with quadrant
                # qq = bits [18, 20), lane rr = bits [11, 18).

                # --- sin/cos: one gather of the quarter-folded table ---
                # For odd qq, lane 127-rr is fetched; sinT[127-rr] =
                # cosT[rr] and cosT[127-rr] = sinT[rr], so the flip itself
                # performs the sin<->cos swap of the odd quadrants; for
                # 7-bit rr the flip is rr ^ 127, and xor with the 0/-1
                # odd-quadrant mask before masking to 7 bits fuses the
                # select away. Quadrant signs: sin < 0 for qq in {2,3}
                # (= qq bit 1 = w1 bit 19), cos < 0 for qq in {1,2}
                # (= qq bit 1 XOR bit 0 = w1 bit 19 XOR bit 18) — each an
                # arithmetic shift of a bit placed at 31, no selects.
                qa = w1 << 12  # w1 bit 19 (qq bit 1) at bit 31
                qb = w1 << 13  # w1 bit 18 (qq bit 0) at bit 31
                tl = ((w1 >> 11) ^ (qb >> 31)) & 127
                if "no_trig_gather" in ablate:
                    w = tl | (tl << 16)  # profiler stand-in (WRONG samples)
                else:
                    w = ga(tbl_c if premult else tbl_b, tl)

                ns = (qa >> 31) ^ dsign
                nc = ((qa ^ qb) >> 31) ^ dsign
                gs = (w << 16) >> 16
                gc = w >> 16
                if not premult:
                    gs = gs * p(_P_GAIN)
                    gc = gc * p(_P_GAIN)
                if tree:
                    iparts.append((gc ^ nc) - nc)
                    qparts.append((gs ^ ns) - ns)
                else:
                    iacc = iacc + ((gc ^ nc) - nc)
                    qacc = qacc + ((gs ^ ns) - ns)

            if tree:
                iacc = _treesum(iparts)
                qacc = _treesum(qparts)
            sl = slice(s * _SLAB, (s + 1) * _SLAB)
            if fmt is not None:
                i16 = (iacc + 64) >> 7
                q16 = (qacc + 64) >> 7
                if fmt == 16:
                    # Little-endian int32 word = interleaved int16 pair.
                    i_ref[sl, :] = (i16 & 0xFFFF) | (q16 << 16)
                elif fmt == 8:
                    # Word = bytes {I0,Q0,I1,Q1}: per-lane halfword shifted
                    # by parity, pair-summed (disjoint bits => sum == or),
                    # then compacted to 128 words/row and row-pair
                    # selected (bit 6 of the word lane picks the row).
                    # The int16 wrap ((short) cast) happens BEFORE >>4,
                    # like the reference's short buffer (gpssim.c:2280).
                    iw = (i16 << 16) >> 16
                    qw = (q16 << 16) >> 16
                    v = (((iw >> 4) & 0xFF) | (((qw >> 4) & 0xFF) << 8)
                         ) << (16 * (lane & 1))
                    w32 = v + ga(v, (lane + 1) & 127)
                    g = ga(w32, (lane & 63) * 2)
                    d = PACK_DIV[8]
                    i_ref[s * (_SLAB // d):(s + 1) * (_SLAB // d), :] = \
                        _row_select(scratch, g, 1, 6)
                else:  # fmt == 1
                    # Word = 4 bytes x {I,Q,I,Q,...} sign bits MSB-first:
                    # each lane's two bits land at disjoint positions, a
                    # 4-step gather tree sums each 16-lane group, then
                    # compact + 16-row select (bits [3,7) of the lane).
                    # Sign of the int16-WRAPPED sample, like the
                    # reference's short buffer (gpssim.c:2270-2273).
                    iw = (i16 << 16) >> 16
                    qw = (q16 << 16) >> 16
                    v = ((iw > 0).astype(jnp.int32) << shift_i) \
                        | ((qw > 0).astype(jnp.int32) << (shift_i - 1))
                    for sh in (1, 2, 4, 8):
                        v = v + ga(v, (lane + sh) & 127)
                    g = ga(v, (lane & 7) * 16)
                    d = PACK_DIV[1]
                    i_ref[s * (_SLAB // d):(s + 1) * (_SLAB // d), :] = \
                        _row_select(scratch, g, 4, 3)
            elif quantize:
                i_ref[sl, :] = ((iacc + 64) >> 7).astype(jnp.int16)
                q_ref[sl, :] = ((qacc + 64) >> 7).astype(jnp.int16)
            else:
                i_ref[sl, :] = iacc
                q_ref[sl, :] = qacc

    return kernel


@lru_cache(maxsize=None)
def _get_pallas_fn(n_chan: int, quantize: bool = True,
                   uniform: bool = False, tile_rows: int = 0,
                   premult: bool = False, int_step: bool = True,
                   fmt: int | None = None, tpe: int = 0,
                   int_m: bool = False,
                   ablate: frozenset | None = None,
                   debug: bool = False, int_nav: bool = True,
                   nowrap: bool = True, tree: bool = False):
    """tpe > 0 (tiles per epoch; requires uniform/epoch-aligned rows)
    enables the v5 nav-gather kernel: run() then takes a third operand,
    the [B*n_chan, 128] per-epoch nav mask table (nav_masks), and tile i
    reads its epoch's [n_chan, 128] block (i // tpe).

    ablate=None resolves to the GPS_SDR_SIM_ABLATE env set (_ABLATE);
    passing an explicit frozenset keys a distinct cache entry so the
    profiler can time ablation variants interleaved in one process.

    debug=True passes through to pl.pallas_call: Mosaic prints the
    kernel's vector-dialect MLIR at lowering time (tools/op_budget.py
    captures and statically counts it)."""
    tile_rows = tile_rows or _TILE_ROWS
    nav_gather = tpe > 0
    if ablate is None:
        ablate = _ABLATE
    kernel = _make_kernel(n_chan, tile_rows, quantize, uniform, premult,
                          int_step, fmt, nav_gather, int_m, ablate,
                          int_nav, nowrap, tree)
    out_dtype = jnp.int16 if quantize else jnp.int32
    tbl = _PACKED_Q0.reshape(1, 128)
    div = PACK_DIV[fmt] if fmt is not None else 1

    @jax.jit
    def run(params, ca_words, nav=None):
        rows = params.shape[0]
        grid = (rows // tile_rows,)
        # gather operands must span 128 lanes; word indices are < 32
        ca_in = jnp.pad(ca_words, ((0, 0), (0, 128 - ca_words.shape[1])))
        out_rows = rows * _SLAB // div
        blk_rows = tile_rows * _SLAB // div
        if fmt is not None:
            out_specs = pl.BlockSpec((blk_rows, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((out_rows, 128), jnp.int32)
        else:
            out_specs = tuple(
                pl.BlockSpec((blk_rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) for _ in range(2))
            out_shape = tuple(
                jax.ShapeDtypeStruct((out_rows, 128), out_dtype)
                for _ in range(2))
        in_specs = [
            pl.BlockSpec((tile_rows, params.shape[1]),
                         lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ca_words whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed trig table
        ]
        operands = [params, ca_in, jnp.asarray(tbl)]
        if nav_gather:
            # Per-epoch nav mask table: tile i belongs to epoch i // tpe.
            # The table's per-epoch row count comes from its own shape —
            # the wire keeps all MAX_CHAN channel columns (active
            # compacted first), so it is >= n_chan; channel c is row c of
            # the block either way.
            blk = nav.shape[0] // (rows // (tile_rows * tpe))
            in_specs.append(pl.BlockSpec(
                (blk, 128), lambda i: (i // tpe, 0),
                memory_space=pltpu.VMEM))
            operands.append(nav)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            # fmt 8/1: VMEM bounce buffer for the strided row-select.
            scratch_shapes=([pltpu.VMEM((_SLAB, 128), jnp.int32)]
                            if fmt in (8, 1) else []),
            # Sub-block tiles are independent: let Mosaic split the grid
            # across TensorCores where the chip has them.
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interpret(),
            debug=debug,
        )(*operands)
        if fmt is not None:
            # (rows*_SLAB/div, 128) flattens to the packed word stream in
            # sample order; reshape is layout-preserving.
            return out.reshape(rows, SUBBLOCK // div)
        i16, q16 = out
        # (rows*_SLAB, 128) flattens to the same sample order as
        # (rows, SUBBLOCK); reshape is layout-preserving.
        return (i16.reshape(rows, SUBBLOCK), q16.reshape(rows, SUBBLOCK))

    return run


def _relimb20(l16: np.ndarray, n: int) -> list:
    """[..., 3] 16-bit limbs (bits [0,48)) -> n 20-bit limbs + remainder.

    Returns [bits [0,20), bits [20,40), ...][:n] plus, as the final entry,
    the bits >= 20*n — the same exact integer, re-windowed for the kernel's
    2x20-bit ramp chains."""
    x = (l16[..., 0].astype(np.int64) | (l16[..., 1].astype(np.int64) << 16)
         | (l16[..., 2].astype(np.int64) << 32))
    out = [((x >> (20 * j)) & 0xFFFFF).astype(np.int32) for j in range(n)]
    out.append((x >> (20 * n)).astype(np.int32))
    return out


def pack_params(db: DeviceBatch) -> np.ndarray:
    """DeviceBatch -> [B*SB (padded to TILE), C*32] int32 parameter rows."""
    B, SB, C = db.t_base.shape
    rows = B * SB
    rows_pad = -(-rows // _TILE_ROWS) * _TILE_ROWS
    params = np.zeros((rows_pad, C, PARAM_LANES), dtype=np.int32)

    def put(lane, arr_row_c):  # arr [B, SB, C] -> rows
        params[:rows, :, lane] = arr_row_c.reshape(rows, C)

    def put_epoch(lane, arr_b_c):  # arr [B, C] broadcast over SB
        put(lane, np.broadcast_to(arr_b_c[:, None, :], (B, SB, C)))

    # Bases are fractional bits [16, 56) => exactly two 20-bit limbs; the
    # code step carries its integer part (bits >= 56 of the 2^56 step,
    # i.e. bits >= 40 of the [16, 64) window) in the third step lane.
    cp = _relimb20(db.code_p, 2)
    gp = _relimb20(db.carr_p, 2)
    cs = _relimb20(db.code_s, 2)
    gs = _relimb20(db.carr_s, 2)
    for k in range(2):
        put(_P_CODE_P + k, cp[k])
        put(_P_CARR_P + k, gp[k])
        put_epoch(_P_CODE_S + k, cs[k])
        put_epoch(_P_CARR_S + k, gs[k])
    put_epoch(_P_CODE_S + 2, cs[2])  # integer chips/sample
    put(_P_TBASE, db.t_base)
    # _P_M0 carries m0 mod 20 (the folded nav counter — see the
    # _wire_to_params note); _P_B0 stays populated for tooling dumps but
    # the kernel no longer reads it.
    put_epoch(_P_M0, db.m0 - 20 * db.b0)
    put_epoch(_P_B0, db.b0)
    put_epoch(_P_NAVBITS, db.navbits)
    put_epoch(_P_GAIN, db.gain)
    return params.reshape(rows_pad, C * PARAM_LANES)


def synth_batch(batch: DeviceBatch, n_out: int) -> jax.Array:
    """DeviceBatch -> [B, n_out, 2] int16 via the fused Pallas kernel."""
    B, SB, C = batch.t_base.shape
    params = pack_params(batch)
    fn = _get_pallas_fn(C)
    i16, q16 = fn(jnp.asarray(params), jnp.asarray(batch.ca_words))
    rows = B * SB
    iq = jnp.stack([i16[:rows].reshape(B, SB * SUBBLOCK),
                    q16[:rows].reshape(B, SB * SUBBLOCK)], axis=-1)
    return iq[:, :n_out]


# ---------------------------------------------------------------------------
# Fast path: compact per-epoch upload + on-device sub-block rebase.
# ---------------------------------------------------------------------------


def _device_rebase(f8, s8, k0):
    """tot = f8 + k0 * s8 over 8 exact 8-bit limbs (all int32).

    f8/s8: [B, C, 8] 2^56-scaled values (the step may exceed 1.0, hence 8
    limbs = 64 bits); k0: [SB]. Returns (the kernel's two 20-bit limbs
    covering fractional bits [16, 56), integer part = bits >= 56), each
    [B, SB, C].
    """
    t = f8[:, None, :, :] + k0[None, :, None, None] * s8[:, None, :, :]
    carry = jnp.zeros_like(t[..., 0])
    limbs = []
    for j in range(8):
        tj = t[..., j] + carry
        carry = tj >> 8
        limbs.append(tj & 0xFF)
    # Kernel base = fractional bits [16, 56) as two 20-bit limbs.
    l20_0 = limbs[2] | (limbs[3] << 8) | ((limbs[4] & 0xF) << 16)
    l20_1 = (limbs[4] >> 4) | (limbs[5] << 4) | (limbs[6] << 12)
    t_int = limbs[7] | (carry << 8)  # bits >= 56
    return (l20_0, l20_1), t_int


def _unpack_wire(wire):
    """Invert plan.pack_epoch_wire on device (cheap shifts on [B, C])."""
    def u8(lane):  # lanes (lane, lane+1) -> [B, C, 8] 8-bit limbs
        parts = [(wire[..., lane + (j // 4)] >> (8 * (j % 4))) & 0xFF
                 for j in range(8)]
        return jnp.stack(parts, axis=-1)

    return dict(
        code_f8=u8(0), code_s8=u8(2), carr_f8=u8(4), carr_s8=u8(6),
        t0=wire[..., 8], m0=wire[..., 9] & 0xFFFF, b0=wire[..., 9] >> 16,
        navbits=wire[..., 10], gain=wire[..., 11])


def nav_masks(m0, b0, navbits):
    """[B, C] nav window fields -> [B*C, 128] per-code-period sign masks.

    Lane m holds -(nav bit of code period m0+m) as a 0/-1 mask; the v5
    kernel gathers it by the in-epoch period count M, replacing the
    per-sample window walk (mg, floor((mg+0.5)/20), shift — the
    gpssim.c:2233-2241 semantics, reproduced here bit-for-bit including
    the float rounding) with one measured-free lane gather. 128 lanes
    cover every legal geometry: an epoch is 102,300 chips (~101 periods)
    plus at most ~15 periods of tile padding (_aligned_tile), and the
    in-epoch M is never negative (t0 = floor(code phase) >= 0)."""
    m = jnp.arange(128, dtype=jnp.int32)
    mg = m0[..., None] + m
    bidx = jnp.floor((mg.astype(jnp.float32) + 0.5)
                     * _INV20).astype(jnp.int32)
    # Padded rows past the epoch end may push the window index past the
    # packed bits; they are sliced off by the caller, so clamp only to
    # keep the shift defined (valid-region j is always in range).
    j = jnp.clip(bidx - b0[..., None], 0, 31)
    mask = -((navbits[..., None] >> j) & 1)
    B, C = m0.shape
    return mask.reshape(B * C, 128)


def nav_table_from_wire(wire):
    """Wire [B, C, 12] -> [B*C, 128] nav masks (see nav_masks)."""
    u = _unpack_wire(wire)
    return nav_masks(u["m0"], u["b0"], u["navbits"])


def _aligned_tile(sub_blocks: int) -> tuple[int, int]:
    """Pick (tile_rows, padded sub-block count) for epoch-aligned tiles.

    Tiles must not straddle epochs (the uniform kernel reads one row's
    steps for the whole tile), so each epoch's row count pads up to a
    tile multiple; choose the tile size minimizing that waste, preferring
    larger tiles (more hoist amortization) on ties. At the canonical
    2.6 Msps (127 sub-blocks/epoch) the waste is one sub-block (0.8%)."""
    best = None
    for t in (8, 16, 24, 32):
        pad = -(-sub_blocks // t) * t
        if best is None or pad < best[1] or (pad == best[1] and t > best[0]):
            best = (t, pad)
    return best


def _wire_to_params(wire, sub_blocks: int, align: bool = False):
    """Wire [B, C, 12] -> kernel params [rows_pad, C*32] (on device).

    Performs the exact per-sub-block rebase and the lane packing; shared
    by the single-device fast path and the shard_map'd pod path.

    align=True pads each epoch's sub-block count to a whole number of
    kernel tiles (see _aligned_tile) so every tile's rows share one
    epoch's parameters — the contract of the uniform kernel variant. The
    padded sub-blocks evaluate the same ramps a little past the epoch end
    and are sliced off by the caller."""
    SB = sub_blocks
    if align:
        SB = _aligned_tile(sub_blocks)[1]
    u = _unpack_wire(wire)
    t0, code_f8, code_s8 = u["t0"], u["code_f8"], u["code_s8"]
    carr_f8, carr_s8 = u["carr_f8"], u["carr_s8"]
    m0, b0, navbits, gain = u["m0"], u["b0"], u["navbits"], u["gain"]
    B, C = t0.shape
    k0 = jnp.arange(SB, dtype=jnp.int32) * SUBBLOCK

    (cp0, cp1), ccarry = _device_rebase(code_f8, code_s8, k0)
    (qp0, qp1), _ = _device_rebase(carr_f8, carr_s8, k0)
    t_base = t0[:, None, :] + ccarry

    # Per-sample kernel steps: fractional bits [16, 56) of the 2^56 step
    # as two 20-bit limbs, plus the code step's integer part (bits >= 56,
    # nonzero when the step exceeds 1 chip/sample) as a direct chip lane.
    def step20(s8):
        l0 = s8[..., 2] | (s8[..., 3] << 8) | ((s8[..., 4] & 0xF) << 16)
        l1 = (s8[..., 4] >> 4) | (s8[..., 5] << 4) | (s8[..., 6] << 12)
        return l0, l1

    cs0, cs1 = step20(code_s8)
    cs_top = code_s8[..., 7]  # integer chips/sample
    gs0, gs1 = step20(carr_s8)

    def bc(a):  # [B, C] -> [B, SB, C]
        return jnp.broadcast_to(a[:, None, :], (B, SB, C))

    # _P_M0 carries m0 - 20*b0 (= m0 mod 20): the kernel's nav bit index
    # is then floor((m0r + M + 0.5)/20) DIRECTLY — the old
    # floor((m0 + M + 0.5)/20) - b0 needed one more SMEM broadcast and a
    # vector subtract per (row, channel). Exact: shifting the argument by
    # 20*b0 commutes with floor(/20), and in the folded domain
    # (m0r + M + 0.5 <= 148.5) the f32 product is always >= 0.025 away
    # from an integer so the floor cannot misround (the unfolded form is
    # exact over its domain too — goldens — so outputs are bit-identical).
    lanes = [cp0, cp1, qp0, qp1, t_base,
             bc(cs0), bc(cs1), bc(cs_top), bc(gs0), bc(gs1),
             bc(m0 - 20 * b0), bc(b0), bc(navbits), bc(gain)]
    params = jnp.stack(
        lanes + [jnp.zeros_like(t_base)] * (PARAM_LANES - len(lanes)),
        axis=-1)  # [B, SB, C, 32]
    rows = B * SB
    params = params.reshape(rows, C * PARAM_LANES)
    if not align:
        rows_pad = -(-rows // _TILE_ROWS) * _TILE_ROWS
        if rows_pad != rows:
            params = jnp.pad(params, ((0, rows_pad - rows), (0, 0)))
    return params, rows


@lru_cache(maxsize=None)
def _get_epoch_fn(n_chan: int, sub_blocks: int, n_out: int,
                  premult: bool = False, int_step: bool = True,
                  fmt: int | None = 16, nav_gather: bool = False):
    """Packed fast path: wire -> [B, words] int32, the final byte stream.

    Output words per epoch cover the tile-padded SBp * SUBBLOCK samples;
    the valid prefix is packed_bytes(n_out, fmt) bytes (callers slice on
    host, or see checksum_packed for device-side validation).

    fmt=None is the legacy (round-2) path — two int16 kernel outputs
    stacked by XLA into [B, n_out, 2] — kept for A/B ablation
    (GPS_SDR_SIM_PACKED=0) and for SUBBLOCK values the packers don't
    divide."""
    tile, SBp = _aligned_tile(sub_blocks)
    pallas_fn_inner = _get_pallas_fn(n_chan, uniform=True, tile_rows=tile,
                                     premult=premult, int_step=int_step,
                                     fmt=fmt,
                                     tpe=SBp // tile if nav_gather else 0)

    def _extra(wire):
        return (nav_table_from_wire(wire),) if nav_gather else ()

    if fmt is None:
        @jax.jit
        def run_legacy(wire, ca_words):
            B = wire.shape[0]
            params, rows = _wire_to_params(wire, sub_blocks, align=True)
            i16, q16 = pallas_fn_inner(params, ca_words, *_extra(wire))
            iq = jnp.stack([i16.reshape(B, SBp * SUBBLOCK),
                            q16.reshape(B, SBp * SUBBLOCK)], axis=-1)
            return iq[:, :n_out]

        return run_legacy

    div = PACK_DIV[fmt]

    @jax.jit
    def run(wire, ca_words):
        B = wire.shape[0]
        params, rows = _wire_to_params(wire, sub_blocks, align=True)
        words = pallas_fn_inner(params, ca_words, *_extra(wire))
        return words.reshape(B, SBp * SUBBLOCK // div)

    return run


def packed_bytes(n_out: int, fmt: int) -> int:
    """Valid output bytes per epoch of n_out samples in format `fmt`.

    SC01 drops a trailing partial byte like the reference (loop bound
    iq_buff_size/4, gpssim.c:2268)."""
    return {16: n_out * 4, 8: n_out * 2, 1: n_out // 4}[fmt]


# Per-segment C/A word tables are identical across every batch of the
# segment; cache their device copies so each is uploaded once (transfers
# over this environment's tunnel cost ~2 ms each).
_CA_DEVICE_CACHE: dict = {}


def _ca_device(ca_words: np.ndarray) -> jax.Array:
    key = ca_words.tobytes()
    dev = _CA_DEVICE_CACHE.get(key)
    if dev is None:
        if len(_CA_DEVICE_CACHE) > 64:
            _CA_DEVICE_CACHE.clear()
        dev = _CA_DEVICE_CACHE[key] = jnp.asarray(ca_words)
    return dev


# Gain bound for the premultiplied-table kernel: |table| = 250, so rails
# stay exact int16 while gain <= 32767 // 250. True for every terrestrial
# scenario (the 20,200 km reference distance caps gain near 128,
# gpssim.c:2178-2186); spacecraft passing close to the GPS shell can
# exceed it and fall back to the in-mix gain multiply. Env kill-switch
# for A/B ablation.
PREMULT_MAX_GAIN = 32767 // 250
_PREMULT_ENABLED = _os.environ.get("GPS_SDR_SIM_PREMULT", "1") != "0"


def premult_ok(gain: np.ndarray) -> bool:
    """Host-side gate: may this batch use the premultiplied kernel?"""
    return bool(_PREMULT_ENABLED and (np.size(gain) == 0 or int(
        np.max(gain)) <= PREMULT_MAX_GAIN))


def stage_epochs(eb):
    """Start the (async) host->device upload of an EpochBatch.

    The batch crosses the boundary as ONE coalesced array
    (plan.pack_epoch_wire) to amortize per-transfer latency; callers that
    stage batch k+1 before synthesizing batch k overlap the upload with
    device compute (worth ~1.5x end-to-end behind this environment's
    tunnel — see runner.run_epoch_range)."""
    from gps_sdr_sim_tpu.ops.plan import pack_epoch_wire

    # int_step gate: skip the integer-step lane when every code step is
    # < 1 chip/sample (2^56 bits >= 56 all zero — any rate > ~1.023 Msps).
    int_step = bool(np.any(eb.code_s >> 56))
    return (jnp.asarray(pack_epoch_wire(eb)), _ca_device(eb.ca_words),
            max(eb.n_chan, 1), premult_ok(eb.gain), int_step)


def synth_staged_packed(staged, n_out: int, fmt: int = 16) -> jax.Array:
    """Staged upload -> [B, words] int32: the packed output byte stream.

    The fastest path: quantization AND format packing happen in the
    kernel epilogue, so per epoch only packed_bytes(n_out, fmt) (+ tile
    padding) ever reach HBM. Words viewed as little-endian bytes are the
    final file stream; each epoch's valid prefix is
    packed_bytes(n_out, fmt) bytes."""
    wire, ca_dev, n_chan, premult, int_step = staged
    sub_blocks = -(-n_out // SUBBLOCK)
    fn = _get_epoch_fn(n_chan, sub_blocks, n_out, premult, int_step, fmt,
                       nav_gather_enabled())
    return fn(wire, ca_dev)


@jax.jit
def _words_to_iq16(words):
    # Little-endian halves: [..., 0] = bits [0,16) = I, [..., 1] = Q.
    return jax.lax.bitcast_convert_type(words, jnp.int16)


def synth_staged(staged, n_out: int) -> jax.Array:
    """Staged upload (stage_epochs) -> [B, n_out, 2] int16 on device."""
    if packed_supported(16):
        return _words_to_iq16(
            synth_staged_packed(staged, n_out, 16))[:, :n_out]
    wire, ca_dev, n_chan, premult, int_step = staged
    sub_blocks = -(-n_out // SUBBLOCK)
    fn = _get_epoch_fn(n_chan, sub_blocks, n_out, premult, int_step, None,
                       nav_gather_enabled())
    return fn(wire, ca_dev)


def synth_epochs(eb, n_out: int) -> jax.Array:
    """EpochBatch -> [B, n_out, 2] int16; rebase and synthesis on device."""
    return synth_staged(stage_epochs(eb), n_out)


def iter_staged(items, make_staged):
    """Yield (staged_upload, item) with one-batch lookahead.

    The upload for item k+1 is dispatched when the consumer comes back
    for it — i.e. right AFTER it dispatched the kernel for item k — so
    the transfer streams during device compute. One copy of the
    pipelining contract, shared by runner.run_epoch_range and bench.py.
    """
    it = iter(items)
    try:
        cur = next(it)
    except StopIteration:
        return
    staged = make_staged(cur)
    for nxt in it:
        yield staged, cur
        staged, cur = make_staged(nxt), nxt
    yield staged, cur
