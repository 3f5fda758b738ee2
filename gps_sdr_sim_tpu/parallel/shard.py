"""shard_map'd IQ synthesis over a ('time', 'chan') mesh.

Sharding layout for a DeviceBatch (see ops/plan.py):
  epochs  (B axis)  -> 'time'  : embarrassingly parallel, no collectives
  channels (C axis) -> 'chan'  : each device accumulates its channel slice,
                                 then partial int32 I/Q sums are psum-reduced
                                 over ICI *before* the (acc+64)>>7
                                 quantization — matching the reference,
                                 which sums all channels first
                                 (gpssim.c:2192-2259).

Correctness invariants (tested on a virtual 8-device CPU mesh):
  * N-device output == 1-device output, bit-exact, for any (time, chan)
    factorization;
  * epoch padding added to fill the 'time' axis is silent (zero gain) and
    stripped before returning.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gps_sdr_sim_tpu.ops.plan import DeviceBatch
from gps_sdr_sim_tpu.ops import synth_jnp
from gps_sdr_sim_tpu.parallel.mesh import CHAN_AXIS, TIME_AXIS

# PartitionSpecs per DeviceBatch field (order matches _FIELDS below).
_FIELDS = ("code_s", "code_p", "carr_s", "carr_p", "t_base", "m0", "b0",
           "navbits", "gain", "ca_words")
_IN_SPECS = (
    P(TIME_AXIS, CHAN_AXIS, None),        # code_s  [B, C, 3]
    P(TIME_AXIS, None, CHAN_AXIS, None),  # code_p  [B, SB, C, 3]
    P(TIME_AXIS, CHAN_AXIS, None),        # carr_s  [B, C, 3]
    P(TIME_AXIS, None, CHAN_AXIS, None),  # carr_p  [B, SB, C, 3]
    P(TIME_AXIS, None, CHAN_AXIS),        # t_base  [B, SB, C]
    P(TIME_AXIS, CHAN_AXIS),              # m0      [B, C]
    P(TIME_AXIS, CHAN_AXIS),              # b0      [B, C]
    P(TIME_AXIS, CHAN_AXIS),              # navbits [B, C]
    P(TIME_AXIS, CHAN_AXIS),              # gain    [B, C]
    P(CHAN_AXIS, None),                   # ca_words [C, 32]
)


@lru_cache(maxsize=None)
def _get_sharded_fn(mesh: Mesh, n_out: int, local_chan: int, backend: str):
    sin_fix, cos_fix = synth_jnp._trig_corrections(backend)

    def local_step(code_s, code_p, carr_s, carr_p, t_base, m0, b0, navbits,
                   gain, ca_words):
        iacc, qacc = synth_jnp.accumulate(
            code_s, code_p, carr_s, carr_p, t_base, m0, b0, navbits, gain,
            ca_words, n_chan=local_chan, sin_fix=sin_fix, cos_fix=cos_fix)
        # Cross-device channel reduction BEFORE quantization (int32 exact).
        iacc = jax.lax.psum(iacc, CHAN_AXIS)
        qacc = jax.lax.psum(qacc, CHAN_AXIS)
        return synth_jnp.quantize_iq(iacc, qacc, n_out)

    fn = jax.shard_map(
        local_step, mesh=mesh, in_specs=_IN_SPECS,
        out_specs=P(TIME_AXIS, None, None))
    return jax.jit(fn)


def _pad_time(db: DeviceBatch, mult: int) -> tuple[DeviceBatch, int]:
    """Pad the epoch axis to a multiple of the mesh 'time' size.

    Padding replicates the last epoch's ramps but zeroes its gain, so padded
    epochs synthesize silence and are sliced off after the sharded call.
    """
    b = db.gain.shape[0]
    target = -(-b // mult) * mult
    if target == b:
        return db, b
    pad = target - b

    def pe(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, mode="edge")

    return DeviceBatch(
        code_s=pe(db.code_s), carr_s=pe(db.carr_s), code_p=pe(db.code_p),
        carr_p=pe(db.carr_p), t_base=pe(db.t_base), m0=pe(db.m0),
        b0=pe(db.b0), navbits=pe(db.navbits),
        gain=np.pad(db.gain, [(0, pad), (0, 0)]),
        ca_words=db.ca_words), b


def synth_batch_sharded(db: DeviceBatch, n_out: int, mesh: Mesh) -> jax.Array:
    """DeviceBatch -> [B, n_out, 2] int16, sharded over `mesh`."""
    n_time = mesh.shape[TIME_AXIS]
    n_chan_dev = mesh.shape[CHAN_AXIS]
    C = db.gain.shape[1]
    if C % n_chan_dev != 0:
        raise ValueError(f"{C} channels not divisible by mesh "
                         f"'chan' size {n_chan_dev}")
    db, b_valid = _pad_time(db, n_time)
    fn = _get_sharded_fn(mesh, n_out, C // n_chan_dev,
                         jax.default_backend())
    out = fn(*(jnp.asarray(getattr(db, f)) for f in _FIELDS))
    return out[:b_valid]


# ---------------------------------------------------------------------------
# Pallas fast path, time-sharded: the production pod configuration.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _get_sharded_pallas_fn(mesh: Mesh, local_chan: int):
    from gps_sdr_sim_tpu.ops import synth_pallas

    chan_n = mesh.shape[CHAN_AXIS]
    if chan_n == 1:
        inner = synth_pallas._get_pallas_fn(local_chan)
        local = lambda params, ca: inner(params, ca)
    else:
        # Each device's kernel emits raw int32 partial accumulators for
        # its channel slice; the cross-device channel reduction rides ICI
        # BEFORE the (acc+64)>>7 quantization, exactly like the reference
        # sums all channels first (gpssim.c:2192-2259).
        inner = synth_pallas._get_pallas_fn(local_chan, quantize=False)

        def local(params, ca):
            iacc, qacc = inner(params, ca)
            iacc = jax.lax.psum(iacc, CHAN_AXIS)
            qacc = jax.lax.psum(qacc, CHAN_AXIS)
            return (((iacc + 64) >> 7).astype(jnp.int16),
                    ((qacc + 64) >> 7).astype(jnp.int16))

    fn = jax.shard_map(
        local,
        mesh=mesh,
        # params rows (epoch x sub-block) shard over 'time'; the packed
        # 32-lane-per-channel param axis and ca_words rows shard over
        # 'chan' at whole-channel boundaries.
        in_specs=(P(TIME_AXIS, CHAN_AXIS), P(CHAN_AXIS, None)),
        out_specs=(P(TIME_AXIS, None), P(TIME_AXIS, None)),
        # pallas_call's out_shape can't carry the varying-mesh-axes info
        # the vma checker wants; the specs above are the full contract.
        check_vma=False)
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _get_wire_sharded_fn(mesh: Mesh, sub_blocks: int, n_out: int,
                         local_chan: int, premult: bool = False):
    from gps_sdr_sim_tpu.constants import SUBBLOCK
    from gps_sdr_sim_tpu.ops import synth_pallas

    chan_n = mesh.shape[CHAN_AXIS]
    tile, SBp = synth_pallas._aligned_tile(sub_blocks)
    nav_gather = synth_pallas.nav_gather_enabled()
    inner = synth_pallas._get_pallas_fn(local_chan, quantize=(chan_n == 1),
                                        uniform=True, tile_rows=tile,
                                        premult=premult,
                                        tpe=SBp // tile if nav_gather else 0)

    def local(wire, ca):
        B = wire.shape[0]
        params, _rows = synth_pallas._wire_to_params(wire, sub_blocks,
                                                     align=True)
        extra = ((synth_pallas.nav_table_from_wire(wire),)
                 if nav_gather else ())
        ia, qa = inner(params, ca, *extra)
        if chan_n > 1:
            # Raw int32 partial accumulators cross ICI BEFORE the
            # (acc+64)>>7 quantization (reference sums all channels first,
            # gpssim.c:2192-2259).
            ia = ((jax.lax.psum(ia, CHAN_AXIS) + 64) >> 7).astype(jnp.int16)
            qa = ((jax.lax.psum(qa, CHAN_AXIS) + 64) >> 7).astype(jnp.int16)
        iq = jnp.stack([ia.reshape(B, SBp * SUBBLOCK),
                        qa.reshape(B, SBp * SUBBLOCK)], axis=-1)
        return iq[:, :n_out]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(TIME_AXIS, CHAN_AXIS, None), P(CHAN_AXIS, None)),
        out_specs=P(TIME_AXIS, None, None),
        # pallas_call's out_shape can't carry varying-mesh-axes info.
        check_vma=False)
    return jax.jit(fn)


def synth_epochs_sharded(eb, n_out: int, mesh: Mesh) -> jax.Array:
    """EpochBatch -> [B, n_out, 2] int16, sharded over the mesh.

    The production pod path: the batch crosses hosts/devices as the
    compact [B, C, 12] wire (plan.pack_epoch_wire, ~170x smaller than
    pre-packed kernel params), each device performs its own exact rebase
    and parameter packing (synth_pallas._wire_to_params), and 'chan'
    shards psum raw accumulators before quantization. Epoch and channel
    padding synthesize silence (zero gain) and are stripped/ignored.
    """
    from gps_sdr_sim_tpu.constants import SUBBLOCK
    from gps_sdr_sim_tpu.ops.plan import pack_epoch_wire

    n_time = mesh.shape[TIME_AXIS]
    n_chan_dev = mesh.shape[CHAN_AXIS]
    from gps_sdr_sim_tpu.ops.synth_pallas import _ca_device

    wire = pack_epoch_wire(eb)
    B, C, _ = wire.shape
    b_pad = -(-B // n_time) * n_time - B
    c_pad = -(-max(C, 1) // n_chan_dev) * n_chan_dev - C
    wire = np.pad(wire, ((0, b_pad), (0, c_pad), (0, 0)))
    # Content-keyed device cache: the padded table is identical for every
    # batch of a segment (uploads cost ~2 ms each behind the tunnel).
    ca = _ca_device(np.pad(eb.ca_words, ((0, c_pad), (0, 0))))
    sub_blocks = -(-n_out // SUBBLOCK)
    from gps_sdr_sim_tpu.ops.synth_pallas import premult_ok

    fn = _get_wire_sharded_fn(mesh, sub_blocks, n_out,
                              (C + c_pad) // n_chan_dev,
                              premult_ok(eb.gain))
    out = fn(jnp.asarray(wire), ca)
    return out[:B]


def synth_pallas_sharded(db: DeviceBatch, n_out: int, mesh: Mesh) -> jax.Array:
    """Fused-kernel synthesis sharded over the ('time', 'chan') mesh.

    Rows (one per [epoch, sub-block]) are embarrassingly parallel over
    'time' — zero collectives, the pod configuration for bulk generation.
    A 'chan' axis > 1 splits the packed parameter lanes and ca_words at
    whole-channel boundaries; each device's fused kernel then produces raw
    int32 partial sums that are psum-reduced over ICI before quantization
    (see _get_sharded_pallas_fn).
    """
    from gps_sdr_sim_tpu.constants import SUBBLOCK
    from gps_sdr_sim_tpu.ops import synth_pallas

    n_time = mesh.shape[TIME_AXIS]
    n_chan_dev = mesh.shape[CHAN_AXIS]
    B, SB, C = db.t_base.shape
    if C % n_chan_dev != 0:
        raise ValueError(f"{C} channels not divisible by mesh "
                         f"'chan' size {n_chan_dev}")
    params = synth_pallas.pack_params(db)  # [rows_pad(TILE), C*32]

    # Pad rows so every shard is a whole number of kernel tiles.
    quantum = synth_pallas._TILE_ROWS * n_time
    rows = params.shape[0]
    rows_pad = -(-rows // quantum) * quantum
    if rows_pad != rows:
        params = np.pad(params, ((0, rows_pad - rows), (0, 0)))

    fn = _get_sharded_pallas_fn(mesh, C // n_chan_dev)
    i16, q16 = fn(jnp.asarray(params), jnp.asarray(db.ca_words))
    n_rows = B * SB
    iq = jnp.stack([i16[:n_rows].reshape(B, SB * SUBBLOCK),
                    q16[:n_rows].reshape(B, SB * SUBBLOCK)], axis=-1)
    return iq[:, :n_out]
