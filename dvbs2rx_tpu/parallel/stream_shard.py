"""Time-axis sharding with overlap-save halo exchange over ICI.

The second scale-out axis (SURVEY.md §2.7, §5 long-context row): besides
running independent channels in data parallel (``batch.py``), one very-high
-rate stream can be sharded along the *sample-time* axis across the mesh.
Windowed front-end ops (the SOF/PLSC differential correlators, FIR matched
filters) then need the tail of the previous shard — the classic overlap-save
halo — which rides a single ``ppermute`` hop between ICI neighbors, exactly
the reference's block-history mechanism (``gr::block::set_history``,
``lib/pl_frame_sync.cc`` delay lines) re-expressed as a collective.

All functions take a ``jax.sharding.Mesh`` with a ``"t"`` axis and planar
(re, im) float32 arrays (see ``ops/cplx.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import plsync

HALO = 90  # PLHEADER length: history needed by the dense timing metric


def make_time_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("t",))


def sharded_timing_metric(mesh: Mesh):
    """Dense SOF+PLSC timing metric over a time-sharded symbol stream.

    Returns a jitted function ``f(symbols (T, 2)) -> metric (T,)`` with the
    time axis sharded over ``mesh``'s ``"t"`` axis. Device i sends its last
    90 symbols to device i+1 (ppermute); device 0 uses zeros (stream start),
    so the result equals the unsharded ``ops.plsync.timing_metric`` with
    zero history.
    """
    n = mesh.shape["t"]

    def local(sym):
        # sym: (T/n, 2) local shard
        tail = sym[-HALO:]
        halo = jax.lax.ppermute(
            tail, "t", [(i, (i + 1) % n) for i in range(n)]
        )
        idx = jax.lax.axis_index("t")
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        m, _, _ = plsync.timing_metric(sym, halo)
        return m

    fn = shard_map(
        local, mesh=mesh, in_specs=P("t", None), out_specs=P("t"),
    )
    return jax.jit(fn)


def sharded_matched_filter(mesh: Mesh, taps, sps: int = 2):
    """Polyphase-free matched filter + decimation over a time-sharded stream.

    Returns a jitted ``f(samples (T, 2)) -> symbols (T//sps, 2)`` with both
    axes sharded over ``"t"``. Device i sends its last ``len(taps)-1``
    samples to device i+1 (the FIR overlap-save halo); device 0 zero-pads
    (stream start), so the result equals the unsharded convolution
    ``y[k] = sum_j x[k*sps - (L-1) + j] * taps[j]`` with zero history —
    the reference's ``set_history`` contract as one ppermute hop.
    """
    n = mesh.shape["t"]
    taps = jnp.asarray(taps, jnp.float32)
    L = int(taps.shape[0])

    def local(sym):
        # sym: (T/n, 2) local shard; T/n must be a multiple of sps
        tail = sym[-(L - 1):]
        halo = jax.lax.ppermute(
            tail, "t", [(i, (i + 1) % n) for i in range(n)]
        )
        idx = jax.lax.axis_index("t")
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([halo, sym], axis=0)     # (T/n + L - 1, 2)
        lhs = ext.T[:, None, :]                        # (2, 1, len)
        rhs = taps[None, None, :]                      # (1, 1, L)
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(sps,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
        )                                              # (2, 1, T/n/sps)
        return out[:, 0, :].T                          # (T/n/sps, 2)

    fn = shard_map(
        local, mesh=mesh, in_specs=P("t", None), out_specs=P("t", None),
    )
    return jax.jit(fn)


def shard_time(mesh: Mesh, arr):
    """Place a (T, ...) array with the leading (time) axis sharded."""
    spec = P("t", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
