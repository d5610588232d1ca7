"""Batched multi-channel receiver pipeline with mesh sharding.

The scale-out story (SURVEY.md §2.7): the reference has no distributed
backend — its parallelism is one POSIX thread per block plus SIMD lanes in
the LDPC decoder. The TPU-native equivalent is a *channel* batch axis running
N independent receivers in lockstep, sharded over a ``jax.sharding.Mesh``:

- every stage (symbol sync scan, frame group, LDPC, BCH) is vmapped over the
  channel axis; XLA vectorizes the per-channel work onto the VPU/MXU
- the channel axis is sharded over the mesh's ``ch`` axis with ``pjit``-style
  NamedSharding, so a 64-channel receiver spreads across a pod slice with no
  cross-channel communication on the data path
- cross-channel reductions (aggregate lock/error statistics) ride a psum
  over ICI, mirroring the reference's per-block stats getters

This module powers ``bench.py`` (single chip: mesh of 1) and the
multi-device dry run in ``__graft_entry__.py``.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cplx
from ..ops.demap import quantize_llrs
from ..rx.receiver import Receiver, RxConfig


def make_channel_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("ch",))


class BatchedPipeline:
    """Steady-state locked pipeline over a channel batch.

    One ``step`` call takes frame-aligned symbol groups for each channel and
    produces decoded BBFRAME bytes plus aggregated statistics — the fused
    device program that dominates receiver throughput. Acquisition and TS
    stitching stay on the host (they are per-stream control flow).
    """

    def __init__(self, cfg: RxConfig, n_channels: int, frames_per_step: int,
                 mesh: Mesh = None):
        self.cfg = cfg
        self.n_channels = n_channels
        self.frames_per_step = frames_per_step
        self.mesh = mesh
        # reuse the single-channel receiver's jitted stage implementations
        self._rx = Receiver(cfg)
        self.frame_len = self._rx.frame_len
        self.payload_len = self._rx.payload_len

        def step(headers_ext, payloads, coarse_corrected):
            # headers_ext: (C, F+1, 91, 2); payloads: (C, F, payload_len, 2)
            group = jax.vmap(
                lambda h, p: self._rx._frame_group_impl(
                    h, p, coarse_corrected, n_frames=frames_per_step,
                    llr_quantize=False,
                )
            )(headers_ext, payloads)
            # transpose to the decoder's lane-major layout while still f32
            # (int8 transposes are pathologically slow on TPU; the f32
            # transpose + quantize is bit-identical to quantize-then-
            # transpose — see ops/demap.demap and tools/compose_split.py)
            llrs_f32 = group["llrs"].reshape(-1, cfg.fec.nldpc)
            llrsT = quantize_llrs(llrs_f32.transpose(1, 0))
            kbytes, n_corr, iters, ok, _hard = (
                self._rx._fec_stage_lane_major_impl(llrsT)
            )
            C, F = n_channels, frames_per_step
            # cross-channel aggregations: with the channel axis sharded over
            # the mesh, XLA lowers these reductions to ICI collectives
            stats = {
                "bch_errors": jnp.sum(n_corr < 0),
                "metric_min": jnp.min(group["metric"]),
                "ldpc_iters": iters,
            }
            return (
                kbytes.reshape(C, F, -1),
                group["n0"],
                stats,
            )

        if mesh is not None:
            spec_hdr = NamedSharding(mesh, P("ch", None, None, None))
            spec_pay = NamedSharding(mesh, P("ch", None, None, None))
            out_spec = (
                NamedSharding(mesh, P("ch", None, None)),
                NamedSharding(mesh, P("ch")),
                {
                    "bch_errors": NamedSharding(mesh, P()),
                    "metric_min": NamedSharding(mesh, P()),
                    "ldpc_iters": NamedSharding(mesh, P()),
                },
            )
            self.step = jax.jit(
                step,
                in_shardings=(spec_hdr, spec_pay, None),
                out_shardings=out_spec,
            )
        else:
            self.step = jax.jit(step)

    def frame_inputs_from_symbols(self, symbols):
        """Host helper: frame-aligned symbol stream (C, n_syms) ->
        (headers_ext (C, F+1, 91), payloads (C, F, payload_len)).

        Assumes symbol index 0 is a SOF start (steady-state locked).
        """
        C = symbols.shape[0]
        F = self.frames_per_step
        L = self.frame_len
        need = (F + 1) * L + 91
        assert symbols.shape[1] >= need - L, "not enough symbols"
        idx_h = np.arange(F + 1)[:, None] * L + np.arange(-1, 90)[None, :]
        idx_h = np.clip(idx_h, 0, symbols.shape[1] - 1)
        headers_ext = cplx.from_np(symbols[:, idx_h])
        idx_p = 90 + np.arange(F)[:, None] * L + np.arange(self.payload_len)[None, :]
        payloads = cplx.from_np(symbols[:, idx_p])
        return headers_ext, payloads


def shard_channels(mesh: Mesh, arr):
    """Place a (C, ...) array with the channel axis sharded over the mesh."""
    spec = P("ch", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
