"""Batched multi-channel receiver pipeline with mesh sharding.

The scale-out story (SURVEY.md §2.7): the reference has no distributed
backend — its parallelism is one POSIX thread per block plus SIMD lanes in
the LDPC decoder. The TPU-native equivalent takes the SIMD-lane idea to its
conclusion: every (channel, frame) pair is a LANE, and the whole frame group
runs vmapped over the minor axis so each elementwise op processes 128 frames
per vector register — the same packing the reference uses only inside its
AVX2 LDPC decoder, applied to the entire pipeline:

- inputs arrive lane-major: headers (91, 2, C, F+1), payloads
  (payload_len, 2, C, F) with the lane axis minor. Descrambling, phase
  correction, and demapping batch over lanes at full VPU utilization, and
  the demapper writes the (N, B) int8 LLR tensor the Pallas LDPC kernel
  consumes DIRECTLY — zero layout copies between demap and decode. (The
  previous channel-major layout spent more time in XLA relayout copies of
  the 33 MB LLR tensor than in the LDPC decode itself; see
  tools/probes/compose_split.py and the jit_step trace: copy 3.3 ms + reshape
  2.8 ms vs 1.05 ms kernel.)
- the channel axis is sharded over the mesh's ``ch`` axis with ``pjit``-style
  NamedSharding, so a 64-channel receiver spreads across a pod slice with no
  cross-channel communication on the data path
- cross-channel aggregations (lock metrics, error counts) are full
  reductions that XLA lowers to ICI collectives under the mesh

This module powers ``bench.py`` (single chip: mesh of 1) and the
multi-device dry run in ``__graft_entry__.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cplx, plsync
from ..ops.demap import (
    demap,
    estimate_snr_generic,
    estimate_snr_qpsk,
    quantize_llrs,
)
from ..rx.receiver import Receiver, RxConfig
from ..utils.runtime import fec_jit


def make_channel_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("ch",))


def make_lane_fn(cfg: RxConfig, descr_np):
    """Per-lane PLFRAME processing closure shared by the batched pipelines.

    ``lane(hdr_ext, nxt_ext, payload, coarse_corrected, n0_override)``:
    one frame's extended header pair + payload -> metric/autocorr/fine/
    n0/llrs/xfec (same math as ``Receiver._frame_group_impl`` for
    n_frames=1; reference ``plsync_cc_impl::handle_payload`` +
    ``xfecframe_demapper_cb``). ``n0_override > 0`` demaps with the
    post-decoder refined N0 instead of the data-aided estimate.
    """
    info = cfg.pls_info

    def lane(hdr_ext, nxt_ext, payload, coarse_corrected, n0_override):
        exts = jnp.stack([hdr_ext, nxt_ext])               # (2, 91, 2)
        headers = exts[:, 1:]                              # (2, 90, 2)
        d = cplx.conj_mul(exts[:, 1:], exts[:, :-1])
        metric = plsync.frame_metric(d[:, 1:])             # (2,)
        pls2 = jnp.full((2,), cfg.pls, jnp.int32)
        r = plsync.coarse_autocorr(headers[:1], pls2[:1], full=True)[0]
        hdr_phase = plsync.plheader_phase(headers, pls2)   # (2,)
        payload_d = cplx.cmul(payload, jnp.asarray(descr_np))
        if info.has_pilots:
            fine = plsync.fine_foffset_pilot_mode(
                headers[0], payload_d, pls2[0], info.n_pilots
            )
            pil_ph = plsync.pilot_phases(payload_d, info.n_pilots)
            fine_ff = jnp.where(coarse_corrected, fine, 0.0)
            xfec = plsync.correct_payload_pilots(
                payload_d, hdr_phase[0], pil_ph, fine_ff,
                info.n_slots, info.n_pilots,
            )
        else:
            fine = plsync.fine_foffset_pilotless(
                hdr_phase[0], hdr_phase[1], info.plframe_len
            )
            fine_ff = jnp.where(coarse_corrected, fine, 0.0)
            xfec = plsync.correct_payload_pilotless(
                payload_d, hdr_phase[0], fine_ff
            )
        if cfg.constellation == "QPSK":
            snr = estimate_snr_qpsk(xfec)
        else:
            snr = estimate_snr_generic(xfec, cfg.constellation, cfg.rate)
        n0 = 1.0 / jnp.maximum(snr, 1e-9)
        n0_demap = jnp.where(n0_override > 0, n0_override, n0)
        llr = demap(xfec[None], n0_demap[None], cfg.constellation, cfg.rate,
                    quantize=False)[0]
        return {"metric": metric, "autocorr": r, "fine": fine, "n0": n0,
                "llrs": llr, "xfec": xfec}

    return lane


class BatchedPipeline:
    """Steady-state locked pipeline over a (channel x frame) lane batch.

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
        self._rx = Receiver(cfg)
        self.frame_len = self._rx.frame_len
        self.payload_len = self._rx.payload_len
        C, F = n_channels, frames_per_step
        B = C * F
        lane = make_lane_fn(cfg, self._rx._descr_np)

        def step(headers_ext, payloads, coarse_corrected):
            # headers_ext: (91, 2, C, F+1); payloads: (payload_len, 2, C, F);
            # lane b = c*F + f (minor axis). Frame b's next header is entry
            # f+1 of its channel's header window.
            hdr = headers_ext[..., :F].reshape(91, 2, B)
            nxt = headers_ext[..., 1:].reshape(91, 2, B)
            pay = payloads.reshape(self.payload_len, 2, B)
            out = jax.vmap(
                lambda h, n, p: lane(h, n, p, coarse_corrected,
                                     jnp.float32(-1.0)),
                in_axes=(-1, -1, -1),
                out_axes={"metric": 0, "autocorr": 0, "fine": 0, "n0": 0,
                          "llrs": -1, "xfec": 0},
            )(hdr, nxt, pay)
            del out["xfec"]  # unused here; XLA dead-code-eliminates it
            llrsT = quantize_llrs(out["llrs"])                 # (N, B)
            kbytes, n_corr, iters, ok, _hard = (
                self._rx._fec_stage_lane_major_impl(llrsT)
            )
            stats = {
                "bch_errors": jnp.sum(n_corr < 0),
                "metric_min": jnp.min(out["metric"]),
                "ldpc_iters": iters,
            }
            return (
                kbytes.reshape(C, F, -1),
                out["n0"],
                stats,
            )

        if mesh is not None:
            spec_in = NamedSharding(mesh, P(None, None, "ch", None))
            out_spec = (
                NamedSharding(mesh, P("ch", None, None)),
                NamedSharding(mesh, P("ch")),
                {
                    "bch_errors": NamedSharding(mesh, P()),
                    "metric_min": NamedSharding(mesh, P()),
                    "ldpc_iters": NamedSharding(mesh, P()),
                },
            )
            self.step = fec_jit(
                step,
                in_shardings=(spec_in, spec_in, None),
                out_shardings=out_spec,
            )
        else:
            self.step = fec_jit(step)

    def frame_inputs_from_symbols(self, symbols):
        """Host helper: frame-aligned symbol stream (C, n_syms) -> lane-major
        (headers_ext (91, 2, C, F+1), payloads (payload_len, 2, C, F)).

        Assumes symbol index 0 is a SOF start (steady-state locked). The
        lane-axis-minor layout is built on the host so the device step never
        pays a relayout.
        """
        h, p = self.channel_major_inputs(symbols)
        headers_ext = np.ascontiguousarray(h.transpose(2, 3, 0, 1))
        payloads = np.ascontiguousarray(p.transpose(2, 3, 0, 1))
        return headers_ext, payloads

    def channel_major_inputs(self, symbols):
        """(C, n_syms) -> channel-major (C, F+1, 91, 2), (C, F, Lp, 2) —
        the per-channel layout ``Receiver._frame_group_impl`` consumes."""
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


def shard_channels(mesh: Mesh, arr, axis: int = -2):
    """Place an array with its channel axis (default: second-to-last, the
    lane-major convention) sharded over the mesh."""
    axis = axis % arr.ndim
    spec = P(*[("ch" if i == axis else None) for i in range(arr.ndim)])
    return jax.device_put(arr, NamedSharding(mesh, spec))
