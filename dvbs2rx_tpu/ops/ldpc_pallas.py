"""Hand-written Pallas TPU kernel for layered offset-min-sum LDPC decoding.

This is the speed-of-light path for the receiver's hottest op. Same
algorithm as the XLA path (``ops/ldpc.py``) and the reference's production
configuration (``lib/ldpc_decoder/layered_decoder.hh``,
``ldpc_decoder_avx2.cc:13-19``): offset-min-sum with beta = 1, saturating
int8 state, check messages clamped to [-32, 31], hard-decision parity early
exit each iteration. Frames occupy the 128-wide lane axis exactly like the
reference packs one frame per int8 SIMD lane.

Why a kernel: the XLA path materializes every layer's rolled operands and
scatter-updates through HBM — measured ~3.4 ms/iteration for 128 normal
frames on TPU v5e. Here the whole codeword state lives in VMEM across all
iterations:

- ``v`` (data-bit blocks, [n_blocks, 360, B] int8) and ``p`` (parity in
  (layer, slot) layout, [q, 360, B] int8) are VMEM-resident: <= 8.3 MB for
  normal FECFRAMEs at B=128.
- check messages ([q, max_deg, 360, B] int8, up to ~30 MB) stay in HBM;
  each layer's slice is DMA'd in/out with double buffering so the DMA for
  layer i+1 overlaps the VPU work of layer i.
- the layer schedule is **fully static**: the per-layer edge lists (block
  index, cyclic shift) are compile-time constants, so every variable-node
  access lowers to a constant sublane rotate and every DMA slot/slice is
  static. The quasi-cyclic structure makes rolls the only data movement —
  no gathers (see ``spec/ldpc_tables.py``).
- iteration 1 skips the message reads entirely (messages are
  definitionally zero), so the message buffer needs no initialization.

The first-min tie-break, message/value clamps, and the layer-0 missing
previous-parity edge (check 0) replicate the XLA path bit-for-bit; both
paths decode identical outputs on the same inputs
(tests/test_ldpc_pallas.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.ldpc_tables import LDPCCode
from ..utils.runtime import fec_jit

BETA = 1
MSG_LO, MSG_HI = -32, 31
_INF = 32767


def _layer_edges(code: LDPCCode):
    """Static per-layer data-edge lists [(block, shift), ...]."""
    lay = code.layers
    edges = []
    for i in range(code.q):
        e = []
        for c in range(lay["max_cnt"]):
            if lay["block"][i, c] >= 0:
                e.append((int(lay["block"][i, c]),
                          int(lay["shift"][i, c] % code.M)))
        edges.append(e)
    return edges


def _build_kernel(code: LDPCCode, max_trials: int, B: int, interpret: bool):
    q, M, n_blocks = code.q, code.M, code.n_blocks
    edges = _layer_edges(code)
    max_deg = max(len(e) for e in edges) + 2   # data + own pty + prev pty
    DEPTH = 2

    def roll(x, s):
        # cyclic shift along the sublane (slot) axis; jnp.roll semantics.
        # Shifts are compile-time constants; Mosaic's rotate wants 32-bit
        # lanes, and all our rolled values are already int32.
        s = s % M
        if s == 0:
            return x
        if interpret:
            return jnp.roll(x, s, axis=0)
        return pltpu.roll(x, s, axis=0)

    def sat8(x32):
        return jnp.clip(x32, -128, 127).astype(jnp.int8)

    def kernel(vin_ref, pin_ref,
               vout_ref, pout_ref, msgs_ref, iters_ref, conv_ref,
               v_ref, p_ref, rbuf, wbuf, rsem, wsem, isem, done_ref):
        row0 = jax.lax.broadcasted_iota(jnp.int32, (M, B), 0) == 0

        # ---- stage the LLR state into VMEM
        cp_v = pltpu.make_async_copy(vin_ref, v_ref, isem.at[0])
        cp_p = pltpu.make_async_copy(pin_ref, p_ref, isem.at[1])
        cp_v.start()
        cp_p.start()
        cp_v.wait()
        cp_p.wait()
        iters_ref[0, 0] = 0

        def vblk(b):
            return v_ref[b].astype(jnp.int32)

        def pblk(i):
            return p_ref[i].astype(jnp.int32)

        def layer_vals(i):
            """Edge input values for layer i (list of (M, B) int8; rolls
            happen widened to int32 for Mosaic, then narrow back):
            data edges (rolled bit blocks), own parity, previous parity
            (with the missing check-0 edge of layer 0 forced inert)."""
            vals = [roll(vblk(b), s).astype(jnp.int8) for b, s in edges[i]]
            vals.append(p_ref[i])
            if i > 0:
                vals.append(p_ref[i - 1])
            else:
                vals.append(
                    jnp.where(row0, 127, roll(pblk(q - 1), 1)).astype(jnp.int8)
                )
            return vals

        # ---- parity early-exit check (reference bad()) ----------------
        def bad_pass():
            acc = jnp.zeros((M, B), jnp.bool_)
            for i in range(q):
                # int8 vector compares are unsupported on TPU: widen first
                vals = [v.astype(jnp.int32) for v in layer_vals(i)]
                sgn = vals[0] < 0
                anyz = vals[0] == 0
                for val in vals[1:]:
                    sgn = sgn ^ (val < 0)
                    anyz = anyz | (val == 0)
                acc = acc | sgn | anyz
            lane_bad = jnp.max(acc.astype(jnp.int32), axis=0, keepdims=True)
            conv_ref[:] = (lane_bad == 0).astype(jnp.int32)
            done_ref[0] = jnp.where(jnp.max(lane_bad) > 0, 0, 1)

        # ---- one full layered iteration -------------------------------
        def rdma(i):
            return pltpu.make_async_copy(
                msgs_ref.at[i], rbuf.at[i % DEPTH], rsem.at[i % DEPTH]
            )

        def wdma(i):
            return pltpu.make_async_copy(
                wbuf.at[i % DEPTH], msgs_ref.at[i], wsem.at[i % DEPTH]
            )

        def run_layer(i, first):
            slot = i % DEPTH
            E = len(edges[i]) + 2
            vals = layer_vals(i)
            # per-lane freeze at convergence (mirrors ops/ldpc.py
            # _run_decode): lanes whose parity passed at the last bad_pass
            # take no state deltas, so each frame's result is independent
            # of batch composition (pooling across channels/steps stays
            # bit-identical). A frozen lane's parity remains satisfied, so
            # conv_ref is automatically cumulative.
            frozen = conv_ref[:] != 0                  # (1, B) -> broadcast

            def old_msg(c):
                m = rbuf[slot, c].astype(jnp.int32)
                return jnp.where(first, 0, m)

            def val32(c):
                return vals[c].astype(jnp.int32)

            # pass 1: exclusive min / sign parity. Only ``vals`` (the
            # pre-update rolled edge values, E int8 buffers) live across
            # the two passes — inp/mag are recomputed in pass 2 from vals
            # + rbuf (both unchanged within the layer), trading ~5 cheap
            # VPU ops per edge for 2E fewer layer-spanning VMEM values.
            # (Mosaic allocates layer-spanning values poorly across the
            # fully-unrolled q-layer program: caching inp+mag too pushed
            # the rate-3/5 kernel's scoped-vmem demand to 109+ MiB and the
            # r4 VCM step past the 115.8 MiB ceiling; see
            # tools/probes/ldpc_vmem_probe.py.) No first-min index is
            # needed: when mag == min0 the exclusive min is min1, which
            # equals min0 whenever the minimum is duplicated — identical
            # to the reference's first-min rule.
            def mk_inp(c):
                return jnp.clip(val32(c) - old_msg(c), -128, 127)

            def mag_of(inp32):
                return jnp.maximum(jnp.minimum(jnp.abs(inp32), 127) - BETA, 0)

            inp = mk_inp(0)
            min0 = mag_of(inp)
            min1 = jnp.full((M, B), _INF, jnp.int32)
            sgn = inp < 0
            for c in range(1, E):
                inp = mk_inp(c)
                mag = mag_of(inp)
                lower = mag < min0
                min1 = jnp.where(lower, min0, jnp.minimum(min1, mag))
                min0 = jnp.minimum(min0, mag)
                sgn = sgn ^ (inp < 0)

            # pass 2: per-edge check output, message + delta write-back
            for c in range(E):
                inp = mk_inp(c)
                mag = mag_of(inp)
                excl = jnp.where(mag == min0, min1, min0)
                out = jnp.where(sgn ^ (inp < 0), -excl, excl)
                msg = jnp.clip(out, MSG_LO, MSG_HI)
                delta = jnp.clip(inp + out, -128, 127) - val32(c)
                delta = jnp.where(frozen, 0, delta)
                if c < E - 2:                       # data edge
                    b, s = edges[i][c]
                    wbuf[slot, c] = msg.astype(jnp.int8)
                    v_ref[b] = sat8(vblk(b) + roll(delta, M - s))
                elif c == E - 2:                    # own parity
                    wbuf[slot, c] = msg.astype(jnp.int8)
                    p_ref[i] = sat8(pblk(i) + delta)
                else:                               # previous parity
                    if i > 0:
                        wbuf[slot, c] = msg.astype(jnp.int8)
                        p_ref[i - 1] = sat8(pblk(i - 1) + delta)
                    else:
                        dead = row0
                        wbuf[slot, c] = jnp.where(
                            dead, 0, msg
                        ).astype(jnp.int8)
                        d = roll(jnp.where(dead, 0, delta), M - 1)
                        p_ref[q - 1] = sat8(pblk(q - 1) + d)

        def run_iteration(first):
            @pl.when(jnp.logical_not(first))
            def _():
                rdma(0).start()

            for i in range(q):
                if i + 1 < q:
                    @pl.when(jnp.logical_not(first))
                    def _(i=i):
                        rdma(i + 1).start()
                @pl.when(jnp.logical_not(first))
                def _(i=i):
                    rdma(i).wait()
                # wbuf[slot] was last used by layer i-DEPTH; drain its DMA
                if i >= DEPTH:
                    wdma(i - DEPTH).wait()
                run_layer(i, first)
                wdma(i).start()

            # drain the last DEPTH writes before the next iteration reads
            for i in range(max(q - DEPTH, 0), q):
                wdma(i).wait()

        # ---- decode loop ----------------------------------------------
        bad_pass()

        def trial(t, _):
            @pl.when(done_ref[0] == 0)
            def _():
                run_iteration(t == 0)
                bad_pass()
                iters_ref[0, 0] = iters_ref[0, 0] + 1

            return 0

        jax.lax.fori_loop(0, max_trials, trial, 0)

        # ---- ship the VMEM-resident state back to HBM outputs. Keeping
        # the big outputs in ANY (HBM) keeps them OFF the scoped-vmem
        # stack: VMEM-space custom-call results are stack-allocated when
        # the pallas_call sits inside control flow (lax.cond in the VCM
        # drain scan), which pushed the r4 VCM step past the 115.8 MiB
        # scoped limit (BENCH_r04). The two copies cost ~10 us at HBM
        # bandwidth vs ~0.5 ms/iteration of decode.
        cp_vo = pltpu.make_async_copy(v_ref, vout_ref, isem.at[0])
        cp_po = pltpu.make_async_copy(p_ref, pout_ref, isem.at[1])
        cp_vo.start()
        cp_po.start()
        cp_vo.wait()
        cp_po.wait()

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),          # v in (HBM)
        pl.BlockSpec(memory_space=pl.ANY),          # p in (HBM)
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),          # v out (HBM)
        pl.BlockSpec(memory_space=pl.ANY),          # p out (HBM)
        pl.BlockSpec(memory_space=pl.ANY),          # msgs (HBM)
        pl.BlockSpec(memory_space=pltpu.SMEM),      # iters
        pl.BlockSpec(memory_space=pltpu.VMEM),      # converged (tiny)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks, M, B), jnp.int8),
        jax.ShapeDtypeStruct((q, M, B), jnp.int8),
        jax.ShapeDtypeStruct((q, max_deg, M, B), jnp.int8),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    ]
    scratch_shapes = [
        pltpu.VMEM((n_blocks, M, B), jnp.int8),         # v (VMEM-resident)
        pltpu.VMEM((q, M, B), jnp.int8),                # p (VMEM-resident)
        pltpu.VMEM((DEPTH, max_deg, M, B), jnp.int8),   # rbuf
        pltpu.VMEM((DEPTH, max_deg, M, B), jnp.int8),   # wbuf
        pltpu.SemaphoreType.DMA((DEPTH,)),
        pltpu.SemaphoreType.DMA((DEPTH,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((1,), jnp.int32),                    # done flag
    ]
    kwargs = {}
    if not interpret:
        # Mosaic schedules in discrete modes: demand for the rate-3/5
        # normal code at B=128 is 116.97 MiB ("fat", chosen for limits
        # >= ~56 MiB) or ~63 MiB ("tight", only chosen when the limit is
        # already below its own demand, so never compilable) — measured
        # via tools/probes/ldpc_vmem_probe.py. The effective per-op
        # ceiling is min(this, xla_tpu_scoped_vmem_limit_kib - ~8 MiB
        # program reserve); fec_jit raises the flag to 128 MiB, making
        # 119 MiB here the binding-but-sufficient request.
        import os
        mb = int(os.environ.get("DVBS2RX_LDPC_VMEM_MB", "119"))
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=mb * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )


class PallasLDPCDecoder:
    """Drop-in replacement for ``ops.ldpc.LDPCDecoder`` (same call contract:
    int8 LLRs (batch, N) -> (hard bits, final LLRs, iterations, converged))
    backed by the Pallas kernel. ``interpret=True`` runs the kernel in the
    Pallas interpreter (CPU testing)."""

    def __init__(self, code: LDPCCode, max_trials: int = 25,
                 interpret: bool = None):
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self.code = code
        self.max_trials = max_trials
        self.interpret = interpret
        self.q, self.M, self.n_blocks = code.q, code.M, code.n_blocks
        self._calls = {}

    def _get_call(self, B):
        if B not in self._calls:
            if not self.interpret and B % 128 != 0:
                # Mosaic DMA slices need lane-dim (frame-batch) alignment to
                # 128 on hardware; small batches fall back to the XLA path
                # (production batches are multiples of 128 lanes anyway).
                from .ldpc import LDPCDecoder

                self._calls[B] = fec_jit(
                    LDPCDecoder(self.code, self.max_trials)._decode_impl
                )
                return self._calls[B]
            call = self._get_kernel(B)

            def decode(llrs):
                K, M, q = self.code.K, self.M, self.q
                v = llrs[:, :K].reshape(B, self.n_blocks, M).transpose(1, 2, 0)
                p = llrs[:, K:].reshape(B, M, q).transpose(2, 1, 0)
                v, p, _msgs, iters, conv = call(v, p)
                llr_data = v.transpose(2, 0, 1).reshape(B, K)
                llr_par = p.transpose(2, 1, 0).reshape(B, M * q)
                llrs_out = jnp.concatenate([llr_data, llr_par], axis=1)
                hard = (llrs_out < 0).astype(jnp.uint8)
                return hard, llrs_out, iters[0, 0], conv[0] != 0

            self._calls[B] = fec_jit(decode)
        return self._calls[B]

    def _decode_impl(self, llrs):
        # jit-traceable: shapes are static under trace
        return self._get_call(llrs.shape[0])(llrs)

    def decode_lane_major(self, llrsT):
        """Decode from (N, B) int8 LLRs, frames on the minor (lane) axis.

        This is the kernel's NATIVE layout: the (B, N) -> kernel-layout int8
        transposes cost ~4.6 ms for 128 normal frames on TPU (layout probes,
        tools/probes/compose_split.py) — more than the decode itself. Lane-major
        callers (the batched pipeline) transpose once in f32 upstream
        instead. Returns (hard_t (N, B) uint8, llrsT out, iters, conv (B,)).
        """
        K, M, q, nb = self.code.K, self.M, self.q, self.n_blocks
        B = llrsT.shape[1]
        if not self.interpret and B % 128 != 0:
            key = ("lm-fallback", B)
            if key not in self._calls:
                from .ldpc import LDPCDecoder

                dec = LDPCDecoder(self.code, self.max_trials)
                self._calls[key] = jax.jit(dec.decode_lane_major)
            return self._calls[key](llrsT)
        call = self._get_kernel(B)
        v = llrsT[:K].reshape(nb, M, B)
        p = llrsT[K:].reshape(M, q, B).transpose(1, 0, 2)
        v, p, _msgs, iters, conv = call(v, p)
        llr_data_t = v.reshape(K, B)
        llr_par_t = p.transpose(1, 0, 2).reshape(M * q, B)
        llrsT_out = jnp.concatenate([llr_data_t, llr_par_t], axis=0)
        hard_t = (llrsT_out < 0).astype(jnp.uint8)
        return hard_t, llrsT_out, iters[0, 0], conv[0] != 0

    def _get_kernel(self, B):
        key = ("kernel", B)
        if key not in self._calls:
            self._calls[key] = _build_kernel(
                self.code, self.max_trials, B, self.interpret
            )
        return self._calls[key]

    def __call__(self, llrs):
        llrs = jnp.asarray(llrs, jnp.int8)
        return self._get_call(llrs.shape[0])(llrs)


@functools.lru_cache(maxsize=16)
def get_pallas_decoder(table_name: str, max_trials: int = 25,
                       interpret: bool = None) -> PallasLDPCDecoder:
    from ..spec.ldpc_tables import get_code

    return PallasLDPCDecoder(get_code(table_name), max_trials, interpret)
