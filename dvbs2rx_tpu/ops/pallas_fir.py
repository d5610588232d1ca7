"""Pallas TPU kernels: fused polyphase matched filter + decimation.

The feed-forward front end's hot op is ``y[k] = sum_l x[base + k*sps + l] *
taps[l]`` (a subfilter-phase FIR fused with decimation-by-``sps``), with a
per-segment ``base``/``taps`` in the segmented extraction of
``ffsync.FeedForwardSync`` (reference analog: the polyphase interpolator of
``lib/symbol_sync_cc_impl.cc:73-132``, which also fuses MF + decimation).

Two Mosaic (TPU Pallas compiler) constraints shape the design:

1. **No strided lane access** — the obvious ``win.reshape(2, TILE, sps)
   [:, :, 0]`` decimation fails (unsupported ``tpu.reshape``). The input is
   therefore deinterleaved once (outside the kernel, one XLA pass) into
   ``sps`` polyphase streams, turning the decimating FIR into ``sps`` short
   FIRs over *contiguous* lanes.
2. **Dynamic DMA starts must be provably 128-divisible** — a traced
   ``base`` cannot index HBM directly. The whole-sample extraction offset
   (bounded by ``off_bound``, ~16 in the front end) is instead folded into
   an *extended tap vector* by a one-hot shift composition in XLA (the same
   trick the grouped-conv fallback uses), so every DMA start is a static
   multiple of TILE.

Net kernel: per grid step, DMA one (2, TILE+PAD) window of each phase
stream HBM->VMEM and accumulate ~K/2 static lane shifts per stream. Every
input sample crosses HBM once, vs the XLA convolution fallback that
computes all ``sps`` output phases and discards all but one.

f32 only (the front end is float; this environment's toolchain also cannot
compile int8 Pallas). All entry points fall back to the XLA convolution
path when Pallas is unavailable or shapes don't tile.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

TILE = 2048      # output symbols per grid step
PAD = 128        # DMA window slack: covers the per-phase extended tap span


def _phase_split(samples, pad=0):
    """(n, 2) f32 -> even/odd streams, each (2, n//2 + pad).

    ``pad`` trailing zeros give the kernel's fixed-length (TILE + PAD) DMA
    windows headroom past the last needed sample; the zeros multiply into
    tap positions that are never used. The split is a copy anyway, so the
    pad rides the same pass.
    """
    n2 = samples.shape[0] // 2
    x = samples[: 2 * n2].reshape(n2, 2, 2)      # (n2, phase, rail)
    a = x[:, 0, :].T                              # even: (2, n2)
    b = x[:, 1, :].T                              # odd:  (2, n2)
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, pad)))
    return a, b


def _extend_taps(taps_seg, base_seg, off_bound):
    """Fold whole-sample offsets into shifted taps: t_ext[l'] = t[l'-off].

    taps_seg (..., L), base_seg (...,) int32 in [0, off_bound].
    Returns (..., L + off_bound).
    """
    L = taps_seg.shape[-1]
    K = L + off_bound
    off = jnp.clip(base_seg, 0, off_bound)
    # (..., off_bound+1, K) stack of all shifts; one-hot select (exact —
    # 0/1 weights; a gather would serialize on TPU)
    shifted = jnp.stack(
        [
            jnp.pad(taps_seg, [(0, 0)] * (taps_seg.ndim - 1)
                    + [(o, off_bound - o)])
            for o in range(off_bound + 1)
        ],
        axis=-2,
    )
    oh = (off[..., None] == jnp.arange(off_bound + 1)).astype(taps_seg.dtype)
    return jnp.einsum("...o,...ok->...k", oh, shifted)


def _seg_kernel(a_ref, b_ref, ta_ref, tb_ref, out_ref, *, m_ext, seg_tiles):
    """One grid step = one TILE of outputs of one channel.

    Grid (C, n_out/TILE). a/b: (C, 2, n2p) HBM phase streams; ta/tb:
    (C, S, M) whole arrays in VMEM (tiny), indexed by dynamic scalars;
    out block (1, 2, TILE). All DMA starts are static multiples of TILE.
    """
    c = pl.program_id(0)
    j = pl.program_id(1)
    s = jax.lax.div(j, seg_tiles)
    start = j * TILE

    def inner(wa, wb, sem_a, sem_b):
        da = pltpu.make_async_copy(
            a_ref.at[c, :, pl.ds(start, TILE + PAD)], wa, sem_a
        )
        db = pltpu.make_async_copy(
            b_ref.at[c, :, pl.ds(start, TILE + PAD)], wb, sem_b
        )
        da.start()
        db.start()
        da.wait()
        db.wait()
        # pltpu.roll + aligned [:, :TILE] slice: misaligned static lane
        # slices of a VMEM window mis-lower on this toolchain (values
        # rotate within 128-lane tiles past the first tile boundary), so
        # the lag-m window is produced by a circular lane shift instead
        va, vb = wa[:], wb[:]
        W = TILE + PAD
        acc = jnp.zeros((2, TILE), jnp.float32)
        for m in range(m_ext):
            # left-shift by m == circular right-roll by W - m (roll
            # requires a non-negative shift); the wrapped tail lands past
            # lane TILE and is discarded by the aligned slice
            sa = va if m == 0 else pltpu.roll(va, shift=W - m, axis=1)
            sb = vb if m == 0 else pltpu.roll(vb, shift=W - m, axis=1)
            acc = acc + sa[:, :TILE] * ta_ref[c, s, m]
            acc = acc + sb[:, :TILE] * tb_ref[c, s, m]
        out_ref[0] = acc

    pl.run_scoped(
        inner,
        wa=pltpu.VMEM((2, TILE + PAD), jnp.float32),
        wb=pltpu.VMEM((2, TILE + PAD), jnp.float32),
        sem_a=pltpu.SemaphoreType.DMA(()),
        sem_b=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("seg_tiles", "interpret"))
def _mf_pallas(a, b, ta, tb, seg_tiles, interpret=False):
    """a/b: (C, 2, n2p); ta/tb: (C, S, M) extended phase taps; returns
    (C, 2, S*seg_tiles*TILE)."""
    C, S, M = ta.shape
    n_out = S * seg_tiles * TILE
    grid = (C, S * seg_tiles)
    out = pl.pallas_call(
        functools.partial(_seg_kernel, m_ext=M, seg_tiles=seg_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # A stream stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # B stream stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps: tiny, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, TILE), lambda c, j: (c, 0, j)),
        out_shape=jax.ShapeDtypeStruct((C, 2, n_out), jnp.float32),
        interpret=interpret,
    )(a, b, ta, tb)
    return out


def _phase_tap_split(taps_ext):
    """(..., K) extended taps -> even/odd phase taps (..., M), M=ceil(K/2).

    With the offset folded in (base even, residue 0): y[k] =
    sum_m A[k+m]*t_ext[2m] + sum_m B[k+m]*t_ext[2m+1].
    """
    K = taps_ext.shape[-1]
    if K % 2:
        taps_ext = jnp.pad(taps_ext, [(0, 0)] * (taps_ext.ndim - 1) + [(0, 1)])
    return taps_ext[..., 0::2], taps_ext[..., 1::2]


PRECISIONS = ("default", "high", "highest")


def _prec(name):
    import jax
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def mf_segmented(samples, taps_seg, base_seg, sps, seg_len, off_bound,
                 use_pallas=True, interpret=False, precision="default"):
    """Batched segmented decimating matched filter.

    samples: (C, n, 2) f32; taps_seg: (C, S, L); base_seg: (C, S) int32
    whole-sample extraction offsets in [0, off_bound] (window s starts at
    sample ``s*seg_len*sps + base_seg[c, s]``). Returns (C, S*seg_len, 2).
    CONTRACT: a traced ``base_seg`` outside [0, off_bound] is silently
    clipped into range on the Pallas path (the offset folds into extended
    taps via a one-hot bounded by off_bound); keep base_seg in range or the
    two paths of this API diverge numerically.

    Pallas path requires sps == 2 and seg_len % TILE == 0; falls back to a
    grouped-convolution XLA lowering otherwise (same math).

    ``precision`` controls the XLA conv fallback's multiply passes on TPU:
    "default" = single-pass bf16 (fast; ~-48 dB error floor, measured
    ~40 dB below the noise at every DVB-S2 operating point — see
    docs/mf_precision_ab.json), "high" = 3-pass, "highest" = 6-pass exact
    f32 (2x front-end cost; the round-2 pin that regressed the CCM
    headline 32%). The Pallas path is exact f32 regardless.
    """
    C, n, _ = samples.shape
    S, L = taps_seg.shape[1], taps_seg.shape[2]
    n_out = S * seg_len
    K = L + off_bound
    taps_ext = _extend_taps(taps_seg, base_seg, off_bound)    # (C, S, K)
    ok = (
        use_pallas
        and _HAS_PALLAS
        and sps == 2
        and seg_len % TILE == 0
        and (K + 1) // 2 + 2 <= PAD
        # caller contract: every extraction window fits in the input;
        # gate on the DEINTERLEAVED length (odd n loses its last sample
        # to _phase_split, so n alone is one sample optimistic)
        and 2 * (n // 2) >= (n_out - 1) * sps + K
    )
    if ok:
        # pad the phase streams so the fixed (TILE + PAD) DMA windows have
        # headroom past the last needed sample (see _phase_split)
        a, b = jax.vmap(
            lambda s: _phase_split(s, pad=PAD + 2)
        )(samples)                                    # (C, 2, n2p) x2
        ta, tb = _phase_tap_split(taps_ext)           # (C, S, M) x2
        out = _mf_pallas(a, b, ta, tb, seg_len // TILE, interpret=interpret)
        return out.transpose(0, 2, 1)                 # (C, n_out, 2)
    # XLA fallback: depthwise grouped convolution with the same extended
    # taps (what ffsync shipped before the Pallas kernel compiled).
    # Rails split ONCE with a clean (C, 2, n) transpose, then windows
    # slice rail-major: per-window planar slicing made XLA materialize
    # rail planes of the whole front-end block as (C, n, 1) arrays in
    # 1x128-tiled layouts (1/8 store efficiency, ~1.9 ms/step profiled on
    # the 64-channel stream step).
    w_seg = (seg_len - 1) * sps + K

    def one(ch_sr, ch_taps_ext):
        # ch_sr: (2, n) rail-major
        lhs = jnp.stack(
            [
                jax.lax.slice_in_dim(
                    ch_sr, s * seg_len * sps,
                    s * seg_len * sps + w_seg, axis=1
                )
                for s in range(S)
            ],
            axis=1,
        )                                             # (2, S, w_seg)
        rhs = ch_taps_ext[:, None, :]                 # (S, 1, K)
        out = jax.lax.conv_general_dilated(
            lhs, rhs,
            window_strides=(sps,),
            padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=S,
            precision=_prec(precision),
        )                                             # (2, S, seg_len)
        return out.transpose(1, 2, 0).reshape(n_out, 2)

    assert n >= (n_out - 1) * sps + K, "history too short"
    return jax.vmap(one)(samples.transpose(0, 2, 1), taps_ext)


def mf_decimate(samples, taps, base, sps, n_out, use_pallas=True,
                off_bound=None, interpret=False, precision="default"):
    """y[k] = sum_l samples[base + k*sps + l] * taps[l], k in [0, n_out).

    samples: (n, 2) f32; taps: (L,) f32; base: traced int32. When the
    caller can statically bound ``base <= off_bound`` the Pallas path
    applies (the offset folds into extended taps — see module docstring)
    and a traced ``base`` that exceeds the bound is silently CLIPPED to it;
    without ``off_bound`` the XLA convolution fallback handles arbitrary
    ``base`` exactly.
    """
    L = taps.shape[0]
    if (
        use_pallas
        and _HAS_PALLAS
        and sps == 2
        and off_bound is not None
        and n_out % TILE == 0
        and (L + off_bound + 1) // 2 + 2 <= PAD
        and 2 * (samples.shape[0] // 2) >= (n_out - 1) * sps + L + off_bound
    ):
        out = mf_segmented(
            samples[None], taps[None, None, :], base[None, None], sps,
            n_out, off_bound, use_pallas=True, interpret=interpret,
        )
        return out[0]
    # XLA fallback: convolution + strided slice (precision: see mf_segmented)
    tr = taps[::-1]
    y_re = jnp.convolve(samples[:, 0], tr, mode="valid",
                        precision=_prec(precision))
    y_im = jnp.convolve(samples[:, 1], tr, mode="valid",
                        precision=_prec(precision))
    seg_re = jax.lax.dynamic_slice_in_dim(y_re, base, n_out * sps)
    seg_im = jax.lax.dynamic_slice_in_dim(y_im, base, n_out * sps)
    return jnp.stack(
        [seg_re.reshape(n_out, sps)[:, 0], seg_im.reshape(n_out, sps)[:, 0]],
        axis=-1,
    )
