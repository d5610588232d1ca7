"""Pallas TPU kernel: fused polyphase matched filter + decimation.

The feed-forward front end's hot op is ``y[k] = sum_l x[base + k*sps + l] *
taps[l]`` (a subfilter-phase FIR fused with decimation). The XLA lowering of
a 1D convolution walks HBM once per tap; this kernel DMAs each input tile
into VMEM once and performs the whole dot-product accumulation on-chip,
tiled over the output axis with the rails (I/Q) on the sublane axis and time
on the lane axis.

f32 only: this environment's TPU toolchain cannot compile int8 Pallas
kernels (see the axon backend notes), and the front end is float anyway.
``mf_decimate`` falls back to the XLA convolution path when Pallas is
unavailable or shapes don't tile.
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
PAD = 128        # window padding to keep the DMA length lane-aligned


def _kernel(base_ref, samples_ref, taps_ref, out_ref, *, L, sps):
    i = pl.program_id(0)
    start = base_ref[0] + i * TILE * sps

    def inner(scratch, sem):
        dma = pltpu.make_async_copy(
            samples_ref.at[:, pl.ds(start, TILE * sps + PAD)], scratch, sem
        )
        dma.start()
        dma.wait()
        win = scratch[:]                                    # (2, TILE*sps+PAD)
        acc = jnp.zeros((2, TILE), jnp.float32)
        for l in range(L):
            seg = win[:, l: l + TILE * sps]
            seg = seg.reshape(2, TILE, sps)[:, :, 0]
            acc = acc + seg * taps_ref[0, l]
        out_ref[:] = acc

    pl.run_scoped(
        inner,
        scratch=pltpu.VMEM((2, TILE * sps + PAD), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("L", "sps", "n_out", "interpret"))
def _mf_decimate_pallas(samples_t, taps, base, L, sps, n_out, interpret=False):
    n_tiles = n_out // TILE
    taps2 = jnp.zeros((1, 128), jnp.float32).at[0, :L].set(taps)
    base_arr = jnp.reshape(base.astype(jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # samples stay off-chip
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps
        ],
        out_specs=pl.BlockSpec(
            (2, TILE), lambda i, base: (0, i), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(_kernel, L=L, sps=sps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, n_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base_arr, samples_t, taps2)
    return out.T  # back to (n_out, 2)


def mf_decimate(samples, taps, base, sps, n_out, use_pallas=True,
                interpret=False):
    """y[k] = sum_l samples[base + k*sps + l] * taps[l], k in [0, n_out).

    samples: (n, 2) f32; taps: (L,) f32; base: traced int32 in [0, history].
    """
    L = taps.shape[0]
    if (
        use_pallas
        and _HAS_PALLAS
        and n_out % TILE == 0
        and samples.shape[0] >= n_out * sps + PAD + 8
    ):
        samples_t = samples.T  # (2, n): rails on sublanes, time on lanes
        return _mf_decimate_pallas(samples_t, taps, base, L, sps, n_out,
                                   interpret=interpret)
    # XLA fallback: convolution + strided slice
    tr = taps[::-1]
    y_re = jnp.convolve(samples[:, 0], tr, mode="valid")
    y_im = jnp.convolve(samples[:, 1], tr, mode="valid")
    seg_re = jax.lax.dynamic_slice_in_dim(y_re, base, n_out * sps)
    seg_im = jax.lax.dynamic_slice_in_dim(y_im, base, n_out * sps)
    return jnp.stack(
        [seg_re.reshape(n_out, sps)[:, 0], seg_im.reshape(n_out, sps)[:, 0]],
        axis=-1,
    )
