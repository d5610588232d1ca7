"""Feed-forward symbol timing recovery (Oerder & Meyr) — the TPU fast path.

The reference's Gardner loop (``ops/frontend.py``) is a per-strobe recurrence
and therefore a sequential ``lax.scan`` — correct, but it caps single-chip
throughput (~4.5 Msamples/s measured). This module is the TPU-first redesign
(SURVEY.md §7 "hard parts"): a *feed-forward* square-law timing estimator
whose every stage is dense vector math:

1. interpolate the 2 samples/symbol input to 4/T with a half-band filter
   (the O&M spectral line at 1/T needs >2x oversampling to be observable)
2. tau = -T/(2*pi) * arg( sum_n |x4[n]|^2 * e^{-j*pi*n/2} )  per block
3. matched-filter the 2/T input with the polyphase RRC subfilter selected by
   frac(tau) — one dense convolution — and decimate at the symbol offset

Because tau is constant over a block, every symbol in the block shares one
subfilter phase: the whole "interpolate + MF + decimate" collapses into a
single strided convolution (VPU/MXU work, no scan). Residual timing drift is
tracked block-to-block through the carry (integer slips adjust the consumed
sample count), and the downstream frame sync absorbs the rest.

Trade-off vs. the Gardner loop: assumes a slowly-varying symbol clock
(|clock offset| << 1/block), which holds for file replay and TCXO-grade SDR
front ends (the reference's field configuration). The Gardner path remains
available via ``RxConfig(sym_sync_impl="gardner")``.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.rrc import polyphase_rrc_bank
from .pallas_fir import mf_decimate


def _halfband_taps(n_taps=23):
    """Half-band lowpass for 2x interpolation (odd length, zero at even lags)."""
    n = np.arange(n_taps) - n_taps // 2
    h = np.sinc(n / 2.0) * np.hamming(n_taps)
    return (h / h.sum() * 2.0).astype(np.float32)  # gain 2 for zero-stuffed input


@jax.tree_util.register_pytree_node_class
@dataclass
class FFSyncState:
    tau: jnp.ndarray       # smoothed timing estimate in input samples [0, sps)
    initialized: jnp.ndarray  # int32 flag (first block takes tau directly)

    def tree_flatten(self):
        return (self.tau, self.initialized), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class FeedForwardSync:
    """Block-wise O&M timing recovery + polyphase RRC matched filtering.

    ``step(state, samples, n_out)``: samples (n, 2) planar at sps/T; emits
    (state', symbols (n_out, 2), consumed int32).
    """

    def __init__(self, sps=2, rolloff=0.2, rrc_delay=5, n_subfilt=128,
                 smooth=0.5, est_window=16384, use_pallas=False):
        if sps != 2:
            raise ValueError("FeedForwardSync currently supports sps=2")
        self.sps = sps
        self.smooth = smooth
        self.est_window = est_window
        # hand-written Pallas MF kernel; off by default (this environment's
        # remote Mosaic compiler cannot build it - see PARITY.md)
        self.use_pallas = use_pallas
        bank, self.subfilt_len, self.subfilt_delay = polyphase_rrc_bank(
            sps, rolloff, rrc_delay, n_subfilt
        )
        self.n_subfilt = n_subfilt
        self._bank = bank                       # numpy (n_subfilt, L)
        self._hb = _halfband_taps()             # numpy
        self._history = self.subfilt_len + 4    # samples kept ahead of new data
        self._step = jax.jit(self._step_impl, static_argnums=(2,))

    def history(self) -> int:
        return self._history

    def init_state(self) -> FFSyncState:
        return FFSyncState(
            tau=jnp.asarray(0.0, jnp.float32),
            initialized=jnp.asarray(0, jnp.int32),
        )

    # ---------- internals ----------

    def _estimate_tau(self, samples):
        """O&M estimate in input-sample units, range [0, sps).

        The IQ signal (bandwidth (1+alpha)/2T < 1/T) is first interpolated to
        4/T — the squared envelope's timing tone at 1/T sits exactly at the
        2/T Nyquist edge and must be created *after* resampling, not before
        (|x|^2 at 2/T aliases).
        """
        # a subwindow is ample for the estimate (variance ~ 1/N) and halves
        # the front-end cost on large blocks
        samples = samples[: self.est_window]
        n = samples.shape[0]
        up = jnp.zeros((2 * n, 2), jnp.float32).at[::2].set(samples)
        hb = jnp.asarray(self._hb)
        x4_re = jnp.convolve(up[:, 0], hb, mode="same")
        x4_im = jnp.convolve(up[:, 1], hb, mode="same")
        sq4 = x4_re * x4_re + x4_im * x4_im
        # correlate with e^{-j 2 pi k / 4}: cos/sin patterns of period 4
        k = jnp.arange(sq4.shape[0])
        re = jnp.sum(sq4 * jnp.asarray(np.array([1, 0, -1, 0], np.float32))[k % 4])
        im = jnp.sum(sq4 * jnp.asarray(np.array([0, -1, 0, 1], np.float32))[k % 4])
        # tau in symbol fractions: -angle/(2 pi); in input samples: * sps
        tau_sym = -jnp.arctan2(im, re) / (2 * jnp.pi)
        return (tau_sym * self.sps) % self.sps

    def _step_impl(self, state: FFSyncState, samples, n_out: int):
        sps, L = self.sps, self.subfilt_len
        tau_new = self._estimate_tau(samples)
        # Track a *continuous* sampling position: the estimate is only known
        # modulo one symbol period, so unwrap against the carried position and
        # low-pass it. When the position drifts past a symbol boundary the
        # grid must slip by a whole symbol (adjusting the consumed count) —
        # never by a single sample, which would land between symbols.
        delta = jnp.mod(tau_new - state.tau + sps / 2, sps) - sps / 2
        pos = jnp.where(
            state.initialized > 0, state.tau + self.smooth * delta, tau_new
        )
        # half-symbol hysteresis: a position jittering around the wrap
        # boundary must not slip back and forth (each slip shifts the symbol
        # grid and breaks downstream frame alignment)
        slip_syms = jnp.where(
            pos < -0.5 * sps, -1, jnp.where(pos >= 1.5 * sps, 1, 0)
        ).astype(jnp.int32)
        pos = pos - slip_syms.astype(jnp.float32) * sps       # in [-sps/2, 3sps/2)

        # split into integer offset + fractional subfilter phase; the +2
        # sample slack keeps the extraction start in bounds for pos < 0
        base = jnp.floor(pos).astype(jnp.int32)
        mu = pos - base.astype(jnp.float32)
        base = base + 2
        idx_subfilt = jnp.clip(
            jnp.floor(self.n_subfilt * mu).astype(jnp.int32),
            0,
            self.n_subfilt - 1,
        )
        taps = jax.lax.dynamic_index_in_dim(
            jnp.asarray(self._bank), idx_subfilt, keepdims=False
        )                                                     # (L,)

        # matched filter + decimate: y[k] = sum_l x[base + k*sps + l]*taps[l]
        # (fused Pallas kernel when enabled; XLA conv + strided slice default)
        syms = mf_decimate(samples, taps, base, sps, n_out,
                           use_pallas=self.use_pallas)

        consumed = n_out * sps + slip_syms * sps
        new_state = FFSyncState(
            tau=pos, initialized=jnp.asarray(1, jnp.int32)
        )
        return new_state, syms, consumed.astype(jnp.int32)

    def step(self, state, samples, n_out: int):
        return self._step(state, jnp.asarray(samples, jnp.float32), n_out)
