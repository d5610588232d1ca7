"""Waveform front end: rotator and Gardner symbol timing recovery (JAX).

TPU-native reformulation of the reference blocks:

- ``rotator_cc`` (``lib/rotator_cc_impl.cc``): a complex NCO applied per
  block with the phase threaded as carry state. Scheduled phase-increment
  updates become block-granular carry updates (SURVEY.md §3.5: the reference
  already tolerates two-frame correction delays, so block granularity is
  faithful).

- ``symbol_sync_cc`` (``lib/symbol_sync_cc_impl.cc``): Gardner TED + PI loop
  + modulo-1 decrementing counter (Rice Ch. 8), with the polyphase RRC
  matched-filter interpolator: the loop picks one of ``n_subfilt``
  phase-offset RRC subfilters per strobe, fusing matched filtering,
  decimation, and fractional interpolation into one dot product. The
  per-strobe recurrence is inherently sequential -> ``lax.scan`` over output
  symbols, vmappable over a channel axis for batched receivers.

All IQ data is planar float32 (..., 2) — see ``ops/cplx.py``.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.rrc import polyphase_rrc_bank
from . import cplx


def rotate_block(iq, phase0, phase_inc):
    """Frequency-shift a block: iq * exp(j*(phase0 + phase_inc*n)).

    iq: (n, 2) float32. Returns (rotated, next_phase) with the phase wrapped
    for numerical stability across unbounded streams.
    """
    n = jnp.arange(iq.shape[-2], dtype=jnp.float32)
    ph = phase0 + phase_inc * n
    # elementwise complex multiply on the planar array (no jnp.stack):
    # the stack-based cmul makes XLA materialize two (n, 1) rail planes
    # in 1x128-tiled layouts (1/8 store efficiency, ~1.9 ms/step profiled
    # on the 64-channel stream step); this form fuses into one pass.
    # Bit-identical: re = x0*c + x1*s*(-1), im = x1*c + x0*s.
    c, sn = jnp.cos(ph)[..., None], jnp.sin(ph)[..., None]
    sign = jnp.asarray([-1.0, 1.0], jnp.float32)
    out = iq * c + iq[..., ::-1] * sn * sign
    next_phase = jnp.mod(phase0 + phase_inc * iq.shape[-2], 2 * jnp.pi)
    return out, next_phase


def gted_gain(rolloff: float) -> float:
    """Gardner TED gain from the S-curve slope at the origin (reference
    ``symbol_sync_cc_impl.cc:156-171``, Rice Eq. 8.47 with K=1, Eavg=1)."""
    L = 1e3
    C = np.sin(np.pi * rolloff / 2) / (4 * np.pi * (1 - (rolloff * rolloff / 4)))
    delta_x = 2.0 / L
    delta_y = 8 * C * np.sin(2 * np.pi / L)
    return delta_y / delta_x


def pi_constants(sps: float, loop_bw: float, damping: float, rolloff: float):
    """PI loop constants K1, K2 (reference ``symbol_sync_cc_impl.cc:173-199``,
    Rice Eqs. C.56/C.60). loop_bw is Bn*Ts (normalized to the symbol rate)."""
    Kp = gted_gain(rolloff)
    Bn_T = loop_bw / sps
    theta_n = Bn_T / (damping + (1.0 / (4 * damping)))
    denom = 1 + 2 * damping * theta_n + theta_n * theta_n
    Kp_K0_K1 = (4 * damping * theta_n) / denom
    Kp_K0_K2 = (4 * theta_n * theta_n) / denom
    K0 = -1.0  # decrementing counter
    return Kp_K0_K1 / (Kp * K0), Kp_K0_K2 / (Kp * K0)


@jax.tree_util.register_pytree_node_class
@dataclass
class SymbolSyncState:
    cnt: jnp.ndarray      # modulo-1 counter
    mu: jnp.ndarray       # fractional timing offset
    vi: jnp.ndarray       # PI integrator
    jump: jnp.ndarray     # samples to jump to the next strobe (int32)
    last_xi: jnp.ndarray  # previous output interpolant, (2,) float32
    n: jnp.ndarray        # absolute index of the last processed sample within
                          # the current buffer (int32)

    def tree_flatten(self):
        return (self.cnt, self.mu, self.vi, self.jump, self.last_xi, self.n), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class SymbolSync:
    """Gardner symbol synchronizer with a polyphase RRC matched filter.

    ``step(state, samples, n_out)`` consumes ~``n_out * sps`` samples and
    emits exactly ``n_out`` symbols. ``samples`` is (n, 2) float32 planar IQ.
    The caller keeps a sample ring buffer: feed a window with ``history()``
    old samples at the front, then drop the consumed samples after each call.
    """

    INTERP_METHODS = ("polyphase", "linear", "quadratic", "cubic")

    def __init__(self, sps=2, loop_bw=0.01, damping=1.0, rolloff=0.2,
                 rrc_delay=5, n_subfilt=128, interp_method="polyphase"):
        if sps < 2 or int(sps) != sps or int(sps) % 2 != 0:
            raise ValueError("sps must be an even integer >= 2")
        if interp_method not in self.INTERP_METHODS:
            raise ValueError(f"Unknown interpolation method {interp_method!r}")
        self.sps = int(sps)
        self.midpoint = self.sps // 2
        self.interp_method = interp_method
        bank, self.subfilt_len, self.subfilt_delay = polyphase_rrc_bank(
            sps, rolloff, rrc_delay, n_subfilt
        )
        self.n_subfilt = n_subfilt
        # numpy-resident: jit-captured constants must not be device arrays
        self._bank = bank  # (n_subfilt, L) reversed taps
        self.K1, self.K2 = pi_constants(sps, loop_bw, damping, rolloff)
        if interp_method == "polyphase":
            self._history = self.subfilt_len - 2 + self.midpoint
        elif interp_method == "linear":
            self._history = 1 + self.midpoint
        else:
            self._history = 2 + self.midpoint
        self._step = jax.jit(self._step_impl, static_argnums=(2,))

    def history(self) -> int:
        return self._history

    def init_state(self) -> SymbolSyncState:
        f = jnp.float32
        return SymbolSyncState(
            cnt=jnp.asarray(1.0 - 1.0 / self.sps, f),
            mu=jnp.asarray(0.0, f),
            vi=jnp.asarray(0.0, f),
            jump=jnp.asarray(self.sps, jnp.int32),
            last_xi=jnp.zeros((2,), f),
            n=jnp.asarray(self._history - 1 + 2, jnp.int32),
        )

    def _interp(self, samples, m_k, mu, bank):
        """Interpolant at basepoint m_k; returns a (2,) IQ pair.

        Interpolators follow the reference (``symbol_sync_cc_impl.cc:23-66``,
        Rice Ch. 8): polyphase RRC subfilter (default, fuses the matched
        filter), linear (Eq. 8.61), quadratic and cubic Farrow (Tables
        8.4.1/8.4.2). The Farrow/linear variants assume matched filtering is
        done upstream.
        """
        if self.interp_method == "polyphase":
            idx_subfilt = jnp.clip(
                jnp.floor(self.n_subfilt * mu).astype(jnp.int32),
                0, self.n_subfilt - 1,
            )
            taps = jax.lax.dynamic_index_in_dim(bank, idx_subfilt, keepdims=False)
            start = m_k + 2 - self.subfilt_len
            window = jax.lax.dynamic_slice_in_dim(
                samples, start, self.subfilt_len, axis=0
            )                                                          # (L, 2)
            return jnp.sum(window * taps[:, None], axis=0)             # (2,)
        if self.interp_method == "linear":
            w = jax.lax.dynamic_slice_in_dim(samples, m_k, 2, axis=0)
            return mu * w[1] + (1.0 - mu) * w[0]
        # Farrow structures use samples m_k-2 .. m_k+1
        w = jax.lax.dynamic_slice_in_dim(samples, m_k - 2, 4, axis=0)[::-1]
        if self.interp_method == "quadratic":
            coef2 = jnp.asarray(np.array([0.5, -0.5, -0.5, 0.5], np.float32))
            coef1 = jnp.asarray(np.array([-0.5, 1.5, -0.5, -0.5], np.float32))
            v2 = jnp.sum(w * coef2[:, None], axis=0)
            v1 = jnp.sum(w * coef1[:, None], axis=0)
            v0 = w[2]  # in[m_k - 1]
            return (mu * v2 + v1) * mu + v0
        coef3 = jnp.asarray(np.array([1 / 6, -0.5, 0.5, -1 / 6], np.float32))
        coef2 = jnp.asarray(np.array([0.0, 0.5, -1.0, 0.5], np.float32))
        coef1 = jnp.asarray(np.array([-1 / 6, 1.0, -0.5, -1 / 3], np.float32))
        v3 = jnp.sum(w * coef3[:, None], axis=0)
        v2 = jnp.sum(w * coef2[:, None], axis=0)
        v1 = jnp.sum(w * coef1[:, None], axis=0)
        v0 = w[2]
        return (((mu * v3) + v2) * mu + v1) * mu + v0

    def _step_impl(self, state: SymbolSyncState, samples, n_out: int):
        nominal_step = 1.0 / self.sps
        K1, K2 = self.K1, self.K2
        bank = jnp.asarray(self._bank)

        def body(carry, _):
            cnt, mu, vi, jump, last_xi, n = carry
            n = n + jump
            m_k = n - 1
            out_k = self._interp(samples, m_k, mu, bank)
            x_zc = self._interp(samples, m_k - self.midpoint, mu, bank)
            # Gardner error: <x_zc, last - out>
            e = jnp.sum(x_zc * (last_xi - out_k))
            vp = K1 * e
            vi = vi + K2 * e
            pi_out = vp + vi
            W1 = nominal_step + pi_out
            W2 = nominal_step + vi
            jump = (jnp.floor((cnt - W1) / W2) + 2).astype(jnp.int32)
            cnt_basepoint = cnt - W1 - (jump - 2).astype(jnp.float32) * W2
            mu_multi = cnt_basepoint / W2
            cnt_multi = cnt_basepoint - W2 + 1.0
            mu_single = cnt / W1
            cnt_single = cnt - W1 + 1.0
            single = jump <= 1
            mu = jnp.where(single, mu_single, mu_multi)
            cnt = jnp.where(single, cnt_single, cnt_multi)
            mu = jnp.clip(mu, 0.0, 1.0 - 1e-6)
            return (cnt, mu, vi, jump, out_k, n), out_k

        init = (state.cnt, state.mu, state.vi, state.jump, state.last_xi, state.n)
        (cnt, mu, vi, jump, last_xi, n), symbols = jax.lax.scan(
            body, init, None, length=n_out
        )
        new_state = SymbolSyncState(cnt, mu, vi, jump, last_xi, n)
        return new_state, symbols  # symbols: (n_out, 2)

    def step(self, state: SymbolSyncState, samples, n_out: int):
        """Process a sample window; returns (state', symbols (n_out, 2))."""
        return self._step(state, jnp.asarray(samples, jnp.float32), n_out)
