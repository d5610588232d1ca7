"""Physical-layer synchronization ops (JAX): frame sync, freq/phase sync, PLSC.

TPU-native reformulation of the reference's ``frame_sync``/``freq_sync``/
``plsc_decoder`` (``lib/pl_frame_sync.cc``, ``lib/pl_freq_sync.cc``,
``lib/pl_signaling.cc``):

- Frame sync computes the SOF/PLSC differential-correlation timing metric
  *densely* over a whole symbol block (TPU prefers dense vector math over the
  reference's skip-when-locked scalar loop), as 57 shifted multiply-adds.
  The metric peaks while processing the last PLHEADER symbol, i.e. at
  ``n = sof_start + 89``, and resolves the PLSC MSB sign ambiguity via
  ``max(|sof + plsc|, |sof - plsc|)``.
- Correlator taps are derived from first principles (SOF differentials and
  the PLSC pair differentials, which depend only on the scrambler and the
  dataword's LSB) and validated against the reference's hand-written tap
  tables in the tests.
- Coarse CFO: Mengali-style weighted autocorrelation of the
  modulation-removed PLHEADER, accumulated over a configurable number of
  frames. Fine CFO: pilot-mode (phase deltas between 36-symbol pilot blocks
  spaced 1476 symbols) and pilotless (PLHEADER-to-PLHEADER phase delta).
- PLSC soft decoding: derotate pi/2-BPSK to real and take the argmax of a
  (128, 64) matmul against the scrambled codeword images — MXU-trivial.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import pl_defs, reed_muller
from ..spec.pi2_bpsk import map_bpsk
from ..spec.pl_defs import (
    PLHEADER_LEN,
    PLSC_LEN,
    SOF_LEN,
    SOF_BITS,
    PLSC_SCRAMBLER_BITS,
    PILOT_BLK_LEN,
    PILOT_BLK_PERIOD,
    SLOT_LEN,
    SLOTS_PER_PILOT_BLK,
    SQRT2_2,
)

# Residual-CFO magnitude below which the fine estimator takes over
# (reference ``lib/pl_freq_sync.h:18``).
FINE_FOFFSET_CORR_RANGE = 3.3875e-4

# Frame-sync thresholds (reference ``lib/pl_frame_sync.h:160-162``)
THRESHOLD_UNLOCKED = 30.0
THRESHOLD_LOCKED = 25.0

SOF_CORR_LEN = SOF_LEN - 1       # 25 differentials
PLSC_CORR_LEN = PLSC_LEN // 2    # 32 pair differentials


@functools.lru_cache(maxsize=1)
def sof_diff_taps():
    """conj of the ideal SOF differentials d[j] = conj(s[j]) s[j-1], j=1..25."""
    sof = map_bpsk(SOF_BITS)
    d = np.conj(sof[1:]) * sof[:-1]
    return np.conj(d).astype(np.complex64)  # taps[j-1] matches diff index j


@functools.lru_cache(maxsize=1)
def plsc_diff_taps():
    """conj of the PLSC within-pair differentials for an even-b7 codeword.

    Pair k covers PLSC bits (2k, 2k+1) at PLHEADER indexes (26+2k, 27+2k).
    For every codeword the two bits differ by exactly b7, so the pair
    differential is +-j depending only on the scrambler bits (and flips sign
    globally with b7) - that is what makes a codeword-independent correlator
    possible (reference ``lib/pl_frame_sync.cc:44-52``).
    """
    s = PLSC_SCRAMBLER_BITS
    par = (s[0::2] ^ s[1::2]).astype(np.float32)  # scrambler pair parity
    d = -1j * (1.0 - 2.0 * par)  # within-pair differential for b7=0
    return np.conj(d).astype(np.complex64)


@functools.lru_cache(maxsize=1)
def _frame_sync_kernels():
    """Dense correlation kernels over d[n-i], i = 0..88.

    sof_corr[n] = sum_j d[n-89+j] * conj(d_sof[j])   (j = 1..25 -> i = 89-j)
    plsc_corr[n] = sum_k d[n-27-... ] : pair diff at index 27+2k from the
    frame start -> i = 62 - 2k.
    """
    k_sof = np.zeros(89, dtype=np.complex64)
    t_sof = sof_diff_taps()
    for j in range(1, SOF_LEN):
        k_sof[89 - j] = t_sof[j - 1]
    k_plsc = np.zeros(89, dtype=np.complex64)
    t_plsc = plsc_diff_taps()
    for k in range(PLSC_CORR_LEN):
        k_plsc[62 - 2 * k] = t_plsc[k]
    return k_sof, k_plsc


def differentials(symbols, last_sym):
    """d[n] = conj(x[n]) * x[n-1] with the previous-block boundary symbol."""
    prev = jnp.concatenate([last_sym[None], symbols[:-1]])
    return jnp.conj(symbols) * prev


def timing_metric(symbols, history):
    """Dense SOF+PLSC timing metric for each position of a symbol block.

    ``history``: the last 90 symbols of the previous block (use zeros at
    stream start). Returns (metric, sof_plus_plsc_complex) arrays of the
    block's length; ``metric[n]`` corresponds to frame start ``n - 89``
    within the extended [history | block] indexing minus history length —
    i.e. metric[n] peaks when block symbol n is the last PLHEADER symbol.
    """
    hist_len = history.shape[0]
    ext = jnp.concatenate([history, symbols])
    d_ext = jnp.conj(ext[1:]) * ext[:-1]  # d_ext[m] = diff at ext index m+1
    k_sof, k_plsc = _frame_sync_kernels()
    N = symbols.shape[0]

    # correlation: c[n] = sum_i d[n - i] * k[i]; with d[n] = d_ext[n + hist_len - 1]
    def corr(kernel):
        acc = jnp.zeros(N, jnp.complex64)
        for i in range(kernel.shape[0]):
            if kernel[i] == 0:
                continue
            # d[n - i] = d_ext[n - i + hist_len - 1]
            acc = acc + kernel[i] * jax.lax.dynamic_slice_in_dim(
                d_ext, hist_len - 1 - i, N
            )
        return acc

    sof_c = corr(np.asarray(k_sof))
    plsc_c = corr(np.asarray(k_plsc))
    m = jnp.maximum(jnp.abs(sof_c + plsc_c), jnp.abs(sof_c - plsc_c))
    return m, sof_c, plsc_c


# ---------------- PLSC decoding ----------------

@functools.lru_cache(maxsize=1)
def _rm_images():
    return reed_muller.scrambled_euclidean_images()


@functools.lru_cache(maxsize=1)
def _pi2_derot_factors():
    rot = np.where(
        (np.arange(PLSC_LEN) + SOF_LEN) % 2 == 0,
        np.complex64(SQRT2_2 - 1j * SQRT2_2),
        np.complex64(-SQRT2_2 - 1j * SQRT2_2),
    )
    return rot


def plsc_decode_soft(plheader, enabled_mask=None):
    """Soft-ML decode of the PLSC from the 90-symbol PLHEADER (batched).

    plheader: (..., 90) complex. Returns (plsc index, correlation scores).
    """
    plsc_syms = plheader[..., SOF_LEN:]
    soft = jnp.real(plsc_syms * jnp.asarray(_pi2_derot_factors()))
    scores = jnp.einsum("...k,ck->...c", soft, jnp.asarray(_rm_images()))
    if enabled_mask is not None:
        scores = jnp.where(enabled_mask, scores, -jnp.inf)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32), scores


# ---------------- Frequency / phase estimation ----------------

@functools.lru_cache(maxsize=1)
def _plheader_conj_lut():
    """(128, 90) conj of the ideal PLHEADER symbols per PLS value."""
    out = np.empty((128, PLHEADER_LEN), dtype=np.complex64)
    for plsc in range(128):
        bits = np.concatenate(
            [SOF_BITS, reed_muller.codeword_bits()[plsc] ^ PLSC_SCRAMBLER_BITS]
        )
        out[plsc] = np.conj(map_bpsk(bits))
    return out


@functools.lru_cache(maxsize=4)
def _coarse_weights(N):
    """Mengali window weights w(m), m = 1..N-1 (reference
    ``pl_freq_sync.cc:74-85``)."""
    L = N - 1
    m = np.arange(L, dtype=np.float64)
    w = 3.0 * ((2 * L + 1.0) ** 2 - (2 * m + 1.0) ** 2) / (
        ((2 * L + 1.0) ** 2 - 1) * (2 * L + 1)
    )
    return w.astype(np.float32)


def mod_removed_plheader(plheader, plsc):
    """Remove the data modulation: multiply by the conj ideal PLHEADER."""
    lut = jnp.asarray(_plheader_conj_lut())
    return plheader * lut[plsc]


def coarse_autocorr(plheader, plsc, full=True):
    """Autocorrelation accumulator contribution of one PLHEADER (batched).

    Returns r (..., N-1) complex with r[m-1] = sum_n p[n+m] conj(p[n]) for
    lag m = 1..N-1, where p is the modulation-removed PLHEADER (or its SOF
    part only when ``full`` is False).
    """
    p = mod_removed_plheader(plheader, plsc)
    N = PLHEADER_LEN if full else SOF_LEN
    p = p[..., :N]
    lags = []
    for m in range(1, N):
        lags.append(jnp.sum(p[..., m:] * jnp.conj(p[..., :N - m]), axis=-1))
    return jnp.stack(lags, axis=-1)


def coarse_foffset_from_autocorr(r):
    """Finalize the coarse CFO estimate from accumulated autocorrelation.

    r: (..., N-1). Returns the normalized frequency offset in [-0.5, 0.5].
    """
    N = r.shape[-1] + 1
    angles = jnp.arctan2(jnp.imag(r), jnp.real(r))
    prev = jnp.concatenate(
        [jnp.zeros_like(angles[..., :1]), angles[..., :-1]], axis=-1
    )
    diff = angles - prev
    diff = jnp.where(diff > jnp.pi, diff - 2 * jnp.pi, diff)
    diff = jnp.where(diff < -jnp.pi, diff + 2 * jnp.pi, diff)
    w = _coarse_weights(N)
    est = jnp.sum(diff * w, axis=-1) / (2 * jnp.pi)
    return jnp.clip(est, -0.5, 0.5)


def data_aided_phase(syms, expected_conj):
    """Average phase of modulation-removed symbols (batched)."""
    ck = jnp.sum(syms * expected_conj, axis=-1)
    return jnp.arctan2(jnp.imag(ck), jnp.real(ck))


def plheader_phase(plheader, plsc):
    lut = jnp.asarray(_plheader_conj_lut())
    return data_aided_phase(plheader, lut[plsc])


def sof_phase(plheader):
    lut = _plheader_conj_lut()
    return data_aided_phase(plheader[..., :SOF_LEN], jnp.asarray(lut[0, :SOF_LEN]))


def pilot_phases(payload_descrambled, n_pilots: int):
    """Average phase of each descrambled 36-symbol pilot block (batched).

    Pilot block i occupies payload indexes [(i+1)*1476 - 36, (i+1)*1476).
    The pilots are unmodulated at angle pi/4, which is subtracted.
    """
    phases = []
    for i in range(n_pilots):
        end = (i + 1) * PILOT_BLK_PERIOD
        blk = payload_descrambled[..., end - PILOT_BLK_LEN: end]
        ck = jnp.sum(blk, axis=-1)
        ph = jnp.arctan2(jnp.imag(ck), jnp.real(ck)) - jnp.pi / 4
        ph = jnp.where(ph > jnp.pi, ph - 2 * jnp.pi, ph)
        ph = jnp.where(ph < -jnp.pi, ph + 2 * jnp.pi, ph)
        phases.append(ph)
    return jnp.stack(phases, axis=-1) if phases else None


def fine_foffset_pilot_mode(plheader, payload_descrambled, plsc, n_pilots: int):
    """Pilot-aided fine CFO (reference ``pl_freq_sync.cc:255-303``)."""
    lut = jnp.asarray(_plheader_conj_lut())
    tail_conj = lut[plsc][..., PLHEADER_LEN - PILOT_BLK_LEN:]
    ph0 = data_aided_phase(plheader[..., PLHEADER_LEN - PILOT_BLK_LEN:], tail_conj)
    phs = pilot_phases(payload_descrambled, n_pilots)
    allph = jnp.concatenate([ph0[..., None], phs], axis=-1)
    diff = allph[..., 1:] - allph[..., :-1]
    diff = jnp.where(diff > jnp.pi, diff - 2 * jnp.pi, diff)
    diff = jnp.where(diff < -jnp.pi, diff + 2 * jnp.pi, diff)
    return jnp.sum(diff, axis=-1) / (2 * jnp.pi * PILOT_BLK_PERIOD * n_pilots)


def fine_foffset_pilotless(curr_phase, next_phase, plframe_len: int):
    """PLHEADER-to-PLHEADER fine CFO (reference ``pl_freq_sync.cc:305-349``).

    Only trustworthy when |true offset| < 1/(2*plframe_len); the caller
    gates on the coarse estimate.
    """
    delta = next_phase - curr_phase
    delta = jnp.where(delta > jnp.pi, delta - 2 * jnp.pi, delta)
    delta = jnp.where(delta < -jnp.pi, delta + 2 * jnp.pi, delta)
    return delta / (2 * jnp.pi * plframe_len)


# ---------------- Payload correction ----------------

def correct_payload_pilotless(payload_descrambled, phase, fine_foffset):
    """Feed-forward derotation: e^{-j(phase + 2*pi*f*n)} over the payload."""
    n = jnp.arange(payload_descrambled.shape[-1], dtype=jnp.float32)
    ph = phase[..., None] + 2 * jnp.pi * fine_foffset[..., None] * n
    return payload_descrambled * jnp.exp(-1j * ph)


def correct_payload_pilots(payload_descrambled, header_phase, pilot_phs,
                           fine_foffset, n_slots: int, n_pilots: int):
    """Segment-wise phase correction for pilot mode.

    Each 16-slot segment is derotated by the most recent pilot phase estimate
    (the PLHEADER phase for the first segment), plus the feed-forward fine
    CFO ramp restarting at each segment boundary (reference
    ``plsync_cc_impl.cc:729-794`` resets the rotator phase per segment).
    Returns the corrected *data* symbols (pilots dropped), shape
    (..., n_slots*90).
    """
    seg_len = SLOTS_PER_PILOT_BLK * SLOT_LEN
    outs = []
    for seg in range(n_pilots + 1):
        start = seg * PILOT_BLK_PERIOD
        if seg < n_pilots:
            data = payload_descrambled[..., start: start + seg_len]
        else:
            data = payload_descrambled[..., start:]
        phase = header_phase if seg == 0 else pilot_phs[..., seg - 1]
        n = jnp.arange(data.shape[-1], dtype=jnp.float32)
        ph = phase[..., None] + 2 * jnp.pi * fine_foffset[..., None] * n
        outs.append(data * jnp.exp(-1j * ph))
    return jnp.concatenate(outs, axis=-1)
