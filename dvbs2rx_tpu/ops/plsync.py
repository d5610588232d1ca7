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

All device-side IQ uses the planar float32 (..., 2) layout of ``ops/cplx.py``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import reed_muller
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
from . import cplx

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
    """Dense correlation kernels over d[n-i], i = 0..88 (numpy complex).

    sof_corr[n] = sum_j d[n-89+j] * conj(d_sof[j])   (j = 1..25 -> i = 89-j)
    plsc_corr[n] uses the pair differential at frame index 27+2k -> i = 62-2k.
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


def differentials(ext):
    """d over an extended planar block: d[m] = conj(x[m+1]) * x[m]."""
    return cplx.conj_mul(ext[1:], ext[:-1])


def timing_metric(symbols, history):
    """Dense SOF+PLSC timing metric for each position of a symbol block.

    symbols: (N, 2) planar; history: (90, 2) tail of the previous block
    (zeros at stream start). metric[n] peaks when block symbol n is the last
    PLHEADER symbol. Returns (metric, sof_corr, plsc_corr).
    """
    hist_len = history.shape[0]
    ext = jnp.concatenate([history, symbols], axis=0)
    d_ext = differentials(ext)            # (hist+N-1, 2); d_ext[m] = diff at m+1
    k_sof, k_plsc = _frame_sync_kernels()
    N = symbols.shape[0]

    def corr(kernel):
        acc = jnp.zeros((N, 2), jnp.float32)
        for i in range(kernel.shape[0]):
            if kernel[i] == 0:
                continue
            kr = np.float32(kernel[i].real)
            ki = np.float32(kernel[i].imag)
            seg = jax.lax.dynamic_slice_in_dim(d_ext, hist_len - 1 - i, N, axis=0)
            acc = acc + jnp.stack(
                [
                    seg[:, 0] * kr - seg[:, 1] * ki,
                    seg[:, 0] * ki + seg[:, 1] * kr,
                ],
                axis=-1,
            )
        return acc

    sof_c = corr(np.asarray(k_sof))
    plsc_c = corr(np.asarray(k_plsc))
    m = jnp.maximum(
        jnp.sqrt(cplx.abs2(sof_c + plsc_c)), jnp.sqrt(cplx.abs2(sof_c - plsc_c))
    )
    return m, sof_c, plsc_c


def frame_metric(d_frame):
    """Timing metric at the expected peak for batched frames.

    d_frame: (F, 89, 2) differentials at frame indexes 1..89 from each SOF.
    """
    k_sof, k_plsc = _frame_sync_kernels()
    ks = cplx.from_np(np.ascontiguousarray(k_sof[::-1]))
    kp = cplx.from_np(np.ascontiguousarray(k_plsc[::-1]))
    sof_c = jnp.sum(cplx.cmul(d_frame, jnp.asarray(ks)[None]), axis=1)
    plsc_c = jnp.sum(cplx.cmul(d_frame, jnp.asarray(kp)[None]), axis=1)
    return jnp.maximum(
        jnp.sqrt(cplx.abs2(sof_c + plsc_c)), jnp.sqrt(cplx.abs2(sof_c - plsc_c))
    )


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
    return cplx.from_np(rot)


def plsc_decode_soft(plheader, enabled_mask=None):
    """Soft-ML decode of the PLSC from the 90-symbol planar PLHEADER.

    plheader: (..., 90, 2). Returns (plsc index, correlation scores).
    """
    plsc_syms = plheader[..., SOF_LEN:, :]
    rot = jnp.asarray(_pi2_derot_factors())
    soft = cplx.cmul(plsc_syms, rot)[..., 0]     # real part after derotation
    scores = jnp.einsum("...k,ck->...c", soft, jnp.asarray(_rm_images()))
    if enabled_mask is not None:
        scores = jnp.where(enabled_mask, scores, -jnp.inf)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32), scores


def plsc_decode_hard(plheader, enabled_mask=None):
    """Coherent-hard decode (reference ``pl_signaling.cc:140`` with
    coherent=true, soft=false): sign-quantize the derotated PLSC symbols,
    then ML = min Hamming distance, expressed as the same (128, 64)
    correlation against the +-1 scrambled-codeword images (score =
    64 - 2*hamming, so argmax == argmin distance)."""
    plsc_syms = plheader[..., SOF_LEN:, :]
    rot = jnp.asarray(_pi2_derot_factors())
    soft = cplx.cmul(plsc_syms, rot)[..., 0]
    hard_pm = jnp.where(soft < 0, -1.0, 1.0).astype(jnp.float32)
    scores = jnp.einsum("...k,ck->...c", hard_pm, jnp.asarray(_rm_images()))
    if enabled_mask is not None:
        scores = jnp.where(enabled_mask, scores, -jnp.inf)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32), scores


def plsc_decode_diff(plheader, enabled_mask=None):
    """Differential-hard decode robust to large CFO (reference
    ``pl_signaling.cc:142`` with coherent=false): differential demap seeded
    by the last SOF symbol (``pi2_bpsk.cc:76-179``), then hard ML decode of
    the still-scrambled bits against the scrambled codeword images (the
    common XOR preserves Hamming distances)."""
    syms = plheader[..., SOF_LEN - 1:, :]               # (..., 65, 2)
    d = cplx.conj_mul(syms[..., 1:, :], syms[..., :-1, :])
    odd = (jnp.arange(PLSC_LEN) & 1).astype(jnp.int32)
    flips = (d[..., 1] < 0).astype(jnp.int32) ^ odd
    bits = jnp.cumsum(flips, axis=-1) & 1               # running XOR
    pm = (1 - 2 * bits).astype(jnp.float32)
    scores = jnp.einsum("...k,ck->...c", pm, jnp.asarray(_rm_images()))
    if enabled_mask is not None:
        scores = jnp.where(enabled_mask, scores, -jnp.inf)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32), scores


def derotate_plheader(plheader, foffset, apply_freq):
    """Coarse/fine-assisted PLHEADER derotation before PLSC decoding
    (reference ``pl_freq_sync.cc:351-437`` ``derotate_plheader``).

    Two corrections, mirroring the reference:

    1. *Frequency derotation* (open-loop mode only, gated by ``apply_freq``):
       remove the rotation accumulated across the 90 symbols using the most
       recent coarse (or fine, once available) frequency-offset estimate.
       In closed loop the external/internal rotator handles it, and applying
       a stale estimate on top would be wrong (see the reference's NOTE 3).
    2. *SOF phase correction* (always): estimate the header phase from the
       26 a-priori-known SOF symbols only — the PLSC is not decoded yet, and
       in VCM the previous frame's MODCOD says nothing about this one — and
       derotate the full header by it.

    plheader: (..., 90, 2) planar; foffset: scalar normalized offset;
    apply_freq: scalar bool. Returns the derotated (..., 90, 2) header.
    """
    n = jnp.arange(PLHEADER_LEN, dtype=jnp.float32)
    ph = jnp.where(apply_freq, 2 * jnp.pi * foffset, 0.0) * n
    hdr = cplx.cmul(plheader, cplx.cexp(-ph))
    ph_sof = sof_phase(hdr)
    return cplx.cmul(hdr, cplx.cexp(-ph_sof)[..., None, :])


# ---------------- Frequency / phase estimation ----------------

@functools.lru_cache(maxsize=1)
def _plheader_conj_lut():
    """(128, 90, 2) planar conj of the ideal PLHEADER symbols per PLS."""
    out = np.empty((128, PLHEADER_LEN), dtype=np.complex64)
    for plsc in range(128):
        bits = np.concatenate(
            [SOF_BITS, reed_muller.codeword_bits()[plsc] ^ PLSC_SCRAMBLER_BITS]
        )
        out[plsc] = np.conj(map_bpsk(bits))
    return cplx.from_np(out)


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
    return cplx.cmul(plheader, lut[plsc])


def coarse_autocorr(plheader, plsc, full=True):
    """Autocorrelation accumulator contribution of one PLHEADER (batched).

    plheader: (..., 90, 2). Returns r (..., N-1, 2) with r[m-1] =
    sum_n p[n+m] conj(p[n]) for lag m = 1..N-1, where p is the
    modulation-removed PLHEADER (or its SOF part only when ``full`` False).
    """
    p = mod_removed_plheader(plheader, plsc)
    N = PLHEADER_LEN if full else SOF_LEN
    p = p[..., :N, :]
    # r[m] = sum_n p[n+m] conj(p[n]) for all lags in ONE pass: a grouped
    # autocorrelation conv (each batch row correlates with its own data)
    # instead of N-1 separately-shaped lag reductions, which are
    # dispatch-overhead-bound on TPU.
    batch_shape = p.shape[:-2]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    x = p.reshape(B, N, 2).transpose(0, 2, 1)            # (B, 2, N)
    re_rhs = x                                           # (x, y)
    im_rhs = jnp.stack([-x[:, 1], x[:, 0]], axis=1)      # (-y, x)

    def corr(rhs):
        # out[b, m] = sum_rail sum_k x[b, rail, m+k] * rhs[b, rail, k]
        out = jax.lax.conv_general_dilated(
            x.reshape(1, B * 2, N),
            rhs.reshape(B * 2, 1, N),
            window_strides=(1,),
            padding=((N - 1, N - 1),),
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=B * 2,
        ).reshape(B, 2, 2 * N - 1)
        # rail pairs sum within each batch row; correlation at positive lags
        # sits in the upper half of the full correlation
        return (out[:, 0] + out[:, 1])[:, N:]            # (B, N-1), lags 1..

    r = jnp.stack([corr(re_rhs), corr(im_rhs)], axis=-1)  # (B, N-1, 2)
    return r.reshape(*batch_shape, N - 1, 2)


def coarse_foffset_from_autocorr(r):
    """Finalize the coarse CFO estimate from accumulated autocorrelation.

    r: (..., N-1, 2). Returns the normalized frequency offset in [-0.5, 0.5].
    """
    N = r.shape[-2] + 1
    angles = cplx.angle(r)
    prev = jnp.concatenate(
        [jnp.zeros_like(angles[..., :1]), angles[..., :-1]], axis=-1
    )
    diff = angles - prev
    diff = jnp.where(diff > jnp.pi, diff - 2 * jnp.pi, diff)
    diff = jnp.where(diff < -jnp.pi, diff + 2 * jnp.pi, diff)
    w = jnp.asarray(_coarse_weights(N))
    est = jnp.sum(diff * w, axis=-1) / (2 * jnp.pi)
    return jnp.clip(est, -0.5, 0.5)


def data_aided_phase(syms, expected_conj):
    """Average phase of modulation-removed symbols (batched, planar)."""
    ck = jnp.sum(cplx.cmul(syms, expected_conj), axis=-2)
    return jnp.arctan2(ck[..., 1], ck[..., 0])


def plheader_phase(plheader, plsc):
    lut = jnp.asarray(_plheader_conj_lut())
    return data_aided_phase(plheader, lut[plsc])


def sof_phase(plheader):
    lut = _plheader_conj_lut()
    return data_aided_phase(
        plheader[..., :SOF_LEN, :], jnp.asarray(lut[0, :SOF_LEN])
    )


def pilot_phases(payload_descrambled, n_pilots: int):
    """Average phase of each descrambled 36-symbol pilot block (batched).

    Pilot block i occupies payload indexes [(i+1)*1476 - 36, (i+1)*1476).
    The pilots are unmodulated at angle pi/4, which is subtracted.
    """
    phases = []
    for i in range(n_pilots):
        end = (i + 1) * PILOT_BLK_PERIOD
        blk = payload_descrambled[..., end - PILOT_BLK_LEN: end, :]
        ck = jnp.sum(blk, axis=-2)
        ph = jnp.arctan2(ck[..., 1], ck[..., 0]) - jnp.pi / 4
        ph = jnp.where(ph > jnp.pi, ph - 2 * jnp.pi, ph)
        ph = jnp.where(ph < -jnp.pi, ph + 2 * jnp.pi, ph)
        phases.append(ph)
    return jnp.stack(phases, axis=-1) if phases else None


def fine_foffset_pilot_mode(plheader, payload_descrambled, plsc, n_pilots: int):
    """Pilot-aided fine CFO (reference ``pl_freq_sync.cc:255-303``)."""
    lut = jnp.asarray(_plheader_conj_lut())
    tail_conj = lut[plsc][..., PLHEADER_LEN - PILOT_BLK_LEN:, :]
    ph0 = data_aided_phase(
        plheader[..., PLHEADER_LEN - PILOT_BLK_LEN:, :], tail_conj
    )
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
    n = jnp.arange(payload_descrambled.shape[-2], dtype=jnp.float32)
    ph = phase[..., None] + 2 * jnp.pi * fine_foffset[..., None] * n
    return cplx.cmul(payload_descrambled, cplx.cexp(-ph))


def correct_payload_pilots(payload_descrambled, header_phase, pilot_phs,
                           fine_foffset, n_slots: int, n_pilots: int):
    """Segment-wise phase correction for pilot mode.

    Each 16-slot segment is derotated by the most recent pilot phase estimate
    (the PLHEADER phase for the first segment), plus the feed-forward fine
    CFO ramp restarting at each segment boundary (reference
    ``plsync_cc_impl.cc:729-794`` resets the rotator phase per segment).
    Returns the corrected *data* symbols (pilots dropped), shape
    (..., n_slots*90, 2).
    """
    seg_len = SLOTS_PER_PILOT_BLK * SLOT_LEN
    outs = []
    for seg in range(n_pilots + 1):
        start = seg * PILOT_BLK_PERIOD
        if seg < n_pilots:
            data = payload_descrambled[..., start: start + seg_len, :]
        else:
            data = payload_descrambled[..., start:, :]
        phase = header_phase if seg == 0 else pilot_phs[..., seg - 1]
        n = jnp.arange(data.shape[-2], dtype=jnp.float32)
        ph = phase[..., None] + 2 * jnp.pi * fine_foffset[..., None] * n
        outs.append(cplx.cmul(data, cplx.cexp(-ph)))
    return jnp.concatenate(outs, axis=-2)
