"""Baseband-frame parsing and TS packet reassembly (receive side).

Numpy/host reference implementing the semantics of the reference's
``bbdeheader_bb`` block (``lib/bbdeheader_bb_impl.cc:76-261``): BBHEADER
validation with CRC-8, SYNCD-based resynchronization, partial-packet carry
across BBFRAMEs, 0x47 sync restoration, and Transport-Error-Indicator marking
on user-packet CRC failure.

The device side of the receiver emits descrambled BBFRAME bytes; this parser
performs the final ragged TS stitching on the host (SURVEY.md §7 layer 5).
"""

from dataclasses import dataclass, field

import numpy as np

from .pl_defs import (
    BB_HEADER_LENGTH_BYTES,
    BB_HEADER_LENGTH_BITS,
    TS_PACKET_LENGTH,
    TS_SYNC_BYTE,
    TRANSPORT_ERROR_INDICATOR,
)
from .scramblers import crc8_check


@dataclass
class BBHeader:
    ts_gs: int
    sis_mis: int
    ccm_acm: int
    issyi: int
    npd: int
    ro: int
    isi: int
    upl: int
    dfl: int
    sync: int
    syncd: int


@dataclass
class BBFrameStats:
    bbframe_cnt: int = 0
    bbframe_drop_cnt: int = 0
    bbframe_gap_cnt: int = 0
    packet_cnt: int = 0
    error_cnt: int = 0


class BBFrameParser:
    """Stateful BBFRAME -> TS packet reassembler.

    ``kbch`` may be None for ACM/VCM streams whose frames vary in size; each
    ``push`` then validates against the pushed frame's own length.
    """

    def __init__(self, kbch: int = None):
        self.kbch_bytes = kbch // 8 if kbch else None
        self.max_dfl = kbch - BB_HEADER_LENGTH_BITS if kbch else None
        self.synched = False
        self.partial = np.empty(0, dtype=np.uint8)
        self.stats = BBFrameStats()

    def parse_header(self, frame: np.ndarray, max_dfl=None,
                     skip_crc=False):
        max_dfl = max_dfl if max_dfl is not None else self.max_dfl
        hdr = frame[:BB_HEADER_LENGTH_BYTES]
        if not skip_crc and not crc8_check(hdr):
            return None
        h = BBHeader(
            ts_gs=(hdr[0] >> 6) & 0x3,
            sis_mis=(hdr[0] >> 5) & 0x1,
            ccm_acm=(hdr[0] >> 4) & 0x1,
            issyi=(hdr[0] >> 3) & 0x1,
            npd=(hdr[0] >> 2) & 0x1,
            ro=hdr[0] & 0x3,
            isi=int(hdr[1]) if (hdr[0] >> 5) & 0x1 == 0 else 0,
            upl=(int(hdr[2]) << 8) | int(hdr[3]),
            dfl=(int(hdr[4]) << 8) | int(hdr[5]),
            sync=int(hdr[6]),
            syncd=(int(hdr[7]) << 8) | int(hdr[8]),
        )
        if h.dfl > max_dfl or h.dfl % 8 != 0:
            return None
        if h.syncd > h.dfl or h.syncd % 8 != 0:
            return None
        if h.upl != TS_PACKET_LENGTH * 8:
            return None
        return h

    def push(self, frame: np.ndarray, pkt_ok: np.ndarray = None,
             hdr_ok=None) -> np.ndarray:
        """Process one descrambled BBFRAME (kbch/8 bytes); returns TS bytes.

        ``pkt_ok``/``hdr_ok``: device-precomputed CRC-8 validity
        (``ops/crc8_dev.packet_validity``: pkt_ok is the LSB-first packed
        per-position window-CRC map, hdr_ok the BBHEADER check). When
        given, the stitch becomes a vectorized flag lookup + memcpy — no
        per-byte CRC work on the host (VERDICT r3 item 6). Bit-identical
        to the flag-less path."""
        frame = np.asarray(frame, dtype=np.uint8)
        if self.kbch_bytes is not None:
            assert frame.size == self.kbch_bytes
        self.stats.bbframe_cnt += 1
        if hdr_ok is not None and not hdr_ok:
            self.synched = False
            self.stats.bbframe_drop_cnt += 1
            return np.empty(0, dtype=np.uint8)
        h = self.parse_header(
            frame, max_dfl=frame.size * 8 - BB_HEADER_LENGTH_BITS,
            skip_crc=hdr_ok is not None,
        )
        if h is None:
            self.synched = False
            self.stats.bbframe_drop_cnt += 1
            return np.empty(0, dtype=np.uint8)
        if pkt_ok is not None:
            return self._push_flagged(frame, h, pkt_ok)

        df = frame[BB_HEADER_LENGTH_BYTES: BB_HEADER_LENGTH_BYTES + h.dfl // 8]
        pos = 0

        # Detect non-consecutive BBFRAMEs: the partial packet must be
        # completable exactly at the signaled next UP start.
        if self.partial.size > 0 and (
            h.syncd // 8 != TS_PACKET_LENGTH - 1 - self.partial.size
        ):
            self.synched = False
            self.stats.bbframe_gap_cnt += 1

        # Fast path: the native host runtime implements the stitch loop
        # (CRC validation, resync, partial carry, TEI marking) in C.
        from ..io import native as _native

        if _native.available():
            ts, new_partial, n_err = _native.ts_stitch(
                df, self.partial, self.synched, h.syncd // 8
            )
            self.synched = True
            self.partial = new_partial
            self.stats.error_cnt += n_err
            self.stats.packet_cnt += ts.size // TS_PACKET_LENGTH
            return ts

        if not self.synched:
            pos = h.syncd // 8 + 1  # skip to first UP, drop its CRC byte
            self.synched = True
            self.partial = np.empty(0, dtype=np.uint8)

        out = []
        remaining = df.size - pos
        while remaining >= TS_PACKET_LENGTH:
            if self.partial.size > 0:
                need = TS_PACKET_LENGTH - self.partial.size
                packet = np.concatenate([self.partial, df[pos: pos + need]])
                self.partial = np.empty(0, dtype=np.uint8)
                pos += need
            else:
                packet = df[pos: pos + TS_PACKET_LENGTH]
                pos += TS_PACKET_LENGTH
            remaining = df.size - pos
            # packet = 187 data bytes + CRC-8 of them (the replaced sync byte
            # of the following UP). Restore 0x47 and flag CRC failures.
            ok = crc8_check(packet)
            ts_pkt = np.empty(TS_PACKET_LENGTH, dtype=np.uint8)
            ts_pkt[0] = TS_SYNC_BYTE
            ts_pkt[1:] = packet[:-1]
            if not ok:
                ts_pkt[1] |= TRANSPORT_ERROR_INDICATOR
                self.stats.error_cnt += 1
            self.stats.packet_cnt += 1
            out.append(ts_pkt)

        if remaining > 0:
            self.partial = df[pos:].copy()

        return (
            np.concatenate(out) if out else np.empty(0, dtype=np.uint8)
        )

    def _push_flagged(self, frame, h, pkt_ok):
        """Vectorized stitch with device-precomputed packet validity."""
        df_start = BB_HEADER_LENGTH_BYTES
        df = frame[df_start: df_start + h.dfl // 8]
        pos = 0
        if self.partial.size > 0 and (
            h.syncd // 8 != TS_PACKET_LENGTH - 1 - self.partial.size
        ):
            self.synched = False
            self.stats.bbframe_gap_cnt += 1
        if not self.synched:
            pos = h.syncd // 8 + 1
            self.synched = True
            self.partial = np.empty(0, dtype=np.uint8)

        out = []
        # same completion gate as the loop path (bit-identical semantics)
        if self.partial.size > 0 and df.size - pos >= TS_PACKET_LENGTH:
            # the one cross-frame packet: its CRC window spans two frames,
            # so the host checks it (187 bytes, once per frame)
            need = TS_PACKET_LENGTH - self.partial.size
            packet = np.concatenate([self.partial, df[pos: pos + need]])
            self.partial = np.empty(0, dtype=np.uint8)
            pos += need
            ts_pkt = np.empty(TS_PACKET_LENGTH, dtype=np.uint8)
            ts_pkt[0] = TS_SYNC_BYTE
            ts_pkt[1:] = packet[:-1]
            if not crc8_check(packet):
                ts_pkt[1] |= TRANSPORT_ERROR_INDICATOR
                self.stats.error_cnt += 1
            self.stats.packet_cnt += 1
            out.append(ts_pkt)

        n = max(0, (df.size - pos) // TS_PACKET_LENGTH)
        if n:
            body = df[pos: pos + n * TS_PACKET_LENGTH].reshape(
                n, TS_PACKET_LENGTH
            )
            ts = np.empty((n, TS_PACKET_LENGTH), dtype=np.uint8)
            ts[:, 0] = TS_SYNC_BYTE
            ts[:, 1:] = body[:, :-1]
            # CRC byte of packet k sits at frame index
            # df_start + pos + 187 + 188*k; look its validity up in the
            # device-computed map (LSB-first packed)
            idx = (df_start + pos + TS_PACKET_LENGTH - 1
                   + TS_PACKET_LENGTH * np.arange(n))
            okb = (pkt_ok[idx >> 3] >> (idx & 7)) & 1
            bad = okb == 0
            ts[bad, 1] |= TRANSPORT_ERROR_INDICATOR
            self.stats.error_cnt += int(bad.sum())
            self.stats.packet_cnt += n
            pos += n * TS_PACKET_LENGTH
            out.append(ts.reshape(-1))
        if df.size - pos > 0:
            self.partial = df[pos:].copy()
        return (
            np.concatenate(out) if out else np.empty(0, dtype=np.uint8)
        )
