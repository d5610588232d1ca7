/*
 * dvbs2rx_tpu native host runtime: hot host-side loops in C.
 *
 * The TPU executes the DSP; the host runtime around it (IQ format
 * conversion, CRC-8 validation, TS stream stitching) is native, mirroring
 * the role of the reference's C++ block layer for IO-adjacent work
 * (lib/bbdeheader_bb_impl.cc, the u8->fc32 conversion chain of
 * apps/dvbs2-rx:674-716).
 *
 * Python binding via the CPython C API (no pybind11 in this environment).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* ---------------- CRC-8 (poly 0b111010101, non-reflected, init 0) -------- */

static uint8_t crc8_table[256];
static int crc8_table_ready = 0;

static void crc8_init(void)
{
    const unsigned poly = 0xD5; /* low 8 bits of the 9-bit polynomial */
    for (unsigned b = 0; b < 256; b++) {
        unsigned rem = b;
        for (int i = 0; i < 8; i++)
            rem = (rem & 0x80) ? (((rem << 1) ^ poly) & 0xFF) : ((rem << 1) & 0xFF);
        crc8_table[b] = (uint8_t)rem;
    }
    crc8_table_ready = 1;
}

static inline uint8_t crc8_of(const uint8_t* p, Py_ssize_t n)
{
    uint8_t rem = 0;
    for (Py_ssize_t i = 0; i < n; i++)
        rem = crc8_table[rem ^ p[i]];
    return rem;
}

static PyObject* py_crc8(PyObject* self, PyObject* args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    uint8_t rem = crc8_of((const uint8_t*)buf.buf, buf.len);
    PyBuffer_Release(&buf);
    return PyLong_FromLong(rem);
}

/* crc8_check_packets(buf): buf = N*188 bytes of [187 data][crc] chunks.
 * Returns a bytes object of N flags (1 = CRC ok). */
static PyObject* py_crc8_check_packets(PyObject* self, PyObject* args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    if (buf.len % 188 != 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer must be a multiple of 188 bytes");
        return NULL;
    }
    Py_ssize_t n = buf.len / 188;
    PyObject* out = PyBytes_FromStringAndSize(NULL, n);
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint8_t* flags = (uint8_t*)PyBytes_AS_STRING(out);
    const uint8_t* p = (const uint8_t*)buf.buf;
    for (Py_ssize_t i = 0; i < n; i++)
        flags[i] = crc8_of(p + i * 188, 188) == 0;
    PyBuffer_Release(&buf);
    return out;
}

/* ---------------- IQ format conversion ---------------- */

/* u8_to_fc32(bytes) -> bytes of float32 interleaved (re, im), centered at
 * 127.5 and scaled by 1/127.5 (RTL-SDR convention). */
static PyObject* py_u8_to_fc32(PyObject* self, PyObject* args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    Py_ssize_t n = buf.len;
    PyObject* out = PyBytes_FromStringAndSize(NULL, n * (Py_ssize_t)sizeof(float));
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    float* dst = (float*)PyBytes_AS_STRING(out);
    const uint8_t* src = (const uint8_t*)buf.buf;
    const float scale = 1.0f / 127.5f;
    for (Py_ssize_t i = 0; i < n; i++)
        dst[i] = ((float)src[i] - 127.5f) * scale;
    PyBuffer_Release(&buf);
    return out;
}

/* fc32_to_u8(bytes_f32, scale) -> u8 bytes */
static PyObject* py_fc32_to_u8(PyObject* self, PyObject* args)
{
    Py_buffer buf;
    double scale = 0.9;
    if (!PyArg_ParseTuple(args, "y*|d", &buf, &scale))
        return NULL;
    Py_ssize_t n = buf.len / (Py_ssize_t)sizeof(float);
    PyObject* out = PyBytes_FromStringAndSize(NULL, n);
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out);
    const float* src = (const float*)buf.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        float v = src[i] * (float)scale * 127.5f + 127.5f;
        if (v < 0.0f) v = 0.0f;
        if (v > 255.0f) v = 255.0f;
        dst[i] = (uint8_t)(v + 0.5f);
    }
    PyBuffer_Release(&buf);
    return out;
}

/* ---------------- TS stream stitching ----------------
 *
 * ts_stitch(datafield, partial, synched, syncd_bytes):
 *   Implements the inner loop of the reference's bbdeheader_bb
 *   (lib/bbdeheader_bb_impl.cc:203-246): SYNCD resync, partial-packet
 *   carry, per-packet CRC-8 validation, 0x47 restoration, TEI marking.
 * Returns (ts_bytes, new_partial, n_errors).
 */
static PyObject* py_ts_stitch(PyObject* self, PyObject* args)
{
    Py_buffer df, partial;
    int synched, syncd_bytes;
    if (!PyArg_ParseTuple(args, "y*y*pi", &df, &partial, &synched, &syncd_bytes))
        return NULL;

    const uint8_t* d = (const uint8_t*)df.buf;
    Py_ssize_t dlen = df.len;
    Py_ssize_t pos = 0;
    Py_ssize_t part_len = partial.len;
    uint8_t pkt[188];

    if (!synched) {
        pos = syncd_bytes + 1;
        part_len = 0;
        if (pos > dlen)
            pos = dlen;
    }

    Py_ssize_t max_pkts = (dlen - pos + part_len) / 188 + 1;
    PyObject* out = PyBytes_FromStringAndSize(NULL, max_pkts * 188);
    if (!out) {
        PyBuffer_Release(&df);
        PyBuffer_Release(&partial);
        return NULL;
    }
    uint8_t* o = (uint8_t*)PyBytes_AS_STRING(out);
    Py_ssize_t produced = 0;
    long n_errors = 0;

    while (dlen - pos + part_len >= 188) {
        if (part_len > 0) {
            Py_ssize_t need = 188 - part_len;
            memcpy(pkt, partial.buf, part_len);
            memcpy(pkt + part_len, d + pos, need);
            pos += need;
            part_len = 0;
        } else {
            memcpy(pkt, d + pos, 188);
            pos += 188;
        }
        int ok = crc8_of(pkt, 188) == 0;
        o[produced] = 0x47;
        memcpy(o + produced + 1, pkt, 187);
        if (!ok) {
            o[produced + 1] |= 0x80; /* Transport Error Indicator */
            n_errors++;
        }
        produced += 188;
    }

    Py_ssize_t rem = dlen - pos;
    PyObject* new_partial;
    if (part_len > 0) {
        /* datafield exhausted while completing the old partial: keep the
         * combination for the next call */
        new_partial = PyBytes_FromStringAndSize(NULL, part_len + rem);
        if (new_partial) {
            memcpy(PyBytes_AS_STRING(new_partial), partial.buf, part_len);
            memcpy(PyBytes_AS_STRING(new_partial) + part_len, d + pos, rem);
        }
    } else {
        new_partial = PyBytes_FromStringAndSize((const char*)(d + pos), rem);
    }
    PyBuffer_Release(&df);
    PyBuffer_Release(&partial);
    if (!new_partial) {
        Py_DECREF(out);
        return NULL;
    }
    if (_PyBytes_Resize(&out, produced) < 0) {
        Py_DECREF(new_partial);
        return NULL;
    }
    return Py_BuildValue("NNl", out, new_partial, n_errors);
}

/* ts_stitch_flagged(datafield, partial, synched, syncd_bytes, ok_map,
 *                   base_idx):
 *   Same stitch loop as ts_stitch, but per-packet validity comes from the
 *   device-precomputed packed CRC map (ops/crc8_dev.packet_validity:
 *   LSB-first bit per FRAME byte position; bit i == "the 188-byte window
 *   ending at frame byte i checks out"). base_idx is the datafield's
 *   offset inside the frame (the BBHEADER length). Only the one
 *   cross-frame packet per call (whose CRC window spans two frames)
 *   computes a CRC on the host. Bit-identical to ts_stitch.
 */
static PyObject* py_ts_stitch_flagged(PyObject* self, PyObject* args)
{
    Py_buffer df, partial, okmap;
    int synched, syncd_bytes;
    Py_ssize_t base_idx;
    if (!PyArg_ParseTuple(args, "y*y*piy*n", &df, &partial, &synched,
                          &syncd_bytes, &okmap, &base_idx)) {
        return NULL;
    }

    const uint8_t* d = (const uint8_t*)df.buf;
    const uint8_t* okm = (const uint8_t*)okmap.buf;
    Py_ssize_t ok_bits = okmap.len * 8;
    Py_ssize_t dlen = df.len;
    Py_ssize_t pos = 0;
    Py_ssize_t part_len = partial.len;
    uint8_t pkt[188];

    if (!synched) {
        pos = syncd_bytes + 1;
        part_len = 0;
        if (pos > dlen)
            pos = dlen;
    }

    Py_ssize_t max_pkts = (dlen - pos + part_len) / 188 + 1;
    PyObject* out = PyBytes_FromStringAndSize(NULL, max_pkts * 188);
    if (!out) {
        PyBuffer_Release(&df);
        PyBuffer_Release(&partial);
        PyBuffer_Release(&okmap);
        return NULL;
    }
    uint8_t* o = (uint8_t*)PyBytes_AS_STRING(out);
    Py_ssize_t produced = 0;
    long n_errors = 0;

    while (dlen - pos + part_len >= 188) {
        int ok;
        if (part_len > 0) {
            Py_ssize_t need = 188 - part_len;
            memcpy(pkt, partial.buf, part_len);
            memcpy(pkt + part_len, d + pos, need);
            pos += need;
            part_len = 0;
            ok = crc8_of(pkt, 188) == 0;
            o[produced] = 0x47;
            memcpy(o + produced + 1, pkt, 187);
        } else {
            Py_ssize_t idx = base_idx + pos + 187;
            ok = (idx < ok_bits) ? ((okm[idx >> 3] >> (idx & 7)) & 1) : 0;
            o[produced] = 0x47;
            memcpy(o + produced + 1, d + pos, 187);
            pos += 188;
        }
        if (!ok) {
            o[produced + 1] |= 0x80; /* Transport Error Indicator */
            n_errors++;
        }
        produced += 188;
    }

    Py_ssize_t rem = dlen - pos;
    PyObject* new_partial;
    if (part_len > 0) {
        new_partial = PyBytes_FromStringAndSize(NULL, part_len + rem);
        if (new_partial) {
            memcpy(PyBytes_AS_STRING(new_partial), partial.buf, part_len);
            memcpy(PyBytes_AS_STRING(new_partial) + part_len, d + pos, rem);
        }
    } else {
        new_partial = PyBytes_FromStringAndSize((const char*)(d + pos), rem);
    }
    PyBuffer_Release(&df);
    PyBuffer_Release(&partial);
    PyBuffer_Release(&okmap);
    if (!new_partial) {
        Py_DECREF(out);
        return NULL;
    }
    if (_PyBytes_Resize(&out, produced) < 0) {
        Py_DECREF(new_partial);
        return NULL;
    }
    return Py_BuildValue("NNl", out, new_partial, n_errors);
}

/* ts_stitch_flagged_batch(frames, C, F, nb, ok_maps, ok_nb, hdr_ok,
 *                         base_idx, partial, partial_len, synched, stats):
 *   One call stitches a whole receiver step: C channels x F frames
 *   (frame-major, channel outer), each frame nb descrambled bytes with a
 *   device-precomputed packed validity map (ok_nb bytes per frame) and a
 *   BBHEADER-validity flag. BBHEADER field parsing/validation (DFL/SYNCD/
 *   UPL), gap detection, SYNCD resync, partial-packet carry, 0x47
 *   restoration and TEI marking all run here — the per-frame Python
 *   parser glue was the dominant cost of the per-push API (the reference
 *   runs this loop in C++ too, lib/bbdeheader_bb_impl.cc:144-261).
 *
 *   State arrays are writable buffers mutated in place:
 *     partial     (C, 188) u8   partial-packet carry bytes
 *     partial_len (C,)     i32
 *     synched     (C,)     u8
 *     stats       (C, 5)   i64  [packets, errors, gaps, drops, bbframes]
 *   Returns (ts_bytes, sizes): one buffer with each channel's TS bytes
 *   contiguous in channel order and a (C,) i64 byte-size array.
 */
static PyObject* py_ts_stitch_flagged_batch(PyObject* self, PyObject* args)
{
    Py_buffer frames, okmaps, hdrok, partial, plen, synched, stats;
    Py_ssize_t C, F, nb, ok_nb, base_idx;
    if (!PyArg_ParseTuple(args, "y*nnny*ny*nw*w*w*w*", &frames, &C, &F, &nb,
                          &okmaps, &ok_nb, &hdrok, &base_idx, &partial,
                          &plen, &synched, &stats)) {
        return NULL;
    }
    if (frames.len < C * F * nb || okmaps.len < C * F * ok_nb ||
        hdrok.len < C * F || partial.len < C * 188 ||
        plen.len < (Py_ssize_t)(C * sizeof(int32_t)) ||
        synched.len < C ||
        stats.len < (Py_ssize_t)(C * 5 * sizeof(int64_t))) {
        PyErr_SetString(PyExc_ValueError, "buffer too small");
        goto fail;
    }

    {
    const uint8_t* frs = (const uint8_t*)frames.buf;
    const uint8_t* oks = (const uint8_t*)okmaps.buf;
    const uint8_t* hok = (const uint8_t*)hdrok.buf;
    uint8_t* part = (uint8_t*)partial.buf;
    int32_t* pl = (int32_t*)plen.buf;
    uint8_t* sy = (uint8_t*)synched.buf;
    int64_t* st = (int64_t*)stats.buf;
    Py_ssize_t max_dfl = nb * 8 - 80;

    PyObject* out = PyBytes_FromStringAndSize(NULL, C * F * nb + C * 188);
    PyObject* sizes = PyBytes_FromStringAndSize(NULL, C * sizeof(int64_t));
    if (!out || !sizes) {
        Py_XDECREF(out);
        Py_XDECREF(sizes);
        goto fail;
    }
    uint8_t* o = (uint8_t*)PyBytes_AS_STRING(out);
    int64_t* sz = (int64_t*)PyBytes_AS_STRING(sizes);
    Py_ssize_t produced_total = 0;
    uint8_t pkt[188];

    for (Py_ssize_t c = 0; c < C; c++) {
        Py_ssize_t produced0 = produced_total;
        for (Py_ssize_t f = 0; f < F; f++) {
            Py_ssize_t cf = c * F + f;
            const uint8_t* fr = frs + cf * nb;
            st[c * 5 + 4]++; /* bbframe_cnt */
            if (!hok[cf]) {
                sy[c] = 0;
                st[c * 5 + 3]++; /* drop */
                continue;
            }
            long upl = ((long)fr[2] << 8) | fr[3];
            long dfl = ((long)fr[4] << 8) | fr[5];
            long syncd = ((long)fr[7] << 8) | fr[8];
            if (dfl > max_dfl || (dfl & 7) || syncd > dfl || (syncd & 7) ||
                upl != 188 * 8) {
                sy[c] = 0;
                st[c * 5 + 3]++; /* drop */
                continue;
            }
            const uint8_t* d = fr + base_idx;
            const uint8_t* okm = oks + cf * ok_nb;
            Py_ssize_t ok_bits = ok_nb * 8;
            Py_ssize_t dlen = dfl / 8;
            Py_ssize_t pos = 0;
            Py_ssize_t part_len = pl[c];
            if (part_len > 0 && syncd / 8 != 188 - 1 - part_len) {
                sy[c] = 0;
                st[c * 5 + 2]++; /* gap */
            }
            if (!sy[c]) {
                pos = syncd / 8 + 1;
                part_len = 0;
                if (pos > dlen)
                    pos = dlen;
                sy[c] = 1;
            }
            while (dlen - pos + part_len >= 188) {
                int ok;
                if (part_len > 0) {
                    Py_ssize_t need = 188 - part_len;
                    memcpy(pkt, part + c * 188, part_len);
                    memcpy(pkt + part_len, d + pos, need);
                    pos += need;
                    part_len = 0;
                    ok = crc8_of(pkt, 188) == 0;
                    o[produced_total] = 0x47;
                    memcpy(o + produced_total + 1, pkt, 187);
                } else {
                    Py_ssize_t idx = base_idx + pos + 187;
                    ok = (idx < ok_bits)
                             ? ((okm[idx >> 3] >> (idx & 7)) & 1)
                             : 0;
                    o[produced_total] = 0x47;
                    memcpy(o + produced_total + 1, d + pos, 187);
                    pos += 188;
                }
                if (!ok) {
                    o[produced_total + 1] |= 0x80; /* TEI */
                    st[c * 5 + 1]++;               /* error */
                }
                st[c * 5 + 0]++; /* packet */
                produced_total += 188;
            }
            Py_ssize_t rem = dlen - pos;
            if (part_len > 0) {
                /* datafield exhausted completing the old partial */
                memcpy(part + c * 188 + part_len, d + pos, rem);
                pl[c] = (int32_t)(part_len + rem);
            } else {
                memcpy(part + c * 188, d + pos, rem);
                pl[c] = (int32_t)rem;
            }
        }
        sz[c] = produced_total - produced0;
    }

    PyBuffer_Release(&frames);
    PyBuffer_Release(&okmaps);
    PyBuffer_Release(&hdrok);
    PyBuffer_Release(&partial);
    PyBuffer_Release(&plen);
    PyBuffer_Release(&synched);
    PyBuffer_Release(&stats);
    if (_PyBytes_Resize(&out, produced_total) < 0) {
        Py_DECREF(sizes);
        return NULL;
    }
    return Py_BuildValue("NN", out, sizes);
    }

fail:
    PyBuffer_Release(&frames);
    PyBuffer_Release(&okmaps);
    PyBuffer_Release(&hdrok);
    PyBuffer_Release(&partial);
    PyBuffer_Release(&plen);
    PyBuffer_Release(&synched);
    PyBuffer_Release(&stats);
    return NULL;
}

/* ---------------- module ---------------- */

static PyMethodDef methods[] = {
    { "crc8", py_crc8, METH_VARARGS,
      "CRC-8 (poly x^8+x^7+x^6+x^4+x^2+1) of a byte buffer." },
    { "crc8_check_packets", py_crc8_check_packets, METH_VARARGS,
      "Validate N*188-byte [187 data][crc] chunks; returns N flag bytes." },
    { "u8_to_fc32", py_u8_to_fc32, METH_VARARGS,
      "Interleaved u8 IQ -> float32 bytes (offset 127.5, scaled)." },
    { "fc32_to_u8", py_fc32_to_u8, METH_VARARGS,
      "float32 bytes -> interleaved u8 IQ." },
    { "ts_stitch", py_ts_stitch, METH_VARARGS,
      "Datafield -> TS packets with CRC check, resync and partial carry." },
    { "ts_stitch_flagged", py_ts_stitch_flagged, METH_VARARGS,
      "ts_stitch with device-precomputed packet validity (packed map)." },
    { "ts_stitch_flagged_batch", py_ts_stitch_flagged_batch, METH_VARARGS,
      "Whole-step C x F flagged stitch with in-place channel state." },
    { NULL, NULL, 0, NULL }
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "dvbs2rx_native", NULL, -1, methods
};

PyMODINIT_FUNC PyInit_dvbs2rx_native(void)
{
    crc8_init();
    return PyModule_Create(&moduledef);
}
