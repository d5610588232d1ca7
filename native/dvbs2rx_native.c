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
