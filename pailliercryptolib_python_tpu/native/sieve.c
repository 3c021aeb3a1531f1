/* Native keygen helpers: windowed trial-division sieve + limb packing.
 *
 * TPU-native counterpart of the native code paths the reference keeps in
 * C++ (the IPCL crypto core's primality search feeding
 * ipcl::generateKeypair, and the bindings' byte<->limb converters,
 * /root/reference/src/ipcl_python/bindings/ipcl_bindings.cpp:100-138).
 * The device does bulk modexp; the host-side hot loops that remain —
 * sieving prime candidates and packing big integers into limb buffers —
 * live here as a plain CPython C extension (no pybind11 dependency).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* sieve_window(base_le_bytes, count, primes_tuple) -> bytearray mask
 *
 * base must be odd.  Considers the `count` odd candidates
 * base, base+2, base+4, ... base+2*(count-1) and returns mask[i] == 1
 * when candidate i has no divisor among `primes`.
 */
static PyObject *
sieve_window(PyObject *self, PyObject *args)
{
    Py_buffer base;
    Py_ssize_t count;
    PyObject *primes;

    if (!PyArg_ParseTuple(args, "y*nO", &base, &count, &primes))
        return NULL;

    PyObject *mask = PyByteArray_FromStringAndSize(NULL, count);
    if (!mask) {
        PyBuffer_Release(&base);
        return NULL;
    }
    char *m = PyByteArray_AS_STRING(mask);
    memset(m, 1, (size_t)count);

    PyObject *seq = PySequence_Fast(primes, "primes must be a sequence");
    if (!seq) {
        PyBuffer_Release(&base);
        Py_DECREF(mask);
        return NULL;
    }
    Py_ssize_t np = PySequence_Fast_GET_SIZE(seq);
    const uint8_t *b = (const uint8_t *)base.buf;
    Py_ssize_t nb = base.len;

    for (Py_ssize_t k = 0; k < np; k++) {
        long p = PyLong_AsLong(PySequence_Fast_GET_ITEM(seq, k));
        if (p <= 2)
            continue;
        /* r = base mod p, big-endian scan of the little-endian buffer */
        uint64_t r = 0;
        for (Py_ssize_t i = nb - 1; i >= 0; i--)
            r = ((r << 8) | b[i]) % (uint64_t)p;
        /* smallest j >= 0 with (base + 2j) % p == 0:
         * j = (p - r) * inv2 mod p, inv2 = (p+1)/2 */
        uint64_t need = ((uint64_t)p - r) % (uint64_t)p;
        uint64_t inv2 = ((uint64_t)p + 1) / 2;
        uint64_t j = (need * inv2) % (uint64_t)p;
        for (; j < (uint64_t)count; j += (uint64_t)p) {
            /* candidate equal to p itself stays prime */
            if (r == 0 && j == 0 && nb <= 8) {
                uint64_t v = 0;
                for (Py_ssize_t i = nb - 1; i >= 0; i--)
                    v = (v << 8) | b[i];
                if (v == (uint64_t)p)
                    continue;
            }
            m[j] = 0;
        }
    }

    Py_DECREF(seq);
    PyBuffer_Release(&base);
    return mask;
}

/* pack_limbs16(concat_bytes, count, limbs) -> bytes
 *
 * Reinterpret `count` fixed-width little-endian integers (limbs*2 bytes
 * each) as an interleaved (limbs, count) uint32 buffer of 16-bit limbs —
 * the device layout — in one pass. */
static PyObject *
pack_limbs16(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    Py_ssize_t count, limbs;

    if (!PyArg_ParseTuple(args, "y*nn", &buf, &count, &limbs))
        return NULL;
    if (buf.len < count * limbs * 2) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "pack_limbs16: buffer too small");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, count * limbs * 4);
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint32_t *o = (uint32_t *)PyBytes_AS_STRING(out);
    const uint8_t *src = (const uint8_t *)buf.buf;
    for (Py_ssize_t c = 0; c < count; c++) {
        const uint8_t *row = src + c * limbs * 2;
        for (Py_ssize_t l = 0; l < limbs; l++) {
            uint16_t v = (uint16_t)(row[2 * l] | (row[2 * l + 1] << 8));
            o[l * count + c] = v;  /* limbs-major */
        }
    }
    PyBuffer_Release(&buf);
    return out;
}

static PyMethodDef Methods[] = {
    {"sieve_window", sieve_window, METH_VARARGS,
     "Trial-division sieve over a window of odd candidates."},
    {"pack_limbs16", pack_limbs16, METH_VARARGS,
     "Pack fixed-width little-endian ints into limbs-major uint32."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_paillier_native", NULL, -1, Methods,
};

PyMODINIT_FUNC
PyInit__paillier_native(void)
{
    return PyModule_Create(&moduledef);
}
