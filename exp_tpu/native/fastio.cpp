// Native IO kernels for exp_tpu (the counterpart of the reference's C++
// particle readers, exputil/ParticleReader.cc / Component body readers).
//
// Exposed through ctypes (see exp_tpu/native/__init__.py).  The hot
// function parses whitespace-separated numeric tables (the ascii body-file
// format) at strtod speed — ~20x faster than numpy.loadtxt, which matters
// when bootstrapping 10M-particle runs from text ICs.
//
// Build:  g++ -O3 -march=native -shared -fPIC fastio.cpp -o libfastio.so

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <cstdint>

extern "C" {

// Parse up to max_rows rows of ncols doubles from the buffer `data`
// (NUL-terminated) starting at byte offset `start`.  Rows shorter than
// ncols stop the parse.  Returns the number of complete rows written to
// `out` (row-major max_rows x ncols).
long parse_table(const char* data, long start, double* out,
                 long max_rows, int ncols)
{
    const char* p = data + start;
    long rows = 0;
    while (rows < max_rows) {
        int c = 0;
        const char* line_start = p;
        for (; c < ncols; ++c) {
            char* end = nullptr;
            // skip whitespace but stop at end of buffer
            while (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')
                ++p;
            if (*p == '\0')
                return rows;
            double v = strtod(p, &end);
            if (end == p) {       // comment or garbage: skip the line
                while (*p && *p != '\n') ++p;
                break;
            }
            out[rows * ncols + c] = v;
            p = end;
        }
        if (c == ncols) {
            ++rows;
            // consume the remainder of the line (extra attributes)
            while (*p && *p != '\n') ++p;
        } else if (p == line_start) {
            return rows;          // no progress: bail out
        }
    }
    return rows;
}

// Count numeric columns in the first data row after `start`.
int count_columns(const char* data, long start)
{
    const char* p = data + start;
    while (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n') ++p;
    int n = 0;
    while (*p && *p != '\n') {
        char* end = nullptr;
        strtod(p, &end);
        if (end == p) break;
        ++n;
        p = end;
        while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
    }
    return n;
}

// Fast binary block copy with stride conversion: extract column `col` of a
// packed record array (record_size bytes, offset bytes to the field) as
// doubles -- used for PSP record unpacking of huge files.
void extract_field_f64(const char* data, long nrec, long record_size,
                       long offset, double* out)
{
    for (long i = 0; i < nrec; ++i) {
        double v;
        memcpy(&v, data + i * record_size + offset, sizeof(double));
        out[i] = v;
    }
}

void extract_field_f32(const char* data, long nrec, long record_size,
                       long offset, double* out)
{
    for (long i = 0; i < nrec; ++i) {
        float v;
        memcpy(&v, data + i * record_size + offset, sizeof(float));
        out[i] = (double)v;
    }
}

}  // extern "C"
