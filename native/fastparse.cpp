// Fast whitespace-separated float table parser for LAMMPS dump bodies.
//
// The reference delegates dump parsing to pymatgen's pandas-based reader;
// this native path parses the ATOMS body of a dump frame (~1.4 MB per
// 10k-atom frame, 100+ frames per trajectory) at memory bandwidth rather
// than CSV-engine speed. Exposed through ctypes (no pybind11 in this
// image) via mdproptools_tpu/io/_native.py with a pure-Python fallback.
//
// Format contract (LAMMPS dump ATOMS section): rows of exactly `ncols`
// space-separated numeric tokens, '\n' separated, possibly trailing
// whitespace. Numbers are standard C locale: [-+]?digits[.digits][eE...].

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

// Parse one double; advances *p past the token. Fast path for plain
// fixed-point; falls back to strtod for exponents/specials.
inline double parse_token(const char*& p, const char* end) {
    // skip whitespace
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
        ++p;
    const char* start = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = (*p == '-');
        ++p;
    }
    double value = 0.0;
    int digits = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
        value = value * 10.0 + (*p - '0');
        ++p;
        ++digits;
        any = true;
    }
    int frac_digits = 0;
    if (p < end && *p == '.') {
        ++p;
        while (p < end && *p >= '0' && *p <= '9') {
            value = value * 10.0 + (*p - '0');
            ++frac_digits;
            ++digits;
            ++p;
            any = true;
        }
    }
    // Fast path is exact only while the digit string fits in 2^53 and the
    // divisor 10^frac is an exact double (<= 1e15): then value/10^frac is
    // a single correctly-rounded division of two exact doubles, i.e.
    // identical to strtod. Exponents/specials/long tokens -> strtod.
    if (!any || (p < end && (*p == 'e' || *p == 'E')) || digits > 15 ||
        frac_digits > 15) {
        char* q;
        value = strtod(start, &q);
        p = q;
        return value;
    }
    static const double pow10[] = {
        1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11,
        1e12, 1e13, 1e14, 1e15,
    };
    value /= pow10[frac_digits];
    return neg ? -value : value;
}

inline bool is_ws(char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

// Advance past one token without converting it (skipped columns cost a
// byte scan instead of digit accumulation / strtod).
inline void skip_token(const char*& p, const char* end) {
    while (p < end && is_ws(*p)) ++p;
    while (p < end && !is_ws(*p)) ++p;
}

}  // namespace

extern "C" {

// Parse up to max_rows * ncols doubles from text[0:len] into out
// (row-major). Returns the number of complete rows parsed, or -1 if a
// row had a malformed token count.
int64_t mdpt_parse_table(const char* text, int64_t len, int64_t ncols,
                         double* out, int64_t max_rows) {
    const char* p = text;
    const char* end = text + len;
    int64_t row = 0;
    while (row < max_rows) {
        // skip leading whitespace / blank lines
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r'))
            ++p;
        if (p >= end) break;
        for (int64_t c = 0; c < ncols; ++c) {
            if (p >= end) return -1;
            out[row * ncols + c] = parse_token(p, end);
        }
        ++row;
    }
    return row;
}

// Column-masked variant: rows still have `ncols` tokens, but only the
// columns with keep_mask[c] != 0 are converted (n_keep of them, in file
// order) into out (row-major, n_keep doubles per row); the rest are
// byte-scanned past. A trajectory reader that needs 5 of 19 dump
// columns skips ~3/4 of the numeric conversion work.
int64_t mdpt_parse_table_cols(const char* text, int64_t len, int64_t ncols,
                              const uint8_t* keep_mask, int64_t n_keep,
                              double* out, int64_t max_rows) {
    const char* p = text;
    const char* end = text + len;
    int64_t row = 0;
    while (row < max_rows) {
        while (p < end && is_ws(*p)) ++p;
        if (p >= end) break;
        double* orow = out + row * n_keep;
        int64_t k = 0;
        for (int64_t c = 0; c < ncols; ++c) {
            if (p >= end) return -1;
            if (keep_mask[c]) {
                orow[k++] = parse_token(p, end);
            } else {
                skip_token(p, end);
            }
        }
        ++row;
    }
    return row;
}

// Exactness check helper: round-trips are verified in the test suite
// against Python float() on the same tokens.
double mdpt_parse_one(const char* text, int64_t len) {
    const char* p = text;
    return parse_token(p, text + len);
}

}  // extern "C"
