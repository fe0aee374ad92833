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

#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

// Parse one double; advances *p past the token. Fast path for plain
// fixed-point; falls back to strtod for exponents/specials.
//
// The mantissa is accumulated in a uint64_t (1-cycle dependent adds)
// rather than a double (the previous value*10.0+d chain serialized on
// ~8-cycle FP mul-add latency per digit and capped the parser at
// ~140 MB/s on one core); digits <= 15 keeps it < 2^53, so the final
// int->double conversion plus one division by an exact power of ten is
// still a single correctly-rounded operation, identical to strtod.
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
    uint64_t mant = 0;
    int digits = 0;
    bool any = false;
    while (p < end && static_cast<unsigned>(*p - '0') < 10u) {
        mant = mant * 10 + static_cast<unsigned>(*p - '0');
        ++p;
        ++digits;
        any = true;
    }
    int frac_digits = 0;
    if (p < end && *p == '.') {
        ++p;
        while (p < end && static_cast<unsigned>(*p - '0') < 10u) {
            mant = mant * 10 + static_cast<unsigned>(*p - '0');
            ++frac_digits;
            ++digits;
            ++p;
            any = true;
        }
    }
    // Fast path is exact only while the digit string fits in 2^53 and the
    // divisor 10^frac is an exact double (<= 1e15): then mant/10^frac is
    // a single correctly-rounded division of two exact doubles, i.e.
    // identical to strtod. Exponents/specials/long tokens -> strtod.
    if (!any || (p < end && (*p == 'e' || *p == 'E')) || digits > 15 ||
        frac_digits > 15) {
        // strtod needs a NUL-terminated string and would otherwise scan
        // past `end` (the buffer may be a borrowed ndarray view with no
        // trailing NUL — only Python bytes guarantee one). Copy the token
        // into a bounded stack buffer. 63 chars is far beyond any real
        // numeric token; a longer one parses its first 63 chars.
        char buf[64];
        size_t avail = static_cast<size_t>(end - start);
        size_t len = avail < 63 ? avail : 63;
        memcpy(buf, start, len);
        buf[len] = '\0';
        char* q;
        double value = strtod(buf, &q);
        p = start + (q - buf);
        return value;
    }
    static const double pow10[] = {
        1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11,
        1e12, 1e13, 1e14, 1e15,
    };
    double value = static_cast<double>(mant) / pow10[frac_digits];
    return neg ? -value : value;
}

// ---- SIMD tokenizer -------------------------------------------------------
//
// Numeric table bytes are all > 0x20 ('+' '-' '.' '0'-'9' 'e' 'E'); the
// only separators are ' ' '\t' '\n' '\r', all <= 0x20. One unsigned
// byte-compare against 0x20 therefore classifies a whole 32-byte lane as
// whitespace/token, and token STARTS are the ws->non-ws transitions:
// starts = nonws & ((ws << 1) | carry). Walking the set bits with ctz
// replaces the per-byte scalar skip loop (the cost that dominated the
// column-masked parse once digit conversion went integer).

// 32-bit whitespace mask for 32 bytes at p (bit i set <=> p[i] <= 0x20).
inline uint32_t ws_mask32(const char* p) {
#if defined(__AVX2__)
    __m256i v = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(p));
    __m256i sp = _mm256_set1_epi8(0x20);
    // v <= 0x20 (unsigned)  <=>  max(v, 0x20) == 0x20
    __m256i le = _mm256_cmpeq_epi8(_mm256_max_epu8(v, sp), sp);
    return static_cast<uint32_t>(_mm256_movemask_epi8(le));
#else
    uint32_t m = 0;
    for (int i = 0; i < 32; ++i)
        m |= static_cast<uint32_t>(static_cast<unsigned char>(p[i]) <= 0x20)
             << i;
    return m;
#endif
}

// Append the offsets of every token start in text[0:len] to starts;
// returns the number of tokens found. starts must have room for
// len/2 + 1 entries (tokens are separated by at least one ws byte).
// int32 offsets: bodies are one dump frame (a few MB), far below 2 GB.
inline int64_t find_token_starts(const char* text, int64_t len,
                                 int32_t* starts) {
    int64_t n = 0;
    int64_t i = 0;
    // carry = "previous byte was whitespace" (start of buffer counts)
    uint32_t carry = 1;
    for (; i + 32 <= len; i += 32) {
        uint32_t ws = ws_mask32(text + i);
        uint32_t nonws = ~ws;
        uint32_t st = nonws & ((ws << 1) | carry);
        carry = ws >> 31;
        while (st) {
            starts[n++] = static_cast<int32_t>(i) + __builtin_ctz(st);
            st &= st - 1;
        }
    }
    bool prev_ws = carry != 0;
    for (; i < len; ++i) {
        bool w = static_cast<unsigned char>(text[i]) <= 0x20;
        if (!w && prev_ws) starts[n++] = static_cast<int32_t>(i);
        prev_ws = w;
    }
    return n;
}

// Reusable per-thread token-offset buffer: a fresh multi-MB malloc per
// frame costs more in page faults than the tokenizer itself; this grows
// geometrically and is reused across frames (never shrunk).
inline int32_t* starts_buffer(int64_t need) {
    static thread_local int32_t* buf = nullptr;
    static thread_local int64_t cap = 0;
    if (need > cap) {
        int64_t newcap = cap ? cap : (int64_t)1 << 20;
        while (newcap < need) newcap *= 2;
        int32_t* nb = static_cast<int32_t*>(
            realloc(buf, sizeof(int32_t) * static_cast<size_t>(newcap)));
        if (!nb) return nullptr;
        buf = nb;
        cap = newcap;
    }
    return buf;
}

}  // namespace

extern "C" {

// Parse up to max_rows * ncols doubles from text[0:len] into out
// (row-major). Returns the number of complete rows parsed, or -1 if a
// row had a malformed token count.
int64_t mdpt_parse_table(const char* text, int64_t len, int64_t ncols,
                         double* out, int64_t max_rows) {
    const char* end = text + len;
    int32_t* starts = starts_buffer(len / 2 + 1);
    if (!starts) return -1;
    int64_t n_tok = find_token_starts(text, len, starts);
    int64_t rows = n_tok / ncols;
    if (rows * ncols != n_tok) return -1;  // ragged tail -> malformed
    if (rows > max_rows) rows = max_rows;
    for (int64_t t = 0; t < rows * ncols; ++t) {
        const char* p = text + starts[t];
        out[t] = parse_token(p, end);
    }
    return rows;
}

// Column-masked variant: rows still have `ncols` tokens, but only the
// columns with keep_mask[c] != 0 are converted (n_keep of them, in file
// order) into out (row-major, n_keep doubles per row); the rest are
// never touched at all — the SIMD tokenizer finds every token start, and
// conversion jumps straight to the kept columns' offsets. A trajectory
// reader that needs 5 of 19 dump columns skips ~3/4 of the work.
int64_t mdpt_parse_table_cols(const char* text, int64_t len, int64_t ncols,
                              const uint8_t* keep_mask, int64_t n_keep,
                              double* out, int64_t max_rows) {
    const char* end = text + len;
    int64_t keep_cols[64];
    int64_t nk = 0;
    for (int64_t c = 0; c < ncols; ++c)
        if (keep_mask[c]) {
            if (nk == 64) return -1;  // caller falls back
            keep_cols[nk++] = c;
        }
    if (nk != n_keep) return -1;
    int32_t* starts = starts_buffer(len / 2 + 1);
    if (!starts) return -1;
    int64_t n_tok = find_token_starts(text, len, starts);
    int64_t rows = n_tok / ncols;
    if (rows * ncols != n_tok) return -1;
    if (rows > max_rows) rows = max_rows;
    for (int64_t row = 0; row < rows; ++row) {
        const int32_t* rstarts = starts + row * ncols;
        double* orow = out + row * n_keep;
        for (int64_t k = 0; k < n_keep; ++k) {
            const char* p = text + rstarts[keep_cols[k]];
            orow[k] = parse_token(p, end);
        }
    }
    return rows;
}

// Exactness check helper: round-trips are verified in the test suite
// against Python float() on the same tokens.
double mdpt_parse_one(const char* text, int64_t len) {
    const char* p = text;
    return parse_token(p, text + len);
}

}  // extern "C"
