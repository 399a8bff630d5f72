// Native host-runtime kernels for sqmc_tpu.
//
// The reference implements its host runtime in compiled Fortran
// (read_integrals chemistry.f90:538, setup_alias more_tools.f90:5603);
// these are the C++ equivalents for the host-side paths that feed the
// TPU: streaming FCIDUMP record parsing and Vose alias-table
// construction (single distribution and ragged per-row batches).
// Exposed through ctypes (sqmc_tpu/native/__init__.py) with a pure-numpy
// fallback when no compiler is available.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse whitespace-separated "value p q r s" records from a text buffer.
// Returns the number of records parsed (at most cap); vals[n], idx[4n].
long sqmc_parse_records(const char* buf, long len, double* vals,
                        int32_t* idx, long cap) {
    const char* p = buf;
    const char* end = buf + len;
    long n = 0;
    while (p < end && n < cap) {
        char* next = nullptr;
        // value
        double v = strtod(p, &next);
        if (next == p) {  // no progress: skip one char (junk/extra ws)
            ++p;
            continue;
        }
        p = next;
        bool ok = true;
        int32_t ijkl[4];
        for (int k = 0; k < 4; ++k) {
            long o = strtol(p, &next, 10);
            if (next == p) { ok = false; break; }
            ijkl[k] = (int32_t)o;
            p = next;
        }
        if (!ok) break;  // trailing non-record text
        vals[n] = v;
        memcpy(idx + 4 * n, ijkl, sizeof ijkl);
        ++n;
    }
    return n;
}

// Vose alias tables for one normalized distribution prob[k].
// J[k] alias indices, q[k] acceptance thresholds.
void sqmc_build_alias(const double* prob, long k, int32_t* J, double* q) {
    std::vector<long> small, large;
    small.reserve(k);
    large.reserve(k);
    for (long i = 0; i < k; ++i) {
        q[i] = prob[i] * (double)k;
        J[i] = (int32_t)i;
        if (q[i] < 1.0) small.push_back(i); else large.push_back(i);
    }
    while (!small.empty() && !large.empty()) {
        long s = small.back(); small.pop_back();
        long l = large.back(); large.pop_back();
        J[s] = (int32_t)l;
        q[l] = q[l] - (1.0 - q[s]);
        if (q[l] < 1.0) small.push_back(l); else large.push_back(l);
    }
}

// Ragged per-row alias build over |vals|: for each row r with entries
// vals[starts[r] .. starts[r]+counts[r]), write row-local alias tables
// into J/q at the same flat offsets.  Rows with zero total are left as
// identity (q=1).
void sqmc_build_row_alias(const double* vals, const int64_t* starts,
                          const int64_t* counts, long nrows,
                          int32_t* J, double* q) {
    std::vector<double> prob;
    for (long r = 0; r < nrows; ++r) {
        int64_t s = starts[r];
        int64_t c = counts[r];
        if (c <= 0) continue;
        double tot = 0.0;
        prob.resize(c);
        for (int64_t i = 0; i < c; ++i) {
            prob[i] = vals[s + i] < 0 ? -vals[s + i] : vals[s + i];
            tot += prob[i];
        }
        if (tot <= 0.0) {
            for (int64_t i = 0; i < c; ++i) { J[s + i] = (int32_t)i; q[s + i] = 1.0; }
            continue;
        }
        for (int64_t i = 0; i < c; ++i) prob[i] /= tot;
        sqmc_build_alias(prob.data(), c, J + s, q + s);
    }
}

}  // extern "C"
