// Batched striped-SW-equivalent alignment + banded cigar traceback (host).
//
// Native replacement for the per-alignment Python cigar path
// (kslam_tpu/golden/ssw.py): reproduces the observable behavior of the
// reference's ssw.c/ssw_cpp.cpp as driven by SmithWaterman.h:184-233 --
// forward-pass score with ssw end-position tie-breaks (ssw.c:316-342),
// begin position via the reversed-prefix re-alignment (ssw.c:905-923), and
// the scalar banded DP + traceback with band doubling and the reference's
// direction-preference quirks (ssw.c:594-792), including the merged
// leading-M row-0 rule (ssw.c:754-771) and the overflow abort
// (ssw.c:631-642, 941-944).
//
// Scores use classic Gotoh recurrences in int32; under the pipeline's
// parameter regime (checked by golden/ssw.py:check_params: 2*gap_open >
// match + mismatch) these equal the reference kernel's lazy-F values, and
// the same tie-break rules then pick identical coordinates.  Parity with
// the Python golden model (and transitively with the compiled reference
// ssw.c, see tests/oracle/) is asserted by tests/test_ssw_batch_native.py.
//
// One entry point, OpenMP-parallel over overlaps; exported with C linkage
// for ctypes (kslam_tpu/io/native.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ASCII -> 5-letter SW codes: A0 C1 T2 G3 (case-insensitive), U/u -> A
// mirroring the reference translation-table quirk (ssw_cpp.cpp:18,22),
// everything else -> N=4 (scores 0 against all).
struct SwTable {
    uint8_t t[256];
    SwTable() {
        memset(t, 4, sizeof(t));
        const char* groups[4] = {"AaUu", "Cc", "Tt", "Gg"};
        for (int code = 0; code < 4; ++code)
            for (const char* p = groups[code]; *p; ++p)
                t[(uint8_t)*p] = (uint8_t)code;
    }
};
const SwTable kSw;

inline uint8_t complement5(uint8_t c) { return c < 4 ? (uint8_t)(c ^ 2) : c; }

struct Params {
    int32_t mat[25];  // [q*5 + r]
    int32_t go, ge;
};

struct Ends {
    int32_t score, ref_end, read_end;
};

// Forward pass over query q[0..m) vs ref r[0..n): best local score with the
// ssw tie-breaks (first strictly-improving ref column; smallest query index
// equal to the max within it).  H/E are caller scratch of size >= m.
Ends sw_forward_ends(const uint8_t* q, int m, const uint8_t* r, int n,
                     const Params& p, int32_t* H, int32_t* E) {
    if (m == 0 || n == 0) return {0, -1, 0};
    memset(H, 0, sizeof(int32_t) * m);
    memset(E, 0, sizeof(int32_t) * m);
    const int32_t NEG = INT32_MIN / 4;
    int32_t best = 0;
    int best_col = -1, best_row = 0;
    for (int j = 0; j < n; ++j) {
        const uint8_t rj = r[j];
        int32_t diag = 0;      // H[i-1] of the previous column
        int32_t f = NEG;
        int32_t colmax = 0;
        int colrow = 0;
        for (int i = 0; i < m; ++i) {
            const int32_t hprev = H[i];
            int32_t h = diag + p.mat[q[i] * 5 + rj];
            if (h < 0) h = 0;
            const int32_t e = E[i];
            if (e > h) h = e;
            if (f > h) h = f;
            // E for the next column, clamped at 0 (ssw subs_epu semantics)
            int32_t en = h - p.go;
            const int32_t e2 = e - p.ge;
            if (e2 > en) en = e2;
            if (en < 0) en = 0;
            E[i] = en;
            // F for the next row (from the FINAL h of this row)
            int32_t fn = h - p.go;
            const int32_t f2 = f - p.ge;
            f = f2 > fn ? f2 : fn;
            H[i] = h;
            diag = hprev;
            if (h > colmax) { colmax = h; colrow = i; }
        }
        if (colmax > best) { best = colmax; best_col = j; best_row = colrow; }
    }
    if (best == 0) return {0, -1, 0};  // pvHmax all-zero path (ssw.c:333-342)
    return {best, best_col, best_row};
}

// Banded DP + traceback over the [begin..end] sub-sequences, emulating
// ssw.c:594-792 exactly (same direction preferences, same row-0 quirk).
// Emits (len<<4 | op) runs, op 0=M 1=I 2=D, forward order, into out
// (capacity max_ops).  Returns the op count, or -1 on the reference's
// overflow-abort path.
int banded_cigar(const uint8_t* rd, int read_len, const uint8_t* rf,
                 int ref_len, int32_t score, const Params& p, int band_width,
                 std::vector<int32_t>& hb, std::vector<int32_t>& eb,
                 std::vector<int32_t>& hc, std::vector<int8_t>& dir,
                 uint32_t* out, int max_ops) {
    int w;
    for (;;) {
        w = band_width;
        const int64_t width = (int64_t)w * 2 + 3;
        const int64_t width_d = (int64_t)w * 2 + 1;
        if (width_d * read_len * 3 >= (int64_t)1 << 31) return -1;
        const size_t hsz = (size_t)(width + 2 > 8 ? width + 2 : 8);
        hb.assign(hsz, 0);
        eb.assign(hsz, 0);
        hc.assign(hsz, 0);
        dir.assign((size_t)read_len * width_d * 3, 0);
        int32_t max_score = 0;
        int64_t u = 0;
        for (int i = 0; i < read_len; ++i) {
            const int beg = i - w > 0 ? i - w : 0;
            const int end = i + w < ref_len - 1 ? i + w : ref_len - 1;
            int64_t edge = end + 1 < width - 1 ? end + 1 : width - 1;
            int32_t f = 0;
            hb[0] = eb[0] = hb[edge] = eb[edge] = hc[0] = 0;
            int8_t* dline = &dir[(size_t)i * width_d * 3];
            const int x_i = i - w > 0 ? i - w : 0;
            const int x_im1 = i - 1 - w > 0 ? i - 1 - w : 0;
            for (int j = beg; j <= end; ++j) {
                u = j - x_i + 1;
                const int64_t e_idx = j - x_im1 + 1;
                const int64_t b = j - 1 - x_i + 1;
                const int64_t d = j - 1 - x_im1 + 1;
                const int64_t dbase = (int64_t)(j - x_i) * 3;
                int32_t t1 = i == 0 ? -p.go : hb[e_idx] - p.go;
                int32_t t2 = i == 0 ? -p.ge : eb[e_idx] - p.ge;
                const int32_t e_new = t1 > t2 ? t1 : t2;
                dline[dbase + 0] = t1 > t2 ? 3 : 2;
                t1 = hc[b] - p.go;
                t2 = f - p.ge;
                f = t1 > t2 ? t1 : t2;
                dline[dbase + 1] = t1 > t2 ? 5 : 4;
                const int32_t e1 = e_new > 0 ? e_new : 0;
                const int32_t f1 = f > 0 ? f : 0;
                t1 = e1 > f1 ? e1 : f1;
                t2 = hb[d] + p.mat[rd[i] * 5 + rf[j]];
                eb[u] = e_new;
                hc[u] = t1 > t2 ? t1 : t2;
                if (hc[u] > max_score) max_score = hc[u];
                if (t1 <= t2)
                    dline[dbase + 2] = 1;
                else
                    dline[dbase + 2] = e1 > f1 ? dline[dbase + 0]
                                               : dline[dbase + 1];
            }
            for (int64_t k = 1; k <= u; ++k) hb[k] = hc[k];
        }
        if (max_score >= score) break;
        band_width *= 2;
    }
    // traceback (ssw.c:697-785); runs appended in reverse order
    const int64_t width_d = (int64_t)band_width * 2 + 1;
    int n_runs = 0;
    uint32_t runs_rev[4096];  // read_len <= 1365 guarantees <= m+n runs fit
    int i = read_len - 1, j = ref_len - 1;
    int32_t e = 0;
    int f = 0, run_op = 0, temp2 = 2, row = read_len - 1;
    while (i > 0) {
        const int x = i - band_width > 0 ? i - band_width : 0;
        const int8_t d =
            dir[(size_t)row * width_d * 3 + (int64_t)(j - x) * 3 + temp2];
        switch (d) {
            case 1: --i; --j; temp2 = 2; --row; f = 0; break;
            case 2: --i; temp2 = 0; --row; f = 1; break;
            case 3: --i; temp2 = 2; --row; f = 1; break;
            case 4: --j; temp2 = 1; f = 2; break;
            case 5: --j; temp2 = 2; f = 2; break;
            default: return -1;  // "trace back error"
        }
        if (f == run_op) {
            ++e;
        } else {
            if (n_runs >= 4094) return -1;
            runs_rev[n_runs++] = ((uint32_t)e << 4) | (uint32_t)run_op;
            run_op = f;
            e = 1;
        }
    }
    if (f == 0) {
        runs_rev[n_runs++] = ((uint32_t)(e + 1) << 4);  // merged leading M
    } else {
        runs_rev[n_runs++] = ((uint32_t)e << 4) | (uint32_t)f;
        runs_rev[n_runs++] = (1u << 4);
    }
    if (n_runs > max_ops) return -1;
    for (int k = 0; k < n_runs; ++k) out[k] = runs_rev[n_runs - 1 - k];
    return n_runs;
}

struct Workspace {
    std::vector<int32_t> H, E, hb, eb, hc;
    std::vector<int8_t> dir;
    std::vector<uint8_t> query, window, qr, rr;
};

}  // namespace

extern "C" {

// Aligns one batch of seeded overlaps exactly as the reference's
// performSmithWatermanOnRange2 (SmithWaterman.h:184-233) + Aligner::Align
// would: slice the ref window at max(rel_pos,0) of query length (clamped at
// the entry end like substr), reverse-complement the *window* for RC hits,
// align, un-flip coordinates to forward-ref space and reverse the cigar.
//
//   reads        [n_reads, stride] row-major ASCII (padded)
//   read_len     [n_reads]
//   genome       concatenated ASCII of all entries
//   entry_off    [n_entries+1] int64 offsets into genome
//   read_id/entry_id/rel_pos/rc   [n_ov] overlap columns
//   score/ref_begin/ref_end/query_begin/query_end  [n_ov] outputs
//   cigar_buf    [n_ov, max_ops] packed (len<<4|op) runs, op 0=M 1=I 2=D
//   cigar_len    [n_ov]: ops written; -1 = overflow abort (score zeroed,
//                ssw.c:941-944); -2 = cigar not requested/score-filtered
//
// report_cigar=0 skips the banded pass entirely (score/ends only).
void kslam_ssw_cigar_batch(
    const uint8_t* reads, const int32_t* read_len, int64_t stride,
    const uint8_t* genome, const int64_t* entry_off,
    const int32_t* read_id, const int32_t* entry_id, const int32_t* rel_pos,
    const uint8_t* rc, int64_t n_ov,
    int32_t match, int32_t mismatch, int32_t gap_open, int32_t gap_extend,
    int32_t score_filter, int32_t report_cigar,
    int32_t* score, int32_t* ref_begin, int32_t* ref_end,
    int32_t* query_begin, int32_t* query_end,
    uint32_t* cigar_buf, int32_t* cigar_len, int32_t max_ops) {
    Params p;
    p.go = gap_open;
    p.ge = gap_extend;
    for (int a = 0; a < 5; ++a)
        for (int b = 0; b < 5; ++b)
            p.mat[a * 5 + b] =
                (a == 4 || b == 4) ? 0 : (a == b ? match : -mismatch);

#pragma omp parallel
    {
        Workspace ws;
#pragma omp for schedule(dynamic, 32)
        for (int64_t k = 0; k < n_ov; ++k) {
            const int32_t rid = read_id[k];
            const int32_t eid = entry_id[k];
            const int qlen = read_len[rid];
            const int64_t ebeg = entry_off[eid];
            const int64_t elen = entry_off[eid + 1] - ebeg;
            const int64_t ref_start =
                rel_pos[k] > 0 ? (int64_t)rel_pos[k] : 0;
            int64_t wlen = elen - ref_start;
            if (wlen < 0) wlen = 0;
            if (wlen > qlen) wlen = qlen;
            ws.query.resize(qlen);
            ws.window.resize(wlen);
            const uint8_t* rrow = reads + (int64_t)rid * stride;
            for (int i = 0; i < qlen; ++i) ws.query[i] = kSw.t[rrow[i]];
            const uint8_t* gwin = genome + ebeg + ref_start;
            if (rc[k]) {
                for (int64_t i = 0; i < wlen; ++i)
                    ws.window[i] = complement5(kSw.t[gwin[wlen - 1 - i]]);
            } else {
                for (int64_t i = 0; i < wlen; ++i)
                    ws.window[i] = kSw.t[gwin[i]];
            }
            const int n = (int)wlen, m = qlen;
            ws.H.resize(m > 1 ? m : 1);
            ws.E.resize(m > 1 ? m : 1);
            int32_t sc = 0, rb = 0, re = 0, qb = 0, qe = 0;
            int clen = -2;
            if (m > 0) {
                const Ends fwd = sw_forward_ends(
                    ws.query.data(), m, ws.window.data(), n, p,
                    ws.H.data(), ws.E.data());
                sc = fwd.score;
                re = fwd.ref_end;
                qe = fwd.read_end;
                // reverse pass: reversed read prefix vs reversed ref prefix
                int re2 = 0, rd2 = 0;
                if (re >= 0) {
                    ws.qr.resize(qe + 1);
                    ws.rr.resize(re + 1);
                    for (int i = 0; i <= qe; ++i)
                        ws.qr[i] = ws.query[qe - i];
                    for (int i = 0; i <= re; ++i)
                        ws.rr[i] = ws.window[re - i];
                    const Ends rev = sw_forward_ends(
                        ws.qr.data(), qe + 1, ws.rr.data(), re + 1, p,
                        ws.H.data(), ws.E.data());
                    if (rev.ref_end >= 0) { re2 = rev.ref_end; rd2 = rev.read_end; }
                }
                rb = re - re2;
                qb = qe - rd2;
                if (report_cigar && !(score_filter && sc < score_filter)) {
                    const int read_sub = qe - qb + 1;
                    const int ref_sub = re - rb + 1;
                    int band = ref_sub - read_sub;
                    if (band < 0) band = -band;
                    band += 1;
                    uint32_t* out = cigar_buf + k * (int64_t)max_ops;
                    // banded DP over the window-space sub-sequences;
                    // guard ref slice bounds like the Python slice does
                    const int rb_c = rb < 0 ? 0 : rb;
                    const int ref_n = re - rb_c + 1 > 0 ? re - rb_c + 1 : 0;
                    clen = banded_cigar(
                        ws.query.data() + qb, read_sub,
                        ws.window.data() + rb_c, ref_n, sc, p, band,
                        ws.hb, ws.eb, ws.hc, ws.dir, out, max_ops);
                    if (clen < 0) {
                        clen = -1;
                        sc = 0;  // ssw.c:941-944
                    } else if (rc[k]) {
                        for (int a = 0, b2 = clen - 1; a < b2; ++a, --b2) {
                            const uint32_t t = out[a];
                            out[a] = out[b2];
                            out[b2] = t;
                        }
                    }
                }
            }
            if (rc[k]) {
                const int64_t rl = wlen;
                const int32_t rb2 = (int32_t)(rl - (re + 1));
                const int32_t re_2 = (int32_t)(rl - (rb + 1));
                rb = rb2;
                re = re_2;
                const int32_t qb2 = (int32_t)(qlen - (qe + 1));
                const int32_t qe2 = (int32_t)(qlen - (qb + 1));
                qb = qb2;
                qe = qe2;
            }
            score[k] = sc;
            ref_begin[k] = rb + (int32_t)ref_start;
            ref_end[k] = re + (int32_t)ref_start;
            query_begin[k] = qb;
            query_end[k] = qe;
            cigar_len[k] = clen;
        }
    }
}

}  // extern "C"
