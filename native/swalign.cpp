// Native striped-Smith-Waterman-equivalent aligner (C API via ctypes).
//
// Scalar re-implementation of the lane-exact algorithm in
// hashreadmapper_tpu/align/sw.py (which is golden-verified against the
// reference's vendored SSW, see tests/golden/ssw_golden.txt): byte pass
// (16 uint8 lanes, bias arithmetic, saturation) with word fallback
// (8 uint16 lanes) on saturation, striped maxColumn semantics, reverse pass
// for begin positions, banded traceback with the reference's direction tie
// rules, and the M -> =/X rewrite with soft clips.
//
// This is NOT a copy of the reference's ssw.c: it simulates the observable
// lane semantics scalar-wise (the striped layout is emulated with index
// arithmetic), the way the Python oracle does.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct PassResult {
    int best = 0;
    int end_ref = 0;
    int end_read = 0;
    std::vector<int> max_column;
};

// score matrix: 5x5, codes 0..4 (A C G T N)
static int score_mat(int a, int b, int match_s, int mismatch_s) {
    if (a < 4 && a == b) return match_s;
    return -mismatch_s;
}

static int8_t translate_char(char c) {
    switch (c) {
        case 'A': case 'a': case 'U': case 'u': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return 4;
    }
}

// Exact scalar simulation of the striped pass (byte_mode: 16 lanes with
// bias/saturation; else 8 uint16 lanes).  Mirrors sw.py::_striped_pass.
static PassResult striped_pass(const std::vector<int8_t>& read,
                               const std::vector<int8_t>& ref,
                               int ref_dir, int gap_open, int gap_extend,
                               int terminate, bool byte_mode,
                               int match_s, int mismatch_s,
                               bool* overflowed) {
    const int read_len = (int)read.size();
    const int ref_len = (int)ref.size();
    const int lanes = byte_mode ? 16 : 8;
    const int seg_len = (read_len + lanes - 1) / lanes;
    const int bias = byte_mode ? mismatch_s : 0;
    const int sat = 255;

    // profile[nt][j*lanes + k]
    std::vector<int> prof(5 * seg_len * lanes, 0);
    for (int nt = 0; nt < 5; nt++) {
        for (int j = 0; j < seg_len; j++) {
            for (int k = 0; k < lanes; k++) {
                int pos = j + k * seg_len;
                int v;
                if (byte_mode) {
                    v = pos >= read_len ? bias
                        : score_mat(nt, read[pos], match_s, mismatch_s) + bias;
                } else {
                    v = pos < read_len
                        ? score_mat(nt, read[pos], match_s, mismatch_s) : 0;
                }
                prof[(nt * seg_len + j) * lanes + k] = v;
            }
        }
    }

    const int W = seg_len * lanes;
    std::vector<int> h_store(W, 0), h_load(W, 0), e_arr(W, 0), h_max(W, 0);
    std::vector<int> vh(lanes), vf(lanes);
    PassResult pr;
    pr.max_column.assign(ref_len, 0);
    pr.end_ref = byte_mode ? -1 : 0;
    pr.end_read = read_len - 1;
    if (overflowed) *overflowed = false;

    int begin = 0, end = ref_len, step = 1;
    if (ref_dir == 1) { begin = ref_len - 1; end = -1; step = -1; }

    for (int i = begin; i != end; i += step) {
        // vH = pvHStore[segLen-1] shifted left one lane
        vh[0] = 0;
        for (int k = 1; k < lanes; k++)
            vh[k] = h_store[(seg_len - 1) * lanes + (k - 1)];
        std::swap(h_store, h_load);
        std::fill(vf.begin(), vf.end(), 0);
        std::vector<int> vmax_col(lanes, 0);
        const int* p = &prof[ref[i] * seg_len * lanes];

        for (int j = 0; j < seg_len; j++) {
            for (int k = 0; k < lanes; k++) {
                int h = vh[k] + p[j * lanes + k];
                if (byte_mode && h > sat) h = sat;
                if (byte_mode) h = std::max(h - bias, 0);
                int e = e_arr[j * lanes + k];
                h = std::max(h, e);
                h = std::max(h, vf[k]);
                if (h > vmax_col[k]) vmax_col[k] = h;
                h_store[j * lanes + k] = h;
                int hg = std::max(h - gap_open, 0);
                e = std::max(std::max(e - gap_extend, 0), hg);
                e_arr[j * lanes + k] = e;
                vf[k] = std::max(std::max(vf[k] - gap_extend, 0), hg);
                vh[k] = h_load[j * lanes + k];
            }
        }
        // lazy-F
        bool done = false;
        for (int kk = 0; kk < lanes && !done; kk++) {
            for (int k = lanes - 1; k > 0; k--) vf[k] = vf[k - 1];
            vf[0] = 0;
            for (int j = 0; j < seg_len; j++) {
                bool any = false;
                for (int k = 0; k < lanes; k++) {
                    int h = std::max(h_store[j * lanes + k], vf[k]);
                    if (h > vmax_col[k]) vmax_col[k] = h;
                    h_store[j * lanes + k] = h;
                    int hg = std::max(h - gap_open, 0);
                    vf[k] = std::max(vf[k] - gap_extend, 0);
                    if (vf[k] > hg) any = true;
                }
                if (!any) { done = true; break; }
            }
        }
        int colmax = 0;
        for (int k = 0; k < lanes; k++) colmax = std::max(colmax, vmax_col[k]);
        if (colmax > pr.best) {
            pr.best = colmax;
            if (byte_mode && pr.best + bias >= sat) {
                if (overflowed) *overflowed = true;
                pr.max_column[i] = colmax;
                break;
            }
            pr.end_ref = i;
            std::copy(h_store.begin(), h_store.end(), h_max.begin());
        }
        pr.max_column[i] = colmax;
        if (colmax == terminate) break;
    }

    for (int idx = 0; idx < W; idx++) {
        if (h_max[idx] == pr.best) {
            int pos = idx / lanes + (idx % lanes) * seg_len;
            if (pos < pr.end_read) pr.end_read = pos;
        }
    }
    if (byte_mode && pr.best + bias >= sat) pr.best = sat;
    return pr;
}

// Banded traceback (mirrors sw.py::_banded_cigar).
//
// Perf note: the oracle zero-fills full read_len x ref_len matrices per
// band iteration, but the DP guards (in_up/in_left/in_diag) never read
// outside the band, and the only out-of-band reads happen in the traceback
// (where a zero direction means "left the band -> fail").  So the scratch
// matrices are reused across pairs WITHOUT clearing, and the traceback
// tests band membership explicitly — bit-identical results, ~200 KB less
// alloc+memset per pair.
struct BandScratch {
    std::vector<int> h, e;
    std::vector<int8_t> d_e, d_f, d_h;
    std::string ops;
};

// banded-DP accounting, read via hrm_band_stats (diagnostic only)
static std::atomic<long long> g_band_cells{0}, g_band_iters{0},
    g_band_pairs{0};

static bool banded_cigar(const int8_t* read, int read_len,
                         const int8_t* ref, int ref_len,
                         int score, int gap_open, int gap_extend,
                         int match_s, int mismatch_s,
                         std::vector<std::pair<int, char>>* entries) {
    int band_width = std::abs(ref_len - read_len) + 1;
    const int max_len = std::max(ref_len, read_len);

    thread_local BandScratch scratch;
    const size_t cells = (size_t)read_len * ref_len;
    if (scratch.h.size() < cells) {
        scratch.h.resize(cells);
        scratch.e.resize(cells);
        scratch.d_e.resize(cells);
        scratch.d_f.resize(cells);
        scratch.d_h.resize(cells);
    }
    std::vector<int>& h = scratch.h;
    std::vector<int>& e = scratch.e;
    std::vector<int8_t>& d_e = scratch.d_e;
    std::vector<int8_t>& d_f = scratch.d_f;
    std::vector<int8_t>& d_h = scratch.d_h;
    int best = 0;
    g_band_pairs.fetch_add(1, std::memory_order_relaxed);
    while (true) {
        g_band_iters.fetch_add(1, std::memory_order_relaxed);
        g_band_cells.fetch_add(
            (long long)read_len * std::min(2 * band_width + 1, ref_len),
            std::memory_order_relaxed);
        // row i == 0: in_up/in_diag are false; constants per the oracle
        {
            const int endj = std::min(ref_len - 1, band_width);
            int f = 0;
            const int rd0 = read[0];
            for (int j = 0; j <= endj; j++) {
                int t1 = -gap_open, t2 = -gap_extend;
                int e_cur = t1 > t2 ? t1 : t2;
                d_e[j] = t1 > t2 ? 3 : 2;
                e[j] = e_cur;
                int h_left = j > 0 ? h[j - 1] : 0;
                t1 = h_left - gap_open;
                t2 = f - gap_extend;
                f = t1 > t2 ? t1 : t2;
                d_f[j] = t1 > t2 ? 5 : 4;
                int e1 = e_cur > 0 ? e_cur : 0;
                int f1 = f > 0 ? f : 0;
                t1 = e1 > f1 ? e1 : f1;
                t2 = score_mat(ref[j], rd0, match_s, mismatch_s);
                int h_cur = t1 > t2 ? t1 : t2;
                h[j] = h_cur;
                if (h_cur > best) best = h_cur;
                d_h[j] = (t1 <= t2) ? 1 : (e1 > f1 ? d_e[j] : d_f[j]);
            }
        }
        for (int i = 1; i < read_len; i++) {
            const int beg = std::max(0, i - band_width);
            const int endj = std::min(ref_len - 1, i + band_width);
            // in_up (|j-(i-1)| <= bw) fails only above i-1+bw: j >= beg
            // >= i-bw > i-1-bw covers the lower side; in_diag's |j-1-(i-1)|
            // <= bw holds for every j in [beg, endj].
            const int up_lim = i - 1 + band_width;
            int f = 0;
            int* h_row = &h[(size_t)i * ref_len];
            int* e_row = &e[(size_t)i * ref_len];
            const int* h_up = &h[(size_t)(i - 1) * ref_len];
            const int* e_up = &e[(size_t)(i - 1) * ref_len];
            int8_t* de_row = &d_e[(size_t)i * ref_len];
            int8_t* df_row = &d_f[(size_t)i * ref_len];
            int8_t* dh_row = &d_h[(size_t)i * ref_len];
            const int rdi = read[i];
            for (int j = beg; j <= endj; j++) {
                const bool in_up = j <= up_lim;
                int t1 = (in_up ? h_up[j] : 0) - gap_open;
                int t2 = (in_up ? e_up[j] : 0) - gap_extend;
                int e_cur = t1 > t2 ? t1 : t2;
                de_row[j] = t1 > t2 ? 3 : 2;
                e_row[j] = e_cur;

                int h_left = j > beg ? h_row[j - 1] : 0;
                t1 = h_left - gap_open;
                t2 = f - gap_extend;
                f = t1 > t2 ? t1 : t2;
                df_row[j] = t1 > t2 ? 5 : 4;

                int e1 = e_cur > 0 ? e_cur : 0;
                int f1 = f > 0 ? f : 0;
                t1 = e1 > f1 ? e1 : f1;
                int h_diag = j > beg ? h_up[j - 1] : 0;
                t2 = h_diag + score_mat(ref[j], rdi, match_s, mismatch_s);
                int h_cur = t1 > t2 ? t1 : t2;
                h_row[j] = h_cur;
                if (h_cur > best) best = h_cur;
                dh_row[j] = (t1 <= t2) ? 1 : (e1 > f1 ? de_row[j] : df_row[j]);
            }
        }
        band_width *= 2;
        if (!(best < score && band_width <= max_len)) break;
    }
    const int bw_final = band_width / 2;  // band used by the last DP pass

    // traceback
    int i = read_len - 1, j = ref_len - 1;
    std::string& ops = scratch.ops;
    ops.clear();
    int layer = 2;
    while (i >= 0 && j > 0) {
        // out-of-band cells read as direction 0 in the zero-filled oracle
        if (std::abs(j - i) > bw_final) return false;
        int8_t d;
        if (layer == 0) d = d_e[i * ref_len + j];
        else if (layer == 1) d = d_f[i * ref_len + j];
        else d = d_h[i * ref_len + j];
        char op;
        switch (d) {
            case 1: --i; --j; layer = 2; op = 'M'; break;
            case 2: --i; layer = 0; op = 'I'; break;
            case 3: --i; layer = 2; op = 'I'; break;
            case 4: --j; layer = 1; op = 'D'; break;
            case 5: --j; layer = 2; op = 'D'; break;
            default: return false;
        }
        ops.push_back(op);
    }

    entries->clear();
    if (ops.empty()) {
        entries->push_back({1, 'M'});
    } else {
        int cnt = 1;
        for (size_t t = 1; t < ops.size(); t++) {
            if (ops[t] == ops[t - 1]) cnt++;
            else { entries->push_back({cnt, ops[t - 1]}); cnt = 1; }
        }
        char last = ops.back();
        if (last == 'M') entries->push_back({cnt + 1, 'M'});
        else { entries->push_back({cnt, last}); entries->push_back({1, 'M'}); }
    }
    std::reverse(entries->begin(), entries->end());
    return true;
}

// Shared tail of the aligner: banded traceback over the matched subregion
// plus the M -> =/X rewrite with soft clips.  Fills cigar/mismatches/flag.
// flag_in carries the reverse-pass flag (0 ok / 2 begin-missing); banded
// failure overrides it with 1 (matching s_align flag semantics).
static void finish_alignment(const int8_t* read, const int8_t* ref_t,
                             int query_len_total,
                             int score1, int ref_begin, int ref_end,
                             int query_begin, int query_end, int flag_in,
                             int gap_open, int gap_extend,
                             int match_s, int mismatch_s,
                             int32_t* flag_out, int32_t* mismatches_out,
                             std::string* cig_out, int diag_certified,
                             const int16_t* dev_ops = nullptr,
                             int dev_ops_len = 0, int dev_fail = 0) {
    *flag_out = flag_in;
    *mismatches_out = 0;
    cig_out->clear();
    thread_local std::vector<std::pair<int, char>> entries;
    if (diag_certified) {
        // device-certified all-M traceback (ops/swdev.py::_diag_fastpath_flag
        // carries the proof): equal-length subregions whose gapless diagonal
        // score equals score1 always trace back as one m-long M run, so the
        // banded DP is skipped entirely and only the =/X rewrite below runs.
        entries.clear();
        entries.push_back({query_end - query_begin + 1, 'M'});
    } else if (dev_ops && dev_fail != 2) {
        // device-walked traceback (ops/bandtb.py): backward-order
        // run-length entries, int16 each = op (bits 0..1: 1=M 2=I 3=D)
        // | length << 2, 0-terminated.  dev_fail: 1 mirrors the oracle's
        // traceback failure (left the band / zero direction); 2 = the
        // device's entry budget overflowed and the caller falls through
        // to the host banded DP below (bit-exact either way).
        if (dev_fail == 1) {
            *flag_out = 1;
            return;
        }
        // identical run-length construction to the oracle walk: merge
        // adjacent same-op runs, then the final backward entry merges
        // the implicit corner M (or appends one)
        entries.clear();
        static const char kOp[4] = {'?', 'M', 'I', 'D'};
        int cnt = 0;
        char cur = 0;
        for (int t = 0; t < dev_ops_len && dev_ops[t]; t++) {
            char op = kOp[dev_ops[t] & 3];
            int len = dev_ops[t] >> 2;
            if (op == cur) {
                cnt += len;
            } else {
                if (cnt) entries.push_back({cnt, cur});
                cur = op;
                cnt = len;
            }
        }
        if (cnt == 0) {
            entries.push_back({1, 'M'});
        } else if (cur == 'M') {
            entries.push_back({cnt + 1, 'M'});
        } else {
            entries.push_back({cnt, cur});
            entries.push_back({1, 'M'});
        }
        std::reverse(entries.begin(), entries.end());
    } else if (!banded_cigar(read + query_begin,
                             query_end - query_begin + 1,
                             ref_t + ref_begin, ref_end - ref_begin + 1,
                             score1, gap_open, gap_extend,
                             match_s, mismatch_s, &entries)) {
        *flag_out = 1;
        return;
    }
    std::string& cig = *cig_out;
    int mismatches = 0;
    if (query_begin > 0) cig += std::to_string(query_begin) + "S";
    int ri = ref_begin, qi = query_begin;
    int run_len = 0;
    char run_op = 0;
    auto flush = [&]() {
        if (run_len) cig += std::to_string(run_len) + run_op;
        run_len = 0;
        run_op = 0;
    };
    for (auto& ent : entries) {
        if (ent.second == 'M') {
            for (int t = 0; t < ent.first; t++) {
                char cur = (ref_t[ri] == read[qi] ? '=' : 'X');
                if (cur == 'X') mismatches++;
                if (cur != run_op) { flush(); run_op = cur; }
                run_len++;
                ri++; qi++;
            }
        } else if (ent.second == 'I') {
            mismatches += ent.first;
            flush();
            cig += std::to_string(ent.first) + "I";
            qi += ent.first;
        } else {  // D
            mismatches += ent.first;
            flush();
            cig += std::to_string(ent.first) + "D";
            ri += ent.first;
        }
    }
    flush();
    int end_clip = query_len_total - query_end - 1;
    if (end_clip > 0) cig += std::to_string(end_clip) + "S";
    *mismatches_out = mismatches;
}

}  // namespace

extern "C" {

// Diagnostic counters for the banded traceback (reset=1 clears after read).
void hrm_band_stats(long long* pairs, long long* iters, long long* cells,
                    int reset) {
    *pairs = g_band_pairs.load();
    *iters = g_band_iters.load();
    *cells = g_band_cells.load();
    if (reset) { g_band_pairs = 0; g_band_iters = 0; g_band_cells = 0; }
}

struct HrmAlignment {
    int32_t sw_score;
    int32_t sw_score_next_best;
    int32_t ref_begin;
    int32_t ref_end;
    int32_t query_begin;
    int32_t query_end;
    int32_t ref_end_next_best;
    int32_t mismatches;
    int32_t flag;
    int32_t cigar_len;         // bytes written to cigar_buf
};

// Returns 0 on success.  cigar_buf receives the =/X/S cigar string.
int hrm_ssw_align(const char* query, int query_len,
                  const char* ref, int ref_len,
                  int mask_len, int compute_cigar,
                  HrmAlignment* out, char* cigar_buf, int cigar_buf_size) {
    const int gap_open = 3, gap_extend = 1, match_s = 2, mismatch_s = 2;
    std::memset(out, 0, sizeof(*out));
    out->ref_begin = -1;
    out->query_begin = -1;
    if (query_len == 0 || ref_len == 0) return 0;

    std::vector<int8_t> read(query_len), ref_t(ref_len);
    for (int i = 0; i < query_len; i++) read[i] = translate_char(query[i]);
    for (int i = 0; i < ref_len; i++) ref_t[i] = translate_char(ref[i]);

    bool byte_mode = true;
    bool ovf = false;
    PassResult fw = striped_pass(read, ref_t, 0, gap_open, gap_extend,
                                 255, true, match_s, mismatch_s, &ovf);
    if (fw.best == 255) {
        byte_mode = false;
        fw = striped_pass(read, ref_t, 0, gap_open, gap_extend, -1, false,
                          match_s, mismatch_s, nullptr);
    }
    out->sw_score = fw.best;
    out->ref_end = fw.end_ref;
    out->query_end = fw.end_read;

    int score2 = 0, ref_end2 = 0;
    int lo = std::max(0, fw.end_ref - mask_len);
    int hi = std::min(ref_len, fw.end_ref + mask_len);
    for (int i = 0; i < lo; i++)
        if (fw.max_column[i] > score2) { score2 = fw.max_column[i]; ref_end2 = i; }
    for (int i = (byte_mode ? hi + 1 : hi); i < ref_len; i++)
        if (fw.max_column[i] > score2) { score2 = fw.max_column[i]; ref_end2 = i; }
    if (mask_len >= 15) {
        out->sw_score_next_best = score2;
        out->ref_end_next_best = ref_end2;
    } else {
        out->sw_score_next_best = 0;
        out->ref_end_next_best = -1;
    }

    if (fw.best == 0 || fw.end_ref < 0) return 0;

    std::vector<int8_t> read_prefix(read.begin(), read.begin() + fw.end_read + 1);
    std::reverse(read_prefix.begin(), read_prefix.end());
    std::vector<int8_t> ref_prefix(ref_t.begin(), ref_t.begin() + fw.end_ref + 1);
    PassResult rv = striped_pass(read_prefix, ref_prefix, 1, gap_open,
                                 gap_extend, fw.best, byte_mode, match_s,
                                 mismatch_s, nullptr);
    out->ref_begin = rv.end_ref;
    out->query_begin = fw.end_read - rv.end_read;
    if (fw.best > rv.best) out->flag = 2;

    if (!compute_cigar) return 0;

    std::string cig;
    finish_alignment(read.data(), ref_t.data(), query_len, fw.best,
                     out->ref_begin, fw.end_ref, out->query_begin,
                     fw.end_read, out->flag,
                     gap_open, gap_extend, match_s, mismatch_s,
                     &out->flag, &out->mismatches, &cig, 0);
    out->cigar_len = (int)cig.size();
    if ((int)cig.size() + 1 > cigar_buf_size) return 1;
    std::memcpy(cigar_buf, cig.c_str(), cig.size() + 1);
    return 0;
}

// ---------------------------------------------------------------------------
// Finish-only batch: the striped score passes already ran on the device
// (hashreadmapper_tpu/ops/swdev.py); this computes just the banded CIGAR +
// =/X rewrite for each pair from the device-provided positions.  Matches
// the tail of ssw_align (align/sw.py:430-443).  Threaded like
// hrm_ssw_align_batch.  Returns 0 on success, 1 if any cigar overflowed.
// ---------------------------------------------------------------------------
int hrm_ssw_finish_batch(const char* query_pool, const int32_t* query_off,
                         const int32_t* query_len,
                         const char* ref_pool, const int32_t* ref_off,
                         const int32_t* ref_len,
                         const int32_t* score1, const int32_t* ref_begin,
                         const int32_t* ref_end, const int32_t* query_begin,
                         const int32_t* query_end, const int32_t* flag_in,
                         const int8_t* diag,
                         const int16_t* dev_ops, int dev_ops_stride,
                         const int8_t* dev_fail,
                         int n_pairs, int n_threads, int codes_in,
                         int32_t* mismatches_out, int32_t* flag_out,
                         char* cigar_pool, int32_t* cigar_len_out,
                         int cigar_stride);

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched API: align many (query, ref) pairs across threads.
// Queries/refs are NUL-free byte strings given via offsets into flat pools.
// Each pair produces an HrmAlignment and a cigar written into a per-pair
// slice of cigar_pool (cigar_stride bytes each).
// Returns 0 on success, 1 if any cigar overflowed its slice.
// ---------------------------------------------------------------------------

#include <atomic>
#include <thread>

extern "C" {

int hrm_ssw_align_batch(const char* query_pool, const int32_t* query_off,
                        const int32_t* query_len,
                        const char* ref_pool, const int32_t* ref_off,
                        const int32_t* ref_len,
                        const int32_t* mask_len, int n_pairs,
                        int compute_cigar, int n_threads,
                        HrmAlignment* out, char* cigar_pool,
                        int cigar_stride) {
    if (n_threads < 1) n_threads = 1;
    std::atomic<int> next{0};
    std::atomic<int> err{0};
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n_pairs) break;
            int rc = hrm_ssw_align(
                query_pool + query_off[i], query_len[i],
                ref_pool + ref_off[i], ref_len[i],
                mask_len[i], compute_cigar, &out[i],
                cigar_pool + (size_t)i * cigar_stride, cigar_stride);
            if (rc != 0) err.store(1);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return err.load();
}

int hrm_ssw_finish_batch(const char* query_pool, const int32_t* query_off,
                         const int32_t* query_len,
                         const char* ref_pool, const int32_t* ref_off,
                         const int32_t* ref_len,
                         const int32_t* score1, const int32_t* ref_begin,
                         const int32_t* ref_end, const int32_t* query_begin,
                         const int32_t* query_end, const int32_t* flag_in,
                         const int8_t* diag,
                         const int16_t* dev_ops, int dev_ops_stride,
                         const int8_t* dev_fail,
                         int n_pairs, int n_threads, int codes_in,
                         int32_t* mismatches_out, int32_t* flag_out,
                         char* cigar_pool, int32_t* cigar_len_out,
                         int cigar_stride) {
    const int gap_open = 3, gap_extend = 1, match_s = 2, mismatch_s = 2;
    if (n_threads < 1) n_threads = 1;
    std::atomic<int> next{0};
    std::atomic<int> err{0};
    auto worker = [&]() {
        std::string cig;
        std::vector<int8_t> read_buf, ref_buf;
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n_pairs) break;
            const int ql = query_len[i], fl = ref_len[i];
            const char* q = query_pool + query_off[i];
            const char* r = ref_pool + ref_off[i];
            const int8_t* read;
            const int8_t* ref_t;
            if (codes_in) {
                // pools already hold 0..4 codes: zero-copy
                read = (const int8_t*)q;
                ref_t = (const int8_t*)r;
            } else {
                read_buf.resize(ql);
                ref_buf.resize(fl);
                for (int t = 0; t < ql; t++)
                    read_buf[t] = translate_char(q[t]);
                for (int t = 0; t < fl; t++)
                    ref_buf[t] = translate_char(r[t]);
                read = read_buf.data();
                ref_t = ref_buf.data();
            }
            finish_alignment(read, ref_t, ql, score1[i], ref_begin[i],
                             ref_end[i], query_begin[i], query_end[i],
                             flag_in[i], gap_open, gap_extend, match_s,
                             mismatch_s, &flag_out[i], &mismatches_out[i],
                             &cig, diag ? diag[i] : 0,
                             dev_ops ? dev_ops + (size_t)i * dev_ops_stride
                                     : nullptr,
                             dev_ops_stride, dev_fail ? dev_fail[i] : 0);
            cigar_len_out[i] = (int32_t)cig.size();
            if ((int)cig.size() + 1 > cigar_stride) { err.store(1); continue; }
            std::memcpy(cigar_pool + (size_t)i * cigar_stride, cig.c_str(),
                        cig.size() + 1);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return err.load();
}

}  // extern "C"
