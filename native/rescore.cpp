// Bisulfite rescoring (STEP 2), native batch path.
//
// Behavioral re-derivation of recalculateAlignmentScorefk (reference:
// src/gpu/mappinghandler.cu:601-745), bit-identical to the Python oracle
// hashreadmapper_tpu/pipeline/mapping.py::rescore_alignment: walk the
// alignment CIGAR with the 82-base horizon (negative bases_left arithmetic
// kept), adjust sw_score / sw_score_next_best where a query T aligns over a
// genomic C (bisulfite conversion) or a query C over a T/A context, and
// count conversions.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// Aligner::getScore char lookup (ssw_cpp.cpp:415-443): unknown chars -> A.
static inline int code_of(char c) {
    switch (c) {
        case 'C': return 1;
        case 'G': return 2;
        case 'T': return 3;
        case 'N': return 4;
        default: return 0;  // 'A' and anything else
    }
}

static inline int get_score(char a, char b) {
    int ia = code_of(a), ib = code_of(b);
    return (ia == ib && ia < 4) ? 2 : -2;
}

static void rescore_one(const char* q, int qlen,
                        const char* ref, int reflen,
                        const char* rcref, int rcreflen,
                        const char* cig, int ciglen,
                        int32_t* sw_score, int32_t* sw_next,
                        int32_t* conv_out) {
    int num_conversions = 0;
    int ref_pos = 0, alt_pos = 0;
    int sw = *sw_score, nb = *sw_next;
    int i = 0;
    while (i < ciglen) {
        int length = 0;
        bool has_digit = false;
        while (i < ciglen && cig[i] >= '0' && cig[i] <= '9') {
            length = length * 10 + (cig[i] - '0');
            i++;
            has_digit = true;
        }
        if (i >= ciglen) break;
        char op = cig[i++];
        if (!has_digit) continue;
        // 82-base horizon; bases_left can go negative and still advances
        // the positions (reference quirk kept)
        int bases_left = std::min(82 - std::max(ref_pos, alt_pos), length);
        switch (op) {
            case 'M':
                for (int t = 0; t < bases_left; t++) {
                    if (alt_pos + t >= qlen || ref_pos + t >= reflen ||
                        ref_pos + t >= rcreflen)
                        continue;
                    char qc = q[alt_pos + t];
                    char rc = ref[ref_pos + t];
                    if (qc == rc || rc == 'N' || qc == 'N') continue;
                    if (qc == 'C') {
                        char x = rcref[ref_pos + t];
                        if ((rc == 'T' && x == 'A') ||
                            (rc == 'A' && x == 'T')) {
                            nb -= get_score('T', rc);
                            nb += get_score('C', rc);
                            sw -= get_score('T', rc);
                            sw += get_score('C', rc);
                        }
                    }
                    if (qc == 'T') {
                        char x = rcref[ref_pos + t];
                        if ((rc == 'C' && x == 'G') ||
                            (rc == 'G' && x == 'C')) {
                            num_conversions++;
                            nb -= 2;  // get_score('T','T')
                            nb += get_score('T', rc);
                            sw -= 2;
                            sw += get_score('T', rc);
                        }
                    }
                }
                ref_pos += bases_left;
                alt_pos += bases_left;
                break;
            case '=':
                for (int t = 0; t < bases_left; t++) {
                    if (alt_pos + t >= qlen || ref_pos + t >= reflen ||
                        ref_pos + t >= rcreflen)
                        continue;
                    char qc = q[alt_pos + t];
                    char rc = ref[ref_pos + t];
                    if (qc == rc || rc == 'N' || qc == 'N') continue;
                    if (qc == 'T') {
                        char x = rcref[ref_pos + t];
                        if ((rc == 'C' && x == 'G') ||
                            (rc == 'G' && x == 'C')) {
                            num_conversions++;
                            nb -= 2;
                            nb += get_score(qc, rc);
                            sw -= 2;
                            sw += get_score(qc, rc);
                        }
                    }
                }
                ref_pos += bases_left;
                alt_pos += bases_left;
                break;
            case 'I':
            case 'S':
                alt_pos += bases_left;
                break;
            case 'D':
            case 'N':
                ref_pos += bases_left;
                break;
            case 'X':
                ref_pos += bases_left;
                alt_pos += bases_left;
                break;
            default:  // H, P
                break;
        }
    }
    *sw_score = sw;
    *sw_next = nb;
    *conv_out = num_conversions;
}

}  // namespace

extern "C" {

// Batch rescoring over n alignments.  q_pool holds the per-alignment
// _query (the reference's h-swap already applied by the caller: h==0 ->
// rc_query, h==1 -> query).  sw_score / sw_next are adjusted in place.
// Returns 0.
int hrm_rescore_batch(const char* q_pool, const int32_t* q_off,
                      const int32_t* q_len,
                      const char* ref_pool, const int32_t* ref_off,
                      const int32_t* ref_len,
                      const char* rcref_pool, const int32_t* rcref_off,
                      const int32_t* rcref_len,
                      const char* cig_pool, const int32_t* cig_off,
                      const int32_t* cig_len,
                      int32_t* sw_score, int32_t* sw_next,
                      int32_t* num_conversions,
                      int n_aligns, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::atomic<int> next{0};
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n_aligns) break;
            rescore_one(q_pool + q_off[i], q_len[i],
                        ref_pool + ref_off[i], ref_len[i],
                        rcref_pool + rcref_off[i], rcref_len[i],
                        cig_pool + cig_off[i], cig_len[i],
                        &sw_score[i], &sw_next[i], &num_conversions[i]);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return 0;
}

}  // extern "C"
