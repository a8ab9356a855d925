// Native NW edit distance (multi-block Myers bit-vector) + traceback DP.
//
// Capability counterpart of the reference's vendored edlib for the edlib
// mapper mode; semantics mirror hashreadmapper_tpu/align/edit.py (distance
// golden-verified against compiled reference edlib).  The distance path is
// the Myers/Hyyro bit-parallel recurrence over 64-bit blocks (the same
// family of algorithm edlib uses, reference: src/edlib.cpp); the traceback
// path keeps the plain DP, whose direction tie rules are the oracle's.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Multi-block Myers bit-vector NW distance (Hyyro's block recurrence).
// The query is zero-padded to a block multiple with never-matching rows;
// padding rows cannot affect rows <= m (DP rows depend only on earlier
// rows), so the true D[m][n] is read back from the padded bottom score by
// walking the last block's vertical delta bits (VP/VN) above row m.
static int myers_nw_distance(const uint8_t* q, int m, const uint8_t* t,
                             int n) {
    constexpr int W = 64;
    const int nb = (m + W - 1) / W;
    std::vector<uint64_t> peq(nb * 256, 0);
    for (int i = 0; i < m; i++)
        peq[(i / W) * 256 + q[i]] |= 1ULL << (i % W);

    std::vector<uint64_t> vp(nb, ~0ULL), vn(nb, 0);
    const int padded_m = nb * W;
    int score = padded_m;                     // D[padded_m][0]
    constexpr uint64_t HIGH = 1ULL << (W - 1);
    for (int j = 0; j < n; j++) {
        const uint8_t tc = t[j];
        int hin = 1;                          // top boundary: D[0][j] = j
        for (int b = 0; b < nb; b++) {
            // Hyyro's block step: Xv (vertical) uses Eq without the carry
            // bit, Xh (horizontal) with it
            uint64_t eq = peq[b * 256 + tc];
            const uint64_t xv = eq | vn[b];
            if (hin < 0) eq |= 1;
            const uint64_t xh = (((eq & vp[b]) + vp[b]) ^ vp[b]) | eq;
            uint64_t ph = vn[b] | ~(xh | vp[b]);
            uint64_t mh = vp[b] & xh;
            int hout = 0;
            if (ph & HIGH) hout = 1;
            else if (mh & HIGH) hout = -1;
            ph <<= 1;
            mh <<= 1;
            if (hin < 0) mh |= 1;
            if (hin > 0) ph |= 1;
            vp[b] = mh | ~(xv | ph);
            vn[b] = ph & xv;
            hin = hout;
        }
        score += hin;                         // hout of the last block
    }
    // score = D[padded_m][n]; walk up to row m via the vertical deltas
    // (bit i of the last block's VP/VN is the delta between rows
    // (nb-1)*W + i and (nb-1)*W + i + 1)
    const int rem = m - (nb - 1) * W;
    const uint64_t vpl = vp[nb - 1], vnl = vn[nb - 1];
    for (int i = W - 1; i >= rem; i--) {
        if (vpl & (1ULL << i)) score--;
        else if (vnl & (1ULL << i)) score++;
    }
    (void)padded_m;
    return score;
}

}  // namespace

extern "C" {

int hrm_nw_distance(const char* q, int m, const char* t, int n) {
    if (m == 0) return n;
    if (n == 0) return m;
    return myers_nw_distance(reinterpret_cast<const uint8_t*>(q), m,
                             reinterpret_cast<const uint8_t*>(t), n);
}

// NW alignment with M/I/D cigar (traceback preferences match
// align/edit.py::nw_align: diagonal first, then D (target gap... target
// base consumed), then I).  Returns distance; cigar written to buf.
int hrm_nw_align(const char* q, int m, const char* t, int n,
                 char* cigar_buf, int cigar_buf_size, int* cigar_len) {
    std::vector<int> dp((m + 1) * (n + 1));
    for (int j = 0; j <= n; j++) dp[j] = j;
    for (int i = 1; i <= m; i++) {
        dp[i * (n + 1)] = i;
        const char qc = q[i - 1];
        for (int j = 1; j <= n; j++) {
            int d = dp[(i - 1) * (n + 1) + j - 1] + (qc != t[j - 1]);
            int v = dp[(i - 1) * (n + 1) + j] + 1;
            int h = dp[i * (n + 1) + j - 1] + 1;
            dp[i * (n + 1) + j] = std::min(d, std::min(v, h));
        }
    }
    int dist = dp[m * (n + 1) + n];

    std::string ops;
    int i = m, j = n;
    while (i > 0 || j > 0) {
        int cur = dp[i * (n + 1) + j];
        if (i > 0 && j > 0 &&
            cur == dp[(i - 1) * (n + 1) + j - 1] + (q[i - 1] != t[j - 1])) {
            ops.push_back('M'); i--; j--;
        } else if (j > 0 && cur == dp[i * (n + 1) + j - 1] + 1) {
            ops.push_back('D'); j--;
        } else {
            ops.push_back('I'); i--;
        }
    }
    std::reverse(ops.begin(), ops.end());
    std::string cig;
    int cnt = 0;
    char prev_op = 0;
    for (char op : ops) {
        if (op == prev_op) cnt++;
        else {
            if (cnt) cig += std::to_string(cnt) + prev_op;
            prev_op = op; cnt = 1;
        }
    }
    if (cnt) cig += std::to_string(cnt) + prev_op;
    *cigar_len = (int)cig.size();
    if ((int)cig.size() + 1 > cigar_buf_size) return -1;
    std::memcpy(cigar_buf, cig.c_str(), cig.size() + 1);
    return dist;
}

}  // extern "C"
