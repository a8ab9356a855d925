// Native NW edit-distance + traceback (plain DP, exactness-first).
//
// Capability counterpart of the reference's vendored edlib for the edlib
// mapper mode; semantics mirror hashreadmapper_tpu/align/edit.py (distance
// golden-verified against compiled reference edlib).  At read scales
// (<=160 x 128) the DP is a few microseconds; a multi-block Myers
// bit-vector distance is a planned fast path for the scan stage.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>



extern "C" {

// Simple banded-free NW distance; falls back to plain DP for exactness with
// the Python oracle (the multi-block Myers above is kept for reference but
// the DP is authoritative and still fast at read scales).
int hrm_nw_distance(const char* q, int m, const char* t, int n) {
    if (m == 0) return n;
    if (n == 0) return m;
    std::vector<int> prev(n + 1), cur(n + 1);
    for (int j = 0; j <= n; j++) prev[j] = j;
    for (int i = 1; i <= m; i++) {
        cur[0] = i;
        const char qc = q[i - 1];
        for (int j = 1; j <= n; j++) {
            int d = prev[j - 1] + (qc != t[j - 1]);
            int v = prev[j] + 1;
            int h = cur[j - 1] + 1;
            cur[j] = std::min(d, std::min(v, h));
        }
        std::swap(prev, cur);
    }
    return prev[n];
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
