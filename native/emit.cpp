// Bulk SAM / VCF emitters for the records-mode STEP 2/3 output path.
//
// Behavioral re-derivation of the reference's serial writers:
//   * hrm_sam_emit — printtoSAM (reference: src/gpu/mappinghandler.cu:196-293):
//     header (@HD, per-read @SQ, @PG without trailing newline, @CO), then one
//     record per read choosing the higher-scoring of the two alignments, with
//     the CSSW MAPQ formula (mappinghandler.cu:184-193) and the Yf/YZ tags.
//   * hrm_vc_emit — doVC + VariantHandler (mappinghandler.cu:92-156,
//     src/varianthandler.cpp:14-166): per mapped read with MAPQ >= 20, walk
//     the CIGAR with the 82-base horizon, buffer variants in an ordered set
//     keyed by (pos, "ref\talt"), flush entries with pos + 82 < lastPos using
//     the flushing read's metadata; the tail is never force-flushed.
//
// Both are byte-identical to the python writers in pipeline/mapping.py and
// io/vcf.py (the oracles), including python-specific slice/index semantics
// (negative positions wrap once) that the oracle inherited from faithfully
// keeping the reference's negative bases_left arithmetic.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <set>
#include <string>
#include <thread>
#include <utility>
#include <vector>

namespace {

// MAPQ exactly as the reference computes it (mappinghandler.cu:184-193):
// the double is assigned to uint32_t first (truncation), then +4.99 and
// truncated again; NaN / +inf cast to 0 on x86-64.
static inline int mapq_cssw(int32_t s1, int32_t s2) {
  int m1;
  if (s1 == 0) {
    m1 = 0;
  } else {
    double frac = std::fabs((double)(s1 - s2)) / (double)s1;
    if (frac >= 1.0) {
      m1 = 0;
    } else {
      m1 = (int)(-4.343 * std::log(1.0 - frac));
    }
  }
  int mapq = m1 + 4;
  return mapq < 254 ? mapq : 254;
}

static inline void append_i64(std::string& s, long long v) {
  char buf[24];
  int n = snprintf(buf, sizeof buf, "%lld", v);
  s.append(buf, n);
}

struct SamArgs {
  long long n;
  const uint8_t* q;      // [n, lq]
  int lq;
  const int32_t* q_len;  // [n]
  const uint8_t* win;    // [n, ws]
  int ws;
  const int32_t* wlen;     // [n]
  const int64_t* position; // [n]
  const int32_t* chrom;    // [n]
  const uint8_t* names;    // pool
  const int64_t* names_off;
  const int32_t* names_len;
  const int32_t* flag0;  // [n]
  const int32_t* flag1;  // [n]
  const int32_t* sw;     // [2n]
  const int32_t* nb;     // [2n]
  const int32_t* qb;     // [2n]
  const int32_t* conv;   // [2n]
  const uint8_t* cig;    // pool
  const int64_t* cig_off;  // [2n]
  const int32_t* cig_len;  // [2n]
  const uint8_t* qual;     // [n, lq] or null
  long long rid_base;
};

static void sam_range(const SamArgs& a, long long r0, long long r1,
                      std::string& out, long long& mapped,
                      long long& unmapped) {
  out.reserve((size_t)(r1 - r0) * (a.lq + a.ws + 96));
  for (long long r = r0; r < r1; ++r) {
    int h = a.sw[2 * r] >= a.sw[2 * r + 1] ? 0 : 1;
    long long p = 2 * r + h;
    int samflag = h == 0 ? a.flag0[r] : a.flag1[r];
    int mapq = mapq_cssw(a.sw[p], a.nb[p]);
    long long pos = a.position[r] + a.qb[p];
    append_i64(out, a.rid_base + r);
    out.push_back('\t');
    append_i64(out, samflag);
    out.push_back('\t');
    int c = a.chrom[r];
    out.append((const char*)a.names + a.names_off[c], a.names_len[c]);
    out.push_back('\t');
    append_i64(out, pos);
    out.push_back('\t');
    append_i64(out, mapq);
    out.push_back('\t');
    out.append((const char*)a.cig + a.cig_off[p], a.cig_len[p]);
    out.push_back('\t');
    out.append((const char*)a.win + (size_t)r * a.ws, a.wlen[r]);
    out.append("\t\t0\t", 4);
    out.append((const char*)a.q + (size_t)r * a.lq, a.q_len[r]);
    out.push_back('\t');
    if (a.qual && a.q_len[r] > 0 &&
        a.qual[(size_t)r * a.lq] != 0) {
      out.append((const char*)a.qual + (size_t)r * a.lq, a.q_len[r]);
    } else {
      out.push_back('*');
    }
    out.push_back('\t');
    if ((a.flag0[r] & 0x4) == 0) {
      ++mapped;
      out.append("Yf:i:<", 6);
      append_i64(out, a.conv[p]);
      out.append(">YZ:A:<", 7);
      out.push_back(h == 0 ? '+' : '-');
      out.push_back('>');
    } else {
      ++unmapped;
      append_i64(out, a.flag0[r]);
    }
    out.append("\t\n", 2);
  }
}

}  // namespace

extern "C" int hrm_sam_emit(
    const char* path, long long n, const uint8_t* q, int lq,
    const int32_t* q_len, const uint8_t* win, int ws, const int32_t* wlen,
    const int64_t* position, const int32_t* chrom, const uint8_t* names,
    const int64_t* names_off, const int32_t* names_len, const int32_t* flag0,
    const int32_t* flag1, const int32_t* sw, const int32_t* nb,
    const int32_t* qb, const int32_t* conv, const uint8_t* cig,
    const int64_t* cig_off, const int32_t* cig_len, const uint8_t* qual,
    long long rid_base, int threads, long long* mapped_out,
    long long* unmapped_out) {
  FILE* fh = fopen(path, "wb");
  if (!fh) return -1;
  SamArgs a{n,  q,  lq, q_len, win, ws,  wlen,    position, chrom,
            names, names_off, names_len, flag0, flag1, sw, nb, qb, conv,
            cig,   cig_off,   cig_len,   qual,  rid_base};
  // header: @HD, one @SQ per read (SN = read id, LN = window length),
  // @PG with the reference's missing newline, @CO column legend
  std::string head = "@HD\tVN:1.4\n";
  for (long long r = 0; r < n; ++r) {
    head.append("@SQ\tSN:", 7);
    append_i64(head, rid_base + r);
    head.append("\tLN:", 4);
    append_i64(head, wlen[r]);
    head.push_back('\n');
  }
  head.append("@PG\tHashreadmapper\tID:1.0");
  head.append("@CO: QNAME\tFLAG\tRNAME\tPOS\tMAPQ\tCIGAR\tRNEXT\tPNEXT\t"
              "TLEN\tSEQ\tQUAL\tTAG\n");
  fwrite(head.data(), 1, head.size(), fh);

  if (threads <= 0) threads = 1;
  if (threads > 32) threads = 32;
  long long per = (n + threads - 1) / threads;
  if (per < 4096) { threads = (int)((n + 4095) / 4096); if (threads < 1) threads = 1; per = (n + threads - 1) / threads; }
  std::vector<std::string> bufs(threads);
  std::vector<long long> maps(threads, 0), unmaps(threads, 0);
  std::vector<std::thread> ts;
  for (int t = 0; t < threads; ++t) {
    long long r0 = t * per, r1 = std::min<long long>(n, r0 + per);
    if (r0 >= r1) break;
    ts.emplace_back([&, t, r0, r1] {
      sam_range(a, r0, r1, bufs[t], maps[t], unmaps[t]);
    });
  }
  for (auto& t : ts) t.join();
  long long mapped = 0, unmapped = 0;
  for (int t = 0; t < threads; ++t) {
    if (!bufs[t].empty()) fwrite(bufs[t].data(), 1, bufs[t].size(), fh);
    mapped += maps[t];
    unmapped += unmaps[t];
  }
  fclose(fh);
  if (mapped_out) *mapped_out = mapped;
  if (unmapped_out) *unmapped_out = unmapped;
  return 0;
}

// ---------------------------------------------------------------------------
// VCF (STEP 3)

namespace {

// python slice s[start:stop] semantics on a known-length string: negative
// indices wrap once, then clamp to [0, len]; empty when start >= stop.
static inline void pyslice(const char* s, long long len, long long start,
                           long long stop, std::string& out) {
  if (start < 0) start += len;
  if (start < 0) start = 0;
  if (stop < 0) stop += len;
  if (stop < 0) stop = 0;
  if (start > len) start = len;
  if (stop > len) stop = len;
  if (start < stop) out.append(s + start, (size_t)(stop - start));
}

// python s[i] semantics: negative wraps once; returns -1 for out-of-range
// (the oracle guards `ref_pos + i < len(ref)` for positive overflow but a
// negative index that stays negative after one wrap would raise — callers
// treat -2 as "python would raise", surfacing rc=1 so the caller falls back)
static inline int pyindex(const char* s, long long len, long long i) {
  if (i >= len) return -1;  // caller-guarded; not reached
  if (i < 0) i += len;
  if (i < 0) return -2;
  return (unsigned char)s[i];
}

struct VcEntry {
  long long pos;
  std::string variant;  // "ref\talt"
  bool operator<(const VcEntry& o) const {
    if (pos != o.pos) return pos < o.pos;
    return variant < o.variant;
  }
};

}  // namespace

extern "C" int hrm_vc_emit(
    const char* path, long long n, const uint8_t* q, int lq,
    const int32_t* q_len, const uint8_t* win, int ws, const int32_t* wlen,
    const int64_t* position, const int32_t* chrom, const uint8_t* names,
    const int64_t* names_off, const int32_t* names_len, const int32_t* sw,
    const int32_t* nb, const int32_t* qb, const uint8_t* cig,
    const int64_t* cig_off, const int32_t* cig_len, long long rid_base) {
  const long long kHorizon = 82;  // SEQ_READ_SIZE (include/constants.hpp)
  FILE* fh = fopen(path, "wb");
  if (!fh) return -1;
  std::string out;
  out.append("##fileformat=VCFv4.2\n");
  out.append("#CHROM\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\n");
  std::set<VcEntry> pending;
  std::string refbuf, altbuf, varbuf;
  int rc = 0;
  for (long long r = 0; r < n && rc == 0; ++r) {
    int h = sw[2 * r] >= sw[2 * r + 1] ? 0 : 1;
    long long p = 2 * r + h;
    int mapq = mapq_cssw(sw[p], nb[p]);
    if (mapq < 20) continue;  // MAP_QUALITY_THRESHOLD
    const char* ref = (const char*)win + (size_t)r * ws;
    long long ref_n = wlen[r];
    const char* alt = (const char*)q + (size_t)r * lq;
    long long alt_n = q_len[r];
    long long qbv = qb[p];
    long long read_pos = position[r] + qbv;
    long long prefix_n = qbv > 0 ? (qbv < ref_n ? qbv : ref_n) : 0;
    // walk the CIGAR (VariantHandler::call, varianthandler.cpp:14-121)
    long long ref_pos = 0, alt_pos = 0;
    const char* cg = (const char*)cig + cig_off[p];
    int cg_n = cig_len[p];
    long long num = 0;
    for (int ci = 0; ci < cg_n; ++ci) {
      char c = cg[ci];
      if (c >= '0' && c <= '9') {
        num = num * 10 + (c - '0');
        continue;
      }
      long long length = num;
      num = 0;
      long long hi = ref_pos > alt_pos ? ref_pos : alt_pos;
      long long bases_left = kHorizon - hi;
      if (length < bases_left) bases_left = length;
      if (c == 'M' || c == 'X' || c == '=') {
        for (long long i = 0; i < bases_left; ++i) {
          if (ref_pos + i >= ref_n || alt_pos + i >= alt_n) continue;
          int rv = pyindex(ref, ref_n, ref_pos + i);
          int av = pyindex(alt, alt_n, alt_pos + i);
          if (rv == -2 || av == -2) { rc = 1; break; }
          if (rv == av || rv == 'N' || av == 'N') continue;
          varbuf.clear();
          varbuf.push_back((char)rv);
          varbuf.push_back('\t');
          varbuf.push_back((char)av);
          pending.insert({read_pos + ref_pos + i, varbuf});
        }
        ref_pos += bases_left;
        alt_pos += bases_left;
      } else if (c == 'I') {
        if (bases_left > 0) {
          varbuf.clear();
          if (ref_pos == 0) {
            pyslice(ref, ref_n, 0, prefix_n, varbuf);
            varbuf.push_back('\t');
            pyslice(ref, ref_n, 0, prefix_n, varbuf);
            pyslice(alt, alt_n, alt_pos, alt_pos + bases_left, varbuf);
          } else {
            pyslice(ref, ref_n, ref_pos - 1, ref_pos, varbuf);
            varbuf.push_back('\t');
            pyslice(alt, alt_n, alt_pos - 1, alt_pos + bases_left, varbuf);
          }
          pending.insert({read_pos + ref_pos, varbuf});
        }
        alt_pos += bases_left;
      } else if (c == 'D') {
        if (bases_left > 0) {
          varbuf.clear();
          if (ref_pos == 0) {
            pyslice(ref, ref_n, 0, prefix_n, varbuf);
            pyslice(ref, ref_n, ref_pos, ref_pos + bases_left, varbuf);
            varbuf.push_back('\t');
            pyslice(ref, ref_n, 0, prefix_n, varbuf);
          } else {
            pyslice(ref, ref_n, ref_pos - 1, ref_pos + bases_left, varbuf);
            varbuf.push_back('\t');
            pyslice(alt, alt_n, alt_pos - 1, alt_pos, varbuf);
          }
          pending.insert({read_pos + ref_pos, varbuf});
        }
        ref_pos += bases_left;
      } else if (c == 'S') {
        alt_pos += bases_left;
      } else if (c == 'H' || c == 'P') {
        // no-op
      } else if (c == 'N') {
        ref_pos += bases_left;
      } else {
        rc = 2;  // unhandled op — oracle raises AssertionError
        break;
      }
    }
    if (rc) break;
    // flush(read_pos): write entries with pos + 82 < lastPos using the
    // CURRENT read's chrom/readId/qual (varianthandler.cpp:124-141)
    int cid = chrom[r];
    while (!pending.empty()) {
      auto it = pending.begin();
      if (it->pos + kHorizon >= read_pos) break;
      out.append((const char*)names + names_off[cid], names_len[cid]);
      out.push_back('\t');
      append_i64(out, it->pos);
      out.push_back('\t');
      append_i64(out, rid_base + r);
      out.push_back('\t');
      out.append(it->variant);
      out.push_back('\t');
      append_i64(out, mapq);
      out.append("\t\t\t\t\n", 5);
      pending.erase(it);
    }
    if (out.size() > (1u << 22)) {
      fwrite(out.data(), 1, out.size(), fh);
      out.clear();
    }
  }
  if (rc == 0 && !out.empty()) fwrite(out.data(), 1, out.size(), fh);
  fclose(fh);
  return rc;
}
