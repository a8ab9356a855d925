// Native FASTA/FASTQ(.gz) bulk reader + preprocessing (C API via ctypes).
//
// Counterpart of the reference's kseqpp-based multi-threaded ingest
// (reference: include/readlibraryio.hpp:288, chunkedreadstorageconstruction.hpp:31):
// parses records, uppercases, replaces non-ACGT bases round-robin with
// A,C,G,T using a persistent counter and flags ambiguous reads
// (chunkedreadstorageconstruction.hpp:70-95 semantics), and emits base codes
// 0..3 into a caller-provided pitched buffer.

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
    gzFile gz = nullptr;
    std::string buf;
    size_t pos = 0;
    bool eof = false;
    int ncount = 0;  // persistent round-robin counter
    std::string pending_line;
    bool have_pending = false;

    bool fill() {
        if (eof) return false;
        char tmp[1 << 16];
        int n = gzread(gz, tmp, sizeof(tmp));
        if (n <= 0) { eof = true; return false; }
        buf.append(tmp, n);
        return true;
    }

    bool getline(std::string* out) {
        out->clear();
        while (true) {
            size_t nl = buf.find('\n', pos);
            if (nl != std::string::npos) {
                out->assign(buf, pos, nl - pos);
                pos = nl + 1;
                if (pos > (1 << 20)) { buf.erase(0, pos); pos = 0; }
                if (!out->empty() && out->back() == '\r') out->pop_back();
                return true;
            }
            if (!fill()) {
                if (pos < buf.size()) {
                    out->assign(buf, pos, buf.size() - pos);
                    pos = buf.size();
                    return !out->empty();
                }
                return false;
            }
        }
    }
};

int8_t code_of(char c) {
    switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return -1;
    }
}

}  // namespace

extern "C" {

void* hrm_fastx_open(const char* path) {
    gzFile gz = gzopen(path, "rb");
    if (!gz) return nullptr;
    Reader* r = new Reader();
    r->gz = gz;
    return r;
}

void hrm_fastx_close(void* handle) {
    Reader* r = (Reader*)handle;
    if (r) {
        gzclose(r->gz);
        delete r;
    }
}

// Reads up to max_reads records.  bases: [max_reads * pitch] int8 codes
// (0..3, pads 0); lengths: [max_reads]; ambiguous: [max_reads] (0/1);
// quals (optional, may be null): [max_reads * pitch] raw phred+33 chars
// (0-filled; FASTA records leave their row all-zero).
// Returns the number of records read (0 = EOF), or -1 on malformed input /
// read longer than pitch.
int hrm_fastx_next_batch_q(void* handle, int max_reads, int pitch,
                           int8_t* bases, int32_t* lengths,
                           uint8_t* ambiguous, uint8_t* quals) {
    Reader* r = (Reader*)handle;
    int count = 0;
    std::string line, seq, qual;
    while (count < max_reads) {
        if (r->have_pending) {
            line = r->pending_line;
            r->have_pending = false;
        } else if (!r->getline(&line)) {
            break;
        }
        if (line.empty()) continue;
        qual.clear();
        if (line[0] == '>') {
            seq.clear();
            while (r->getline(&line)) {
                if (!line.empty() && (line[0] == '>' || line[0] == '@')) {
                    r->pending_line = line;
                    r->have_pending = true;
                    break;
                }
                seq += line;
            }
        } else if (line[0] == '@') {
            if (!r->getline(&seq)) return -1;
            if (!r->getline(&line) || line.empty() || line[0] != '+')
                return -1;
            if (!r->getline(&qual)) return -1;
            if (qual.size() != seq.size()) return -1;
        } else {
            return -1;
        }
        if ((int)seq.size() > pitch) return -1;
        if (quals) {
            uint8_t* qrow = quals + (size_t)count * pitch;
            std::memset(qrow, 0, pitch);
            std::memcpy(qrow, qual.data(), qual.size());
        }
        int8_t* row = bases + (size_t)count * pitch;
        std::memset(row, 0, pitch);
        bool amb = false;
        for (size_t i = 0; i < seq.size(); i++) {
            int8_t c = code_of(seq[i]);
            if (c < 0) {
                amb = true;
                c = (int8_t)(r->ncount);
                r->ncount = (r->ncount + 1) % 4;
            }
            row[i] = c;
        }
        lengths[count] = (int32_t)seq.size();
        ambiguous[count] = amb ? 1 : 0;
        count++;
    }
    return count;
}

int hrm_fastx_next_batch(void* handle, int max_reads, int pitch,
                         int8_t* bases, int32_t* lengths,
                         uint8_t* ambiguous) {
    return hrm_fastx_next_batch_q(handle, max_reads, pitch, bases, lengths,
                                  ambiguous, nullptr);
}

}  // extern "C"
