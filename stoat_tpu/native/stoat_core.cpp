// stoat-tpu native core: streaming VCF -> edge×haplotype matrix ingestion.
//
// TPU-native replacement for the reference's htslib ingestion loop
// (SnarlAnalyzer::make_edge_matrix, /root/reference/src/snarl_analyzer.cpp:
// 190-260) and the packed bit matrix (src/matrix.{hpp,cpp}).  Written from
// scratch in C++17: parses VCF text (plain or gzip via zlib), extracts the
// INFO AT allele traversals and diploid GTs, interns graph edges as rows,
// and fills a dense uint8 edge×haplotype matrix one chromosome at a time.
// Exposed through a plain C ABI consumed from Python via ctypes.
//
// Semantics mirrored from the reference:
//   - records with INFO LV present and != 0 are skipped (nested variants;
//     snarl_analyzer.cpp:199-208)
//   - missing genotype alleles ('.') contribute nothing (:242-252)
//   - every edge of a called allele's traversal is set in the haplotype
//     column 2*i / 2*i+1
//
// Build: g++ -O3 -std=c++17 -shared -fPIC stoat_core.cpp -lz -o libstoat_core.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

struct EdgeKey {
    uint64_t a, b;      // node ids
    uint8_t arev, brev; // orientations
    bool operator==(const EdgeKey& o) const {
        return a == o.a && b == o.b && arev == o.arev && brev == o.brev;
    }
};

struct EdgeKeyHash {
    size_t operator()(const EdgeKey& e) const {
        // golden-ratio combine in the spirit of the reference's Edge_t
        // hash (snarl_data_t.hpp:221-235)
        size_t h = std::hash<uint64_t>()(e.a);
        h ^= std::hash<uint64_t>()(e.b) + 0x9e3779b97f4a7c15ULL + (h << 6) +
             (h >> 2);
        h ^= std::hash<uint32_t>()((uint32_t(e.arev) << 1) | e.brev) +
             0x9e3779b97f4a7c15ULL + (h << 6) + (h >> 2);
        return h;
    }
};

struct LineReader {
    gzFile gz = nullptr;
    std::vector<char> buf;
    LineReader() : buf(1 << 20) {}
    bool open(const char* path) {
        gz = gzopen(path, "rb");
        if (gz) gzbuffer(gz, 1 << 20);
        return gz != nullptr;
    }
    // returns pointer to NUL-terminated line (without trailing newline) or
    // nullptr at EOF; the pointer is valid until the next call
    char* next() {
        size_t len = 0;
        for (;;) {
            if (len + 65536 > buf.size()) buf.resize(buf.size() * 2);
            char* dst = buf.data() + len;
            if (gzgets(gz, dst, int(buf.size() - len)) == nullptr) {
                if (len == 0) return nullptr;
                buf[len] = '\0';
                return buf.data();
            }
            size_t got = strlen(dst);
            len += got;
            if (len > 0 && buf[len - 1] == '\n') {
                buf[len - 1] = '\0';
                if (len > 1 && buf[len - 2] == '\r') buf[len - 2] = '\0';
                return buf.data();
            }
            // line longer than buffer: loop to read more
        }
    }
    void close() {
        if (gz) gzclose(gz);
        gz = nullptr;
    }
};

struct Reader {
    LineReader lr;
    std::vector<std::string> samples;
    std::string pending_line;   // first data line of the next chromosome
    bool have_pending = false;
    bool eof = false;
};

struct Chunk {
    // edge×haplotype matrix, row-major
    uint64_t n_rows = 0, n_cols = 0;
    std::vector<uint8_t> matrix;
    // per row: a_id, a_rev, b_id, b_rev
    std::vector<uint64_t> edges;
    std::string chrom;
};

// parse one oriented traversal string ">123>213<234" into edges, interning
// rows; set bits for columns in cols.
struct MatrixBuilder {
    std::unordered_map<EdgeKey, uint32_t, EdgeKeyHash> edge_to_row;
    std::vector<uint8_t> data;  // row-major [cap_rows, n_cols]
    std::vector<uint64_t> edges;
    uint64_t n_cols = 0;
    uint64_t cap_rows = 0;

    void reset(uint64_t cols, uint64_t initial_rows) {
        edge_to_row.clear();
        edges.clear();
        n_cols = cols;
        cap_rows = initial_rows < 64 ? 64 : initial_rows;
        data.assign(cap_rows * n_cols, 0);
    }

    uint32_t intern(const EdgeKey& k) {
        auto it = edge_to_row.find(k);
        if (it != edge_to_row.end()) return it->second;
        uint32_t row = uint32_t(edge_to_row.size());
        edge_to_row.emplace(k, row);
        if (row >= cap_rows) {
            uint64_t new_cap = cap_rows * 2;
            data.resize(new_cap * n_cols, 0);
            cap_rows = new_cap;
        }
        edges.push_back(k.a);
        edges.push_back(k.arev);
        edges.push_back(k.b);
        edges.push_back(k.brev);
        return row;
    }
};

// Parse an AT traversal into edge keys.  Rows are interned lazily at
// bit-set time: like the reference, alleles no sample carries leave no
// matrix rows (push_matrix is the only interning site, matrix.cpp:40-51).
static void parse_traversal_keys(const char* s, const char* end,
                                 std::vector<EdgeKey>& out) {
    out.clear();
    uint64_t prev_id = 0;
    uint8_t prev_rev = 0;
    bool have_prev = false;
    const char* p = s;
    while (p < end) {
        char c = *p;
        if (c == '>' || c == '<') {
            uint8_t rev = (c == '<');
            ++p;
            uint64_t id = 0;
            while (p < end && *p >= '0' && *p <= '9') {
                id = id * 10 + uint64_t(*p - '0');
                ++p;
            }
            if (have_prev) {
                out.push_back({prev_id, id, prev_rev, rev});
            }
            prev_id = id;
            prev_rev = rev;
            have_prev = true;
        } else {
            ++p;
        }
    }
}

// find "KEY=" in a semicolon-separated INFO field; returns value span
static bool info_field(const char* info, const char* info_end,
                       const char* key, const char** val,
                       const char** val_end) {
    size_t klen = strlen(key);
    const char* p = info;
    while (p < info_end) {
        const char* seg_end = (const char*)memchr(p, ';', info_end - p);
        if (!seg_end) seg_end = info_end;
        if (size_t(seg_end - p) > klen && memcmp(p, key, klen) == 0 &&
            p[klen] == '=') {
            *val = p + klen + 1;
            *val_end = seg_end;
            return true;
        }
        p = seg_end + 1;
    }
    return false;
}

static int parse_allele(const char* p, const char* end) {
    if (p >= end || *p == '.') return -1;
    int v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        ++p;
        any = true;
    }
    return any ? v : -1;
}

// process one data line into the builder; returns chromosome name span
static bool process_line(MatrixBuilder& mb, char* line,
                         std::vector<std::vector<EdgeKey>>& allele_keys,
                         size_t n_samples) {
    // split by tab in place
    // fields: CHROM POS ID REF ALT QUAL FILTER INFO FORMAT samples...
    char* fields[9];
    char* p = line;
    for (int i = 0; i < 9; ++i) {
        fields[i] = p;
        char* t = strchr(p, '\t');
        if (!t) {
            if (i < 8) return false;
            p = p + strlen(p);
            break;
        }
        *t = '\0';
        p = t + 1;
    }
    const char* info = fields[7];
    const char* info_end = info + strlen(info);

    const char *lv, *lv_end;
    if (info_field(info, info_end, "LV", &lv, &lv_end)) {
        int v = atoi(std::string(lv, lv_end).c_str());
        if (v != 0) return true;  // skipped but consumed
    }
    const char *at, *at_end;
    if (!info_field(info, info_end, "AT", &at, &at_end)) return true;

    // decompose each comma-separated allele traversal
    allele_keys.clear();
    const char* a = at;
    while (a < at_end) {
        const char* seg_end = (const char*)memchr(a, ',', at_end - a);
        if (!seg_end) seg_end = at_end;
        allele_keys.emplace_back();
        parse_traversal_keys(a, seg_end, allele_keys.back());
        a = seg_end + 1;
    }
    // per-allele resolved-row cache for this record
    std::vector<std::pair<std::vector<uint32_t>, bool>> allele_row_cache(
        allele_keys.size());

    // samples: p points at the first sample field
    size_t si = 0;
    while (*p != '\0' && si < n_samples) {
        int a1, a2;
        char* t;
        // fast path: the overwhelmingly common "a/b<TAB>" single-digit
        // diploid field
        if (p[0] >= '0' && p[0] <= '9' && (p[1] == '/' || p[1] == '|') &&
            p[2] >= '0' && p[2] <= '9' &&
            (p[3] == '\t' || p[3] == '\0')) {
            a1 = p[0] - '0';
            a2 = p[2] - '0';
            t = p[3] == '\t' ? p + 3 : nullptr;
        } else {
            t = strchr(p, '\t');
            char* fend = t ? t : p + strlen(p);
            // GT is the first colon-separated subfield
            char* colon = (char*)memchr(p, ':', fend - p);
            char* gt_end = colon ? colon : fend;
            // split on '/' or '|'
            char* sep = nullptr;
            for (char* q = p; q < gt_end; ++q) {
                if (*q == '/' || *q == '|') {
                    sep = q;
                    break;
                }
            }
            if (sep) {
                a1 = parse_allele(p, sep);
                a2 = parse_allele(sep + 1, gt_end);
            } else {
                a1 = parse_allele(p, gt_end);
                a2 = -1;
            }
        }
        // rows interned lazily on an allele's first carrier, then cached
        // (semantics match push_matrix: uncalled alleles leave no rows)
        auto rows_of = [&](int allele) -> const std::vector<uint32_t>& {
            auto& cache = allele_row_cache[size_t(allele)];
            if (!cache.second) {
                cache.first.clear();
                for (const EdgeKey& k : allele_keys[size_t(allele)])
                    cache.first.push_back(mb.intern(k));
                cache.second = true;
            }
            return cache.first;
        };
        uint64_t col = 2 * si;
        if (a1 >= 0 && size_t(a1) < allele_keys.size()) {
            for (uint32_t row : rows_of(a1))
                mb.data[uint64_t(row) * mb.n_cols + col] = 1;
        }
        if (a2 >= 0 && size_t(a2) < allele_keys.size()) {
            for (uint32_t row : rows_of(a2))
                mb.data[uint64_t(row) * mb.n_cols + col + 1] = 1;
        }
        ++si;
        if (!t) break;
        p = t + 1;
    }
    return true;
}

static const char* chrom_of(const char* line, size_t* len) {
    const char* t = strchr(line, '\t');
    *len = t ? size_t(t - line) : strlen(line);
    return line;
}

}  // namespace

extern "C" {

void* stoat_vcf_open(const char* path) {
    Reader* r = new Reader();
    if (!r->lr.open(path)) {
        delete r;
        return nullptr;
    }
    // header
    for (;;) {
        char* line = r->lr.next();
        if (!line) {
            delete r;
            return nullptr;
        }
        if (strncmp(line, "##", 2) == 0) continue;
        if (strncmp(line, "#CHROM", 6) == 0) {
            // samples start at column 10
            int col = 0;
            char* p = line;
            while (p) {
                char* t = strchr(p, '\t');
                if (t) *t = '\0';
                if (col >= 9) r->samples.emplace_back(p);
                p = t ? t + 1 : nullptr;
                ++col;
            }
            return r;
        }
        delete r;
        return nullptr;
    }
}

int64_t stoat_vcf_n_samples(void* rp) {
    return int64_t(static_cast<Reader*>(rp)->samples.size());
}

const char* stoat_vcf_sample(void* rp, int64_t i) {
    Reader* r = static_cast<Reader*>(rp);
    if (i < 0 || size_t(i) >= r->samples.size()) return nullptr;
    return r->samples[size_t(i)].c_str();
}

// Parse the next chromosome chunk.  Returns an opaque Chunk* or nullptr at
// EOF.
void* stoat_vcf_next_chunk(void* rp, uint64_t initial_rows) {
    Reader* r = static_cast<Reader*>(rp);
    if (r->eof && !r->have_pending) return nullptr;

    std::string first;
    if (r->have_pending) {
        first = r->pending_line;
        r->have_pending = false;
    } else {
        for (;;) {
            char* line = r->lr.next();
            if (!line) {
                r->eof = true;
                return nullptr;
            }
            if (line[0] == '#' || line[0] == '\0') continue;
            first = line;
            break;
        }
    }

    size_t clen;
    chrom_of(first.c_str(), &clen);
    std::string chrom(first.c_str(), clen);

    Chunk* chunk = new Chunk();
    chunk->chrom = chrom;
    size_t n_samples = r->samples.size();

    MatrixBuilder mb;
    mb.reset(2 * n_samples, initial_rows);
    std::vector<std::vector<EdgeKey>> allele_rows;

    std::vector<char> mutable_line(first.begin(), first.end());
    mutable_line.push_back('\0');
    process_line(mb, mutable_line.data(), allele_rows, n_samples);

    for (;;) {
        char* line = r->lr.next();
        if (!line) {
            r->eof = true;
            break;
        }
        if (line[0] == '#' || line[0] == '\0') continue;
        size_t len2;
        chrom_of(line, &len2);
        if (len2 != clen || memcmp(line, chrom.c_str(), clen) != 0) {
            r->pending_line = line;
            r->have_pending = true;
            break;
        }
        process_line(mb, line, allele_rows, n_samples);
    }

    uint64_t rows = mb.edge_to_row.size();
    chunk->n_rows = rows;
    chunk->n_cols = mb.n_cols;
    chunk->matrix.assign(mb.data.begin(),
                         mb.data.begin() + rows * mb.n_cols);
    chunk->edges = std::move(mb.edges);
    return chunk;
}

const char* stoat_chunk_chrom(void* cp) {
    return static_cast<Chunk*>(cp)->chrom.c_str();
}

uint64_t stoat_chunk_rows(void* cp) {
    return static_cast<Chunk*>(cp)->n_rows;
}

uint64_t stoat_chunk_cols(void* cp) {
    return static_cast<Chunk*>(cp)->n_cols;
}

const uint8_t* stoat_chunk_matrix(void* cp) {
    return static_cast<Chunk*>(cp)->matrix.data();
}

const uint64_t* stoat_chunk_edges(void* cp) {
    return static_cast<Chunk*>(cp)->edges.data();
}

void stoat_chunk_free(void* cp) {
    delete static_cast<Chunk*>(cp);
}

void stoat_vcf_close(void* rp) {
    Reader* r = static_cast<Reader*>(rp);
    r->lr.close();
    delete r;
}

}  // extern "C"
