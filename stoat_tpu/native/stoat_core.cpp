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
// Pipelined + parallel (the reference is single-threaded by default,
// main.cpp:62; this is where our end-to-end throughput comes from):
//   - a reader thread decompresses and splits lines into batches ahead of
//     the consumer (bounded queue),
//   - worker threads parse a batch's records concurrently (AT/LV/GT),
//   - a short serial pass interns edge rows in deterministic record/allele
//     order (only alleles with at least one carrier get rows, matching
//     push_matrix semantics, matrix.cpp:40-51),
//   - worker threads fill matrix bits over disjoint sample ranges.
// Output is identical for any thread count (row order is deterministic).
//
// Semantics mirrored from the reference:
//   - records with INFO LV present and != 0 are skipped (nested variants;
//     snarl_analyzer.cpp:199-208)
//   - missing genotype alleles ('.') contribute nothing (:242-252)
//   - every edge of a called allele's traversal is set in the haplotype
//     column 2*i / 2*i+1
//
// Thread count: STOAT_THREADS env var, default hardware_concurrency.
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread stoat_core.cpp -lz

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
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

static unsigned num_threads() {
    const char* env = getenv("STOAT_THREADS");
    if (env) {
        int v = atoi(env);
        if (v >= 1) return unsigned(v);
    }
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? (hw > 16 ? 16 : hw) : 1;
}

// ---------------------------------------------------------------------------
// Batched line reading on a producer thread

struct Batch {
    std::vector<char> text;        // NUL-terminated lines, concatenated
    std::vector<size_t> offs;      // start of each line in text
    size_t n_lines() const { return offs.size(); }
    const char* line(size_t i) const { return text.data() + offs[i]; }
    char* line_mut(size_t i) { return text.data() + offs[i]; }
};

struct LineSource {
    gzFile gz = nullptr;
    std::vector<char> buf;
    LineSource() : buf(1 << 20) {}
    bool open(const char* path) {
        gz = gzopen(path, "rb");
        if (gz) gzbuffer(gz, 1 << 22);
        return gz != nullptr;
    }
    // NUL-terminated line (no trailing newline), or nullptr at EOF
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
        }
    }
    void close() {
        if (gz) gzclose(gz);
        gz = nullptr;
    }
};

constexpr size_t kBatchBytes = 4u << 20;
constexpr size_t kBatchLines = 8192;
constexpr size_t kQueueDepth = 3;

struct BatchQueue {
    std::deque<Batch*> q;
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
    bool done = false;
    std::atomic<bool> stop{false};

    void push(Batch* b) {
        std::unique_lock<std::mutex> lk(mu);
        cv_push.wait(lk, [&] { return q.size() < kQueueDepth ||
                                       stop.load(); });
        if (stop.load()) { delete b; return; }
        q.push_back(b);
        cv_pop.notify_one();
    }
    void finish() {
        std::lock_guard<std::mutex> lk(mu);
        done = true;
        cv_pop.notify_all();
    }
    Batch* pop() {
        std::unique_lock<std::mutex> lk(mu);
        cv_pop.wait(lk, [&] { return !q.empty() || done; });
        if (q.empty()) return nullptr;
        Batch* b = q.front();
        q.pop_front();
        cv_push.notify_one();
        return b;
    }
    void shutdown() {
        stop.store(true);
        cv_push.notify_all();
        {
            std::lock_guard<std::mutex> lk(mu);
            for (Batch* b : q) delete b;
            q.clear();
        }
        cv_pop.notify_all();
    }
};

// ---------------------------------------------------------------------------
// Record parsing (worker-thread safe: no shared state)

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
            if (have_prev) out.push_back({prev_id, id, prev_rev, rev});
            prev_id = id;
            prev_rev = rev;
            have_prev = true;
        } else {
            ++p;
        }
    }
}

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

struct ParsedRecord {
    bool ok = false;                           // has AT and LV==0
    std::vector<std::vector<EdgeKey>> alleles; // edge keys per allele
    std::vector<int16_t> calls;                // [2*n_samples], -1 missing
    std::vector<uint8_t> carried;              // per allele: any carrier
    std::vector<std::vector<uint32_t>> rows;   // per allele (intern phase)

    void reset() {
        ok = false;
        alleles.clear();
        carried.clear();
        rows.clear();
    }
};

// Parse one data line into `pr` (thread-safe; mutates the line in place).
static void parse_line(char* line, size_t n_samples, ParsedRecord& pr) {
    pr.reset();
    // fields: CHROM POS ID REF ALT QUAL FILTER INFO FORMAT samples...
    char* fields[9];
    char* p = line;
    for (int i = 0; i < 9; ++i) {
        fields[i] = p;
        char* t = strchr(p, '\t');
        if (!t) {
            if (i < 8) return;
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
        if (v != 0) return;  // nested variant: skip
    }
    const char *at, *at_end;
    if (!info_field(info, info_end, "AT", &at, &at_end)) return;

    const char* a = at;
    while (a < at_end) {
        const char* seg_end = (const char*)memchr(a, ',', at_end - a);
        if (!seg_end) seg_end = at_end;
        pr.alleles.emplace_back();
        parse_traversal_keys(a, seg_end, pr.alleles.back());
        a = seg_end + 1;
    }
    int n_alleles = int(pr.alleles.size());
    pr.carried.assign(size_t(n_alleles), 0);
    pr.calls.assign(2 * n_samples, -1);

    size_t si = 0;
    while (*p != '\0' && si < n_samples) {
        int a1, a2;
        char* t;
        // fast path: single-digit diploid "a/b<TAB>"
        if (p[0] >= '0' && p[0] <= '9' && (p[1] == '/' || p[1] == '|') &&
            p[2] >= '0' && p[2] <= '9' &&
            (p[3] == '\t' || p[3] == '\0')) {
            a1 = p[0] - '0';
            a2 = p[2] - '0';
            t = p[3] == '\t' ? p + 3 : nullptr;
        } else {
            t = strchr(p, '\t');
            char* fend = t ? t : p + strlen(p);
            char* colon = (char*)memchr(p, ':', fend - p);
            char* gt_end = colon ? colon : fend;
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
        if (a1 >= 0 && a1 < n_alleles) {
            pr.calls[2 * si] = int16_t(a1);
            pr.carried[size_t(a1)] = 1;
        }
        if (a2 >= 0 && a2 < n_alleles) {
            pr.calls[2 * si + 1] = int16_t(a2);
            pr.carried[size_t(a2)] = 1;
        }
        ++si;
        if (!t) break;
        p = t + 1;
    }
    pr.ok = true;
}

// ---------------------------------------------------------------------------
// Matrix builder (intern serial, fill parallel)

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

struct Reader {
    LineSource src;
    std::vector<std::string> samples;
    BatchQueue queue;
    std::thread producer;
    std::vector<std::string> pending;  // lines of the NEXT chromosome
    bool started = false;

    ~Reader() {
        queue.shutdown();
        if (producer.joinable()) producer.join();
        src.close();
    }

    void start() {
        started = true;
        producer = std::thread([this] {
            Batch* b = new Batch();
            b->text.reserve(kBatchBytes + 65536);
            for (;;) {
                if (queue.stop.load()) { delete b; return; }
                char* line = src.next();
                if (!line) break;
                if (line[0] == '#' || line[0] == '\0') continue;
                size_t len = strlen(line);
                b->offs.push_back(b->text.size());
                b->text.insert(b->text.end(), line, line + len + 1);
                if (b->text.size() >= kBatchBytes ||
                    b->n_lines() >= kBatchLines) {
                    queue.push(b);
                    b = new Batch();
                    b->text.reserve(kBatchBytes + 65536);
                }
            }
            if (b->n_lines()) queue.push(b);
            else delete b;
            queue.finish();
        });
    }
};

struct Chunk {
    uint64_t n_rows = 0, n_cols = 0;
    std::vector<uint8_t> matrix;
    std::vector<uint64_t> edges;  // per row: a_id, a_rev, b_id, b_rev
    std::string chrom;
};

static size_t chrom_len(const char* line) {
    const char* t = strchr(line, '\t');
    return t ? size_t(t - line) : strlen(line);
}

// Parse lines [0, n) of `batch` into `recs` with `nt` threads total.
static void parse_batch(Batch& batch, size_t n, size_t n_samples,
                        std::vector<ParsedRecord>& recs, unsigned nt) {
    recs.resize(n);
    if (nt <= 1 || n < 64) {
        for (size_t i = 0; i < n; ++i)
            parse_line(batch.line_mut(i), n_samples, recs[i]);
        return;
    }
    std::vector<std::thread> threads;
    size_t per = (n + nt - 1) / nt;
    for (unsigned t = 1; t < nt; ++t) {
        size_t lo = t * per, hi = std::min(n, lo + per);
        if (lo >= hi) break;
        threads.emplace_back([&, lo, hi] {
            for (size_t i = lo; i < hi; ++i)
                parse_line(batch.line_mut(i), n_samples, recs[i]);
        });
    }
    for (size_t i = 0; i < std::min(per, n); ++i)
        parse_line(batch.line_mut(i), n_samples, recs[i]);
    for (auto& th : threads) th.join();
}

// Set bits for records [all] over sample range of this thread.
static void fill_range(MatrixBuilder& mb, std::vector<ParsedRecord>& recs,
                       size_t s_lo, size_t s_hi) {
    const uint64_t cols = mb.n_cols;
    uint8_t* data = mb.data.data();
    for (ParsedRecord& pr : recs) {
        if (!pr.ok) continue;
        for (size_t si = s_lo; si < s_hi; ++si) {
            for (int h = 0; h < 2; ++h) {
                int a = pr.calls[2 * si + h];
                if (a < 0) continue;
                const std::vector<uint32_t>& rows = pr.rows[size_t(a)];
                uint64_t col = 2 * si + h;
                for (uint32_t row : rows)
                    data[uint64_t(row) * cols + col] = 1;
            }
        }
    }
}

static void process_records(MatrixBuilder& mb,
                            std::vector<ParsedRecord>& recs,
                            size_t n_samples, unsigned nt) {
    // serial intern in deterministic record/allele order; only alleles
    // with a carrier get rows (push_matrix semantics)
    for (ParsedRecord& pr : recs) {
        if (!pr.ok) continue;
        pr.rows.resize(pr.alleles.size());
        for (size_t a = 0; a < pr.alleles.size(); ++a) {
            if (!pr.carried[a]) continue;
            auto& rows = pr.rows[a];
            rows.reserve(pr.alleles[a].size());
            for (const EdgeKey& k : pr.alleles[a])
                rows.push_back(mb.intern(k));
        }
    }
    // parallel fill over disjoint sample ranges
    if (nt <= 1 || n_samples < 32) {
        fill_range(mb, recs, 0, n_samples);
        return;
    }
    std::vector<std::thread> threads;
    size_t per = (n_samples + nt - 1) / nt;
    for (unsigned t = 1; t < nt; ++t) {
        size_t lo = t * per, hi = std::min(n_samples, lo + per);
        if (lo >= hi) break;
        threads.emplace_back([&, lo, hi] { fill_range(mb, recs, lo, hi); });
    }
    fill_range(mb, recs, 0, std::min(per, n_samples));
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void* stoat_vcf_open(const char* path) {
    Reader* r = new Reader();
    if (!r->src.open(path)) {
        delete r;
        return nullptr;
    }
    // header (synchronous, before the producer thread starts)
    for (;;) {
        char* line = r->src.next();
        if (!line) {
            delete r;
            return nullptr;
        }
        if (strncmp(line, "##", 2) == 0) continue;
        if (strncmp(line, "#CHROM", 6) == 0) {
            int col = 0;
            char* p = line;
            while (p) {
                char* t = strchr(p, '\t');
                if (t) *t = '\0';
                if (col >= 9) r->samples.emplace_back(p);
                p = t ? t + 1 : nullptr;
                ++col;
            }
            r->start();
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
    const unsigned nt = num_threads();
    size_t n_samples = r->samples.size();

    std::string chrom;
    MatrixBuilder mb;
    std::vector<ParsedRecord> recs;
    bool have_chrom = false;
    bool boundary_hit = false;

    // Process one batch: establish/extend the current chromosome, stash
    // any lines beyond the first chromosome change into r->pending.
    auto consume = [&](Batch& b) {
        size_t n = b.n_lines();
        if (n == 0) return;
        if (!have_chrom) {
            chrom.assign(b.line(0), chrom_len(b.line(0)));
            have_chrom = true;
            mb.reset(2 * n_samples, initial_rows);
        }
        size_t boundary = n;
        for (size_t i = 0; i < n; ++i) {
            const char* ln = b.line(i);
            size_t cl = chrom_len(ln);
            if (cl != chrom.size() ||
                memcmp(ln, chrom.data(), cl) != 0) {
                boundary = i;
                break;
            }
        }
        if (boundary < n) {
            boundary_hit = true;
            for (size_t i = boundary; i < n; ++i)
                r->pending.emplace_back(b.line(i));
        }
        parse_batch(b, boundary, n_samples, recs, nt);
        process_records(mb, recs, n_samples, nt);
    };

    // lines stashed from the previous chunk's tail batch first (they may
    // themselves span several tiny chromosomes)
    if (!r->pending.empty()) {
        std::vector<std::string> pending = std::move(r->pending);
        r->pending.clear();
        Batch b;
        for (auto& s : pending) {
            b.offs.push_back(b.text.size());
            b.text.insert(b.text.end(), s.c_str(),
                          s.c_str() + s.size() + 1);
        }
        consume(b);
    }

    while (!boundary_hit) {
        Batch* bp = r->queue.pop();
        if (!bp) break;  // EOF
        consume(*bp);
        delete bp;
    }

    if (!have_chrom) return nullptr;

    Chunk* chunk = new Chunk();
    chunk->chrom = chrom;
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
    delete static_cast<Reader*>(rp);
}

}  // extern "C"
