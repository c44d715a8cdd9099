// stoat-tpu native core: GFA snarl decomposition.
//
// C++17 port of the TPU framework's snarl decomposition
// (stoat_tpu/graph/{gfa,snarls,decompose}.py) — the [native-critical]
// preprocessing stage whose reference counterpart is C++/libbdsg
// (/root/reference/src/snarl_data_t.cpp:417-773).  Mirrors the Python
// implementation's algorithm exactly (side-based separable-pair snarl
// finding, chain construction with series extension, netgraph path
// enumeration with *-collapse, reference-path positions); the Python
// version remains the readable reference and both are pinned equal by
// parity tests.
//
// C ABI: stoat_decompose_gfa(path, refs, thresholds...) returns the
// snarl_analyse.tsv content and the rejects TSV as malloc'd strings.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC graph_core.cpp -o libstoat_graph.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <functional>
#include <map>
#include <optional>
#include <set>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include <cstdio>

namespace {

static unsigned num_threads() {
    const char* env = getenv("STOAT_THREADS");
    if (env) {
        int v = atoi(env);
        if (v >= 1) return unsigned(v);
    }
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? (hw > 16 ? 16 : hw) : 1;
}

using Handle = uint64_t;  // (node_id << 1) | is_reverse

inline Handle make_handle(uint64_t id, bool rev) { return (id << 1) | uint64_t(rev); }
inline uint64_t node_of(Handle h) { return h >> 1; }
inline bool rev_of(Handle h) { return h & 1; }
inline Handle flip(Handle h) { return h ^ 1; }

struct GPath {
    std::string name;
    std::vector<Handle> steps;
    std::string sample;
    bool is_ref = false;
};

struct Graph {
    std::map<uint64_t, uint32_t> node_len;  // ordered (node_ids() sorted)
    std::unordered_map<Handle, std::vector<Handle>> succ;
    std::vector<GPath> paths;

    const std::vector<Handle>& successors(Handle h) const {
        static const std::vector<Handle> kEmpty;
        auto it = succ.find(h);
        return it == succ.end() ? kEmpty : it->second;
    }

    void add_succ(Handle u, Handle v) {
        auto& lst = succ[u];
        if (std::find(lst.begin(), lst.end(), v) == lst.end())
            lst.push_back(v);
    }

    void add_edge(Handle a, Handle b) {
        add_succ(a, b);
        add_succ(flip(b), flip(a));
    }
};

// side key of node m exited by handle (m, o) is (m, o); an entry handle
// (m, o) enters through side (m, !o)
inline Handle entry_side(Handle entry) { return flip(entry); }

// ------------------------------------------------------------------
// GFA parsing (S/L/P/W)
// ------------------------------------------------------------------

static std::vector<std::string> split(const std::string& s, char d) {
    std::vector<std::string> out;
    size_t start = 0;
    for (;;) {
        size_t pos = s.find(d, start);
        if (pos == std::string::npos) {
            out.push_back(s.substr(start));
            break;
        }
        out.push_back(s.substr(start, pos - start));
        start = pos + 1;
    }
    return out;
}

static bool load_gfa(const char* path,
                     const std::set<std::string>& ref_names, Graph& g) {
    FILE* fh = fopen(path, "r");
    if (!fh) return false;
    char* lineptr = nullptr;
    size_t cap = 0;
    ssize_t got;
    std::string line;
    while ((got = getline(&lineptr, &cap, fh)) != -1) {
        line.assign(lineptr, size_t(got));
        while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
            line.pop_back();
        if (line.empty() || line[0] == '#') continue;
        auto f = split(line, '\t');
        if (f[0] == "S" && f.size() >= 3) {
            g.node_len[std::stoull(f[1])] = uint32_t(f[2].size());
        } else if (f[0] == "L" && f.size() >= 5) {
            Handle a = make_handle(std::stoull(f[1]), f[2] == "-");
            Handle b = make_handle(std::stoull(f[3]), f[4] == "-");
            g.add_edge(a, b);
        } else if (f[0] == "P" && f.size() >= 3) {
            GPath p;
            p.name = f[1];
            // PanSN sample#hap#contig
            auto parts = split(f[1], '#');
            p.sample = parts.size() == 3 ? parts[0] : f[1];
            p.is_ref = ref_names.empty() || ref_names.count(f[1]) ||
                       ref_names.count(p.sample);
            for (const auto& step : split(f[2], ',')) {
                if (step.empty()) continue;
                char o = step.back();
                p.steps.push_back(make_handle(
                    std::stoull(step.substr(0, step.size() - 1)), o == '-'));
            }
            g.paths.push_back(std::move(p));
        } else if (f[0] == "W" && f.size() >= 7) {
            GPath p;
            p.sample = f[1];
            p.name = f[1] + "#" + f[2] + "#" + f[3];
            p.is_ref = ref_names.count(f[1]) > 0;
            const std::string& walk = f[6];
            size_t i = 0;
            while (i < walk.size()) {
                char c = walk[i];
                if (c == '>' || c == '<') {
                    bool rev = c == '<';
                    size_t j = ++i;
                    while (i < walk.size() && isdigit(walk[i])) ++i;
                    p.steps.push_back(make_handle(
                        std::stoull(walk.substr(j, i - j)), rev));
                } else {
                    ++i;
                }
            }
            g.paths.push_back(std::move(p));
        }
    }
    free(lineptr);
    fclose(fh);
    return true;
}

// ------------------------------------------------------------------
// Snarl finding (mirror of stoat_tpu/graph/snarls.py)
// ------------------------------------------------------------------

struct Snarl {
    Handle start, end;
    std::set<uint64_t> interior;   // ordered for determinism
    int parent = -1;
    std::vector<int> children;
    int depth = 1;
};

struct Forest {
    std::vector<Snarl> snarls;
    std::vector<std::vector<int>> chains;
    std::unordered_map<int, std::vector<int>> chains_by_parent;  // parent (-2 = none/root)
};

constexpr int kMaxExitTries = 64;
constexpr size_t kMaxInterior = 50000;

struct PairResult {
    std::set<uint64_t> interior;
    Handle end_handle;
};

static std::optional<PairResult> test_pair(const Graph& g, Handle a,
                                           uint64_t b_node, size_t budget) {
    uint64_t a_node = node_of(a);
    Handle a_inside = a;  // side key == handle
    if (b_node == a_node) return std::nullopt;

    std::set<uint64_t> U;
    std::set<Handle> b_faces;
    std::deque<uint64_t> queue;

    for (Handle v : g.successors(a)) {
        uint64_t m = node_of(v);
        if (m == a_node) {
            if (entry_side(v) != a_inside) return std::nullopt;
            continue;
        }
        if (m == b_node) {
            b_faces.insert(entry_side(v));
            if (b_faces.size() > 1) return std::nullopt;
            continue;
        }
        queue.push_back(m);
    }

    while (!queue.empty()) {
        uint64_t u = queue.front();
        queue.pop_front();
        if (U.count(u)) continue;
        U.insert(u);
        if (U.size() > budget || U.size() > kMaxInterior) return std::nullopt;
        for (int o = 0; o < 2; ++o) {
            Handle side = make_handle(u, o);
            for (Handle v : g.successors(side)) {
                uint64_t m = node_of(v);
                if (m == a_node) {
                    if (entry_side(v) != a_inside) return std::nullopt;
                    continue;
                }
                if (m == b_node) {
                    b_faces.insert(entry_side(v));
                    if (b_faces.size() > 1) return std::nullopt;
                    continue;
                }
                if (!U.count(m)) queue.push_back(m);
            }
        }
    }

    if (b_faces.size() != 1) return std::nullopt;
    Handle b_inside = *b_faces.begin();

    auto ok_inside = [&](Handle side, Handle own_inside, uint64_t other_node,
                         Handle other_inside) {
        for (Handle v : g.successors(side)) {
            uint64_t m = node_of(v);
            Handle es = entry_side(v);
            if (U.count(m)) continue;
            if (m == node_of(side) && es == own_inside) continue;
            if (m == other_node && es == other_inside) continue;
            return false;
        }
        return true;
    };
    auto ok_outside = [&](Handle side, uint64_t other_node,
                          Handle other_inside) {
        for (Handle v : g.successors(side)) {
            uint64_t m = node_of(v);
            Handle es = entry_side(v);
            if (U.count(m)) return false;
            if (m == other_node && es == other_inside) return false;
        }
        return true;
    };

    Handle a_outside = flip(a_inside);
    Handle b_outside = flip(b_inside);
    if (!ok_inside(a_inside, a_inside, b_node, b_inside)) return std::nullopt;
    if (!ok_inside(b_inside, b_inside, a_node, a_inside)) return std::nullopt;
    if (!ok_outside(a_outside, b_node, b_inside)) return std::nullopt;
    if (!ok_outside(b_outside, a_node, a_inside)) return std::nullopt;
    if (U.empty() && g.successors(a).size() < 2) return std::nullopt;

    return PairResult{std::move(U), b_outside};
}

struct FindResult {
    uint64_t b;
    std::set<uint64_t> interior;
    Handle end_handle;
};

static std::optional<FindResult> find_snarl_from(
        const Graph& g, Handle a, const std::set<uint64_t>& forbidden,
        int max_tries) {
    std::vector<uint64_t> order;
    std::set<uint64_t> seen{node_of(a)};
    for (Handle v : g.successors(a)) {
        uint64_t m = node_of(v);
        if (!seen.count(m)) {
            seen.insert(m);
            order.push_back(m);
        }
    }
    int tried = 0;
    size_t qi = 0;
    while (qi < order.size() && tried < max_tries) {
        uint64_t b = order[qi++];
        ++tried;
        auto res = test_pair(g, a, b, 16 * order.size() + 64);
        if (res) {
            bool bad = false;
            for (uint64_t n : res->interior)
                if (forbidden.count(n)) { bad = true; break; }
            if (!bad) return FindResult{b, std::move(res->interior),
                                        res->end_handle};
        }
        for (int o = 0; o < 2; ++o) {
            for (Handle v : g.successors(make_handle(b, o))) {
                uint64_t m = node_of(v);
                if (!seen.count(m)) {
                    seen.insert(m);
                    order.push_back(m);
                }
            }
        }
    }
    return std::nullopt;
}

// nodes in nontrivial SCCs of the orientation digraph (or with self
// edges): the only places a single-successor entrance can open a snarl
static std::set<uint64_t> cyclic_nodes(const Graph& g) {
    std::unordered_map<Handle, int> index, lowlink;
    std::unordered_set<Handle> on_stack;
    std::vector<Handle> stack;
    int counter = 0;
    std::set<uint64_t> cyclic;

    std::vector<Handle> vertices;
    for (const auto& [nid, _len] : g.node_len)
        for (int o = 0; o < 2; ++o) vertices.push_back(make_handle(nid, o));

    for (Handle root : vertices) {
        if (index.count(root)) continue;
        std::vector<std::pair<Handle, size_t>> work{{root, 0}};
        index[root] = lowlink[root] = counter++;
        stack.push_back(root);
        on_stack.insert(root);
        while (!work.empty()) {
            auto& [v, pos] = work.back();
            bool advanced = false;
            const auto& succs = g.successors(v);
            while (pos < succs.size()) {
                Handle w = succs[pos++];
                if (w == v) {
                    cyclic.insert(node_of(v));
                } else if (!index.count(w)) {
                    index[w] = lowlink[w] = counter++;
                    stack.push_back(w);
                    on_stack.insert(w);
                    work.push_back({w, 0});
                    advanced = true;
                    break;
                } else if (on_stack.count(w)) {
                    lowlink[v] = std::min(lowlink[v], index[w]);
                }
            }
            if (advanced) continue;
            Handle v2 = work.back().first;
            work.pop_back();
            if (!work.empty()) {
                Handle parent = work.back().first;
                lowlink[parent] = std::min(lowlink[parent], lowlink[v2]);
            }
            if (lowlink[v2] == index[v2]) {
                std::vector<Handle> comp;
                for (;;) {
                    Handle w = stack.back();
                    stack.pop_back();
                    on_stack.erase(w);
                    comp.push_back(w);
                    if (w == v2) break;
                }
                if (comp.size() > 1)
                    for (Handle w : comp) cyclic.insert(node_of(w));
            }
        }
    }
    return cyclic;
}

static Forest find_snarls(const Graph& g) {
    // candidates in sorted node order, orientation False then True
    std::set<uint64_t> cyclic = cyclic_nodes(g);
    std::vector<std::pair<Handle, int>> candidates;
    for (const auto& [nid, _len] : g.node_len) {
        for (int o = 0; o < 2; ++o) {
            Handle h = make_handle(nid, o);
            const auto& succs = g.successors(h);
            if (succs.size() >= 2) {
                candidates.push_back({h, kMaxExitTries});
            } else if (succs.size() == 1) {
                Handle entered = entry_side(succs[0]);
                if (cyclic.count(node_of(succs[0])) &&
                    g.successors(entered).size() >= 2)
                    candidates.push_back({h, 8});
            }
        }
    }

    std::unordered_map<uint64_t, int> ref_order;
    for (const auto& p : g.paths) {
        if (p.is_ref) {
            int rank = 0;
            for (Handle st : p.steps)
                ref_order.emplace(node_of(st), rank++);
            break;
        }
    }
    if (ref_order.empty() && !g.paths.empty()) {
        int rank = 0;
        for (Handle st : g.paths[0].steps)
            ref_order.emplace(node_of(st), rank++);
    }

    // reference-path termini only (sample paths may end mid-graph)
    std::set<uint64_t> forbidden;
    bool any_ref = false;
    for (const auto& p : g.paths) any_ref = any_ref || p.is_ref;
    for (const auto& p : g.paths) {
        if ((any_ref && !p.is_ref) || p.steps.empty()) continue;
        forbidden.insert(node_of(p.steps.front()));
        forbidden.insert(node_of(p.steps.back()));
    }

    // key = (unordered node pair, interior set) — serialize to string
    struct Chosen { Handle a; Handle end; std::set<uint64_t> U; };
    std::map<std::string, Chosen> chosen;
    std::vector<std::string> insertion_order;
    auto key_of = [](uint64_t x, uint64_t y, const std::set<uint64_t>& U) {
        if (x > y) std::swap(x, y);
        std::ostringstream oss;
        oss << x << "_" << y << ":";
        for (uint64_t n : U) oss << n << ",";
        return oss.str();
    };
    auto ref_of = [&](uint64_t n) -> std::optional<int> {
        auto it = ref_order.find(n);
        if (it == ref_order.end()) return std::nullopt;
        return it->second;
    };

    for (auto& [a, tries] : candidates) {
        auto res = find_snarl_from(g, a, forbidden, tries);
        if (!res) continue;
        std::string key = key_of(node_of(a), res->b, res->interior);
        auto it = chosen.find(key);
        if (it != chosen.end()) {
            Handle s0 = it->second.a;
            auto rs = ref_of(node_of(a));
            auto rt = ref_of(res->b);
            auto r0 = ref_of(node_of(s0));
            if (rs && rt && *rs <= *rt &&
                (!r0 || *r0 > *rs || node_of(s0) != node_of(a))) {
                it->second = Chosen{a, res->end_handle, res->interior};
            }
            continue;
        }
        chosen.emplace(key, Chosen{a, res->end_handle,
                                   std::move(res->interior)});
        insertion_order.push_back(key);
    }

    Forest forest;
    for (const auto& key : insertion_order) {
        auto& c = chosen.at(key);
        Handle a = c.a, end = c.end;
        auto rs = ref_of(node_of(a));
        auto rt = ref_of(node_of(end));
        if (rs && rt && *rs > *rt) {
            Handle na = flip(end), ne = flip(a);
            a = na;
            end = ne;
        }
        Snarl s;
        s.start = a;
        s.end = end;
        s.interior = c.U;
        forest.snarls.push_back(std::move(s));
    }

    // nesting via node -> containing-snarl index
    std::unordered_map<uint64_t, std::vector<int>> containing;
    for (size_t j = 0; j < forest.snarls.size(); ++j)
        for (uint64_t n : forest.snarls[j].interior)
            containing[n].push_back(int(j));
    for (size_t i = 0; i < forest.snarls.size(); ++i) {
        Snarl& si = forest.snarls[i];
        const auto* c1 = containing.count(node_of(si.start))
                             ? &containing[node_of(si.start)] : nullptr;
        const auto* c2 = containing.count(node_of(si.end))
                             ? &containing[node_of(si.end)] : nullptr;
        if (!c1 || !c2) continue;
        std::set<int> s1(c1->begin(), c1->end());
        int best = -1;
        size_t best_size = 0;
        for (int j : *c2) {
            if (j == int(i) || !s1.count(j)) continue;
            size_t size = forest.snarls[j].interior.size();
            if (best == -1 || size < best_size ||
                (size == best_size && j < best)) {
                best = j;
                best_size = size;
            }
        }
        if (best >= 0) {
            si.parent = best;
            forest.snarls[best].children.push_back(int(i));
        }
    }
    // depths (iterative)
    for (size_t i = 0; i < forest.snarls.size(); ++i) {
        if (forest.snarls[i].parent != -1) continue;
        std::vector<std::pair<int, int>> stack{{int(i), 1}};
        while (!stack.empty()) {
            auto [j, d] = stack.back();
            stack.pop_back();
            forest.snarls[j].depth = d;
            for (int c : forest.snarls[j].children) stack.push_back({c, d + 1});
        }
    }

    // chains: iterate parents in snarl-index order of first appearance
    std::vector<int> parent_order;
    std::map<int, std::vector<int>> by_parent;
    for (size_t i = 0; i < forest.snarls.size(); ++i) {
        int p = forest.snarls[i].parent;
        if (!by_parent.count(p)) parent_order.push_back(p);
        by_parent[p].push_back(int(i));
    }
    for (int p : parent_order) {
        auto& sibs = by_parent[p];
        std::map<uint64_t, int> by_start, by_end;
        for (int i : sibs) {
            by_start[node_of(forest.snarls[i].start)] = i;
            by_end[node_of(forest.snarls[i].end)] = i;
        }
        std::set<int> used;
        for (int i : sibs) {
            if (used.count(i)) continue;
            std::deque<int> chain{i};
            used.insert(i);
            int cur = i;
            for (;;) {
                auto it = by_start.find(node_of(forest.snarls[cur].end));
                if (it == by_start.end() || used.count(it->second)) break;
                chain.push_back(it->second);
                used.insert(it->second);
                cur = it->second;
            }
            cur = i;
            for (;;) {
                auto it = by_end.find(node_of(forest.snarls[cur].start));
                if (it == by_end.end() || used.count(it->second)) break;
                chain.push_front(it->second);
                used.insert(it->second);
                cur = it->second;
            }
            std::vector<int> cv(chain.begin(), chain.end());
            forest.chains_by_parent[forest.snarls[cv[0]].parent]
                .push_back(int(forest.chains.size()));
            forest.chains.push_back(std::move(cv));
        }
    }
    return forest;
}

// ------------------------------------------------------------------
// Netgraph view + path enumeration (mirror of decompose.py)
// ------------------------------------------------------------------

struct ChainUnit {
    std::vector<int> snarl_ids;
    std::vector<uint64_t> node_ids;
    Handle left, right;
    int n_children = 0;
    bool two_plain() const {
        return snarl_ids.empty() && n_children == 2;
    }
};

struct SnarlReject {
    std::string reason;
};

struct EnumResult {
    std::vector<std::string> pretty;
    std::vector<std::string> types;
    std::vector<std::pair<long, long>> lens;
    bool rejected = false;
    std::string reject_reason;
};

struct Decomposer {
    const Graph& g;
    Forest& forest;
    std::unordered_map<int, std::pair<long, long>> min_max_cache;

    Decomposer(const Graph& g_, Forest& f_) : g(g_), forest(f_) {}

    std::string handle_str(Handle h) const {
        return (rev_of(h) ? "<" : ">") + std::to_string(node_of(h));
    }

    std::pair<long, long> snarl_min_max(int si);

    EnumResult enumerate_paths(int snarl_idx, long children_threshold,
                               long path_length_threshold,
                               long cycle_threshold);
};

struct NetView {
    std::set<uint64_t> hidden;
    std::vector<ChainUnit> units;
    std::map<Handle, std::pair<int, bool>> chain_entry;  // unit idx, reversed

    NetView(Decomposer& d, int snarl_idx) {
        const Graph& g = d.g;
        Forest& forest = d.forest;
        const Snarl& snarl = forest.snarls[snarl_idx];
        std::set<uint64_t> interior = snarl.interior;
        std::set<uint64_t> bounds{node_of(snarl.start), node_of(snarl.end)};

        std::vector<ChainUnit> base_chains;
        auto it = forest.chains_by_parent.find(snarl_idx);
        if (it != forest.chains_by_parent.end()) {
            for (int cid : it->second) {
                const auto& chain = forest.chains[cid];
                ChainUnit u;
                for (size_t k = 0; k < chain.size(); ++k) {
                    const Snarl& s = forest.snarls[chain[k]];
                    for (uint64_t n : s.interior) hidden.insert(n);
                    hidden.insert(node_of(s.start));
                    hidden.insert(node_of(s.end));
                    if (k == 0) u.node_ids.push_back(node_of(s.start));
                    u.node_ids.push_back(node_of(s.end));
                }
                u.snarl_ids = chain;
                u.left = forest.snarls[chain.front()].start;
                u.right = forest.snarls[chain.back()].end;
                u.n_children = int(chain.size() + u.node_ids.size());
                base_chains.push_back(std::move(u));
            }
        }

        std::set<uint64_t> consumed;
        auto series_next = [&](Handle h) -> std::optional<Handle> {
            const auto& succs = g.successors(h);
            if (succs.size() != 1) return std::nullopt;
            Handle v = succs[0];
            uint64_t m = node_of(v);
            if (bounds.count(m) || !interior.count(m) || hidden.count(m) ||
                consumed.count(m))
                return std::nullopt;
            Handle es = entry_side(v);
            if (g.successors(es).size() != 1) return std::nullopt;
            return v;
        };

        bool changed = true;
        while (changed) {
            changed = false;
            for (auto& unit : base_chains) {
                auto v = series_next(unit.right);
                if (v) {
                    unit.node_ids.push_back(node_of(*v));
                    unit.right = *v;
                    unit.n_children += 1;
                    consumed.insert(node_of(*v));
                    changed = true;
                }
                auto vl = series_next(flip(unit.left));
                if (vl) {
                    unit.node_ids.insert(unit.node_ids.begin(), node_of(*vl));
                    unit.left = flip(*vl);
                    unit.n_children += 1;
                    consumed.insert(node_of(*vl));
                    changed = true;
                }
            }
            bool merged_any = true;
            while (merged_any) {
                merged_any = false;
                for (size_t i1 = 0; i1 < base_chains.size(); ++i1) {
                    auto& u1 = base_chains[i1];
                    const auto& nxts = g.successors(u1.right);
                    if (nxts.size() != 1) continue;
                    for (size_t i2 = 0; i2 < base_chains.size(); ++i2) {
                        if (i1 == i2 || nxts[0] != base_chains[i2].left)
                            continue;
                        Handle es = entry_side(base_chains[i2].left);
                        if (g.successors(es).size() != 1) continue;
                        auto& u2 = base_chains[i2];
                        u1.snarl_ids.insert(u1.snarl_ids.end(),
                                            u2.snarl_ids.begin(),
                                            u2.snarl_ids.end());
                        u1.node_ids.insert(u1.node_ids.end(),
                                           u2.node_ids.begin(),
                                           u2.node_ids.end());
                        u1.right = u2.right;
                        u1.n_children += u2.n_children;
                        base_chains.erase(base_chains.begin() + i2);
                        merged_any = true;
                        changed = true;
                        break;
                    }
                    if (merged_any) break;
                }
            }
        }

        // pure-node chains (sorted plain nodes)
        std::vector<uint64_t> plain;
        for (uint64_t m : interior)
            if (!hidden.count(m) && !consumed.count(m)) plain.push_back(m);
        for (uint64_t m : plain) {
            if (consumed.count(m)) continue;
            for (int o = 0; o < 2; ++o) {
                Handle h = make_handle(m, o);
                if (series_next(flip(h))) continue;  // not a run start
                std::vector<uint64_t> run{m};
                consumed.insert(m);
                Handle cur = h;
                for (;;) {
                    auto v = series_next(cur);
                    if (!v) break;
                    run.push_back(node_of(*v));
                    consumed.insert(node_of(*v));
                    cur = *v;
                }
                if (run.size() >= 2) {
                    ChainUnit u;
                    u.node_ids = run;
                    u.left = h;
                    u.right = cur;
                    u.n_children = int(run.size());
                    base_chains.push_back(std::move(u));
                } else {
                    consumed.erase(m);
                }
                break;
            }
        }

        units = std::move(base_chains);
        for (size_t ui = 0; ui < units.size(); ++ui) {
            chain_entry[units[ui].left] = {int(ui), false};
            chain_entry[flip(units[ui].right)] = {int(ui), true};
            for (uint64_t n : units[ui].node_ids) hidden.insert(n);
        }
    }
};

std::pair<long, long> Decomposer::snarl_min_max(int si) {
    auto it = min_max_cache.find(si);
    if (it != min_max_cache.end()) return it->second;
    auto res = enumerate_paths(si, 1L << 40, 1000000, 1);
    std::pair<long, long> out{0, 0};
    if (!res.rejected && !res.lens.empty()) {
        long mn = res.lens[0].first, mx = res.lens[0].second;
        for (auto& l : res.lens) {
            mn = std::min(mn, l.first);
            mx = std::max(mx, l.second);
        }
        out = {mn, mx};
    }
    min_max_cache[si] = out;
    return out;
}

struct PathElem {
    bool is_chain;
    Handle handle;     // node handle, or chain entry handle
    int unit = -1;
    bool rev = false;
    Handle exit = 0;
};

EnumResult Decomposer::enumerate_paths(int snarl_idx, long children_threshold,
                                       long path_length_threshold,
                                       long cycle_threshold) {
    EnumResult out;
    NetView view(*this, snarl_idx);
    const Snarl& snarl = forest.snarls[snarl_idx];
    Handle start = snarl.start, end = snarl.end;
    std::set<uint64_t> allowed = snarl.interior;
    allowed.insert(node_of(start));
    allowed.insert(node_of(end));

    long visible = 0;
    for (uint64_t n : snarl.interior)
        if (!view.hidden.count(n)) ++visible;
    long n_children = visible + long(view.units.size());
    if (n_children > children_threshold) {
        out.rejected = true;
        out.reject_reason = "too_many_children = " +
            std::to_string(n_children) + " children";
        return out;
    }

    std::vector<std::vector<PathElem>> finished;
    std::vector<std::vector<PathElem>> stack;
    stack.push_back({PathElem{false, start}});
    long itr = 0;
    while (!stack.empty()) {
        auto path = std::move(stack.back());
        stack.pop_back();
        // cycle detection
        std::map<std::tuple<bool, uint64_t, bool>, int> occ;
        bool cycle = false;
        for (const auto& el : path) {
            auto key = el.is_chain
                ? std::make_tuple(true, uint64_t(el.unit), el.rev)
                : std::make_tuple(false, el.handle, false);
            if (++occ[key] > cycle_threshold + 1) {
                cycle = true;
                break;
            }
        }
        if (++itr > path_length_threshold) {
            out.rejected = true;
            out.reject_reason = "iteration_calculation_out = " +
                std::to_string(n_children) + " children";
            return out;
        }
        if (cycle) continue;  // over-threshold loops drop entirely
        Handle cur = path.back().is_chain ? path.back().exit
                                          : path.back().handle;
        for (Handle nxt : g.successors(cur)) {
            if (node_of(nxt) == node_of(end) && nxt == end) {
                if (node_of(nxt) != node_of(start) || path.size() > 1) {
                    auto fin = path;
                    fin.push_back(PathElem{false, nxt});
                    finished.push_back(std::move(fin));
                }
                continue;
            }
            if (!allowed.count(node_of(nxt)) ||
                node_of(nxt) == node_of(end) ||
                node_of(nxt) == node_of(start))
                continue;
            auto ce = view.chain_entry.find(nxt);
            if (ce != view.chain_entry.end()) {
                auto [ui, rv] = ce->second;
                const ChainUnit& u = view.units[ui];
                PathElem el;
                el.is_chain = true;
                el.unit = ui;
                el.rev = rv;
                if (!rv) {
                    el.handle = u.left;
                    el.exit = u.right;
                } else {
                    el.handle = flip(u.right);
                    el.exit = flip(u.left);
                }
                auto np = path;
                np.push_back(el);
                stack.push_back(std::move(np));
            } else if (view.hidden.count(node_of(nxt))) {
                continue;
            } else {
                auto np = path;
                np.push_back(PathElem{false, nxt});
                stack.push_back(std::move(np));
            }
        }
    }

    // render
    struct Rendered {
        std::vector<Handle> walk;
        std::string str;
        long mn, mx;
        int n_parts;
    };
    std::vector<Rendered> rendered;
    for (const auto& path : finished) {
        Rendered r;
        r.mn = r.mx = 0;
        long inner = 0;
        for (size_t i = 0; i < path.size(); ++i) {
            const auto& el = path[i];
            if (!el.is_chain) {
                r.walk.push_back(el.handle);
                if (i > 0 && i + 1 < path.size())
                    inner += g.node_len.at(node_of(el.handle));
            } else {
                const ChainUnit& u = view.units[el.unit];
                long cmn = 0, cmx = 0;
                for (int si : u.snarl_ids) {
                    auto [a, b] = snarl_min_max(si);
                    cmn += a;
                    cmx += b;
                }
                for (uint64_t n : u.node_ids) {
                    cmn += g.node_len.at(n);
                    cmx += g.node_len.at(n);
                }
                r.walk.push_back(el.handle);
                if (!u.two_plain()) {
                    r.walk.push_back(make_handle(0, false));
                } else {
                    // reference double-counts 2-node chains (see the
                    // Python twin); pinned by its loop_double unit test
                    r.mn += cmn;
                    r.mx += cmx;
                }
                r.walk.push_back(el.exit);
                r.mn += cmn;
                r.mx += cmx;
            }
        }
        r.mn += inner;
        r.mx += inner;
        r.n_parts = int(r.walk.size());
        std::string s;
        for (Handle h : r.walk) s += handle_str(h);
        r.str = std::move(s);
        rendered.push_back(std::move(r));
    }

    // deterministic order: by walk [(id, rev)...] then string
    std::sort(rendered.begin(), rendered.end(),
              [](const Rendered& x, const Rendered& y) {
                  if (x.walk != y.walk) return x.walk < y.walk;
                  return x.str < y.str;
              });

    for (const auto& r : rendered) {
        out.pretty.push_back(r.str);
        out.lens.push_back({r.mn, r.mx});
        if (r.n_parts >= 3) {
            out.types.push_back(
                r.mn != r.mx ? std::to_string(r.mn) + "/" + std::to_string(r.mx)
                             : std::to_string(r.mn));
        } else if (r.n_parts == 2) {
            out.types.push_back("0");
        } else {
            out.types.push_back("NA");
        }
    }
    return out;
}

// ------------------------------------------------------------------
// Full decomposition to TSV (mirror of decompose_graph)
// ------------------------------------------------------------------

struct DecomposeOutput {
    std::string tsv;
    std::string rejects;
    bool ok = true;
    std::string error;
};

static DecomposeOutput decompose(const Graph& g,
                                 const std::set<std::string>& ref_chr,
                                 long children_threshold,
                                 long path_length_threshold,
                                 long cycle_threshold) {
    DecomposeOutput out;
    Graph& gm = const_cast<Graph&>(g);
    Forest forest = find_snarls(g);
    Decomposer d(g, forest);

    // reference offsets per ref path (first visit)
    std::vector<std::pair<std::string, std::unordered_map<uint64_t, long>>>
        ref_offsets;
    for (const auto& p : g.paths) {
        bool candidate = ref_chr.empty()
            ? p.is_ref
            : (ref_chr.count(p.name) || ref_chr.count(p.sample));
        if (!candidate) continue;
        std::unordered_map<uint64_t, long> offs;
        long pos = 0;
        for (Handle st : p.steps) {
            offs.emplace(node_of(st), pos);
            pos += g.node_len.at(node_of(st));
        }
        ref_offsets.push_back({p.name, std::move(offs)});
    }

    auto node_position = [&](uint64_t nid)
        -> std::optional<std::tuple<std::string, long, long>> {
        for (const auto& [chrom, offs] : ref_offsets) {
            auto it = offs.find(nid);
            if (it != offs.end()) {
                long pos = it->second;
                return std::make_tuple(chrom, pos + long(g.node_len.at(nid)),
                                       pos + 1);
            }
        }
        return std::nullopt;
    };

    auto sort_key = [&](int i) -> long {
        auto p = node_position(node_of(forest.snarls[i].start));
        return p ? std::get<1>(*p) : (1L << 60);
    };

    // resolve positions with parent inheritance (memoized)
    std::unordered_map<int, std::tuple<std::string, long, long, bool>> positions;
    std::function<std::tuple<std::string, long, long, bool>(int)> resolve =
        [&](int i) -> std::tuple<std::string, long, long, bool> {
        auto it = positions.find(i);
        if (it != positions.end()) return it->second;
        const Snarl& s = forest.snarls[i];
        auto p1 = node_position(node_of(s.end));
        auto p2 = node_position(node_of(s.start));
        std::tuple<std::string, long, long, bool> res;
        if (!p1 && !p2) {
            if (s.parent != -1) {
                auto [chrom, a, b, _r] = resolve(s.parent);
                res = {chrom, a, b, false};
            } else {
                res = {"", 0, 0, false};
            }
        } else if (!p1 || !p2) {
            auto& p = p1 ? p1 : p2;
            res = {std::get<0>(*p), std::get<1>(*p), std::get<2>(*p), true};
        } else {
            if (std::get<1>(*p1) < std::get<1>(*p2))
                res = {std::get<0>(*p1), std::get<1>(*p1), std::get<2>(*p2),
                       true};
            else
                res = {std::get<0>(*p1), std::get<1>(*p2), std::get<2>(*p1),
                       true};
        }
        positions[i] = res;
        return res;
    };

    // tree order: top-level sorted by ref position (stable), DFS pre-order
    std::vector<int> order;
    std::function<void(int)> visit = [&](int i) {
        order.push_back(i);
        std::vector<int> kids = forest.snarls[i].children;
        std::stable_sort(kids.begin(), kids.end(), [&](int x, int y) {
            return sort_key(x) < sort_key(y);
        });
        for (int c : kids) visit(c);
    };
    std::vector<int> tops;
    for (size_t i = 0; i < forest.snarls.size(); ++i)
        if (forest.snarls[i].parent == -1) tops.push_back(int(i));
    std::stable_sort(tops.begin(), tops.end(), [&](int x, int y) {
        return sort_key(x) < sort_key(y);
    });
    for (int i : tops) visit(i);

    std::ostringstream tsv, rej;
    tsv << "CHR\tSTART_POS\tEND_POS\tSNARL_HANDLEGRAPH\tSNARL\tPATHS\tTYPE\t"
           "REF\tDEPTH\n";
    rej << "SNARL\tREASON\n";

    // Per-snarl path enumeration is embarrassingly parallel (the
    // reference's `#pragma omp parallel for` over snarls,
    // snarl_data_t.cpp:667); enumerate into per-index results with
    // per-thread Decomposers (each owns its min/max cache; Graph and
    // Forest are read-only here), then write serially in tree order so
    // output is byte-identical for any thread count.
    std::vector<EnumResult> results(order.size());
    const unsigned nt = num_threads();
    if (nt > 1 && order.size() > 8) {
        std::atomic<size_t> next{0};
        auto work = [&] {
            Decomposer dl(g, forest);
            size_t k;
            while ((k = next.fetch_add(1)) < order.size())
                results[k] = dl.enumerate_paths(
                    order[k], children_threshold, path_length_threshold,
                    cycle_threshold);
        };
        std::vector<std::thread> threads;
        for (unsigned t = 1; t < nt; ++t) threads.emplace_back(work);
        work();
        for (auto& th : threads) th.join();
    } else {
        for (size_t k = 0; k < order.size(); ++k)
            results[k] = d.enumerate_paths(order[k], children_threshold,
                                           path_length_threshold,
                                           cycle_threshold);
    }

    long n_paths_total = 0;
    for (size_t k = 0; k < order.size(); ++k) {
        int i = order[k];
        const Snarl& s = forest.snarls[i];
        std::string sid = std::to_string(node_of(s.start)) + "_" +
                          std::to_string(node_of(s.end));
        EnumResult& res = results[k];
        if (res.rejected) {
            rej << sid << "\t" << res.reject_reason << "\n";
            continue;
        }
        if (res.pretty.size() < 2) continue;
        auto [chrom, start_pos, end_pos1, on_ref] = resolve(i);
        if (chrom.empty()) continue;
        tsv << chrom << "\t" << start_pos << "\t" << (end_pos1 - 1) << "\t"
            << i << "\t" << sid << "\t";
        for (size_t k = 0; k < res.pretty.size(); ++k) {
            if (k) tsv << ",";
            tsv << res.pretty[k];
        }
        tsv << "\t";
        for (size_t k = 0; k < res.types.size(); ++k) {
            if (k) tsv << ",";
            tsv << res.types[k];
        }
        tsv << "\t" << (on_ref ? "1" : "0") << "\t" << s.depth << "\n";
        n_paths_total += long(res.pretty.size());
    }

    if (n_paths_total == 0) {
        out.ok = false;
        out.error = "Total number of paths = 0";
        return out;
    }
    out.tsv = tsv.str();
    out.rejects = rej.str();
    (void)gm;
    return out;
}

}  // namespace

extern "C" {

// returns 0 on success; caller frees *tsv_out and *rejects_out with
// stoat_free_str
int stoat_decompose_gfa(const char* gfa_path, const char* ref_names_csv,
                        long children_threshold, long path_length_threshold,
                        long cycle_threshold, char** tsv_out,
                        char** rejects_out, char** error_out) {
    std::set<std::string> refs;
    if (ref_names_csv && *ref_names_csv) {
        std::string csv = ref_names_csv;
        size_t start = 0;
        for (;;) {
            size_t pos = csv.find(',', start);
            std::string tok = csv.substr(
                start, pos == std::string::npos ? std::string::npos
                                                : pos - start);
            if (!tok.empty()) refs.insert(tok);
            if (pos == std::string::npos) break;
            start = pos + 1;
        }
    }
    Graph g;
    if (!load_gfa(gfa_path, refs, g)) {
        *error_out = strdup("could not open GFA");
        return 1;
    }
    auto res = decompose(g, refs, children_threshold, path_length_threshold,
                         cycle_threshold);
    if (!res.ok) {
        *error_out = strdup(res.error.c_str());
        return 2;
    }
    *tsv_out = strdup(res.tsv.c_str());
    *rejects_out = strdup(res.rejects.c_str());
    return 0;
}

// Decompose a graph handed over as flat arrays — the natively-loaded
// binary formats (.hg/.pg/.gbz readers in Python) feed the C++ core
// directly instead of round-tripping through a temporary GFA file.
//
//   node_ids/node_lens: [N] parallel arrays
//   succ_pairs:         [n_succ, 2] packed handles ((id<<1)|rev) — the
//                       EXACT successor lists of the loaded graph, in
//                       order (edge symmetry already materialized), so
//                       enumeration order matches the Python twin
//   steps:              [T] packed handles, concatenated per path
//   path_offsets:       [P+1]
//   names/samples:      '\0'-joined blobs, P entries each
//   is_ref:             [P]
int stoat_decompose_arrays(
        const uint64_t* node_ids, const uint32_t* node_lens,
        uint64_t n_nodes, const uint64_t* succ_pairs, uint64_t n_succ,
        const uint64_t* steps, const uint64_t* path_offsets,
        uint64_t n_paths, const char* names_blob, const char* samples_blob,
        const uint8_t* is_ref, long children_threshold,
        long path_length_threshold, long cycle_threshold, char** tsv_out,
        char** rejects_out, char** error_out) {
    Graph g;
    for (uint64_t i = 0; i < n_nodes; ++i)
        g.node_len[node_ids[i]] = node_lens[i];
    for (uint64_t i = 0; i < n_succ; ++i)
        g.succ[succ_pairs[2 * i]].push_back(succ_pairs[2 * i + 1]);
    const char* name_p = names_blob;
    const char* sample_p = samples_blob;
    for (uint64_t p = 0; p < n_paths; ++p) {
        GPath gp;
        gp.name = name_p;
        name_p += gp.name.size() + 1;
        gp.sample = sample_p;
        sample_p += gp.sample.size() + 1;
        gp.is_ref = is_ref[p] != 0;
        for (uint64_t t = path_offsets[p]; t < path_offsets[p + 1]; ++t)
            gp.steps.push_back(steps[t]);
        g.paths.push_back(std::move(gp));
    }
    std::set<std::string> refs;  // is_ref is already resolved per path
    auto res = decompose(g, refs, children_threshold,
                         path_length_threshold, cycle_threshold);
    if (!res.ok) {
        *error_out = strdup(res.error.c_str());
        return 2;
    }
    *tsv_out = strdup(res.tsv.c_str());
    *rejects_out = strdup(res.rejects.c_str());
    return 0;
}

void stoat_free_str(char* s) { free(s); }


// ---------------------------------------------------------------------------
// Graph-mode walk-set partitioning (production native core).
//
// The per-snarl sample partitioning of PathPartitioner::get_walk_sets
// (/root/reference/src/partitioner.cpp:36-268) for REGULAR snarls: refine
// sample paths by the ordered tuple of outgoing edges each path takes
// from the snarl's start bound.  Runs parallel over snarls with a shared
// node->steps index; group order preserves first appearance by path
// index (the Python partitioner's set-id order, so GROUP_PATHS columns
// match byte-for-byte).
//
// Outputs (malloc'd, caller frees with stoat_free_str/free):
//   part_offs u64[n_snarls+1]  — partition ranges per snarl
//   n_case    u32[total_parts] — distinct case samples per partition
//   n_ctrl    u32[total_parts] — distinct control samples per partition
//   rep       i32[total_parts] — smallest sample id in the partition
//                                (callers order ids lexicographically)
// Returns total partition count, or -1.
long stoat_graph_partitions(
        const uint64_t* steps, const int64_t* offsets, long n_paths,
        const int32_t* path_sample, long n_samples,
        const uint64_t* start_handles, long n_snarls,
        const uint8_t* sample_case, long threads,
        uint64_t** part_offs_out, uint32_t** case_out,
        uint32_t** ctrl_out, int32_t** rep_out) {
    // node id -> [(path, step)] index, like handlegraph's step index
    std::unordered_map<uint64_t,
                       std::vector<std::pair<int32_t, int32_t>>> node_steps;
    for (long p = 0; p < n_paths; ++p)
        for (int64_t i = offsets[p]; i < offsets[p + 1]; ++i)
            node_steps[steps[i] >> 1].push_back(
                {int32_t(p), int32_t(i - offsets[p])});

    struct SnarlParts {
        std::vector<uint32_t> n_case, n_ctrl;
        std::vector<int32_t> rep;
    };
    std::vector<SnarlParts> results((size_t(n_snarls)));

    unsigned nt = threads >= 1 ? unsigned(threads) : num_threads();
    if (nt < 1) nt = 1;
    std::atomic<long> next{0};
    auto worker = [&]() {
        // per-thread scratch
        std::vector<std::vector<std::pair<int32_t, uint64_t>>> per_path;
        std::vector<int32_t> touched;
        std::map<std::vector<uint64_t>, int32_t> group_of;
        for (;;) {
            long s = next.fetch_add(1);
            if (s >= n_snarls) return;
            uint64_t h = start_handles[s];
            auto it = node_steps.find(h >> 1);
            if (it == node_steps.end()) continue;
            uint64_t orient = h & 1;

            if (per_path.size() < size_t(n_paths))
                per_path.resize(size_t(n_paths));
            touched.clear();
            for (const auto& ps : it->second) {
                int32_t p = ps.first, si = ps.second;
                int64_t base = offsets[p];
                uint64_t st = steps[base + si];
                bool go_fwd = (st & 1) == orient;
                int64_t j = go_fwd ? si + 1 : si - 1;
                if (j < 0 || base + j >= offsets[p + 1]) continue;
                if (per_path[p].empty()) touched.push_back(p);
                per_path[p].push_back({si, steps[base + j]});
            }
            std::sort(touched.begin(), touched.end());

            group_of.clear();
            SnarlParts& out = results[size_t(s)];
            std::vector<std::vector<int32_t>> members;
            std::vector<uint64_t> key;
            for (int32_t p : touched) {
                auto& cr = per_path[p];
                std::sort(cr.begin(), cr.end());
                key.clear();
                for (const auto& e : cr) key.push_back(e.second);
                auto ins = group_of.emplace(key, int32_t(members.size()));
                if (ins.second) members.emplace_back();
                members[size_t(ins.first->second)].push_back(p);
                cr.clear();
            }
            // distinct-sample case/control counts + smallest sample id
            std::set<int32_t> samples;
            for (auto& m : members) {
                samples.clear();
                for (int32_t p : m) samples.insert(path_sample[p]);
                uint32_t c1 = 0;
                for (int32_t sm : samples)
                    if (sample_case[sm]) ++c1;
                out.n_case.push_back(c1);
                out.n_ctrl.push_back(uint32_t(samples.size()) - c1);
                out.rep.push_back(*samples.begin());
            }
        }
    };
    std::vector<std::thread> pool;
    for (unsigned t = 1; t < nt; ++t) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();

    uint64_t total = 0;
    for (const auto& r : results) total += r.n_case.size();
    uint64_t* poffs = (uint64_t*)malloc((size_t(n_snarls) + 1) * 8);
    uint32_t* pc = (uint32_t*)malloc(total * 4 + 4);
    uint32_t* pt = (uint32_t*)malloc(total * 4 + 4);
    int32_t* pr = (int32_t*)malloc(total * 4 + 4);
    if (!poffs || !pc || !pt || !pr) return -1;
    uint64_t at = 0;
    for (long s = 0; s < n_snarls; ++s) {
        poffs[s] = at;
        const auto& r = results[size_t(s)];
        for (size_t i = 0; i < r.n_case.size(); ++i, ++at) {
            pc[at] = r.n_case[i];
            pt[at] = r.n_ctrl[i];
            pr[at] = r.rep[i];
        }
    }
    poffs[n_snarls] = at;
    *part_offs_out = poffs;
    *case_out = pc;
    *ctrl_out = pt;
    *rep_out = pr;
    return long(total);
}


}  // extern "C"
