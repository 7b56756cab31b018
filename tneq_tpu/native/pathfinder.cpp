// Contraction-path optimizer for einsum networks.
//
// Native replacement for the host-side path search the reference leaves to
// opt_einsum's Python 'greedy'/'auto' (compile-time hot for large circuits:
// the siamese network of an N-core QCTN has 2N+2*nqubits+nqubits operands —
// SURVEY.md flags the path search at qctn-build time as a hot spot).
//
// Algorithm: greedy pairwise contraction. At each step pick the feasible
// pair (sharing at least one contractible index; outer products deferred)
// that minimizes  size(result) - size(a) - size(b),  tie-broken by fewer
// flops — the same objective class as opt_einsum's greedy, in C++ with
// bitset index arithmetic. Emits an opt_einsum-style path: a sequence of
// (i, j) position pairs into the shrinking operand list.
//
// C ABI (ctypes):
//   int tneq_find_path(
//       int n_ops,
//       const int* op_offsets,   // n_ops+1 prefix offsets into op_symbols
//       const int* op_symbols,   // concatenated symbol ids per operand
//       const double* sym_sizes, // size per symbol id (n_syms)
//       int n_syms,
//       const int* out_symbols, int n_out,
//       int* path_out)           // 2*(n_ops-1) ints, (i, j) pairs
// Returns 0 on success.

#include <algorithm>
#include <cstdint>
#include <cmath>
#include <vector>

namespace {

struct Operand {
    std::vector<uint64_t> mask;  // bitset over symbols
    double size;                 // product of symbol sizes
};

inline bool get_bit(const std::vector<uint64_t>& m, int s) {
    return (m[s >> 6] >> (s & 63)) & 1ull;
}
inline void set_bit(std::vector<uint64_t>& m, int s) {
    m[s >> 6] |= 1ull << (s & 63);
}

double mask_size(const std::vector<uint64_t>& m, const double* sym_sizes,
                 int n_syms) {
    double sz = 1.0;
    for (int s = 0; s < n_syms; ++s)
        if (get_bit(m, s)) sz *= sym_sizes[s];
    return sz;
}

}  // namespace

extern "C" int tneq_find_path(int n_ops, const int* op_offsets,
                              const int* op_symbols, const double* sym_sizes,
                              int n_syms, const int* out_symbols, int n_out,
                              int* path_out) {
    if (n_ops < 1 || n_syms < 1) return 1;
    const int words = (n_syms + 63) / 64;

    // per-symbol operand reference counts (a symbol contracts away once no
    // other remaining operand nor the output uses it)
    std::vector<int> refcount(n_syms, 0);
    std::vector<uint64_t> out_mask(words, 0);
    for (int i = 0; i < n_out; ++i) {
        set_bit(out_mask, out_symbols[i]);
        refcount[out_symbols[i]] += 1;  // output counts as a user
    }

    std::vector<Operand> ops;
    ops.reserve(n_ops);
    for (int i = 0; i < n_ops; ++i) {
        Operand op;
        op.mask.assign(words, 0);
        for (int k = op_offsets[i]; k < op_offsets[i + 1]; ++k) {
            int s = op_symbols[k];
            if (s < 0 || s >= n_syms) return 2;
            if (!get_bit(op.mask, s)) refcount[s] += 1;
            set_bit(op.mask, s);
        }
        op.size = mask_size(op.mask, sym_sizes, n_syms);
        ops.push_back(std::move(op));
    }

    auto result_mask = [&](const Operand& a, const Operand& b) {
        // union of indices, minus those used ONLY by a and b (refcount 2)
        std::vector<uint64_t> u(words);
        for (int w = 0; w < words; ++w) u[w] = a.mask[w] | b.mask[w];
        std::vector<uint64_t> r(words, 0);
        for (int s = 0; s < n_syms; ++s) {
            if (!get_bit(u, s)) continue;
            int users = refcount[s];
            int in_a = get_bit(a.mask, s), in_b = get_bit(b.mask, s);
            if (users - in_a - in_b > 0) set_bit(r, s);
        }
        return r;
    };

    int step = 0;
    while ((int)ops.size() > 1) {
        int best_i = -1, best_j = -1;
        double best_gain = 0.0, best_flops = 0.0;
        bool found = false;
        const int n = (int)ops.size();
        for (int i = 0; i < n; ++i) {
            for (int j = i + 1; j < n; ++j) {
                bool shares = false;
                for (int w = 0; w < words; ++w)
                    if (ops[i].mask[w] & ops[j].mask[w]) { shares = true; break; }
                if (!shares && n > 2) continue;  // defer outer products
                auto rmask = result_mask(ops[i], ops[j]);
                double rsize = mask_size(rmask, sym_sizes, n_syms);
                double gain = rsize - ops[i].size - ops[j].size;
                // flops ~ product over union of indices
                std::vector<uint64_t> u(words);
                for (int w = 0; w < words; ++w)
                    u[w] = ops[i].mask[w] | ops[j].mask[w];
                double flops = mask_size(u, sym_sizes, n_syms);
                if (!found || gain < best_gain ||
                    (gain == best_gain && flops < best_flops)) {
                    found = true;
                    best_gain = gain;
                    best_flops = flops;
                    best_i = i;
                    best_j = j;
                }
            }
        }
        if (!found) {  // only outer products remain (n == 2 handled above)
            best_i = 0;
            best_j = 1;
        }

        // record, merge, update refcounts
        path_out[2 * step] = best_i;
        path_out[2 * step + 1] = best_j;
        ++step;

        Operand& a = ops[best_i];
        Operand& b = ops[best_j];
        auto rmask = result_mask(a, b);
        // symbols in a or b lose one user each; symbols in result gain one
        for (int s = 0; s < n_syms; ++s) {
            if (get_bit(a.mask, s)) refcount[s] -= 1;
            if (get_bit(b.mask, s)) refcount[s] -= 1;
            if (get_bit(rmask, s)) refcount[s] += 1;
        }
        Operand merged;
        merged.mask = std::move(rmask);
        merged.size = mask_size(merged.mask, sym_sizes, n_syms);
        // remove j first (j > i), then i; append merged
        ops.erase(ops.begin() + best_j);
        ops.erase(ops.begin() + best_i);
        ops.push_back(std::move(merged));
    }
    return 0;
}

// Optimal pairwise-contraction order by bitmask dynamic programming over
// operand subsets (Held-Karp style).  cost[S] = min over nonempty proper
// subsets L of S of cost[L] + cost[S\L] + flops(contract(L, S\L)).
// Exponential in n_ops — callers cap n_ops (<= ~16).  Emits the same
// opt_einsum-style (i, j) position-pair path as tneq_find_path.
extern "C" int tneq_find_path_dp(int n_ops, const int* op_offsets,
                                 const int* op_symbols, const double* sym_sizes,
                                 int n_syms, const int* out_symbols, int n_out,
                                 int* path_out) {
    if (n_ops < 1 || n_ops > 20 || n_syms < 1) return 1;
    const int words = (n_syms + 63) / 64;
    const uint32_t FULL = (n_ops == 32) ? 0xFFFFFFFFu
                                        : ((1u << n_ops) - 1u);

    std::vector<int> refcount(n_syms, 0);
    for (int i = 0; i < n_out; ++i) refcount[out_symbols[i]] += 1;
    std::vector<std::vector<uint64_t>> op_masks(n_ops,
                                                std::vector<uint64_t>(words, 0));
    for (int i = 0; i < n_ops; ++i) {
        for (int k = op_offsets[i]; k < op_offsets[i + 1]; ++k) {
            int s = op_symbols[k];
            if (s < 0 || s >= n_syms) return 2;
            if (!get_bit(op_masks[i], s)) refcount[s] += 1;
            set_bit(op_masks[i], s);
        }
    }

    const uint32_t n_sets = FULL + 1u;
    // per-subset: union of symbols, result (kept) symbols, best cost, split
    std::vector<std::vector<uint64_t>> uni(n_sets,
                                           std::vector<uint64_t>(words, 0));
    std::vector<std::vector<uint64_t>> res(n_sets,
                                           std::vector<uint64_t>(words, 0));
    std::vector<double> cost(n_sets, 1e300);
    std::vector<uint32_t> split(n_sets, 0);

    // kept symbols of subset S: used outside S (by other operands or output)
    auto compute_sets = [&](uint32_t S) {
        std::vector<uint64_t> u(words, 0);
        std::vector<int> inner(n_syms, 0);
        for (int i = 0; i < n_ops; ++i) {
            if (!(S >> i & 1)) continue;
            for (int w = 0; w < words; ++w) u[w] |= op_masks[i][w];
            for (int s = 0; s < n_syms; ++s)
                if (get_bit(op_masks[i], s)) inner[s] += 1;
        }
        uni[S] = u;
        std::vector<uint64_t> r(words, 0);
        for (int s = 0; s < n_syms; ++s) {
            if (!get_bit(u, s)) continue;
            if (refcount[s] - inner[s] > 0) set_bit(r, s);
        }
        res[S] = std::move(r);
    };

    for (uint32_t S = 1; S <= FULL; ++S) {
        compute_sets(S);
        if (!(S & (S - 1))) {  // singleton
            cost[S] = 0.0;
            continue;
        }
        // iterate proper submasks
        for (uint32_t L = (S - 1) & S; L; L = (L - 1) & S) {
            uint32_t R = S & ~L;
            if (L < R) continue;  // each split once
            if (cost[L] >= 1e300 || cost[R] >= 1e300) continue;
            // cost of this pairwise step: product over the union of the
            // two subtrees' OPEN (result) index sets — interior indices
            // were contracted within the subtrees already
            std::vector<uint64_t> ru(words);
            for (int w = 0; w < words; ++w)
                ru[w] = res[L][w] | res[R][w];
            double flops = mask_size(ru, sym_sizes, n_syms);
            double c = cost[L] + cost[R] + flops;
            if (c < cost[S]) {
                cost[S] = c;
                split[S] = L;
            }
        }
    }

    // reconstruct: post-order emit of (i, j) position pairs in a simulated
    // shrinking operand list (contracted result appended at the end)
    std::vector<std::pair<uint32_t, uint32_t>> merges;
    // DFS: children before parent
    {
        std::vector<uint32_t> visit = {FULL};
        std::vector<uint32_t> post;
        while (!visit.empty()) {
            uint32_t S = visit.back();
            visit.pop_back();
            post.push_back(S);
            if (S & (S - 1)) {  // not singleton
                visit.push_back(split[S]);
                visit.push_back(S & ~split[S]);
            }
        }
        for (auto it = post.rbegin(); it != post.rend(); ++it)
            if (*it & (*it - 1)) merges.push_back({split[*it], *it & ~split[*it]});
    }
    // simulate the operand list as subsets
    std::vector<uint32_t> live;
    for (int i = 0; i < n_ops; ++i) live.push_back(1u << i);
    int step = 0;
    for (auto& m : merges) {
        int i_pos = -1, j_pos = -1;
        for (int p = 0; p < (int)live.size(); ++p) {
            if (live[p] == m.first) i_pos = p;
            else if (live[p] == m.second) j_pos = p;
        }
        if (i_pos < 0 || j_pos < 0) return 3;
        int a = std::min(i_pos, j_pos), b = std::max(i_pos, j_pos);
        path_out[2 * step] = a;
        path_out[2 * step + 1] = b;
        ++step;
        uint32_t merged = m.first | m.second;
        live.erase(live.begin() + b);
        live.erase(live.begin() + a);
        live.push_back(merged);
    }
    return 0;
}

// Batched variant: amortizes ctypes overhead when scoring many candidate
// networks (genetic search cost model).  Returns total estimated flops of
// the greedy path per network.
extern "C" int tneq_path_cost(int n_ops, const int* op_offsets,
                              const int* op_symbols, const double* sym_sizes,
                              int n_syms, const int* out_symbols, int n_out,
                              double* cost_out) {
    std::vector<int> path(2 * std::max(1, n_ops - 1));
    int rc = tneq_find_path(n_ops, op_offsets, op_symbols, sym_sizes, n_syms,
                            out_symbols, n_out, path.data());
    if (rc != 0) return rc;
    // replay to accumulate flops
    const int words = (n_syms + 63) / 64;
    std::vector<int> refcount(n_syms, 0);
    std::vector<uint64_t> out_mask(words, 0);
    for (int i = 0; i < n_out; ++i) {
        set_bit(out_mask, out_symbols[i]);
        refcount[out_symbols[i]] += 1;
    }
    std::vector<Operand> ops;
    for (int i = 0; i < n_ops; ++i) {
        Operand op;
        op.mask.assign(words, 0);
        for (int k = op_offsets[i]; k < op_offsets[i + 1]; ++k) {
            int s = op_symbols[k];
            if (!get_bit(op.mask, s)) refcount[s] += 1;
            set_bit(op.mask, s);
        }
        op.size = mask_size(op.mask, sym_sizes, n_syms);
        ops.push_back(std::move(op));
    }
    double total = 0.0;
    for (int st = 0; st + 1 < n_ops; ++st) {
        int i = path[2 * st], j = path[2 * st + 1];
        Operand& a = ops[i];
        Operand& b = ops[j];
        std::vector<uint64_t> u(words);
        for (int w = 0; w < words; ++w) u[w] = a.mask[w] | b.mask[w];
        total += mask_size(u, sym_sizes, n_syms);
        std::vector<uint64_t> r(words, 0);
        for (int s = 0; s < n_syms; ++s) {
            if (!get_bit(u, s)) continue;
            int users = refcount[s];
            int in_a = get_bit(a.mask, s), in_b = get_bit(b.mask, s);
            if (users - in_a - in_b > 0) set_bit(r, s);
        }
        for (int s = 0; s < n_syms; ++s) {
            if (get_bit(a.mask, s)) refcount[s] -= 1;
            if (get_bit(b.mask, s)) refcount[s] -= 1;
            if (get_bit(r, s)) refcount[s] += 1;
        }
        Operand merged;
        merged.mask = std::move(r);
        merged.size = mask_size(merged.mask, sym_sizes, n_syms);
        ops.erase(ops.begin() + j);
        ops.erase(ops.begin() + i);
        ops.push_back(std::move(merged));
    }
    *cost_out = total;
    return 0;
}
