// Native batch packer: fills static-shape padded hypergraph batches directly
// from the packed (concatenated + offsets) dataset arrays.
//
// This is the host-side hot path of the data loader: for every training step
// the ragged molecules selected for a batch must be copied into padded dense
// buffers with index offsetting and slot-table construction. The pure-Python
// version loops per molecule; this C++ version does the whole batch in one
// call (invoked via ctypes — no pybind11 dependency).
//
// Row packing (pack_slots): several small molecules share one dense slot row
// via first-fit-decreasing assignment, mirroring the Python packer
// (equihgnn_tpu/data/batching.py pad_hypergraph_batch) — ~2x fewer wasted
// slots for the geometric encoders on QM9-like size distributions.
//
// The reference has no first-party native code — its packing is PyG's
// collation inside torch (SURVEY §2.9); this replaces that role.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success, 1 on capacity overflow, 2 on A_max overflow,
// 3 on slot-row overflow (pack_slots).
int pack_hypergraph_batch(
    // packed dataset (concatenated over all samples)
    const int32_t* af, const int64_t* af_off,          // [sum_atoms, 9]
    const int64_t* vi, const int64_t* vi_off,          // [sum_nnz]
    const int64_t* hi, const int64_t* hi_off,          // [sum_nnz]
    const int64_t* hf, const int64_t* hf_off,          // [sum_hedges]
    const float* y,                                    // [n_samples, n_targets]
    int64_t n_targets, int64_t target,                 // column select (-1: y scalar)
    const float* pos,                                  // [sum_atoms, 3] or null
    const int32_t* z,                                  // [sum_atoms] or null
    // batch member list
    const int64_t* members, int64_t n_members,
    // static spec; n_rows == 0 -> per-molecule slot rows (G of them)
    int64_t G, int64_t N, int64_t E, int64_t NNZ, int64_t A, int64_t n_rows,
    // outputs (preallocated, uninitialized)
    int32_t* out_af,        // [N, 9]
    uint8_t* out_amask,     // [N]
    int32_t* out_agid,      // [N]
    int32_t* out_vi,        // [NNZ]
    int32_t* out_hi,        // [NNZ]
    uint8_t* out_imask,     // [NNZ]
    int32_t* out_hf,        // [E]
    uint8_t* out_hmask,     // [E]
    int32_t* out_hgid,      // [E]
    int32_t* out_eord,      // [E]
    float* out_y,           // [G]
    uint8_t* out_gmask,     // [G]
    float* out_pos,         // [N, 3] or null
    int32_t* out_z,         // [N] or null
    int32_t* out_slot_index,  // [R, A] or null   (R = n_rows ? n_rows : G)
    uint8_t* out_slot_mask,   // [R, A] or null
    int32_t* out_slot_gid,    // [R, A] or null
    int32_t* out_atom_slot,   // [N] or null
    int32_t* out_atom_row     // [N] or null
) {
    const int32_t pad_gid = (int32_t)(G - 1);
    const int64_t R = (n_rows > 0) ? n_rows : G;

    // initialize padding values
    std::memset(out_af, 0, sizeof(int32_t) * N * 9);
    std::memset(out_amask, 0, N);
    for (int64_t i = 0; i < N; ++i) out_agid[i] = pad_gid;
    for (int64_t i = 0; i < NNZ; ++i) out_vi[i] = (int32_t)(N - 1);
    for (int64_t i = 0; i < NNZ; ++i) out_hi[i] = (int32_t)(E - 1);
    std::memset(out_imask, 0, NNZ);
    std::memset(out_hf, 0, sizeof(int32_t) * E);
    std::memset(out_hmask, 0, E);
    for (int64_t i = 0; i < E; ++i) out_hgid[i] = pad_gid;
    std::memset(out_eord, 0, sizeof(int32_t) * E);
    std::memset(out_y, 0, sizeof(float) * G);
    std::memset(out_gmask, 0, G);
    if (out_pos) std::memset(out_pos, 0, sizeof(float) * N * 3);
    if (out_z) std::memset(out_z, 0, sizeof(int32_t) * N);
    if (out_slot_index) std::memset(out_slot_index, 0, sizeof(int32_t) * R * A);
    if (out_slot_mask) std::memset(out_slot_mask, 0, R * A);
    if (out_slot_gid)
        for (int64_t i = 0; i < R * A; ++i) out_slot_gid[i] = -1;
    if (out_atom_slot) std::memset(out_atom_slot, 0, sizeof(int32_t) * N);
    if (out_atom_row)
        for (int64_t i = 0; i < N; ++i) out_atom_row[i] = (int32_t)(R - 1);

    // first-fit-decreasing row assignment (pack_slots only)
    std::vector<int64_t> row_of(n_members, 0), start_of(n_members, 0);
    if (out_slot_index && n_rows > 0) {
        std::vector<int64_t> order(n_members);
        for (int64_t g = 0; g < n_members; ++g) order[g] = g;
        std::stable_sort(order.begin(), order.end(), [&](int64_t p, int64_t q) {
            const int64_t np = af_off[members[p] + 1] - af_off[members[p]];
            const int64_t nq = af_off[members[q] + 1] - af_off[members[q]];
            return np > nq;
        });
        std::vector<int64_t> fill(R, 0);
        for (int64_t g : order) {
            const int64_t s = members[g];
            const int64_t na = af_off[s + 1] - af_off[s];
            int64_t r = 0;
            while (r < R && fill[r] + na > A) ++r;
            if (r == R) return 3;
            row_of[g] = r;
            start_of[g] = fill[r];
            fill[r] += na;
        }
    }

    int64_t a0 = 0, e0 = 0, z0 = 0;
    for (int64_t g = 0; g < n_members; ++g) {
        const int64_t s = members[g];
        const int64_t na = af_off[s + 1] - af_off[s];
        const int64_t ne = hf_off[s + 1] - hf_off[s];
        const int64_t nz = vi_off[s + 1] - vi_off[s];
        if (a0 + na > N || e0 + ne > E || z0 + nz > NNZ || g >= G - 1) return 1;
        if (out_slot_index && na > A) return 2;

        std::memcpy(out_af + a0 * 9, af + af_off[s] * 9, sizeof(int32_t) * na * 9);
        std::memset(out_amask + a0, 1, na);
        for (int64_t i = 0; i < na; ++i) out_agid[a0 + i] = (int32_t)g;
        if (out_pos && pos)
            std::memcpy(out_pos + a0 * 3, pos + af_off[s] * 3, sizeof(float) * na * 3);
        if (out_z && z)
            std::memcpy(out_z + a0, z + af_off[s], sizeof(int32_t) * na);
        if (out_slot_index) {
            const int64_t row = (n_rows > 0) ? row_of[g] : g;
            const int64_t s0 = (n_rows > 0) ? start_of[g] : 0;
            for (int64_t i = 0; i < na; ++i) {
                out_slot_index[row * A + s0 + i] = (int32_t)(a0 + i);
                out_slot_mask[row * A + s0 + i] = 1;
                if (out_slot_gid) out_slot_gid[row * A + s0 + i] = (int32_t)g;
                if (out_atom_slot) out_atom_slot[a0 + i] = (int32_t)(s0 + i);
                if (out_atom_row) out_atom_row[a0 + i] = (int32_t)row;
            }
        }

        const int64_t* vsrc = vi + vi_off[s];
        const int64_t* hsrc = hi + hi_off[s];
        for (int64_t i = 0; i < nz; ++i) {
            const int32_t h_local = (int32_t)hsrc[i];
            out_vi[z0 + i] = (int32_t)(vsrc[i] + a0);
            out_hi[z0 + i] = (int32_t)(h_local + e0);
            out_imask[z0 + i] = 1;
            out_eord[e0 + h_local] += 1;
        }
        for (int64_t i = 0; i < ne; ++i) {
            out_hf[e0 + i] = (int32_t)hf[hf_off[s] + i];
            out_hmask[e0 + i] = 1;
            out_hgid[e0 + i] = (int32_t)g;
        }
        out_y[g] = (target >= 0) ? y[s * n_targets + target] : y[s];
        out_gmask[g] = 1;

        a0 += na; e0 += ne; z0 += nz;
    }
    return 0;
}


// Dense slot-incidence tables derived from a packed flat batch: hyperedges
// and incidence entries get per-row slots (flat order within each row), so
// the hypergraph conv runs its reductions as batched one-hot matmuls
// (equihgnn_tpu/nn/hgconv.py). Mirrors batching.incidence_slot_tables —
// the outputs are bit-identical to the numpy derivation.
// Returns 0 on success, 1 on hedge-slot overflow, 2 on incidence-slot
// overflow (callers fall back to the flat segment path).
int build_incidence_slot_tables(
    const int32_t* vertex_idx, const int32_t* hedge_idx,
    const uint8_t* inc_mask, int64_t NNZ,
    const uint8_t* hedge_mask, int64_t E,
    const int32_t* atom_slot,                            // [N]
    const int32_t* hedge_graph_id,                       // [E]
    const int32_t* slot_gid,                             // [R, A]
    int64_t A, int64_t G,
    int64_t R, int64_t He, int64_t Ni,
    int32_t* hedge_row,        // [E]
    int32_t* hedge_slot,       // [E]
    int32_t* hedge_slot_index, // [R, He]
    uint8_t* hedge_slot_mask,  // [R, He]
    int32_t* inc_slot_atom,    // [R, Ni]
    int32_t* inc_slot_hedge,   // [R, Ni]
    uint8_t* inc_slot_mask     // [R, Ni]
) {
    std::memset(hedge_slot, 0, sizeof(int32_t) * E);
    std::memset(hedge_slot_index, 0, sizeof(int32_t) * R * He);
    std::memset(hedge_slot_mask, 0, R * He);
    std::memset(inc_slot_atom, 0, sizeof(int32_t) * R * Ni);
    std::memset(inc_slot_hedge, 0, sizeof(int32_t) * R * Ni);
    std::memset(inc_slot_mask, 0, R * Ni);

    // hedge_row from hedge_graph_id via the slot_gid row table — identical to
    // batching.incidence_slot_tables (a masked-in hyperedge with zero valid
    // incidence entries still lands in its molecule's row).
    std::vector<int32_t> row_of_graph(G, (int32_t)(R - 1));
    for (int64_t r = 0; r < R; ++r)
        for (int64_t a = 0; a < A; ++a) {
            const int32_t g = slot_gid[r * A + a];
            if (g >= 0) row_of_graph[g] = (int32_t)r;
        }
    for (int64_t e = 0; e < E; ++e)
        hedge_row[e] = hedge_mask[e] ? row_of_graph[hedge_graph_id[e]]
                                     : (int32_t)(R - 1);

    std::vector<int64_t> fill(R, 0);
    for (int64_t e = 0; e < E; ++e) {
        if (!hedge_mask[e]) continue;
        const int64_t r = hedge_row[e];
        const int64_t p = fill[r]++;
        if (p >= He) return 1;
        hedge_slot[e] = (int32_t)p;
        hedge_slot_index[r * He + p] = (int32_t)e;
        hedge_slot_mask[r * He + p] = 1;
    }
    std::fill(fill.begin(), fill.end(), 0);
    for (int64_t zi = 0; zi < NNZ; ++zi) {
        if (!inc_mask[zi]) continue;
        const int64_t r = hedge_row[hedge_idx[zi]];
        const int64_t p = fill[r]++;
        if (p >= Ni) return 2;
        inc_slot_atom[r * Ni + p] = atom_slot[vertex_idx[zi]];
        inc_slot_hedge[r * Ni + p] = hedge_slot[hedge_idx[zi]];
        inc_slot_mask[r * Ni + p] = 1;
    }
    return 0;
}

}  // extern "C"
