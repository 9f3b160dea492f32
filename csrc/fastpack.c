/* fastpack: native batch-packing kernels for the host input pipeline.
 *
 * The TPU-side framework consumes fixed-shape padded batches; turning
 * ragged columnar molecule data into padded [B, A] arrays is the hottest
 * host-side loop (the analog of the reference's apsw/C SQLite layer +
 * PyG collation). These kernels do the gather+pad in one pass over
 * contiguous buffers, called via ctypes from nabladft_tpu.data.fastpack.
 *
 * Layout contracts (little-endian, contiguous):
 *   z_cat:      int32  [total_atoms]
 *   pos_cat:    float32[total_atoms, 3]
 *   forces_cat: float32[total_atoms, 3]
 *   offsets:    int64  [n_molecules + 1]
 *   indices:    int64  [batch_size_real]   (molecule ids to pack)
 * Outputs are caller-allocated, zero-filled by this function.
 */

#include <stdint.h>
#include <string.h>

void pack_energy_batch(
    const int32_t *z_cat,
    const float *pos_cat,
    const float *forces_cat,
    const float *energy_all,
    const int64_t *offsets,
    const int64_t *indices,
    int64_t n_real,
    int64_t batch_size,
    int64_t max_atoms,
    /* outputs */
    int32_t *z_out,        /* [batch_size, max_atoms] */
    float *pos_out,        /* [batch_size, max_atoms, 3] */
    float *forces_out,     /* [batch_size, max_atoms, 3] */
    uint8_t *node_mask,    /* [batch_size, max_atoms] */
    uint8_t *graph_mask,   /* [batch_size] */
    float *energy_out      /* [batch_size] */
) {
    memset(z_out, 0, sizeof(int32_t) * batch_size * max_atoms);
    memset(pos_out, 0, sizeof(float) * batch_size * max_atoms * 3);
    memset(forces_out, 0, sizeof(float) * batch_size * max_atoms * 3);
    memset(node_mask, 0, sizeof(uint8_t) * batch_size * max_atoms);
    memset(graph_mask, 0, sizeof(uint8_t) * batch_size);
    memset(energy_out, 0, sizeof(float) * batch_size);

    for (int64_t slot = 0; slot < n_real; ++slot) {
        const int64_t mol = indices[slot];
        const int64_t a0 = offsets[mol];
        int64_t n = offsets[mol + 1] - a0;
        if (n > max_atoms) n = max_atoms;

        memcpy(z_out + slot * max_atoms, z_cat + a0, sizeof(int32_t) * n);
        memcpy(pos_out + slot * max_atoms * 3, pos_cat + a0 * 3,
               sizeof(float) * n * 3);
        memcpy(forces_out + slot * max_atoms * 3, forces_cat + a0 * 3,
               sizeof(float) * n * 3);
        memset(node_mask + slot * max_atoms, 1, (size_t)n);
        graph_mask[slot] = 1;
        energy_out[slot] = energy_all[mol];
    }
}

/* Pad a list of square float32 matrices (flattened back to back with given
 * per-matrix sizes) into a [batch, O, O] block with an orbital mask. Used
 * by the Hamiltonian-task collator. */
void pack_square_matrices(
    const float *mats_cat,     /* concat of row-major norb_i x norb_i blocks */
    const int64_t *sizes,      /* [n_real] per-matrix norb */
    int64_t n_real,
    int64_t batch_size,
    int64_t max_orb,
    float *out,                /* [batch_size, max_orb, max_orb] */
    uint8_t *orb_mask          /* [batch_size, max_orb] */
) {
    memset(out, 0, sizeof(float) * batch_size * max_orb * max_orb);
    memset(orb_mask, 0, sizeof(uint8_t) * batch_size * max_orb);
    int64_t src = 0;
    for (int64_t slot = 0; slot < n_real; ++slot) {
        const int64_t n = sizes[slot];
        for (int64_t r = 0; r < n && r < max_orb; ++r) {
            memcpy(out + (slot * max_orb + r) * max_orb, mats_cat + src + r * n,
                   sizeof(float) * (n < max_orb ? n : max_orb));
        }
        memset(orb_mask + slot * max_orb, 1, (size_t)(n < max_orb ? n : max_orb));
        src += n * n;
    }
}
