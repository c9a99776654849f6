/* C ABI of the kzg_tpu framework: drop-in c-kzg-4844 surface.
 *
 * Struct layouts and function signatures mirror ethereum/c-kzg-4844 (as
 * also exposed by rust-kzg's c_bindings --
 * /root/reference/kzg/src/eth/c_bindings.rs:16-113,
 * /root/reference/blst/src/eip_4844.rs:163-501). The implementation embeds
 * CPython and dispatches to the kzg_tpu package (TPU compute path where a
 * device is attached, native C++ host core otherwise).
 */
#ifndef CKZG_TPU_H
#define CKZG_TPU_H

#include <stdint.h>
#include <stdio.h>
#include <stdbool.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

#define BYTES_PER_BLOB_ 131072
#define BYTES_PER_CELL_ 2048
#define CELLS_PER_EXT_BLOB_ 128

typedef enum {
    C_KZG_OK = 0,
    C_KZG_BADARGS = 1,
    C_KZG_ERROR = 2,
    C_KZG_MALLOC = 3,
} C_KZG_RET;

typedef struct { uint8_t bytes[32]; } Bytes32;
typedef struct { uint8_t bytes[48]; } Bytes48;
typedef struct { uint8_t bytes[BYTES_PER_BLOB_]; } Blob;
typedef struct { uint8_t bytes[48]; } KZGCommitment;
typedef struct { uint8_t bytes[48]; } KZGProof;
typedef struct { uint8_t bytes[BYTES_PER_CELL_]; } Cell;

/* blst-layout value types for the settings arrays (opaque to most callers;
 * laid out exactly as blst_fr / blst_p1 / blst_p2). */
typedef struct { uint64_t l[4]; } ckzg_fr;
typedef struct { uint64_t x[6], y[6], z[6]; } ckzg_p1;
typedef struct { uint64_t x[12], y[12], z[12]; } ckzg_p2;
typedef struct { uint64_t x[6], y[6]; } ckzg_p1_affine;

/* Field-for-field mirror of c-kzg-4844's CKZGSettings
 * (c_bindings.rs:56-108). */
typedef struct {
    ckzg_fr *roots_of_unity;          /* 8193 elements */
    ckzg_fr *brp_roots_of_unity;      /* 8192 elements */
    ckzg_fr *reverse_roots_of_unity;  /* 8193 elements */
    ckzg_p1 *g1_values_monomial;      /* 4096 */
    ckzg_p1 *g1_values_lagrange_brp;  /* 4096 */
    ckzg_p2 *g2_values_monomial;      /* 65 */
    ckzg_p1 **x_ext_fft_columns;      /* 128 columns x 64 points */
    ckzg_p1_affine **tables;          /* fixed-base MSM tables (NULL here:
                                         precompute lives on-device) */
    size_t wbits;
    size_t scratch_size;
} CKZGSettings;

C_KZG_RET load_trusted_setup(
    CKZGSettings *out,
    const uint8_t *g1_monomial_bytes, uint64_t num_g1_monomial_bytes,
    const uint8_t *g1_lagrange_bytes, uint64_t num_g1_lagrange_bytes,
    const uint8_t *g2_monomial_bytes, uint64_t num_g2_monomial_bytes,
    uint64_t precompute);

C_KZG_RET load_trusted_setup_file(CKZGSettings *out, FILE *in, uint64_t precompute);

void free_trusted_setup(CKZGSettings *s);

C_KZG_RET blob_to_kzg_commitment(KZGCommitment *out, const Blob *blob, const CKZGSettings *s);

C_KZG_RET compute_kzg_proof(
    KZGProof *proof_out, Bytes32 *y_out,
    const Blob *blob, const Bytes32 *z_bytes, const CKZGSettings *s);

C_KZG_RET compute_blob_kzg_proof(
    KZGProof *out, const Blob *blob, const Bytes48 *commitment_bytes,
    const CKZGSettings *s);

C_KZG_RET verify_kzg_proof(
    bool *ok,
    const Bytes48 *commitment_bytes, const Bytes32 *z_bytes,
    const Bytes32 *y_bytes, const Bytes48 *proof_bytes, const CKZGSettings *s);

C_KZG_RET verify_blob_kzg_proof(
    bool *ok,
    const Blob *blob, const Bytes48 *commitment_bytes,
    const Bytes48 *proof_bytes, const CKZGSettings *s);

C_KZG_RET verify_blob_kzg_proof_batch(
    bool *ok,
    const Blob *blobs, const Bytes48 *commitments_bytes,
    const Bytes48 *proofs_bytes, uint64_t n, const CKZGSettings *s);

C_KZG_RET compute_cells_and_kzg_proofs(
    Cell *cells, KZGProof *proofs, const Blob *blob, const CKZGSettings *s);

C_KZG_RET recover_cells_and_kzg_proofs(
    Cell *recovered_cells, KZGProof *recovered_proofs,
    const uint64_t *cell_indices, const Cell *cells, uint64_t num_cells,
    const CKZGSettings *s);

C_KZG_RET verify_cell_kzg_proof_batch(
    bool *ok,
    const Bytes48 *commitments_bytes, const uint64_t *cell_indices,
    const Cell *cells, const Bytes48 *proofs_bytes, uint64_t num_cells,
    const CKZGSettings *s);

/* Fiat-Shamir challenge for cell batch verification; challenge_out is a
 * blst-layout Montgomery-form scalar (rust-kzg exports this per backend,
 * blst/src/eip_7594.rs:30-97). commitment_bytes are the DEDUPLICATED
 * commitments; commitment_indices maps each cell to its slot. */
C_KZG_RET compute_verify_cell_kzg_proof_batch_challenge(
    ckzg_fr *challenge_out,
    const Bytes48 *commitment_bytes, uint64_t num_commitments,
    const uint64_t *commitment_indices, const uint64_t *cell_indices,
    const Cell *cells, const Bytes48 *proofs_bytes, uint64_t num_cells);

#ifdef __cplusplus
}
#endif

#endif /* CKZG_TPU_H */
