/* C-side integration test for libckzg_tpu.so: a C caller loads the mainnet
 * trusted setup and runs blob -> commit -> prove -> verify -> batch verify,
 * plus the error-handling breadth the reference exercises in
 * kzg-bench/src/tests/c_bindings.rs:65-649 (null pointers, wrong byte
 * lengths, invalid/malformed setup points, wrong setup form, malformed
 * setup files, invalid blobs, zero/infinity special cases) and the
 * EIP-7594 index/length validation from kzg/src/eth/c_bindings.rs:133-354.
 *
 * Usage: test_c_abi <trusted_setup.txt>
 */
#include "ckzg_tpu.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int failures = 0;
#define CHECK(cond, msg)                              \
    do {                                              \
        if (!(cond)) {                                \
            printf("FAIL: %s\n", msg);                \
            failures++;                               \
        } else {                                      \
            printf("ok: %s\n", msg);                  \
        }                                             \
    } while (0)

enum { N_G1 = 4096, N_G2 = 65 };
static uint8_t g1_lagrange[N_G1 * 48];
static uint8_t g1_monomial[N_G1 * 48];
static uint8_t g2_monomial[N_G2 * 96];

static int hex_decode(const char *hex, uint8_t *out, size_t n) {
    for (size_t i = 0; i < n; i++) {
        unsigned v;
        if (sscanf(hex + 2 * i, "%2x", &v) != 1) return -1;
        out[i] = (uint8_t)v;
    }
    return 0;
}

/* Parse trusted_setup.txt (format: eip_4844.rs:151-228 -- counts, then
 * n_g1 Lagrange G1, n_g2 monomial G2, n_g1 monomial G1; all hex). */
static int parse_setup(const char *path) {
    FILE *f = fopen(path, "r");
    if (!f) return -1;
    int n1 = 0, n2 = 0;
    if (fscanf(f, "%d %d", &n1, &n2) != 2 || n1 != N_G1 || n2 != N_G2) {
        fclose(f);
        return -1;
    }
    char tok[512];
    for (int i = 0; i < N_G1; i++) {
        if (fscanf(f, "%511s", tok) != 1 || strlen(tok) != 96 ||
            hex_decode(tok, g1_lagrange + i * 48, 48) != 0)
            goto bad;
    }
    for (int i = 0; i < N_G2; i++) {
        if (fscanf(f, "%511s", tok) != 1 || strlen(tok) != 192 ||
            hex_decode(tok, g2_monomial + i * 96, 96) != 0)
            goto bad;
    }
    for (int i = 0; i < N_G1; i++) {
        if (fscanf(f, "%511s", tok) != 1 || strlen(tok) != 96 ||
            hex_decode(tok, g1_monomial + i * 48, 48) != 0)
            goto bad;
    }
    fclose(f);
    return 0;
bad:
    fclose(f);
    return -1;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s trusted_setup.txt\n", argv[0]);
        return 2;
    }
    if (parse_setup(argv[1]) != 0) {
        fprintf(stderr, "cannot parse %s\n", argv[1]);
        return 2;
    }

    /* ---- load_trusted_setup error matrix ----
     * (parity: c_bindings.rs:99-341) */
    CKZGSettings s;
    memset(&s, 0, sizeof s);
    CHECK(load_trusted_setup(NULL, NULL, 0, NULL, 0, NULL, 0, 0) == C_KZG_BADARGS,
          "load_trusted_setup(NULL) -> BADARGS");

    uint8_t junk[96] = {0};
    CHECK(load_trusted_setup(&s, junk, 96, junk, 96, junk, 96, 0) == C_KZG_BADARGS,
          "load_trusted_setup(truncated) -> BADARGS");

    /* wrong G1 byte length: one point short (c_bindings.rs:99-146) */
    CHECK(load_trusted_setup(&s, g1_monomial, (N_G1 - 1) * 48, g1_lagrange,
                             N_G1 * 48, g2_monomial, N_G2 * 96,
                             0) == C_KZG_BADARGS,
          "invalid g1 byte length -> BADARGS");

    /* wrong G2 byte length (c_bindings.rs:198-245) */
    CHECK(load_trusted_setup(&s, g1_monomial, N_G1 * 48, g1_lagrange, N_G1 * 48,
                             g2_monomial, (N_G2 - 1) * 96, 0) == C_KZG_BADARGS,
          "invalid g2 byte length -> BADARGS");

    /* undecompressible G1 point (all 0xff; c_bindings.rs:149-195) */
    {
        static uint8_t bad_g1[N_G1 * 48];
        memcpy(bad_g1, g1_monomial, sizeof bad_g1);
        memset(bad_g1, 0xff, 48);
        CHECK(load_trusted_setup(&s, bad_g1, N_G1 * 48, g1_lagrange, N_G1 * 48,
                                 g2_monomial, N_G2 * 96, 0) == C_KZG_BADARGS,
              "invalid g1 point -> BADARGS");
    }

    /* undecompressible G2 point (c_bindings.rs:248-294) */
    {
        static uint8_t bad_g2[N_G2 * 96];
        memcpy(bad_g2, g2_monomial, sizeof bad_g2);
        memset(bad_g2, 0xff, 96);
        CHECK(load_trusted_setup(&s, g1_monomial, N_G1 * 48, g1_lagrange,
                                 N_G1 * 48, bad_g2, N_G2 * 96,
                                 0) == C_KZG_BADARGS,
              "invalid g2 point -> BADARGS");
    }

    /* wrong form: monomial points in the Lagrange slot fails the pairing
     * form check (c_bindings.rs:297-341; oracle/kzg.py
     * is_trusted_setup_in_lagrange_form) */
    CHECK(load_trusted_setup(&s, g1_lagrange, N_G1 * 48, g1_monomial, N_G1 * 48,
                             g2_monomial, N_G2 * 96, 0) == C_KZG_BADARGS,
          "setup not in Lagrange form -> BADARGS");

    /* malformed setup file (c_bindings.rs:344-430) */
    {
        const char *tmppath = "/tmp/kzg_tpu_bad_setup.txt";
        FILE *tf = fopen(tmppath, "w");
        if (tf) {
            fputs("4096 65\ndeadbeef not-a-point\n", tf);
            fclose(tf);
            tf = fopen(tmppath, "r");
            CKZGSettings sbad;
            memset(&sbad, 0, sizeof sbad);
            CHECK(load_trusted_setup_file(&sbad, tf, 0) == C_KZG_BADARGS,
                  "malformed setup file -> BADARGS");
            fclose(tf);
            remove(tmppath);
        }
    }

    /* free semantics (c_bindings.rs:490-542) */
    free_trusted_setup(NULL); /* must not crash */
    CHECK(1, "free_trusted_setup(NULL) no crash");
    {
        CKZGSettings sz;
        memset(&sz, 0, sizeof sz);
        free_trusted_setup(&sz); /* zeroed settings: must not crash */
        free_trusted_setup(&sz); /* double free of zeroed struct */
        CHECK(1, "free_trusted_setup(zeroed, twice) no crash");
    }

    /* ---- real setup (byte-level API) ---- */
    C_KZG_RET ret = load_trusted_setup(&s, g1_monomial, N_G1 * 48, g1_lagrange,
                                       N_G1 * 48, g2_monomial, N_G2 * 96, 0);
    CHECK(ret == C_KZG_OK, "load_trusted_setup(bytes)");
    if (ret != C_KZG_OK) return 1;
    CHECK(s.roots_of_unity != NULL && s.g1_values_monomial != NULL &&
              s.g1_values_lagrange_brp != NULL && s.g2_values_monomial != NULL &&
              s.reverse_roots_of_unity != NULL && s.brp_roots_of_unity != NULL &&
              s.x_ext_fft_columns != NULL,
          "CKZGSettings arrays populated");
    /* roots_of_unity starts and ends with Fr::one() (Montgomery form) */
    CHECK(s.roots_of_unity[0].l[0] == s.roots_of_unity[8192].l[0],
          "roots_of_unity wraps to one");

    /* also exercise the file loader end-to-end (c_bindings.rs:432-487) */
    {
        FILE *f = fopen(argv[1], "r");
        CKZGSettings s_file;
        memset(&s_file, 0, sizeof s_file);
        ret = load_trusted_setup_file(&s_file, f, 0);
        fclose(f);
        CHECK(ret == C_KZG_OK, "load_trusted_setup_file");
        if (ret == C_KZG_OK) {
            CHECK(memcmp(s_file.roots_of_unity, s.roots_of_unity,
                         8193 * sizeof(ckzg_fr)) == 0,
                  "file and byte loads agree");
            free_trusted_setup(&s_file);
            CHECK(s_file.roots_of_unity == NULL &&
                      s_file.g1_values_monomial == NULL &&
                      s_file.g1_values_lagrange_brp == NULL &&
                      s_file.g2_values_monomial == NULL,
                  "free_trusted_setup nulls all arrays");
        }
    }

    /* ---- blob -> commit -> prove -> verify ---- */
    static Blob blob;
    for (int i = 0; i < 4096; i++) {
        blob.bytes[i * 32] = 0; /* keep canonical: top byte zero */
        for (int j = 1; j < 32; j++) blob.bytes[i * 32 + j] = (uint8_t)(i * 31 + j);
    }
    KZGCommitment c;
    ret = blob_to_kzg_commitment(&c, &blob, &s);
    CHECK(ret == C_KZG_OK, "blob_to_kzg_commitment");

    /* invalid blob: non-canonical field element (c_bindings.rs:65-96) */
    {
        static Blob bad_blob;
        memcpy(&bad_blob, &blob, sizeof blob);
        memset(bad_blob.bytes, 0xff, 32);
        KZGCommitment cc;
        CHECK(blob_to_kzg_commitment(&cc, &bad_blob, &s) == C_KZG_BADARGS,
              "blob_to_kzg_commitment(invalid blob) -> BADARGS");
        KZGProof pp;
        CHECK(compute_blob_kzg_proof(&pp, &bad_blob, (const Bytes48 *)&c, &s) ==
                  C_KZG_BADARGS,
              "compute_blob_kzg_proof(invalid blob) -> BADARGS");
    }

    KZGProof p;
    ret = compute_blob_kzg_proof(&p, &blob, (const Bytes48 *)&c, &s);
    CHECK(ret == C_KZG_OK, "compute_blob_kzg_proof");

    bool ok = false;
    ret = verify_blob_kzg_proof(&ok, &blob, (const Bytes48 *)&c, (const Bytes48 *)&p, &s);
    CHECK(ret == C_KZG_OK && ok, "verify_blob_kzg_proof -> true");

    /* tampered proof: must verify false, not error */
    KZGProof bad = p;
    bad.bytes[10] ^= 1;
    ok = true;
    ret = verify_blob_kzg_proof(&ok, &blob, (const Bytes48 *)&c, (const Bytes48 *)&bad, &s);
    CHECK((ret == C_KZG_OK && !ok) || ret == C_KZG_BADARGS,
          "tampered proof rejected");

    /* zero blob: proves fine against its (infinity) commitment
     * (c_bindings.rs:584-648) */
    {
        static Blob zero_blob; /* static -> zero-initialized */
        KZGCommitment zc;
        ret = blob_to_kzg_commitment(&zc, &zero_blob, &s);
        CHECK(ret == C_KZG_OK, "blob_to_kzg_commitment(zero blob)");
        CHECK(zc.bytes[0] == 0xc0, "zero blob commits to infinity (0xc0...)");
        KZGProof zp2;
        ret = compute_blob_kzg_proof(&zp2, &zero_blob, (const Bytes48 *)&zc, &s);
        CHECK(ret == C_KZG_OK,
              "compute_blob_kzg_proof(commitment at infinity) -> OK");
        ok = false;
        ret = verify_blob_kzg_proof(&ok, &zero_blob, (const Bytes48 *)&zc,
                                    (const Bytes48 *)&zp2, &s);
        CHECK(ret == C_KZG_OK && ok, "verify_blob_kzg_proof(zero blob) -> true");
    }

    /* compute_kzg_proof at a point + verify */
    Bytes32 z;
    memset(&z, 0, sizeof z);
    z.bytes[31] = 7;
    KZGProof zp;
    Bytes32 y;
    ret = compute_kzg_proof(&zp, &y, &blob, &z, &s);
    CHECK(ret == C_KZG_OK, "compute_kzg_proof");
    ok = false;
    ret = verify_kzg_proof(&ok, (const Bytes48 *)&c, &z, &y, (const Bytes48 *)&zp, &s);
    CHECK(ret == C_KZG_OK && ok, "verify_kzg_proof -> true");

    /* invalid field element (non-canonical, all 0xff) */
    Bytes32 badz;
    memset(&badz, 0xff, sizeof badz);
    ret = verify_kzg_proof(&ok, (const Bytes48 *)&c, &badz, &y, (const Bytes48 *)&zp, &s);
    CHECK(ret == C_KZG_BADARGS, "non-canonical z -> BADARGS");

    /* invalid proof bytes (not a compressed point) */
    {
        Bytes48 junk48;
        memset(&junk48, 0xff, sizeof junk48);
        ret = verify_kzg_proof(&ok, (const Bytes48 *)&c, &z, &y, &junk48, &s);
        CHECK(ret == C_KZG_BADARGS, "undecodable proof -> BADARGS");
    }

    /* null pointer args */
    CHECK(blob_to_kzg_commitment(NULL, &blob, &s) == C_KZG_BADARGS,
          "blob_to_kzg_commitment(NULL out) -> BADARGS");
    CHECK(blob_to_kzg_commitment(&c, NULL, &s) == C_KZG_BADARGS,
          "blob_to_kzg_commitment(NULL blob) -> BADARGS");
    CHECK(compute_kzg_proof(NULL, &y, &blob, &z, &s) == C_KZG_BADARGS,
          "compute_kzg_proof(NULL out) -> BADARGS");
    CHECK(verify_kzg_proof(NULL, (const Bytes48 *)&c, &z, &y, (const Bytes48 *)&zp, &s) ==
              C_KZG_BADARGS,
          "verify_kzg_proof(NULL ok) -> BADARGS");
    CHECK(verify_blob_kzg_proof_batch(&ok, NULL, NULL, NULL, 3, &s) == C_KZG_BADARGS,
          "verify_blob_kzg_proof_batch(NULL arrays, n>0) -> BADARGS");

    /* batch verify (2 copies of the same blob); n == 0 vacuously true */
    static Blob blobs[2];
    Bytes48 cs2[2], ps2[2];
    memcpy(&blobs[0], &blob, sizeof blob);
    memcpy(&blobs[1], &blob, sizeof blob);
    memcpy(&cs2[0], &c, 48);
    memcpy(&cs2[1], &c, 48);
    memcpy(&ps2[0], &p, 48);
    memcpy(&ps2[1], &p, 48);
    ok = false;
    ret = verify_blob_kzg_proof_batch(&ok, blobs, cs2, ps2, 2, &s);
    CHECK(ret == C_KZG_OK && ok, "verify_blob_kzg_proof_batch(2) -> true");
    ok = false;
    ret = verify_blob_kzg_proof_batch(&ok, NULL, NULL, NULL, 0, &s);
    CHECK(ret == C_KZG_OK && ok, "verify_blob_kzg_proof_batch(0) -> true");

    /* ---- EIP-7594 cells (kzg/src/eth/c_bindings.rs:133-354) ---- */
    {
        static Cell cells[CELLS_PER_EXT_BLOB_];
        static KZGProof cproofs[CELLS_PER_EXT_BLOB_];
        CHECK(compute_cells_and_kzg_proofs(NULL, NULL, &blob, &s) == C_KZG_BADARGS,
              "compute_cells(NULL, NULL) -> BADARGS");
        ret = compute_cells_and_kzg_proofs(cells, cproofs, &blob, &s);
        CHECK(ret == C_KZG_OK, "compute_cells_and_kzg_proofs");
        if (ret == C_KZG_OK) {
            /* verify a couple of cells */
            Bytes48 vc[2];
            uint64_t vidx[2] = {0, 77};
            Cell vcell[2];
            Bytes48 vproof[2];
            memcpy(&vc[0], &c, 48);
            memcpy(&vc[1], &c, 48);
            vcell[0] = cells[0];
            vcell[1] = cells[77];
            memcpy(&vproof[0], &cproofs[0], 48);
            memcpy(&vproof[1], &cproofs[77], 48);
            ok = false;
            ret = verify_cell_kzg_proof_batch(&ok, vc, vidx, vcell, vproof, 2, &s);
            CHECK(ret == C_KZG_OK && ok, "verify_cell_kzg_proof_batch(2) -> true");

            /* out-of-range cell index -> BADARGS */
            vidx[1] = CELLS_PER_EXT_BLOB_;
            ret = verify_cell_kzg_proof_batch(&ok, vc, vidx, vcell, vproof, 2, &s);
            CHECK(ret == C_KZG_BADARGS,
                  "verify_cell_kzg_proof_batch(index >= 128) -> BADARGS");
            vidx[1] = 77;

            /* num_cells == 0 vacuously true */
            ok = false;
            ret = verify_cell_kzg_proof_batch(&ok, NULL, NULL, NULL, NULL, 0, &s);
            CHECK(ret == C_KZG_OK && ok, "verify_cell_kzg_proof_batch(0) -> true");

            /* recover from the first half of the cells */
            static uint64_t rid[CELLS_PER_EXT_BLOB_ / 2];
            static Cell rcells[CELLS_PER_EXT_BLOB_ / 2];
            for (int i = 0; i < CELLS_PER_EXT_BLOB_ / 2; i++) {
                rid[i] = (uint64_t)i;
                rcells[i] = cells[i];
            }
            static Cell rec[CELLS_PER_EXT_BLOB_];
            static KZGProof recp[CELLS_PER_EXT_BLOB_];
            ret = recover_cells_and_kzg_proofs(rec, recp, rid, rcells,
                                               CELLS_PER_EXT_BLOB_ / 2, &s);
            CHECK(ret == C_KZG_OK, "recover_cells_and_kzg_proofs(half)");
            if (ret == C_KZG_OK) {
                CHECK(memcmp(&rec[100], &cells[100], sizeof(Cell)) == 0 &&
                          memcmp(&recp[100], &cproofs[100], 48) == 0,
                      "recovered cells+proofs match originals");
            }

            /* duplicate cell index -> BADARGS */
            rid[1] = rid[0];
            ret = recover_cells_and_kzg_proofs(rec, recp, rid, rcells,
                                               CELLS_PER_EXT_BLOB_ / 2, &s);
            CHECK(ret == C_KZG_BADARGS,
                  "recover(duplicate index) -> BADARGS");
            rid[1] = 1;

            /* too few cells to recover -> BADARGS */
            ret = recover_cells_and_kzg_proofs(rec, recp, rid, rcells,
                                               CELLS_PER_EXT_BLOB_ / 2 - 1, &s);
            CHECK(ret == C_KZG_BADARGS, "recover(<50% cells) -> BADARGS");

            /* null required args -> BADARGS */
            CHECK(recover_cells_and_kzg_proofs(NULL, NULL, rid, rcells,
                                               CELLS_PER_EXT_BLOB_ / 2,
                                               &s) == C_KZG_BADARGS,
                  "recover(NULL out) -> BADARGS");

            /* challenge export (blst/src/eip_7594.rs:30-97): deterministic,
             * nonzero, input-sensitive, validates its inputs */
            {
                Bytes48 vc1[1];
                uint64_t cidx[2] = {0, 0};
                uint64_t vidx2[2] = {0, 77};
                Cell vcell2[2];
                Bytes48 vproof2[2];
                memcpy(&vc1[0], &c, 48);
                vcell2[0] = cells[0];
                vcell2[1] = cells[77];
                memcpy(&vproof2[0], &cproofs[0], 48);
                memcpy(&vproof2[1], &cproofs[77], 48);
                ckzg_fr r1, r2;
                ret = compute_verify_cell_kzg_proof_batch_challenge(
                    &r1, vc1, 1, cidx, vidx2, vcell2, vproof2, 2);
                CHECK(ret == C_KZG_OK, "batch challenge -> OK");
                CHECK(r1.l[0] | r1.l[1] | r1.l[2] | r1.l[3],
                      "batch challenge nonzero");
                ret = compute_verify_cell_kzg_proof_batch_challenge(
                    &r2, vc1, 1, cidx, vidx2, vcell2, vproof2, 2);
                CHECK(ret == C_KZG_OK && memcmp(&r1, &r2, sizeof r1) == 0,
                      "batch challenge deterministic");
                vidx2[1] = 78; /* different cell index -> different r */
                ret = compute_verify_cell_kzg_proof_batch_challenge(
                    &r2, vc1, 1, cidx, vidx2, vcell2, vproof2, 2);
                CHECK(ret == C_KZG_OK && memcmp(&r1, &r2, sizeof r1) != 0,
                      "batch challenge input-sensitive");
                vidx2[1] = 77;
                CHECK(compute_verify_cell_kzg_proof_batch_challenge(
                          NULL, vc1, 1, cidx, vidx2, vcell2, vproof2, 2) ==
                          C_KZG_BADARGS,
                      "batch challenge(NULL out) -> BADARGS");
                CHECK(compute_verify_cell_kzg_proof_batch_challenge(
                          &r2, vc1, 1, NULL, vidx2, vcell2, vproof2, 2) ==
                          C_KZG_BADARGS,
                      "batch challenge(NULL indices) -> BADARGS");
                Bytes48 junkp[2];
                memset(junkp, 0xff, sizeof junkp);
                CHECK(compute_verify_cell_kzg_proof_batch_challenge(
                          &r2, vc1, 1, cidx, vidx2, vcell2, junkp, 2) ==
                          C_KZG_BADARGS,
                      "batch challenge(undecodable proofs) -> BADARGS");
            }
        }
    }

    /* unknown settings pointer */
    CKZGSettings s2;
    memset(&s2, 0, sizeof s2);
    CHECK(blob_to_kzg_commitment(&c, &blob, &s2) == C_KZG_BADARGS,
          "unknown settings -> BADARGS");

    free_trusted_setup(&s);
    CHECK(s.roots_of_unity == NULL, "free_trusted_setup clears struct");

    printf(failures == 0 ? "ALL C ABI TESTS PASSED\n" : "%d FAILURES\n", failures);
    return failures == 0 ? 0 : 1;
}
