/* C-side integration test for libckzg_tpu.so: a C caller loads the mainnet
 * trusted setup and runs blob -> commit -> prove -> verify -> batch verify,
 * plus the error-handling probes the reference exercises in
 * kzg-bench/src/tests/c_bindings.rs:65-649 (null pointers, malformed setup,
 * invalid field elements).
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

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s trusted_setup.txt\n", argv[0]);
        return 2;
    }

    /* ---- error handling before any setup ---- */
    CKZGSettings s;
    memset(&s, 0, sizeof s);
    CHECK(load_trusted_setup(NULL, NULL, 0, NULL, 0, NULL, 0, 0) == C_KZG_BADARGS,
          "load_trusted_setup(NULL) -> BADARGS");

    /* malformed setup: truncated byte arrays */
    uint8_t junk[96] = {0};
    CHECK(load_trusted_setup(&s, junk, 96, junk, 96, junk, 96, 0) == C_KZG_BADARGS,
          "load_trusted_setup(truncated) -> BADARGS");

    /* ---- real setup ---- */
    FILE *f = fopen(argv[1], "r");
    if (!f) {
        fprintf(stderr, "cannot open %s\n", argv[1]);
        return 2;
    }
    C_KZG_RET ret = load_trusted_setup_file(&s, f, 0);
    fclose(f);
    CHECK(ret == C_KZG_OK, "load_trusted_setup_file");
    if (ret != C_KZG_OK) return 1;
    CHECK(s.roots_of_unity != NULL && s.g1_values_lagrange_brp != NULL &&
              s.x_ext_fft_columns != NULL,
          "CKZGSettings arrays populated");
    /* roots_of_unity starts and ends with Fr::one() (Montgomery form) */
    CHECK(s.roots_of_unity[0].l[0] == s.roots_of_unity[8192].l[0],
          "roots_of_unity wraps to one");

    /* ---- blob -> commit -> prove -> verify ---- */
    static Blob blob;
    for (int i = 0; i < 4096; i++) {
        blob.bytes[i * 32] = 0; /* keep canonical: top byte zero */
        for (int j = 1; j < 32; j++) blob.bytes[i * 32 + j] = (uint8_t)(i * 31 + j);
    }
    KZGCommitment c;
    ret = blob_to_kzg_commitment(&c, &blob, &s);
    CHECK(ret == C_KZG_OK, "blob_to_kzg_commitment");

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

    /* null pointer args */
    CHECK(blob_to_kzg_commitment(NULL, &blob, &s) == C_KZG_BADARGS,
          "blob_to_kzg_commitment(NULL out) -> BADARGS");
    CHECK(verify_kzg_proof(NULL, (const Bytes48 *)&c, &z, &y, (const Bytes48 *)&zp, &s) ==
              C_KZG_BADARGS,
          "verify_kzg_proof(NULL ok) -> BADARGS");

    /* batch verify (2 copies of the same blob) */
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
