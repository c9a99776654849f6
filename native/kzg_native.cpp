// kzg_native: C++ host-side BLS12-381 core for the kzg_tpu framework.
//
// Role parity with the reference's native L0 (blst C/asm, mcl C++ --
// /root/reference/blst/src/types/*.rs wraps them): the serial,
// latency-bound host operations the TPU should not do -- 48/96-byte point
// codecs with subgroup checks, SHA-256 Fiat-Shamir transcripts, the single
// pairing per verification, and small host-side group ops.
//
// The algorithms mirror kzg_tpu/oracle/{field,curve,pairing,serialization}.py
// (this repo's consensus-vector-verified oracle), re-implemented on 6x64-bit
// Montgomery limbs. Differential tests: tests/test_native.py.
//
// Build: native/build.sh  ->  libkzg_native.so

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <ctime>
#include <vector>

#include "constants.h"

typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// Fp: 6x64-bit Montgomery form
// ---------------------------------------------------------------------------

struct Fp {
    uint64_t l[6];
};

static inline bool fp_is_zero(const Fp &a) {
    uint64_t r = 0;
    for (int i = 0; i < 6; i++) r |= a.l[i];
    return r == 0;
}

static inline bool fp_eq(const Fp &a, const Fp &b) {
    uint64_t r = 0;
    for (int i = 0; i < 6; i++) r |= a.l[i] ^ b.l[i];
    return r == 0;
}

// a >= b on raw limbs
static inline bool geq(const uint64_t *a, const uint64_t *b, int n) {
    for (int i = n - 1; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return true;
}

static inline void sub_limbs(uint64_t *r, const uint64_t *a, const uint64_t *b, int n) {
    uint64_t borrow = 0;
    for (int i = 0; i < n; i++) {
        u128 t = (u128)a[i] - b[i] - borrow;
        r[i] = (uint64_t)t;
        borrow = (uint64_t)(t >> 64) ? 1 : 0;
    }
}

static inline void fp_add(Fp &r, const Fp &a, const Fp &b) {
    // branchless: t = a + b; u = t - p; select on the combined borrow/carry
    uint64_t t[6], u[6], carry = 0, borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        t[i] = (uint64_t)s;
        carry = (uint64_t)(s >> 64);
    }
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)t[i] - P_LIMBS[i] - borrow;
        u[i] = (uint64_t)s;
        borrow = (uint64_t)(s >> 64) & 1;
    }
    // take u when t >= p (no borrow) or the add carried out
    uint64_t take_u = carry | (borrow ^ 1);
    uint64_t mask = (uint64_t)0 - take_u;
    for (int i = 0; i < 6; i++) r.l[i] = (u[i] & mask) | (t[i] & ~mask);
}

static inline void fp_sub(Fp &r, const Fp &a, const Fp &b) {
    // branchless: t = a - b; add p back when it borrowed
    uint64_t t[6], borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a.l[i] - b.l[i] - borrow;
        t[i] = (uint64_t)s;
        borrow = (uint64_t)(s >> 64) & 1;
    }
    uint64_t mask = (uint64_t)0 - borrow, carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)t[i] + (P_LIMBS[i] & mask) + carry;
        r.l[i] = (uint64_t)s;
        carry = (uint64_t)(s >> 64);
    }
}

static inline void fp_neg(Fp &r, const Fp &a) {
    if (fp_is_zero(a)) {
        r = a;
        return;
    }
    sub_limbs(r.l, P_LIMBS, a.l, 6);
}

// CIOS Montgomery multiplication (portable fallback; the x86-64 build
// dispatches to the mulx/adcx/adox version below)
static void fp_mul_portable(Fp &r, const Fp &a, const Fp &b) {
    uint64_t t[8] = {0};
    for (int i = 0; i < 6; i++) {
        uint64_t carry = 0;
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)a.l[j] * b.l[i] + t[j] + carry;
            t[j] = (uint64_t)s;
            carry = (uint64_t)(s >> 64);
        }
        u128 s = (u128)t[6] + carry;
        t[6] = (uint64_t)s;
        t[7] = (uint64_t)(s >> 64);

        uint64_t m = t[0] * FP_N0INV;
        u128 s2 = (u128)m * P_LIMBS[0] + t[0];
        carry = (uint64_t)(s2 >> 64);
        for (int j = 1; j < 6; j++) {
            s2 = (u128)m * P_LIMBS[j] + t[j] + carry;
            t[j - 1] = (uint64_t)s2;
            carry = (uint64_t)(s2 >> 64);
        }
        s2 = (u128)t[6] + carry;
        t[5] = (uint64_t)s2;
        t[6] = t[7] + (uint64_t)(s2 >> 64);
        t[7] = 0;
    }
    if (t[6] || geq(t, P_LIMBS, 6)) {
        sub_limbs(r.l, t, P_LIMBS, 6);
    } else {
        memcpy(r.l, t, 6 * sizeof(uint64_t));
    }
}

// mulx/adcx/adox CIOS Montgomery multiplication, fully unrolled with
// rotating accumulator register names (generated mechanically; n0inv is
// inlined as an immediate to stay within the x86-64 register budget).
static inline void fp_mul_asm(Fp &r, const Fp &a, const Fp &b) {
    register uint64_t t0 asm("r14");
    register uint64_t t1 asm("r8");
    register uint64_t t2 asm("r9");
    register uint64_t t3 asm("r10");
    register uint64_t t4 asm("r11");
    register uint64_t t5 asm("r12");
    register uint64_t t6 asm("r13");
    asm volatile(
        "xor %%r8, %%r8\n\t"
        "xor %%r9, %%r9\n\t"
        "xor %%r10, %%r10\n\t"
        "xor %%r11, %%r11\n\t"
        "xor %%r12, %%r12\n\t"
        "xor %%r13, %%r13\n\t"
        "xor %%r14, %%r14\n\t"
        "mov 0(%[a]), %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[b]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 8(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 16(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 24(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 32(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 40(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "movabs $0x89f3fffcfffcfffd, %%rax\n\t"
        "mov %%r8, %%rdx\n\t"
        "imul %%rax, %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[p]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 8(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 16(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 24(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 32(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 40(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mov 8(%[a]), %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[b]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 8(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 16(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 24(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 32(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 40(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "movabs $0x89f3fffcfffcfffd, %%rax\n\t"
        "mov %%r9, %%rdx\n\t"
        "imul %%rax, %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[p]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 8(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 16(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 24(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 32(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 40(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mov 16(%[a]), %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[b]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 8(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 16(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 24(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 32(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 40(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "movabs $0x89f3fffcfffcfffd, %%rax\n\t"
        "mov %%r10, %%rdx\n\t"
        "imul %%rax, %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[p]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 8(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 16(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 24(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 32(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 40(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mov 24(%[a]), %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[b]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 8(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 16(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 24(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 32(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 40(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "movabs $0x89f3fffcfffcfffd, %%rax\n\t"
        "mov %%r11, %%rdx\n\t"
        "imul %%rax, %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[p]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r11\n\t"
        "mulx 8(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 16(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 24(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 32(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 40(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mov 32(%[a]), %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[b]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 8(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 16(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 24(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 32(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 40(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "movabs $0x89f3fffcfffcfffd, %%rax\n\t"
        "mov %%r12, %%rdx\n\t"
        "imul %%rax, %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[p]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r12\n\t"
        "mulx 8(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r13\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 16(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 24(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 32(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 40(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mov 40(%[a]), %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[b]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 8(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 16(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 24(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 32(%[b]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 40(%[b]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        "movabs $0x89f3fffcfffcfffd, %%rax\n\t"
        "mov %%r13, %%rdx\n\t"
        "imul %%rax, %%rdx\n\t"
        "xor %%rax, %%rax\n\t"
        "mulx 0(%[p]), %%rax, %%rbx\n\t"
        "adox %%rax, %%r13\n\t"
        "mulx 8(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r14\n\t"
        "adox %%rax, %%r14\n\t"
        "mulx 16(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r8\n\t"
        "adox %%rax, %%r8\n\t"
        "mulx 24(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r9\n\t"
        "adox %%rax, %%r9\n\t"
        "mulx 32(%[p]), %%rax, %%rbx\n\t"
        "adcx %%rcx, %%r10\n\t"
        "adox %%rax, %%r10\n\t"
        "mulx 40(%[p]), %%rax, %%rcx\n\t"
        "adcx %%rbx, %%r11\n\t"
        "adox %%rax, %%r11\n\t"
        "mov $0, %%rax\n\t"
        "adcx %%rcx, %%r12\n\t"
        "adox %%rax, %%r12\n\t"
        : "=&r"(t0), "=&r"(t1), "=&r"(t2), "=&r"(t3), "=&r"(t4), "=&r"(t5), "=&r"(t6)
        : [a] "r"(a.l), [b] "r"(b.l), [p] "r"(P_LIMBS)
        : "rax", "rbx", "rcx", "rdx", "cc", "memory");
    uint64_t t[6] = {t0, t1, t2, t3, t4, t5};
    if (t6 || geq(t, P_LIMBS, 6)) sub_limbs(r.l, t, P_LIMBS, 6);
    else memcpy(r.l, t, 48);
}

static_assert(FP_N0INV == 0x89f3fffcfffcfffdULL, "n0inv immediate in fp_mul_asm");

static inline void fp_mul(Fp &r, const Fp &a, const Fp &b) {
#if defined(__ADX__) && defined(__BMI2__)
    fp_mul_asm(r, a, b);
#else
    fp_mul_portable(r, a, b);
#endif
}

static inline void fp_sqr(Fp &r, const Fp &a) { fp_mul(r, a, a); }

static const Fp FP_ZERO = {{0, 0, 0, 0, 0, 0}};

static Fp fp_one() {
    Fp r;
    memcpy(r.l, FP_ONE_MONT, sizeof r.l);
    return r;
}

// exponentiation by a plain (non-Montgomery) 6-limb exponent
static void fp_pow(Fp &r, const Fp &a, const uint64_t *e, int n_limbs) {
    Fp acc = fp_one();
    int top = n_limbs * 64 - 1;
    while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) top--;
    for (int i = top; i >= 0; i--) {
        fp_sqr(acc, acc);
        if ((e[i / 64] >> (i % 64)) & 1) fp_mul(acc, acc, a);
    }
    r = acc;
}

static void fp_inv(Fp &r, const Fp &a) { fp_pow(r, a, FP_P_MINUS_2, 6); }

// sqrt for p = 3 mod 4; returns false if non-residue
// (parity: fp_sqrt, kzg_tpu/oracle/field.py)
static bool fp_sqrt(Fp &r, const Fp &a) {
    Fp c;
    fp_pow(c, a, FP_SQRT_EXP, 6);
    Fp c2;
    fp_sqr(c2, c);
    if (!fp_eq(c2, a)) return false;
    r = c;
    return true;
}

// byte conversions (big-endian, plain form <-> Montgomery)
static bool fp_from_be(Fp &r, const uint8_t *b) {  // 48 bytes; false if >= p
    uint64_t plain[6];
    for (int i = 0; i < 6; i++) {
        uint64_t v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | b[(5 - i) * 8 + j];
        plain[i] = v;
    }
    if (geq(plain, P_LIMBS, 6)) return false;  // geq = (plain >= p)
    Fp tmp;
    memcpy(tmp.l, plain, sizeof tmp.l);
    Fp r2;
    memcpy(r2.l, FP_R2, sizeof r2.l);
    fp_mul(r, tmp, r2);
    return true;
}

static void fp_to_be(uint8_t *b, const Fp &a) {  // 48 bytes
    Fp one = {{1, 0, 0, 0, 0, 0}};
    Fp plain;
    fp_mul(plain, a, one);  // Montgomery reduce
    for (int i = 0; i < 6; i++) {
        uint64_t v = plain.l[5 - i];
        for (int j = 0; j < 8; j++) b[i * 8 + j] = (uint8_t)(v >> (56 - 8 * j));
    }
}

// plain-form comparison against (p-1)/2 for the sign bit
static bool fp_lex_larger(const Fp &a) {
    Fp one = {{1, 0, 0, 0, 0, 0}};
    Fp plain;
    fp_mul(plain, a, one);
    // (p-1)/2 = (P_LIMBS - 1) >> 1
    uint64_t half[6];
    uint64_t borrow = 1;
    for (int i = 0; i < 6; i++) {
        uint64_t v = P_LIMBS[i] - borrow;
        borrow = (P_LIMBS[i] < borrow) ? 1 : 0;
        half[i] = v;
    }
    for (int i = 0; i < 6; i++) {
        uint64_t lo = half[i] >> 1;
        if (i < 5) lo |= half[i + 1] << 63;
        half[i] = lo;
    }
    // a_plain > half ?
    for (int i = 5; i >= 0; i--) {
        if (plain.l[i] != half[i]) return plain.l[i] > half[i];
    }
    return false;
}

// ---------------------------------------------------------------------------
// Fp2 = Fp[u]/(u^2+1)   (parity: oracle/field.py fp2_*)
// ---------------------------------------------------------------------------

struct Fp2 {
    Fp c0, c1;
};

static const Fp2 FP2_ZERO_V = {{{0}}, {{0}}};

static Fp2 fp2_one() { return {fp_one(), FP_ZERO}; }

static inline bool fp2_is_zero(const Fp2 &a) { return fp_is_zero(a.c0) && fp_is_zero(a.c1); }
static inline bool fp2_eq(const Fp2 &a, const Fp2 &b) { return fp_eq(a.c0, b.c0) && fp_eq(a.c1, b.c1); }

static inline void fp2_add(Fp2 &r, const Fp2 &a, const Fp2 &b) {
    fp_add(r.c0, a.c0, b.c0);
    fp_add(r.c1, a.c1, b.c1);
}
static inline void fp2_sub(Fp2 &r, const Fp2 &a, const Fp2 &b) {
    fp_sub(r.c0, a.c0, b.c0);
    fp_sub(r.c1, a.c1, b.c1);
}
static inline void fp2_neg(Fp2 &r, const Fp2 &a) {
    fp_neg(r.c0, a.c0);
    fp_neg(r.c1, a.c1);
}

static void fp2_mul(Fp2 &r, const Fp2 &a, const Fp2 &b) {
    Fp t0, t1, t2, sa, sb;
    fp_mul(t0, a.c0, b.c0);
    fp_mul(t1, a.c1, b.c1);
    fp_add(sa, a.c0, a.c1);
    fp_add(sb, b.c0, b.c1);
    fp_mul(t2, sa, sb);
    Fp c0, c1;
    fp_sub(c0, t0, t1);
    fp_sub(t2, t2, t0);
    fp_sub(c1, t2, t1);
    r.c0 = c0;
    r.c1 = c1;
}

static void fp2_sqr(Fp2 &r, const Fp2 &a) {
    Fp s, d, t;
    fp_add(s, a.c0, a.c1);
    fp_sub(d, a.c0, a.c1);
    fp_mul(t, a.c0, a.c1);
    fp_mul(r.c0, s, d);
    fp_add(r.c1, t, t);
}

static void fp2_conj(Fp2 &r, const Fp2 &a) {
    r.c0 = a.c0;
    fp_neg(r.c1, a.c1);
}

static void fp2_inv(Fp2 &r, const Fp2 &a) {
    Fp n, t0, t1, ninv;
    fp_sqr(t0, a.c0);
    fp_sqr(t1, a.c1);
    fp_add(n, t0, t1);
    fp_inv(ninv, n);
    fp_mul(r.c0, a.c0, ninv);
    Fp nc1;
    fp_neg(nc1, a.c1);
    fp_mul(r.c1, nc1, ninv);
}

// (c0 + c1 u)(1 + u) = (c0 - c1) + (c0 + c1) u
static void fp2_mul_by_xi(Fp2 &r, const Fp2 &a) {
    Fp t0, t1;
    fp_sub(t0, a.c0, a.c1);
    fp_add(t1, a.c0, a.c1);
    r.c0 = t0;
    r.c1 = t1;
}

static void fp2_pow(Fp2 &r, const Fp2 &a, const uint64_t *e, int n_limbs) {
    Fp2 acc = fp2_one();
    int top = n_limbs * 64 - 1;
    while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) top--;
    for (int i = top; i >= 0; i--) {
        fp2_sqr(acc, acc);
        if ((e[i / 64] >> (i % 64)) & 1) fp2_mul(acc, acc, a);
    }
    r = acc;
}

// sqrt in Fp2 for p = 3 mod 4 (parity: fp2_sqrt, oracle/field.py:94-106)
static bool fp2_sqrt(Fp2 &r, const Fp2 &a) {
    if (fp2_is_zero(a)) {
        r = a;
        return true;
    }
    Fp2 a1, x0, alpha;
    fp2_pow(a1, a, FP2_A1_EXP, 6);
    fp2_mul(x0, a1, a);
    fp2_mul(alpha, a1, x0);
    Fp2 minus_one;
    fp_neg(minus_one.c0, fp_one());
    minus_one.c1 = FP_ZERO;
    Fp2 x;
    if (fp2_eq(alpha, minus_one)) {
        // x = u * x0
        fp_neg(x.c0, x0.c1);
        x.c1 = x0.c0;
    } else {
        Fp2 b, one = fp2_one();
        fp2_add(b, one, alpha);
        fp2_pow(b, b, FP2_B_EXP, 6);
        fp2_mul(x, b, x0);
    }
    Fp2 chk;
    fp2_sqr(chk, x);
    if (!fp2_eq(chk, a)) return false;
    r = x;
    return true;
}

static bool fp2_lex_larger(const Fp2 &y) {
    if (!fp_is_zero(y.c1)) return fp_lex_larger(y.c1);
    return fp_lex_larger(y.c0);
}

// ---------------------------------------------------------------------------
// Fp6 = Fp2[v]/(v^3 - xi), Fp12 = Fp6[w]/(w^2 - v)
// (parity: oracle/field.py fp6_*/fp12_*)
// ---------------------------------------------------------------------------

struct Fp6 {
    Fp2 a0, a1, a2;
};
struct Fp12 {
    Fp6 b0, b1;
};

static Fp6 fp6_zero() { return {FP2_ZERO_V, FP2_ZERO_V, FP2_ZERO_V}; }
static Fp6 fp6_one() { return {fp2_one(), FP2_ZERO_V, FP2_ZERO_V}; }
static Fp12 fp12_one() { return {fp6_one(), fp6_zero()}; }

static inline void fp6_add(Fp6 &r, const Fp6 &a, const Fp6 &b) {
    fp2_add(r.a0, a.a0, b.a0);
    fp2_add(r.a1, a.a1, b.a1);
    fp2_add(r.a2, a.a2, b.a2);
}
static inline void fp6_sub(Fp6 &r, const Fp6 &a, const Fp6 &b) {
    fp2_sub(r.a0, a.a0, b.a0);
    fp2_sub(r.a1, a.a1, b.a1);
    fp2_sub(r.a2, a.a2, b.a2);
}
static inline void fp6_neg(Fp6 &r, const Fp6 &a) {
    fp2_neg(r.a0, a.a0);
    fp2_neg(r.a1, a.a1);
    fp2_neg(r.a2, a.a2);
}

static void fp6_mul(Fp6 &r, const Fp6 &a, const Fp6 &b) {
    Fp2 t0, t1, t2, s, u0, u1, u2;
    fp2_mul(t0, a.a0, b.a0);
    fp2_mul(t1, a.a1, b.a1);
    fp2_mul(t2, a.a2, b.a2);

    Fp2 c0;
    fp2_add(u0, a.a1, a.a2);
    fp2_add(u1, b.a1, b.a2);
    fp2_mul(s, u0, u1);
    fp2_sub(s, s, t1);
    fp2_sub(s, s, t2);
    fp2_mul_by_xi(s, s);
    fp2_add(c0, t0, s);

    Fp2 c1;
    fp2_add(u0, a.a0, a.a1);
    fp2_add(u1, b.a0, b.a1);
    fp2_mul(s, u0, u1);
    fp2_sub(s, s, t0);
    fp2_sub(s, s, t1);
    fp2_mul_by_xi(u2, t2);
    fp2_add(c1, s, u2);

    Fp2 c2;
    fp2_add(u0, a.a0, a.a2);
    fp2_add(u1, b.a0, b.a2);
    fp2_mul(s, u0, u1);
    fp2_sub(s, s, t0);
    fp2_sub(s, s, t2);
    fp2_add(c2, s, t1);

    r.a0 = c0;
    r.a1 = c1;
    r.a2 = c2;
}

static void fp6_mul_by_v(Fp6 &r, const Fp6 &a) {
    Fp2 t;
    fp2_mul_by_xi(t, a.a2);
    Fp2 a0 = a.a0, a1 = a.a1;
    r.a0 = t;
    r.a1 = a0;
    r.a2 = a1;
}

static void fp6_inv(Fp6 &r, const Fp6 &a) {
    Fp2 c0, c1, c2, t, s;
    fp2_sqr(c0, a.a0);
    fp2_mul(t, a.a1, a.a2);
    fp2_mul_by_xi(t, t);
    fp2_sub(c0, c0, t);

    fp2_sqr(t, a.a2);
    fp2_mul_by_xi(t, t);
    fp2_mul(s, a.a0, a.a1);
    fp2_sub(c1, t, s);

    fp2_sqr(t, a.a1);
    fp2_mul(s, a.a0, a.a2);
    fp2_sub(c2, t, s);

    Fp2 acc, tmp;
    fp2_mul(tmp, a.a2, c1);
    fp2_mul(t, a.a1, c2);
    fp2_add(tmp, tmp, t);
    fp2_mul_by_xi(tmp, tmp);
    fp2_mul(acc, a.a0, c0);
    fp2_add(acc, acc, tmp);
    fp2_inv(acc, acc);
    fp2_mul(r.a0, c0, acc);
    fp2_mul(r.a1, c1, acc);
    fp2_mul(r.a2, c2, acc);
}

static void fp12_mul(Fp12 &r, const Fp12 &a, const Fp12 &b) {
    Fp6 t0, t1, s, u0, u1;
    fp6_mul(t0, a.b0, b.b0);
    fp6_mul(t1, a.b1, b.b1);
    Fp6 c0, c1;
    fp6_mul_by_v(s, t1);
    fp6_add(c0, t0, s);
    fp6_add(u0, a.b0, a.b1);
    fp6_add(u1, b.b0, b.b1);
    fp6_mul(s, u0, u1);
    fp6_sub(s, s, t0);
    fp6_sub(c1, s, t1);
    r.b0 = c0;
    r.b1 = c1;
}

static void fp12_sqr(Fp12 &r, const Fp12 &a) { fp12_mul(r, a, a); }

static void fp12_conj(Fp12 &r, const Fp12 &a) {
    r.b0 = a.b0;
    fp6_neg(r.b1, a.b1);
}

static void fp12_inv(Fp12 &r, const Fp12 &a) {
    Fp6 t, s;
    Fp6 sq0, sq1;
    fp6_mul(sq0, a.b0, a.b0);
    fp6_mul(sq1, a.b1, a.b1);
    fp6_mul_by_v(s, sq1);
    fp6_sub(t, sq0, s);
    fp6_inv(t, t);
    fp6_mul(r.b0, a.b0, t);
    Fp6 nb1;
    fp6_neg(nb1, a.b1);
    fp6_mul(r.b1, nb1, t);
}

static inline bool fp12_is_one(const Fp12 &a) {
    Fp12 one = fp12_one();
    return fp_eq(a.b0.a0.c0, one.b0.a0.c0) && fp_eq(a.b0.a0.c1, FP_ZERO) &&
           fp2_is_zero(a.b0.a1) && fp2_is_zero(a.b0.a2) && fp2_is_zero(a.b1.a0) &&
           fp2_is_zero(a.b1.a1) && fp2_is_zero(a.b1.a2);
}

static Fp2 load_fp2(const uint64_t *c0, const uint64_t *c1) {
    Fp2 r;
    memcpy(r.c0.l, c0, 48);
    memcpy(r.c1.l, c1, 48);
    return r;
}

static void fp6_frobenius(Fp6 &r, const Fp6 &a) {
    Fp2 g1v = load_fp2(FROB_G6_1_C0, FROB_G6_1_C1);
    Fp2 g2v = load_fp2(FROB_G6_2_C0, FROB_G6_2_C1);
    Fp2 t;
    fp2_conj(r.a0, a.a0);
    fp2_conj(t, a.a1);
    fp2_mul(r.a1, t, g1v);
    fp2_conj(t, a.a2);
    fp2_mul(r.a2, t, g2v);
}

static void fp12_frobenius(Fp12 &r, const Fp12 &a) {
    Fp2 g12 = load_fp2(FROB_G12_C0, FROB_G12_C1);
    fp6_frobenius(r.b0, a.b0);
    Fp6 b1;
    fp6_frobenius(b1, a.b1);
    fp2_mul(r.b1.a0, b1.a0, g12);
    fp2_mul(r.b1.a1, b1.a1, g12);
    fp2_mul(r.b1.a2, b1.a2, g12);
}

// ---------------------------------------------------------------------------
// Curve points, generic over the coordinate field
// (parity: oracle/curve.py CurveOps -- Jacobian formulas)
// ---------------------------------------------------------------------------

template <class F>
struct FieldOps;

template <>
struct FieldOps<Fp> {
    static void add(Fp &r, const Fp &a, const Fp &b) { fp_add(r, a, b); }
    static void sub(Fp &r, const Fp &a, const Fp &b) { fp_sub(r, a, b); }
    static void mul(Fp &r, const Fp &a, const Fp &b) { fp_mul(r, a, b); }
    static void sqr(Fp &r, const Fp &a) { fp_sqr(r, a); }
    static void neg(Fp &r, const Fp &a) { fp_neg(r, a); }
    static bool is_zero(const Fp &a) { return fp_is_zero(a); }
    static bool eq(const Fp &a, const Fp &b) { return fp_eq(a, b); }
    static Fp one() { return fp_one(); }
    static Fp zero() { return FP_ZERO; }
};

template <>
struct FieldOps<Fp2> {
    static void add(Fp2 &r, const Fp2 &a, const Fp2 &b) { fp2_add(r, a, b); }
    static void sub(Fp2 &r, const Fp2 &a, const Fp2 &b) { fp2_sub(r, a, b); }
    static void mul(Fp2 &r, const Fp2 &a, const Fp2 &b) { fp2_mul(r, a, b); }
    static void sqr(Fp2 &r, const Fp2 &a) { fp2_sqr(r, a); }
    static void neg(Fp2 &r, const Fp2 &a) { fp2_neg(r, a); }
    static bool is_zero(const Fp2 &a) { return fp2_is_zero(a); }
    static bool eq(const Fp2 &a, const Fp2 &b) { return fp2_eq(a, b); }
    static Fp2 one() { return fp2_one(); }
    static Fp2 zero() { return FP2_ZERO_V; }
};

template <class F>
struct Jac {
    F x, y, z;
    bool inf;
};

template <class F>
static Jac<F> jac_identity() {
    return {FieldOps<F>::zero(), FieldOps<F>::one(), FieldOps<F>::zero(), true};
}

template <class F>
static Jac<F> jac_from_affine(const F &x, const F &y) {
    return {x, y, FieldOps<F>::one(), false};
}

template <class F>
static void jac_double(Jac<F> &r, const Jac<F> &p) {
    using O = FieldOps<F>;
    if (p.inf || O::is_zero(p.y)) {
        r = jac_identity<F>();
        return;
    }
    F a, bq, c, d, e, f, t, t2;
    O::sqr(a, p.x);           // A = X^2
    O::sqr(bq, p.y);          // B = Y^2
    O::sqr(c, bq);            // C = B^2
    O::add(t, p.x, bq);
    O::sqr(t, t);
    O::sub(t, t, a);
    O::sub(t, t, c);
    O::add(d, t, t);          // D = 2((X+B)^2 - A - C)
    O::add(e, a, a);
    O::add(e, e, a);          // E = 3A
    O::sqr(f, e);             // F = E^2
    F x3, y3, z3;
    O::sub(x3, f, d);
    O::sub(x3, x3, d);        // X3 = F - 2D
    O::sub(t, d, x3);
    O::mul(t, e, t);
    F c8;
    O::add(c8, c, c);
    O::add(c8, c8, c8);
    O::add(c8, c8, c8);       // 8C
    O::sub(y3, t, c8);        // Y3 = E(D - X3) - 8C
    O::mul(t2, p.y, p.z);
    O::add(z3, t2, t2);       // Z3 = 2YZ
    r = {x3, y3, z3, false};
}

template <class F>
static void jac_add(Jac<F> &r, const Jac<F> &p, const Jac<F> &q) {
    using O = FieldOps<F>;
    if (p.inf) {
        r = q;
        return;
    }
    if (q.inf) {
        r = p;
        return;
    }
    F z1z1, z2z2, u1, u2, s1, s2, t;
    O::sqr(z1z1, p.z);
    O::sqr(z2z2, q.z);
    O::mul(u1, p.x, z2z2);
    O::mul(u2, q.x, z1z1);
    O::mul(t, q.z, z2z2);
    O::mul(s1, p.y, t);
    O::mul(t, p.z, z1z1);
    O::mul(s2, q.y, t);
    if (O::eq(u1, u2)) {
        if (O::eq(s1, s2)) {
            jac_double(r, p);
            return;
        }
        r = jac_identity<F>();
        return;
    }
    F h, i, j, rr, v;
    O::sub(h, u2, u1);
    O::add(i, h, h);
    O::sqr(i, i);             // I = (2H)^2
    O::mul(j, h, i);          // J = H*I
    O::sub(rr, s2, s1);
    O::add(rr, rr, rr);       // r = 2(S2-S1)
    O::mul(v, u1, i);         // V = U1*I
    F x3, y3, z3;
    O::sqr(x3, rr);
    O::sub(x3, x3, j);
    O::sub(x3, x3, v);
    O::sub(x3, x3, v);        // X3 = r^2 - J - 2V
    O::sub(t, v, x3);
    O::mul(t, rr, t);
    F s1j;
    O::mul(s1j, s1, j);
    O::add(s1j, s1j, s1j);
    O::sub(y3, t, s1j);       // Y3 = r(V - X3) - 2 S1 J
    O::add(t, p.z, q.z);
    O::sqr(t, t);
    O::sub(t, t, z1z1);
    O::sub(t, t, z2z2);
    O::mul(z3, t, h);         // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) H
    r = {x3, y3, z3, false};
}

template <class F>
static void jac_mul_scalar(Jac<F> &r, const Jac<F> &p, const uint64_t *e, int n_limbs) {
    Jac<F> acc = jac_identity<F>();
    int top = n_limbs * 64 - 1;
    while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) top--;
    for (int i = top; i >= 0; i--) {
        jac_double(acc, acc);
        if ((e[i / 64] >> (i % 64)) & 1) jac_add(acc, acc, p);
    }
    r = acc;
}

template <class F>
static bool jac_to_affine(F &x, F &y, const Jac<F> &p) {  // false if infinity
    using O = FieldOps<F>;
    if (p.inf || O::is_zero(p.z)) return false;
    F zinv, zinv2, zinv3;
    if constexpr (sizeof(F) == sizeof(Fp)) {
        fp_inv(*(Fp *)&zinv, *(const Fp *)&p.z);
    } else {
        fp2_inv(*(Fp2 *)&zinv, *(const Fp2 *)&p.z);
    }
    O::sqr(zinv2, zinv);
    O::mul(zinv3, zinv2, zinv);
    O::mul(x, p.x, zinv2);
    O::mul(y, p.y, zinv3);
    return true;
}

template <class F>
static bool in_subgroup(const F &x, const F &y) {
    Jac<F> p = jac_from_affine<F>(x, y);
    Jac<F> rp;
    jac_mul_scalar(rp, p, R_LIMBS, 4);
    return rp.inf;
}

// [|x|]P for the BLS parameter x (Hamming weight 6): 63 doublings + 5 adds.
static void jac_mul_xabs(Jac<Fp> &r, const Jac<Fp> &p) {
    Jac<Fp> acc = jac_identity<Fp>();
    uint64_t x = BLS_X_ABS;
    int top = 63;
    while (!((x >> top) & 1)) top--;
    for (int i = top; i >= 0; i--) {
        jac_double(acc, acc);
        if ((x >> i) & 1) jac_add(acc, acc, p);
    }
    r = acc;
}

// Projective (Jacobian) equality by cross-multiplication: X1 Z2^2 == X2 Z1^2
// and Y1 Z2^3 == Y2 Z1^3 -- no inversion.
template <class F>
static bool jac_eq(const Jac<F> &p, const Jac<F> &q) {
    using O = FieldOps<F>;
    bool pi = p.inf || O::is_zero(p.z), qi = q.inf || O::is_zero(q.z);
    if (pi || qi) return pi == qi;
    F z1z1, z2z2, u1, u2, s1, s2, t;
    O::sqr(z1z1, p.z);
    O::sqr(z2z2, q.z);
    O::mul(u1, p.x, z2z2);
    O::mul(u2, q.x, z1z1);
    if (!O::eq(u1, u2)) return false;
    O::mul(t, q.z, z2z2);
    O::mul(s1, p.y, t);
    O::mul(t, p.z, z1z1);
    O::mul(s2, q.y, t);
    return O::eq(s1, s2);
}

// Fast G1 membership (M. Scott, "A note on group membership tests for G1,
// G2 and GT", eprint 2021/1130): an on-curve P lies in the r-order subgroup
// iff phi(P) == -[x^2]P, where phi(x, y) = (beta x, y) is the GLV
// endomorphism and x the BLS parameter. Two 64-bit ladders (and |x| has
// Hamming weight 6) replace the generic 255-bit multiply-by-r ladder --
// ~4x fewer point operations on the decompress hot path. Differentially
// tested against the generic check (tests/test_native.py).
static bool in_subgroup_g1_fast(const Fp &x, const Fp &y) {
    Jac<Fp> p = jac_from_affine<Fp>(x, y);
    Jac<Fp> phi_p = p;  // z == 1, so scaling X scales the affine x
    Fp beta;
    memcpy(beta.l, BETA_G1_MONT, sizeof beta.l);
    fp_mul(phi_p.x, p.x, beta);
    Jac<Fp> t;
    jac_mul_xabs(t, p);
    jac_mul_xabs(t, t);       // [x^2]P (the parameter's sign squares away)
    fp_neg(t.y, t.y);         // -[x^2]P
    return jac_eq(phi_p, t);
}

// ---------------------------------------------------------------------------
// Point codecs (parity: oracle/serialization.py)
// ---------------------------------------------------------------------------

static const uint8_t FLAG_COMPRESSED = 0x80;
static const uint8_t FLAG_INFINITY = 0x40;
static const uint8_t FLAG_SIGN = 0x20;

// returns: 0 = ok point, 1 = infinity, negative = error
static int g1_decompress(const uint8_t in[48], Fp &x, Fp &y, bool subgroup_check) {
    uint8_t flags = in[0];
    if (!(flags & FLAG_COMPRESSED)) return -1;
    if (flags & FLAG_INFINITY) {
        if (flags != (FLAG_COMPRESSED | FLAG_INFINITY)) return -2;
        for (int i = 1; i < 48; i++)
            if (in[i]) return -2;
        return 1;
    }
    uint8_t buf[48];
    memcpy(buf, in, 48);
    buf[0] &= 0x1F;
    if (!fp_from_be(x, buf)) return -3;
    Fp y2, t, b;
    fp_sqr(t, x);
    fp_mul(y2, t, x);
    memcpy(b.l, B_G1_MONT, sizeof b.l);
    fp_add(y2, y2, b);
    if (!fp_sqrt(y, y2)) return -4;
    bool sign = (flags & FLAG_SIGN) != 0;
    if (sign != fp_lex_larger(y)) fp_neg(y, y);
    if (subgroup_check && !in_subgroup_g1_fast(x, y)) return -5;
    return 0;
}

static void g1_compress(uint8_t out[48], const Fp &x, const Fp &y, bool inf) {
    if (inf) {
        memset(out, 0, 48);
        out[0] = FLAG_COMPRESSED | FLAG_INFINITY;
        return;
    }
    fp_to_be(out, x);
    out[0] |= FLAG_COMPRESSED;
    if (fp_lex_larger(y)) out[0] |= FLAG_SIGN;
}

static int g2_decompress(const uint8_t in[96], Fp2 &x, Fp2 &y, bool subgroup_check) {
    uint8_t flags = in[0];
    if (!(flags & FLAG_COMPRESSED)) return -1;
    if (flags & FLAG_INFINITY) {
        if (flags != (FLAG_COMPRESSED | FLAG_INFINITY)) return -2;
        for (int i = 1; i < 96; i++)
            if (in[i]) return -2;
        return 1;
    }
    uint8_t buf[48];
    memcpy(buf, in, 48);
    buf[0] &= 0x1F;
    if (!fp_from_be(x.c1, buf)) return -3;
    if (!fp_from_be(x.c0, in + 48)) return -3;
    Fp2 y2, t, b;
    fp2_sqr(t, x);
    fp2_mul(y2, t, x);
    memcpy(b.c0.l, B_G2_C0_MONT, 48);
    memcpy(b.c1.l, B_G2_C1_MONT, 48);
    fp2_add(y2, y2, b);
    if (!fp2_sqrt(y, y2)) return -4;
    bool sign = (flags & FLAG_SIGN) != 0;
    if (sign != fp2_lex_larger(y)) fp2_neg(y, y);
    if (subgroup_check && !in_subgroup<Fp2>(x, y)) return -5;
    return 0;
}

static void g2_compress(uint8_t out[96], const Fp2 &x, const Fp2 &y, bool inf) {
    if (inf) {
        memset(out, 0, 96);
        out[0] = FLAG_COMPRESSED | FLAG_INFINITY;
        return;
    }
    fp_to_be(out, x.c1);
    fp_to_be(out + 48, x.c0);
    out[0] |= FLAG_COMPRESSED;
    if (fp2_lex_larger(y)) out[0] |= FLAG_SIGN;
}

// ---------------------------------------------------------------------------
// Pairing: Miller loop with G2 arithmetic in Jacobian coordinates ON THE
// TWIST (all Fp2 -- no per-step tower inversions), sparse line
// multiplication, and a final exponentiation whose hard part is the
// standard BLS12 x-chain over cyclotomic squarings.
//
// Design parity: blst delegates this to its assembly pairing
// (/root/reference/blst/src/kzg_proofs.rs:74-100); here it is an original
// from-scratch implementation.
//
// Twist conventions (match oracle/pairing.py): E': y^2 = x^3 + 4(u+1) is an
// M-type sextic twist with xi = 1+u, untwist psi(x,y) = (x/v, y/w^3) where
// Fp12 = Fp6[w]/(w^2 - v), Fp6 = Fp2[v]/(v^3 - xi). Lines are scaled by
// arbitrary Fp2 factors (killed by the final exponentiation, which contains
// p^2 - 1). Evaluating the doubling tangent at P = (xP, yP) gives
//     L = (3X^3 - 2Y^2)*1 + (-3 X^2 Z^2 xP)*v + (2 Y Z^3 yP)*vw
// and the addition chord through T and affine Q gives
//     L = (theta xQ - mu Z yQ)*w + (-theta xP)*vw + (mu Z yP)*v^2
// with theta = Y - yQ Z^3, mu = X - xQ Z^2 (derivation in the docarchive:
// clear lambda denominators, push w-powers into Fp2 via w^6 = xi).

struct G2Jac {
    Fp2 X, Y, Z;
};

// r *= g where g = c0 + c1*v + c4*v*w (the doubling-line sparse pattern).
// Karatsuba over the w-split: 13 Fp2 muls vs 18 for a generic fp12_mul.
static void fp12_mul_by_014(Fp12 &r, const Fp12 &f, const Fp2 &c0, const Fp2 &c1, const Fp2 &c4) {
    // t0 = f.b0 * (c0 + c1 v): 5 Fp2 muls
    Fp6 t0;
    {
        const Fp2 &a0 = f.b0.a0, &a1 = f.b0.a1, &a2 = f.b0.a2;
        Fp2 m00, m11, mx, s1, s2;
        fp2_mul(m00, a0, c0);
        fp2_mul(m11, a1, c1);
        fp2_add(s1, a0, a1);
        fp2_add(s2, c0, c1);
        fp2_mul(mx, s1, s2);  // a0c1 + a1c0 + m00 + m11
        Fp2 m21, m20;
        fp2_mul(m21, a2, c1);
        fp2_mul(m20, a2, c0);
        Fp2 xi21;
        fp2_mul_by_xi(xi21, m21);
        fp2_add(t0.a0, m00, xi21);
        fp2_sub(t0.a1, mx, m00);
        fp2_sub(t0.a1, t0.a1, m11);
        fp2_add(t0.a2, m11, m20);
    }
    // t1 = f.b1 * (c4 v): 3 Fp2 muls
    Fp6 t1;
    {
        const Fp2 &b0 = f.b1.a0, &b1 = f.b1.a1, &b2 = f.b1.a2;
        Fp2 m2;
        fp2_mul(m2, b2, c4);
        fp2_mul_by_xi(t1.a0, m2);
        fp2_mul(t1.a1, b0, c4);
        fp2_mul(t1.a2, b1, c4);
    }
    // u = (f.b0 + f.b1) * (c0 + (c1+c4) v): 5 Fp2 muls
    Fp6 u;
    {
        Fp2 a0, a1, a2, d1;
        fp2_add(a0, f.b0.a0, f.b1.a0);
        fp2_add(a1, f.b0.a1, f.b1.a1);
        fp2_add(a2, f.b0.a2, f.b1.a2);
        fp2_add(d1, c1, c4);
        Fp2 m00, m11, mx, s1, s2;
        fp2_mul(m00, a0, c0);
        fp2_mul(m11, a1, d1);
        fp2_add(s1, a0, a1);
        fp2_add(s2, c0, d1);
        fp2_mul(mx, s1, s2);
        Fp2 m21, m20;
        fp2_mul(m21, a2, d1);
        fp2_mul(m20, a2, c0);
        Fp2 xi21;
        fp2_mul_by_xi(xi21, m21);
        fp2_add(u.a0, m00, xi21);
        fp2_sub(u.a1, mx, m00);
        fp2_sub(u.a1, u.a1, m11);
        fp2_add(u.a2, m11, m20);
    }
    // r.b0 = t0 + v*t1 ; r.b1 = u - t0 - t1
    Fp6 vt1;
    fp6_mul_by_v(vt1, t1);
    fp6_add(r.b0, t0, vt1);
    fp6_sub(r.b1, u, t0);
    fp6_sub(r.b1, r.b1, t1);
}

// Proper Fp12 squaring (complex/Karatsuba over the w-split): 2 Fp6 muls.
static void fp12_sqr_fast(Fp12 &r, const Fp12 &a) {
    Fp6 t, s0, s1;
    fp6_mul(t, a.b0, a.b1);         // ab
    fp6_add(s0, a.b0, a.b1);        // a+b
    Fp6 bv;
    fp6_mul_by_v(bv, a.b1);
    fp6_add(s1, a.b0, bv);          // a + bv
    fp6_mul(s0, s0, s1);            // a^2 + b^2 v + ab(1+v)
    Fp6 tv;
    fp6_mul_by_v(tv, t);
    fp6_sub(s0, s0, t);
    fp6_sub(r.b0, s0, tv);
    fp6_add(r.b1, t, t);
}

// Doubling step: emits the tangent-line Fp2 coefficients (l0 at 1,
// l1 at v -- to be scaled by xP, l4 at vw -- to be scaled by yP).
static void g2_dbl_step(G2Jac &T, Fp2 &l0, Fp2 &l1, Fp2 &l4) {
    Fp2 XX, YY, YYYY, ZZ, Z3, t;
    fp2_sqr(XX, T.X);
    fp2_sqr(YY, T.Y);
    fp2_sqr(YYYY, YY);
    fp2_sqr(ZZ, T.Z);
    fp2_mul(Z3, ZZ, T.Z);
    // l4 = 2 Y Z^3
    fp2_mul(l4, T.Y, Z3);
    fp2_add(l4, l4, l4);
    // l1 = -3 X^2 Z^2
    fp2_mul(l1, XX, ZZ);
    fp2_add(t, l1, l1);
    fp2_add(l1, t, l1);
    fp2_neg(l1, l1);
    // l0 = 3 X^3 - 2 Y^2
    Fp2 X3c;
    fp2_mul(X3c, XX, T.X);
    fp2_add(t, X3c, X3c);
    fp2_add(l0, t, X3c);
    fp2_add(t, YY, YY);
    fp2_sub(l0, l0, t);
    // T = 2T (Jacobian, a = 0): dbl-2009-l
    Fp2 S, M, X2, Y2, Z2;
    fp2_add(t, T.X, YY);
    fp2_sqr(t, t);
    fp2_sub(t, t, XX);
    fp2_sub(t, t, YYYY);
    fp2_add(S, t, t);               // S = 2((X+YY)^2 - XX - YYYY)
    fp2_add(M, XX, XX);
    fp2_add(M, M, XX);              // M = 3 XX
    fp2_sqr(X2, M);
    fp2_sub(X2, X2, S);
    fp2_sub(X2, X2, S);             // X' = M^2 - 2S
    fp2_add(Z2, T.Y, T.Z);
    fp2_sqr(Z2, Z2);
    fp2_sub(Z2, Z2, YY);
    fp2_sub(Z2, Z2, ZZ);            // Z' = (Y+Z)^2 - YY - ZZ
    fp2_sub(t, S, X2);
    fp2_mul(Y2, M, t);
    Fp2 e8;
    fp2_add(e8, YYYY, YYYY);
    fp2_add(e8, e8, e8);
    fp2_add(e8, e8, e8);
    fp2_sub(Y2, Y2, e8);            // Y' = M(S - X') - 8 YYYY
    T.X = X2;
    T.Y = Y2;
    T.Z = Z2;
}

// Mixed addition step T += Q: emits the chord-line Fp2 coefficients
// (l3 at w, l4 at vw -- to be scaled by xP, l2 at v^2 -- to be scaled by yP).
static void g2_add_step(G2Jac &T, const Fp2 &qx, const Fp2 &qy, Fp2 &l2, Fp2 &l3, Fp2 &l4) {
    Fp2 ZZ, U2, S2, H, rr, HH, H3, XHH, t;
    fp2_sqr(ZZ, T.Z);
    fp2_mul(U2, qx, ZZ);            // xQ Z^2
    fp2_mul(S2, qy, ZZ);
    fp2_mul(S2, S2, T.Z);           // yQ Z^3
    fp2_sub(H, U2, T.X);            // H = -mu
    fp2_sub(rr, S2, T.Y);           // rr = -theta
    fp2_sqr(HH, H);
    fp2_mul(H3, HH, H);
    fp2_mul(XHH, T.X, HH);
    // X' = rr^2 - H^3 - 2 X HH
    Fp2 X2;
    fp2_sqr(X2, rr);
    fp2_sub(X2, X2, H3);
    fp2_sub(X2, X2, XHH);
    fp2_sub(X2, X2, XHH);
    // Y' = rr (X HH - X') - Y H^3
    Fp2 Y2;
    fp2_sub(t, XHH, X2);
    fp2_mul(Y2, rr, t);
    fp2_mul(t, T.Y, H3);
    fp2_sub(Y2, Y2, t);
    // Z' = Z H
    Fp2 Z2;
    fp2_mul(Z2, T.Z, H);
    // line: theta = -rr, mu Z = -Z'
    // l2 = mu Z = -Z'        (coefficient of v^2, scaled by yP)
    fp2_neg(l2, Z2);
    // l4 = -theta = rr       (coefficient of vw, scaled by xP)
    l4 = rr;
    // l3 = theta xQ - mu Z yQ = -rr xQ + Z' yQ
    Fp2 a, b;
    fp2_mul(a, rr, qx);
    fp2_mul(b, Z2, qy);
    fp2_sub(l3, b, a);
    T.X = X2;
    T.Y = Y2;
    T.Z = Z2;
}

// Scale an Fp2 by an Fp scalar (two Fp muls).
static inline void fp2_scale_fp(Fp2 &r, const Fp2 &a, const Fp &s) {
    fp_mul(r.c0, a.c0, s);
    fp_mul(r.c1, a.c1, s);
}

// Miller loop f_{|x|, Q}(P), conjugated for the negative BLS parameter.
// Identity inputs yield 1 (neutral), matching the oracle.
static Fp12 miller_loop(const Fp &px, const Fp &py, bool p_inf, const Fp2 &qx, const Fp2 &qy, bool q_inf) {
    if (p_inf || q_inf) return fp12_one();
    G2Jac T;
    T.X = qx;
    T.Y = qy;
    T.Z = fp2_one();
    Fp12 f = fp12_one();
    uint64_t x = BLS_X_ABS;
    int top = 63;
    while (!((x >> top) & 1)) top--;
    for (int i = top - 1; i >= 0; i--) {
        fp12_sqr_fast(f, f);
        Fp2 l0, l1, l4;
        g2_dbl_step(T, l0, l1, l4);
        fp2_scale_fp(l1, l1, px);
        fp2_scale_fp(l4, l4, py);
        fp12_mul_by_014(f, f, l0, l1, l4);
        if ((x >> i) & 1) {
            Fp2 a2, a3, a4;
            g2_add_step(T, qx, qy, a2, a3, a4);
            // sparse element a2*v^2 + a3*w + a4*vw: only 5 add steps per
            // loop (hamming weight of |x|), a full fp12_mul is fine here.
            Fp12 l;
            l.b0 = fp6_zero();
            l.b1 = fp6_zero();
            fp2_scale_fp(l.b0.a2, a2, py);
            l.b1.a0 = a3;
            fp2_scale_fp(l.b1.a1, a4, px);
            fp12_mul(f, f, l);
        }
    }
    Fp12 r;
    fp12_conj(r, f);
    return r;
}

// ---------------------------------------------------------------------------
// Prepared (fixed-Q) pairing: every pairing this library evaluates has BOTH
// G2 arguments fixed per trusted setup ([1]_2 and [s]_2) -- precompute the
// line coefficients of the whole Miller ladder once and cache them, and run
// the two Miller loops of each verification SHARING one f-squaring chain.
// Removes all per-call G2 Jacobian arithmetic and half the Fp12 squarings
// (~1.7x on the Miller phase). blst reaches the same effect with its
// Pairing::aggregate multi-pairing (used via /root/reference/blst/src/
// kzg_proofs.rs:74-100); the precomputed-line-table form here is original.
// ---------------------------------------------------------------------------

struct PreparedG2 {
    Fp2 dbl[64][3];  // per iteration: l0 | l1 (pre-xP scale) | l4 (pre-yP)
    Fp2 add[8][3];   // per set bit:   l2 (pre-yP) | l3 | l4 (pre-xP)
    Fp2 qx, qy;      // cache key (Montgomery affine coordinates)
    bool valid;
};

static void g2_prepare(const Fp2 &qx, const Fp2 &qy, PreparedG2 &out) {
    G2Jac T;
    T.X = qx;
    T.Y = qy;
    T.Z = fp2_one();
    uint64_t x = BLS_X_ABS;
    int top = 63;
    while (!((x >> top) & 1)) top--;
    int d = 0, a = 0;
    for (int i = top - 1; i >= 0; i--) {
        g2_dbl_step(T, out.dbl[d][0], out.dbl[d][1], out.dbl[d][2]);
        d++;
        if ((x >> i) & 1) {
            g2_add_step(T, qx, qy, out.add[a][0], out.add[a][1], out.add[a][2]);
            a++;
        }
    }
    out.qx = qx;
    out.qy = qy;
    out.valid = true;
}

// 4-entry round-robin cache; the protocol only ever pairs against [1]_2 and
// [s]_2, so after the first verification every call hits. prep_fetch COPIES
// the entry out under a short-lived lock (~21 KB memcpy): callers never hold
// pointers into the cache, so (a) a later miss in the same verification
// cannot evict an entry a caller is still reading -- round-robin eviction
// with >4 distinct G2 points (e.g. multiproof's g2_monomial[n] values) made
// the aliasing version return wrong pairing verdicts -- and (b) the Miller
// loop + final exponentiation run UNLOCKED, so verifications proceed
// concurrently across threads (only the table build/copy serializes).
#include <mutex>
static PreparedG2 g_prep_cache[4];
static int g_prep_next = 0;
static std::mutex g_prep_mutex;

static void prep_fetch(const Fp2 &qx, const Fp2 &qy, PreparedG2 &out) {
    std::lock_guard<std::mutex> lock(g_prep_mutex);
    for (auto &p : g_prep_cache)
        if (p.valid && fp2_eq(p.qx, qx) && fp2_eq(p.qy, qy)) {
            out = p;
            return;
        }
    PreparedG2 &slot = g_prep_cache[g_prep_next];
    g_prep_next = (g_prep_next + 1) & 3;
    g2_prepare(qx, qy, slot);
    out = slot;
}

// f_{|x|,Q1}(P1) * f_{|x|,Q2}(P2) with ONE shared squaring chain, from
// precomputed line tables; conjugated for the negative BLS parameter.
// iK = true skips pair K entirely (its factor is 1).
static Fp12 miller_loop_dual_prepared(const Fp &p1x, const Fp &p1y, bool i1,
                                      const PreparedG2 *q1,
                                      const Fp &p2x, const Fp &p2y, bool i2,
                                      const PreparedG2 *q2) {
    if (i1 && i2) return fp12_one();
    Fp12 f = fp12_one();
    uint64_t x = BLS_X_ABS;
    int top = 63;
    while (!((x >> top) & 1)) top--;
    int d = 0, a = 0;
    for (int i = top - 1; i >= 0; i--) {
        fp12_sqr_fast(f, f);
        if (!i1) {
            Fp2 l1, l4;
            fp2_scale_fp(l1, q1->dbl[d][1], p1x);
            fp2_scale_fp(l4, q1->dbl[d][2], p1y);
            fp12_mul_by_014(f, f, q1->dbl[d][0], l1, l4);
        }
        if (!i2) {
            Fp2 l1, l4;
            fp2_scale_fp(l1, q2->dbl[d][1], p2x);
            fp2_scale_fp(l4, q2->dbl[d][2], p2y);
            fp12_mul_by_014(f, f, q2->dbl[d][0], l1, l4);
        }
        d++;
        if ((x >> i) & 1) {
            if (!i1) {
                Fp12 l;
                l.b0 = fp6_zero();
                l.b1 = fp6_zero();
                fp2_scale_fp(l.b0.a2, q1->add[a][0], p1y);
                l.b1.a0 = q1->add[a][1];
                fp2_scale_fp(l.b1.a1, q1->add[a][2], p1x);
                fp12_mul(f, f, l);
            }
            if (!i2) {
                Fp12 l;
                l.b0 = fp6_zero();
                l.b1 = fp6_zero();
                fp2_scale_fp(l.b0.a2, q2->add[a][0], p2y);
                l.b1.a0 = q2->add[a][1];
                fp2_scale_fp(l.b1.a1, q2->add[a][2], p2x);
                fp12_mul(f, f, l);
            }
            a++;
        }
    }
    Fp12 r;
    fp12_conj(r, f);
    return r;
}

// Granger-Scott cyclotomic squaring: valid after the easy part of the final
// exponentiation. Fp4 pairs of the Fp12 coordinates (over Fp2):
// (a00, b01), (b00, a02), (a01, b02) with Fp4 = Fp2[s]/(s^2 - xi).
static void fp4_square(Fp2 &c0, Fp2 &c1, const Fp2 &a, const Fp2 &b) {
    Fp2 t0, t1, t2;
    fp2_sqr(t0, a);
    fp2_sqr(t1, b);
    fp2_mul_by_xi(t2, t1);
    fp2_add(c0, t2, t0);            // a^2 + xi b^2
    fp2_add(t2, a, b);
    fp2_sqr(t2, t2);
    fp2_sub(t2, t2, t0);
    fp2_sub(c1, t2, t1);            // 2ab
}

static void fp12_cyc_sqr(Fp12 &r, const Fp12 &a) {
    const Fp2 &z0 = a.b0.a0, &z4 = a.b0.a1, &z3 = a.b0.a2;
    const Fp2 &z2 = a.b1.a0, &z1 = a.b1.a1, &z5 = a.b1.a2;
    Fp2 t0, t1, t2, t3, t4, t5, tt;
    fp4_square(t0, t1, z0, z1);
    fp4_square(t2, t3, z2, z3);
    fp4_square(t4, t5, z4, z5);
    // z0' = 3 t0 - 2 z0
    fp2_sub(tt, t0, z0);
    fp2_add(tt, tt, tt);
    fp2_add(r.b0.a0, tt, t0);
    // z1' = 3 t1 + 2 z1
    fp2_add(tt, t1, z1);
    fp2_add(tt, tt, tt);
    fp2_add(r.b1.a1, tt, t1);
    // the (z2,z3) pair's square feeds the (z4,z5) slots and vice versa
    // (cross-wiring of the Fp4 components under gamma-multiplication):
    // z4' = 3 t2 - 2 z4
    fp2_sub(tt, t2, z4);
    fp2_add(tt, tt, tt);
    fp2_add(r.b0.a1, tt, t2);
    // z5' = 3 t3 + 2 z5
    fp2_add(tt, t3, z5);
    fp2_add(tt, tt, tt);
    fp2_add(r.b1.a2, tt, t3);
    // z2' = 3 xi t5 + 2 z2
    Fp2 xt5;
    fp2_mul_by_xi(xt5, t5);
    fp2_add(tt, xt5, z2);
    fp2_add(tt, tt, tt);
    fp2_add(r.b1.a0, tt, xt5);
    // z3' = 3 t4 - 2 z3
    fp2_sub(tt, t4, z3);
    fp2_add(tt, tt, tt);
    fp2_add(r.b0.a2, tt, t4);
}

// m^|x| by square-and-multiply over cyclotomic squarings, then conjugate
// (x < 0; inverse == conjugate in the cyclotomic subgroup).
static Fp12 fp12_cyc_exp_x(const Fp12 &m) {
    uint64_t x = BLS_X_ABS;
    int top = 63;
    while (!((x >> top) & 1)) top--;
    Fp12 acc = m;
    for (int i = top - 1; i >= 0; i--) {
        fp12_cyc_sqr(acc, acc);
        if ((x >> i) & 1) fp12_mul(acc, acc, m);
    }
    Fp12 r;
    fp12_conj(r, acc);
    return r;
}

// Final exponentiation f^((p^12-1)/r), up to a harmless cube: the hard part
// uses (x-1)^2 (x+p) (x^2+p^2-1) + 3 == 3*(p^4-p^2+1)/r (verified
// numerically for the BLS12-381 parameters). gcd(3, r) = 1, so
// result == 1 iff f^((p^12-1)/r) == 1 -- and pairings_verify only tests
// against one.
static Fp12 final_exponentiation(const Fp12 &f) {
    // easy part: m = f^((p^6-1)(p^2+1))
    Fp12 finv, m, m2;
    fp12_inv(finv, f);
    fp12_conj(m, f);
    fp12_mul(m, m, finv);
    fp12_frobenius(m2, m);
    fp12_frobenius(m2, m2);
    fp12_mul(m, m2, m);
    // hard part (all in the cyclotomic subgroup):
    Fp12 a, t, u, r;
    // a = m^(x-1) = exp_x(m) * conj(m)
    a = fp12_cyc_exp_x(m);
    fp12_conj(t, m);
    fp12_mul(a, a, t);
    // a = m^((x-1)^2)
    t = fp12_cyc_exp_x(a);
    fp12_conj(a, a);
    fp12_mul(a, t, a);
    // t = a^(x+p) = exp_x(a) * frob(a)
    t = fp12_cyc_exp_x(a);
    fp12_frobenius(u, a);
    fp12_mul(t, t, u);
    // r = t^(x^2 + p^2 - 1) * m^3
    r = fp12_cyc_exp_x(fp12_cyc_exp_x(t));
    fp12_frobenius(u, t);
    fp12_frobenius(u, u);
    fp12_mul(r, r, u);
    fp12_conj(u, t);
    fp12_mul(r, r, u);
    fp12_cyc_sqr(u, m);
    fp12_mul(u, u, m);
    fp12_mul(r, r, u);
    return r;
}

// ---------------------------------------------------------------------------
// Fr: 4x64-bit Montgomery scalar field + host barycentric evaluation
// (parity: evaluate_polynomial_in_evaluation_form, eip_4844.rs:954-1003 --
// the single-blob verify path is latency-bound, so the 4096-element eval
// runs here instead of paying a device round trip)
// ---------------------------------------------------------------------------

struct Fr {
    uint64_t l[4];
};

static inline bool fr_is_zero(const Fr &a) {
    return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}
static inline bool fr_eq(const Fr &a, const Fr &b) {
    uint64_t r = 0;
    for (int i = 0; i < 4; i++) r |= a.l[i] ^ b.l[i];
    return r == 0;
}

static void fr_mul(Fr &r, const Fr &a, const Fr &b) {
    uint64_t t[6] = {0};
    for (int i = 0; i < 4; i++) {
        uint64_t carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)a.l[j] * b.l[i] + t[j] + carry;
            t[j] = (uint64_t)s;
            carry = (uint64_t)(s >> 64);
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (uint64_t)s;
        t[5] = (uint64_t)(s >> 64);
        uint64_t m = t[0] * FR_N0INV;
        u128 s2 = (u128)m * R_LIMBS[0] + t[0];
        carry = (uint64_t)(s2 >> 64);
        for (int j = 1; j < 4; j++) {
            s2 = (u128)m * R_LIMBS[j] + t[j] + carry;
            t[j - 1] = (uint64_t)s2;
            carry = (uint64_t)(s2 >> 64);
        }
        s2 = (u128)t[4] + carry;
        t[3] = (uint64_t)s2;
        t[4] = t[5] + (uint64_t)(s2 >> 64);
        t[5] = 0;
    }
    if (t[4] || geq(t, R_LIMBS, 4)) {
        sub_limbs(r.l, t, R_LIMBS, 4);
    } else {
        memcpy(r.l, t, 32);
    }
}

static inline void fr_add(Fr &r, const Fr &a, const Fr &b) {
    uint64_t t[4], carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        t[i] = (uint64_t)s;
        carry = (uint64_t)(s >> 64);
    }
    if (carry || geq(t, R_LIMBS, 4)) sub_limbs(r.l, t, R_LIMBS, 4);
    else memcpy(r.l, t, 32);
}

static inline void fr_sub(Fr &r, const Fr &a, const Fr &b) {
    uint64_t t[4], borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.l[i] - b.l[i] - borrow;
        t[i] = (uint64_t)s;
        borrow = ((uint64_t)(s >> 64)) & 1;
    }
    if (borrow) {
        uint64_t carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + R_LIMBS[i] + carry;
            r.l[i] = (uint64_t)s;
            carry = (uint64_t)(s >> 64);
        }
    } else {
        memcpy(r.l, t, 32);
    }
}

static Fr fr_one_mont() {
    Fr r;
    memcpy(r.l, FR_ONE_MONT, 32);
    return r;
}

static void fr_pow(Fr &r, const Fr &a, const uint64_t *e, int nl) {
    Fr acc = fr_one_mont();
    int top = nl * 64 - 1;
    while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) top--;
    for (int i = top; i >= 0; i--) {
        fr_mul(acc, acc, acc);
        if ((e[i / 64] >> (i % 64)) & 1) fr_mul(acc, acc, a);
    }
    r = acc;
}

static void fr_inv(Fr &r, const Fr &a) { fr_pow(r, a, FR_R_MINUS_2, 4); }

// 32-byte big-endian canonical -> Montgomery; false if >= r
static bool fr_from_be(Fr &r, const uint8_t *be) {
    uint64_t t[4];
    for (int i = 0; i < 4; i++) {
        uint64_t v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | be[(3 - i) * 8 + j];
        t[i] = v;
    }
    if (geq(t, R_LIMBS, 4)) return false;
    Fr raw;
    memcpy(raw.l, t, 32);
    Fr r2;
    memcpy(r2.l, FR_R2, 32);
    fr_mul(r, raw, r2);
    return true;
}

static void fr_to_be(uint8_t *be, const Fr &a) {
    Fr one_raw;
    memset(&one_raw, 0, sizeof one_raw);
    one_raw.l[0] = 1;
    Fr canon;
    fr_mul(canon, a, one_raw);  // Montgomery reduce
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 8; j++)
            be[(3 - i) * 8 + j] = (uint8_t)(canon.l[i] >> (56 - 8 * j));
}

// Barycentric evaluation of a blob at z over the bit-reversed 4096-root
// domain: y = (z^n - 1)/n * sum_i p_i r_i / (z - r_i), with the in-domain
// short-circuit. All inputs canonical big-endian; roots are the SAME brp
// table the device path uses (bit-exact by construction).
// Returns 0 ok, -1 bad scalar.
extern "C" int kzgn_eval_barycentric_4096(const uint8_t *blob_be, const uint8_t *z_be,
                               const uint8_t *roots_brp_be, uint8_t *y_out) {
    const int n = 4096;
    static thread_local Fr poly[4096], roots[4096], diff[4096], pref[4096];
    Fr z;
    if (!fr_from_be(z, z_be)) return -1;
    // roots arrive as raw little-endian MONTGOMERY limbs (cached on the
    // Python settings object) -- no per-call conversion
    memcpy(roots, roots_brp_be, 32 * n);
    for (int i = 0; i < n; i++) {
        if (!fr_from_be(poly[i], blob_be + 32 * i)) return -1;
    }
    // in-domain check
    for (int i = 0; i < n; i++) {
        if (fr_eq(z, roots[i])) {
            fr_to_be(y_out, poly[i]);
            return 0;
        }
    }
    // batch inversion of (z - r_i), Montgomery trick
    for (int i = 0; i < n; i++) fr_sub(diff[i], z, roots[i]);
    pref[0] = diff[0];
    for (int i = 1; i < n; i++) fr_mul(pref[i], pref[i - 1], diff[i]);
    Fr acc;
    fr_inv(acc, pref[n - 1]);
    Fr y;
    memset(&y, 0, sizeof y);
    for (int i = n - 1; i >= 1; i--) {
        Fr invd;
        fr_mul(invd, acc, pref[i - 1]);  // 1/diff[i]
        fr_mul(acc, acc, diff[i]);
        Fr term;
        fr_mul(term, poly[i], roots[i]);
        fr_mul(term, term, invd);
        fr_add(y, y, term);
    }
    Fr term0;
    fr_mul(term0, poly[0], roots[0]);
    fr_mul(term0, term0, acc);  // acc == 1/diff[0]
    fr_add(y, y, term0);
    // * (z^n - 1) / n
    Fr zp = z;
    for (int k = 0; k < 12; k++) fr_mul(zp, zp, zp);
    Fr one = fr_one_mont();
    Fr fac;
    fr_sub(fac, zp, one);
    fr_mul(y, y, fac);
    Fr invn;
    memcpy(invn.l, FR_INV4096_MONT, 32);
    fr_mul(y, y, invn);
    fr_to_be(y_out, y);
    return 0;
}

// Batch barycentric evaluation: n blobs at n points, ONE Montgomery batch
// inversion across all n*4096 denominators (the per-blob inverse chain --
// ~255 muls -- amortizes to nothing). This keeps the whole evaluation on
// the HOST: on a remote-attached TPU the 8.4 MB blob upload is wire-bound
// (hundreds of ms), while this loop is ~1.5 ms/blob of scalar Fr work.
// blobs_be: n*4096*32 canonical BE; zs_be: n*32; roots_mont: 4096 raw
// little-endian Montgomery Fr limbs (the cached settings table).
// Returns 0 ok (ys_out: n*32 BE), i+1 if blob i has a non-canonical
// scalar, -(i+1) if z_i is non-canonical.
// ---------------------------------------------------------------------------
// 8-lane Fr arithmetic with AVX-512 IFMA (vpmadd52): radix-2^52, 5 limbs,
// Montgomery R52 = 2^260. Vertical layout: __m512i limb[k] holds limb k of 8
// independent field elements. Used by the batch barycentric evaluator --
// the host-side analog of the reference's rayon parallel eval
// (/root/reference/kzg/src/eip_4844.rs:954-1003 under cfg_iter!), with SIMD
// lanes in place of cores.
// ---------------------------------------------------------------------------
#if defined(__AVX512IFMA__) && defined(__AVX512F__)
#define KZGN_IFMA 1
#include <immintrin.h>

namespace ifma {

constexpr int K = 5;                       // 5 x 52 = 260 bits
constexpr uint64_t MASK52 = (1ULL << 52) - 1;

struct Fr8 {
    __m512i l[K];
};

// modulus r in 52-bit limbs, n' = -r^{-1} mod 2^52, and 2^520 mod r
// (the to-Montgomery factor), all derived at first use from R_LIMBS.
struct Consts {
    uint64_t n52[K];
    uint64_t np52;
    Fr r52sq_mont;                          // scalar-form (4x64) 2^520 mod r
    __m512i vN[K], vNp, vZero;
};

static const Consts &consts() {
    static Consts c = [] {
        Consts cc{};
        // 52-bit limbs of r from the 64-bit limbs
        unsigned __int128 acc = 0;
        int bits = 0, k = 0;
        for (int i = 0; i < 4; i++) {
            acc |= (unsigned __int128)R_LIMBS[i] << bits;
            bits += 64;
            while (bits >= 52 && k < K) {
                cc.n52[k++] = (uint64_t)(acc & MASK52);
                acc >>= 52;
                bits -= 52;
            }
        }
        while (k < K) {
            cc.n52[k++] = (uint64_t)(acc & MASK52);
            acc >>= 52;
        }
        // np52 = -r^{-1} mod 2^52 (Newton iteration on 64-bit then mask)
        uint64_t n0 = cc.n52[0];
        uint64_t inv = n0;                  // n0 odd
        for (int i = 0; i < 6; i++) inv *= 2 - n0 * inv;
        cc.np52 = (0 - inv) & MASK52;
        // 2^520 mod r via repeated doubling on 4x64 raw limbs
        uint64_t v[4] = {1, 0, 0, 0};
        for (int i = 0; i < 520; i++) {
            uint64_t carry = 0;
            for (int j = 0; j < 4; j++) {
                uint64_t nv = (v[j] << 1) | carry;
                carry = v[j] >> 63;
                v[j] = nv;
            }
            if (carry || geq(v, R_LIMBS, 4)) sub_limbs(v, v, R_LIMBS, 4);
        }
        memcpy(cc.r52sq_mont.l, v, 32);
        for (int j = 0; j < K; j++) cc.vN[j] = _mm512_set1_epi64((long long)cc.n52[j]);
        cc.vNp = _mm512_set1_epi64((long long)cc.np52);
        cc.vZero = _mm512_setzero_si512();
        return cc;
    }();
    return c;
}

// c = a * b * 2^-260 mod r, lanes independent. Inputs: limbs < 2^52 with
// values < r (strict); output fully reduced < r.
static inline void mul(Fr8 &c, const Fr8 &a, const Fr8 &b) {
    const Consts &C = consts();
    __m512i t[K + 1];
    for (int j = 0; j <= K; j++) t[j] = C.vZero;
    for (int i = 0; i < K; i++) {
        const __m512i ai = a.l[i];
        // t += ai * b
        t[0] = _mm512_madd52lo_epu64(t[0], ai, b.l[0]);
        t[1] = _mm512_madd52lo_epu64(t[1], ai, b.l[1]);
        t[2] = _mm512_madd52lo_epu64(t[2], ai, b.l[2]);
        t[3] = _mm512_madd52lo_epu64(t[3], ai, b.l[3]);
        t[4] = _mm512_madd52lo_epu64(t[4], ai, b.l[4]);
        t[1] = _mm512_madd52hi_epu64(t[1], ai, b.l[0]);
        t[2] = _mm512_madd52hi_epu64(t[2], ai, b.l[1]);
        t[3] = _mm512_madd52hi_epu64(t[3], ai, b.l[2]);
        t[4] = _mm512_madd52hi_epu64(t[4], ai, b.l[3]);
        t[5] = _mm512_madd52hi_epu64(t[5], ai, b.l[4]);
        // m = low52(t0 * np)  (vpmadd52 reads only low 52 bits of sources)
        __m512i m = _mm512_madd52lo_epu64(C.vZero, t[0], C.vNp);
        // t += m * N; then t0 is 0 mod 2^52 -> shift down one limb
        t[0] = _mm512_madd52lo_epu64(t[0], m, C.vN[0]);
        t[1] = _mm512_madd52lo_epu64(t[1], m, C.vN[1]);
        t[2] = _mm512_madd52lo_epu64(t[2], m, C.vN[2]);
        t[3] = _mm512_madd52lo_epu64(t[3], m, C.vN[3]);
        t[4] = _mm512_madd52lo_epu64(t[4], m, C.vN[4]);
        t[1] = _mm512_madd52hi_epu64(t[1], m, C.vN[0]);
        t[2] = _mm512_madd52hi_epu64(t[2], m, C.vN[1]);
        t[3] = _mm512_madd52hi_epu64(t[3], m, C.vN[2]);
        t[4] = _mm512_madd52hi_epu64(t[4], m, C.vN[3]);
        t[5] = _mm512_madd52hi_epu64(t[5], m, C.vN[4]);
        __m512i carry = _mm512_srli_epi64(t[0], 52);
        t[0] = _mm512_add_epi64(t[1], carry);
        t[1] = t[2];
        t[2] = t[3];
        t[3] = t[4];
        t[4] = t[5];
        t[5] = C.vZero;
    }
    // propagate carries to strict 52-bit limbs
    __m512i mask = _mm512_set1_epi64((long long)MASK52);
    __m512i cr = C.vZero;
    for (int j = 0; j < K; j++) {
        __m512i v = _mm512_add_epi64(t[j], cr);
        c.l[j] = _mm512_and_si512(v, mask);
        cr = _mm512_srli_epi64(v, 52);
    }
    // conditional subtract r (result < 2r guaranteed: R52 = 2^260 > 4r)
    __m512i d[K];
    __m512i borrow = C.vZero;
    for (int j = 0; j < K; j++) {
        __m512i sub = _mm512_add_epi64(C.vN[j], borrow);
        __m512i diff = _mm512_sub_epi64(c.l[j], sub);
        borrow = _mm512_srli_epi64(diff, 63);       // 1 if c.l[j] < sub
        d[j] = _mm512_and_si512(diff, mask);
    }
    // lanes where borrow-out == 0 take the subtracted value
    __mmask8 ge = _mm512_cmpeq_epu64_mask(borrow, C.vZero);
    for (int j = 0; j < K; j++)
        c.l[j] = _mm512_mask_blend_epi64(ge, c.l[j], d[j]);
}

static inline void add(Fr8 &c, const Fr8 &a, const Fr8 &b) {
    const Consts &C = consts();
    __m512i mask = _mm512_set1_epi64((long long)MASK52);
    __m512i cr = C.vZero;
    for (int j = 0; j < K; j++) {
        __m512i v = _mm512_add_epi64(_mm512_add_epi64(a.l[j], b.l[j]), cr);
        c.l[j] = _mm512_and_si512(v, mask);
        cr = _mm512_srli_epi64(v, 52);
    }
    __m512i d[K];
    __m512i borrow = C.vZero;
    for (int j = 0; j < K; j++) {
        __m512i sub = _mm512_add_epi64(C.vN[j], borrow);
        __m512i diff = _mm512_sub_epi64(c.l[j], sub);
        borrow = _mm512_srli_epi64(diff, 63);
        d[j] = _mm512_and_si512(diff, mask);
    }
    __mmask8 ge = _mm512_cmpeq_epu64_mask(borrow, C.vZero);
    for (int j = 0; j < K; j++)
        c.l[j] = _mm512_mask_blend_epi64(ge, c.l[j], d[j]);
}

static inline void sub(Fr8 &c, const Fr8 &a, const Fr8 &b) {
    const Consts &C = consts();
    __m512i mask = _mm512_set1_epi64((long long)MASK52);
    // a - b; lanes that borrow add r back
    __m512i d[K];
    __m512i borrow = C.vZero;
    for (int j = 0; j < K; j++) {
        __m512i sb = _mm512_add_epi64(b.l[j], borrow);
        __m512i diff = _mm512_sub_epi64(a.l[j], sb);
        borrow = _mm512_srli_epi64(diff, 63);
        d[j] = _mm512_and_si512(diff, mask);
    }
    __mmask8 lt = _mm512_cmpneq_epu64_mask(borrow, C.vZero);
    __m512i cr = C.vZero;
    for (int j = 0; j < K; j++) {
        __m512i addv = _mm512_maskz_mov_epi64(lt, C.vN[j]);
        __m512i v = _mm512_add_epi64(_mm512_add_epi64(d[j], addv), cr);
        c.l[j] = _mm512_and_si512(v, mask);
        cr = _mm512_srli_epi64(v, 52);
    }
}

// scalar 4x64 (value < r) -> one lane's 5x52 limbs
static inline void to52(uint64_t out[K], const uint64_t v[4]) {
    unsigned __int128 acc = 0;
    int bits = 0, k = 0, i = 0;
    while (k < K) {
        if (bits < 52 && i < 4) {
            acc |= (unsigned __int128)v[i++] << bits;
            bits += 64;
        }
        out[k++] = (uint64_t)(acc & MASK52);
        acc >>= 52;
        bits -= 52;
        if (bits < 0) bits = 0;
    }
}

static inline void from52(uint64_t out[4], const uint64_t in[K]) {
    unsigned __int128 acc = 0;
    int bits = 0, k = 0;
    for (int i = 0; i < 4; i++) {
        while (bits < 64 && k < K) {
            acc |= (unsigned __int128)in[k++] << bits;
            bits += 52;
        }
        out[i] = (uint64_t)acc;
        acc >>= 64;
        bits -= 64;
    }
}

// gather 8 scalar elements (4x64 raw each) into vertical Fr8
static inline void pack(Fr8 &o, const uint64_t (*vals)[4]) {
    alignas(64) uint64_t tmp[K][8];
    for (int lane = 0; lane < 8; lane++) {
        uint64_t l52[K];
        to52(l52, vals[lane]);
        for (int j = 0; j < K; j++) tmp[j][lane] = l52[j];
    }
    for (int j = 0; j < K; j++)
        o.l[j] = _mm512_load_si512((const void *)tmp[j]);
}

static inline void unpack(uint64_t (*vals)[4], const Fr8 &o) {
    alignas(64) uint64_t tmp[K][8];
    for (int j = 0; j < K; j++)
        _mm512_store_si512((void *)tmp[j], o.l[j]);
    for (int lane = 0; lane < 8; lane++) {
        uint64_t l52[K];
        for (int j = 0; j < K; j++) l52[j] = tmp[j][lane];
        from52(vals[lane], l52);
    }
}

static inline Fr8 splat_mont_one() {
    // Montgomery(1) in R52 domain = 2^260 mod r = to-mont of 1:
    // mul(one_raw, r52sq) later; cheaper: compute 2^260 mod r scalar.
    const Consts &C = consts();
    (void)C;
    uint64_t v[4] = {1, 0, 0, 0};
    for (int i = 0; i < 260; i++) {
        uint64_t carry = 0;
        for (int j = 0; j < 4; j++) {
            uint64_t nv = (v[j] << 1) | carry;
            carry = v[j] >> 63;
            v[j] = nv;
        }
        if (carry || geq(v, R_LIMBS, 4)) sub_limbs(v, v, R_LIMBS, 4);
    }
    uint64_t l52[K];
    to52(l52, v);
    Fr8 o;
    for (int j = 0; j < K; j++) o.l[j] = _mm512_set1_epi64((long long)l52[j]);
    return o;
}

// c = a^(r-2) * adjust -- NOT needed lane-generic; pow with shared exponent
static inline void inv(Fr8 &c, const Fr8 &a) {
    // exponent r-2, MSB-first square-and-multiply, shared across lanes
    uint64_t e[4];
    memcpy(e, FR_R_MINUS_2, 32);
    Fr8 acc = splat_mont_one();
    int top = 255;
    while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) top--;
    for (int i = top; i >= 0; i--) {
        mul(acc, acc, acc);
        if ((e[i / 64] >> (i % 64)) & 1) mul(acc, acc, a);
    }
    c = acc;
}

}  // namespace ifma
#endif  // KZGN_IFMA

// raw (non-Montgomery) canonical parse: fr_from_be minus the to-Montgomery
// multiply. fr_mul(mont(a), raw(b)) = a*b raw -- the barycentric weights
// stay Montgomery and the blob values stay raw, so each element costs one
// mul less than converting the whole blob.
static bool fr_raw_from_be(Fr &r, const uint8_t *be) {
    uint64_t t[4];
    for (int i = 0; i < 4; i++) {
        uint64_t v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | be[(3 - i) * 8 + j];
        t[i] = v;
    }
    if (geq(t, R_LIMBS, 4)) return false;
    memcpy(r.l, t, 32);
    return true;
}

// IFMA differential-test hooks (exercised by tests/test_native.py)
extern "C" int kzgn_ifma_available() {
#ifdef KZGN_IFMA
    return 1;
#else
    return 0;
#endif
}

// out = a * b mod r for n8*8 pairs of canonical raw BE values -- routed
// through pack -> to-Montgomery(R52) -> ifma::mul -> unpack so every piece
// of the 8-lane pipeline is covered differentially against fr_mul.
extern "C" int kzgn_ifma_mul_test(const uint8_t *a_be, const uint8_t *b_be,
                                  size_t n8, uint8_t *out_be) {
#ifdef KZGN_IFMA
    const ifma::Consts &C = ifma::consts();
    uint64_t r52sq_52[ifma::K];
    ifma::to52(r52sq_52, C.r52sq_mont.l);
    ifma::Fr8 vr52sq;
    for (int j = 0; j < ifma::K; j++)
        vr52sq.l[j] = _mm512_set1_epi64((long long)r52sq_52[j]);
    for (size_t g = 0; g < n8; g++) {
        uint64_t av[8][4], bv[8][4], ov[8][4];
        for (int lane = 0; lane < 8; lane++) {
            for (int i = 0; i < 4; i++) {
                uint64_t x = 0, y = 0;
                for (int j = 0; j < 8; j++) {
                    x = (x << 8) | a_be[(g * 8 + lane) * 32 + (3 - i) * 8 + j];
                    y = (y << 8) | b_be[(g * 8 + lane) * 32 + (3 - i) * 8 + j];
                }
                av[lane][i] = x;
                bv[lane][i] = y;
            }
        }
        ifma::Fr8 a8, b8, am, r8;
        ifma::pack(a8, av);
        ifma::pack(b8, bv);
        ifma::mul(am, a8, vr52sq);   // a -> Montgomery(R52)
        ifma::mul(r8, am, b8);       // mont * raw = raw product
        ifma::unpack(ov, r8);
        for (int lane = 0; lane < 8; lane++)
            for (int i = 0; i < 4; i++)
                for (int j = 0; j < 8; j++)
                    out_be[(g * 8 + lane) * 32 + (3 - i) * 8 + j] =
                        (uint8_t)(ov[lane][i] >> (56 - 8 * j));
    }
    return 0;
#else
    (void)a_be; (void)b_be; (void)n8; (void)out_be;
    return -1;
#endif
}

#ifdef KZGN_IFMA
// 8 blobs per pass, one blob per SIMD lane; returns 0 or the 1-based index
// of the first blob with a non-canonical scalar (z errors negative), as
// kzgn_eval_blobs_batch. roots_raw: 4096 x 4x64 canonical values.
// roots -> Montgomery(R52) limb table, cached per roots pointer: [4096][K]
static const std::vector<uint64_t> &roots52m_cache(
    const uint64_t (*roots_raw)[4]) {
    using namespace ifma;
    const int N = 4096;
    const Consts &C = consts();
    static thread_local std::vector<uint64_t> roots52m;
    static thread_local const void *roots_key = nullptr;
    if (roots_key != (const void *)roots_raw || roots52m.empty()) {
        roots52m.assign((size_t)N * K, 0);
        uint64_t r52sq_52[K];
        to52(r52sq_52, C.r52sq_mont.l);
        Fr8 vr52sq;
        for (int j = 0; j < K; j++)
            vr52sq.l[j] = _mm512_set1_epi64((long long)r52sq_52[j]);
        for (int i = 0; i < N; i += 8) {
            Fr8 v, m;
            pack(v, &roots_raw[i]);
            mul(m, v, vr52sq);
            alignas(64) uint64_t tmp[K][8];
            for (int j = 0; j < K; j++)
                _mm512_store_si512((void *)tmp[j], m.l[j]);
            for (int lane = 0; lane < 8; lane++)
                for (int j = 0; j < K; j++)
                    roots52m[(size_t)(i + lane) * K + j] = tmp[j][lane];
        }
        roots_key = (const void *)roots_raw;
    }
    return roots52m;
}

static long eval_blobs_ifma(const uint8_t *blobs_be, size_t n,
                            const uint8_t *zs_be, const uint64_t (*roots_raw)[4],
                            uint8_t *ys_out) {
    using namespace ifma;
    const int N = 4096;
    const Consts &C = consts();
    const std::vector<uint64_t> &roots52m = roots52m_cache(roots_raw);
    uint64_t r52sq_52[K];
    to52(r52sq_52, C.r52sq_mont.l);
    Fr8 vr52sq;
    for (int j = 0; j < K; j++)
        vr52sq.l[j] = _mm512_set1_epi64((long long)r52sq_52[j]);
    Fr8 vone = splat_mont_one();
    // 1/4096 as Montgomery(R52): raw(inv4096) then to-mont52
    Fr inv4096_m256, one_raw;
    memset(&one_raw, 0, sizeof one_raw);
    one_raw.l[0] = 1;
    memcpy(inv4096_m256.l, FR_INV4096_MONT, 32);
    Fr inv4096_raw;
    fr_mul(inv4096_raw, inv4096_m256, one_raw);
    uint64_t inv4096_52[K];
    to52(inv4096_52, inv4096_raw.l);
    Fr8 vinvn_raw;
    for (int j = 0; j < K; j++)
        vinvn_raw.l[j] = _mm512_set1_epi64((long long)inv4096_52[j]);
    Fr8 vinvn;
    mul(vinvn, vinvn_raw, vr52sq);  // Montgomery(R52) of 1/4096

    std::vector<Fr8> poly((size_t)N), diff((size_t)N), pref((size_t)N);
    for (size_t g = 0; g * 8 < n; g++) {
        size_t lanes = (n - g * 8 < 8) ? n - g * 8 : 8;
        // parse + pack z
        uint64_t zv[8][4];
        for (size_t lane = 0; lane < 8; lane++) {
            size_t b = g * 8 + (lane < lanes ? lane : 0);
            uint64_t v[4];
            for (int i = 0; i < 4; i++) {
                uint64_t x = 0;
                for (int j = 0; j < 8; j++)
                    x = (x << 8) | zs_be[b * 32 + (3 - i) * 8 + j];
                v[i] = x;
            }
            if (lane < lanes && geq(v, R_LIMBS, 4)) return -(long)(b + 1);
            memcpy(zv[lane], v, 32);
        }
        Fr8 z_raw, z_m;
        pack(z_raw, zv);
        mul(z_m, z_raw, vr52sq);
        // parse + pack poly (vertical): element i, lane = blob
        for (int i = 0; i < N; i++) {
            uint64_t pv[8][4];
            for (size_t lane = 0; lane < 8; lane++) {
                size_t b = g * 8 + (lane < lanes ? lane : 0);
                const uint8_t *src = blobs_be + (b * (size_t)N + i) * 32;
                uint64_t v[4];
                for (int w = 0; w < 4; w++) {
                    uint64_t x = 0;
                    for (int j = 0; j < 8; j++) x = (x << 8) | src[(3 - w) * 8 + j];
                    v[w] = x;
                }
                if (lane < lanes && geq(v, R_LIMBS, 4)) return (long)(b + 1);
                memcpy(pv[lane], v, 32);
            }
            pack(poly[i], pv);
        }
        // diff = z_m - root_m; in-domain lanes -> substitute one
        int dom_blob[8], dom_idx[8];
        int n_dom = 0;
        for (int lane = 0; lane < 8; lane++) dom_blob[lane] = -1;
        for (int i = 0; i < N; i++) {
            Fr8 rt;
            for (int j = 0; j < K; j++)
                rt.l[j] = _mm512_set1_epi64(
                    (long long)roots52m[(size_t)i * K + j]);
            sub(diff[i], z_m, rt);
            // zero-lane detection
            __m512i orv = diff[i].l[0];
            for (int j = 1; j < K; j++) orv = _mm512_or_si512(orv, diff[i].l[j]);
            __mmask8 zl = _mm512_cmpeq_epu64_mask(orv, _mm512_setzero_si512());
            if (zl) {
                for (int lane = 0; lane < 8; lane++)
                    if ((zl >> lane) & 1) {
                        dom_blob[lane] = 1;
                        dom_idx[lane] = i;
                        n_dom++;
                    }
                for (int j = 0; j < K; j++)
                    diff[i].l[j] = _mm512_mask_blend_epi64(
                        zl, diff[i].l[j], vone.l[j]);
            }
        }
        // prefix products + one shared-exponent inversion
        pref[0] = diff[0];
        for (int i = 1; i < N; i++) mul(pref[i], pref[i - 1], diff[i]);
        Fr8 acc;
        inv(acc, pref[N - 1]);
        // backward sweep
        Fr8 ysum;
        for (int j = 0; j < K; j++) ysum.l[j] = _mm512_setzero_si512();
        for (int i = N; i-- > 0;) {
            Fr8 invd;
            if (i == 0)
                invd = acc;
            else
                mul(invd, acc, pref[i - 1]);
            mul(acc, acc, diff[i]);
            Fr8 rt;
            for (int j = 0; j < K; j++)
                rt.l[j] = _mm512_set1_epi64(
                    (long long)roots52m[(size_t)i * K + j]);
            Fr8 w, term;
            mul(w, rt, invd);          // Montgomery weight root/diff
            mul(term, w, poly[i]);     // mont * raw = raw
            add(ysum, ysum, term);
        }
        // * (z^N - 1) / N
        Fr8 zp = z_m;
        for (int k = 0; k < 12; k++) mul(zp, zp, zp);
        Fr8 fac;
        sub(fac, zp, vone);
        Fr8 y;
        mul(y, fac, ysum);
        mul(y, vinvn, y);
        uint64_t yv[8][4];
        unpack(yv, y);
        for (size_t lane = 0; lane < lanes; lane++) {
            size_t b = g * 8 + lane;
            const uint64_t *src = yv[lane];
            uint64_t dom[4];
            if (dom_blob[lane] >= 0) {
                // in-domain: y = poly[idx] raw, read back from wire bytes
                const uint8_t *p =
                    blobs_be + (b * (size_t)N + dom_idx[lane]) * 32;
                for (int i = 0; i < 4; i++) {
                    uint64_t x = 0;
                    for (int j = 0; j < 8; j++) x = (x << 8) | p[(3 - i) * 8 + j];
                    dom[i] = x;
                }
                src = dom;
            }
            for (int i = 0; i < 4; i++)
                for (int j = 0; j < 8; j++)
                    ys_out[32 * b + (3 - i) * 8 + j] =
                        (uint8_t)(src[i] >> (56 - 8 * j));
        }
        (void)n_dom;
    }
    return 0;
}
// ONE blob split across the 8 lanes (512 contiguous elements per lane):
// the latency-shaped variant for single-blob verification. Same domain
// bookkeeping as eval_blobs_ifma; the 8 per-lane partial sums are reduced
// horizontally at the end.
static long eval_single_ifma(const uint8_t *blob_be, const uint8_t *z_be,
                             const uint64_t (*roots_raw)[4],
                             const std::vector<uint64_t> &roots52m,
                             uint8_t *y_out) {
    using namespace ifma;
    const int N = 4096, SEG = 512;
    const Consts &C = consts();
    (void)roots_raw;
    uint64_t r52sq_52[K];
    to52(r52sq_52, C.r52sq_mont.l);
    Fr8 vr52sq;
    for (int j = 0; j < K; j++)
        vr52sq.l[j] = _mm512_set1_epi64((long long)r52sq_52[j]);
    Fr8 vone = splat_mont_one();
    // z (same value in every lane)
    uint64_t zv4[4];
    for (int i = 0; i < 4; i++) {
        uint64_t x = 0;
        for (int j = 0; j < 8; j++) x = (x << 8) | z_be[(3 - i) * 8 + j];
        zv4[i] = x;
    }
    if (geq(zv4, R_LIMBS, 4)) return -1;
    uint64_t zv[8][4];
    for (int lane = 0; lane < 8; lane++) memcpy(zv[lane], zv4, 32);
    Fr8 z_raw, z_m;
    pack(z_raw, zv);
    mul(z_m, z_raw, vr52sq);

    static thread_local std::vector<Fr8> poly, diff, pref;
    poly.resize(SEG);
    diff.resize(SEG);
    pref.resize(SEG);
    // lane l covers elements [l*SEG, (l+1)*SEG): slot i packs element
    // l*SEG + i of lane l
    for (int i = 0; i < SEG; i++) {
        uint64_t pv[8][4];
        for (int lane = 0; lane < 8; lane++) {
            const uint8_t *src = blob_be + ((size_t)lane * SEG + i) * 32;
            uint64_t v[4];
            for (int w = 0; w < 4; w++) {
                uint64_t x = 0;
                for (int j = 0; j < 8; j++) x = (x << 8) | src[(3 - w) * 8 + j];
                v[w] = x;
            }
            if (geq(v, R_LIMBS, 4)) return 1;
            memcpy(pv[lane], v, 32);
        }
        pack(poly[i], pv);
    }
    int dom_idx = -1;
    for (int i = 0; i < SEG; i++) {
        // roots for slot i: lanes l*SEG+i -- a strided gather
        alignas(64) uint64_t tmp[K][8];
        for (int lane = 0; lane < 8; lane++)
            for (int j = 0; j < K; j++)
                tmp[j][lane] = roots52m[((size_t)lane * SEG + i) * K + j];
        Fr8 rt;
        for (int j = 0; j < K; j++)
            rt.l[j] = _mm512_load_si512((const void *)tmp[j]);
        sub(diff[i], z_m, rt);
        __m512i orv = diff[i].l[0];
        for (int j = 1; j < K; j++) orv = _mm512_or_si512(orv, diff[i].l[j]);
        __mmask8 zl = _mm512_cmpeq_epu64_mask(orv, _mm512_setzero_si512());
        if (zl) {
            for (int lane = 0; lane < 8; lane++)
                if ((zl >> lane) & 1) dom_idx = lane * SEG + i;
            for (int j = 0; j < K; j++)
                diff[i].l[j] =
                    _mm512_mask_blend_epi64(zl, diff[i].l[j], vone.l[j]);
        }
    }
    if (dom_idx >= 0) {
        memcpy(y_out, blob_be + (size_t)dom_idx * 32, 32);
        return 0;
    }
    pref[0] = diff[0];
    for (int i = 1; i < SEG; i++) mul(pref[i], pref[i - 1], diff[i]);
    Fr8 acc;
    inv(acc, pref[SEG - 1]);
    Fr8 ysum;
    for (int j = 0; j < K; j++) ysum.l[j] = _mm512_setzero_si512();
    for (int i = SEG; i-- > 0;) {
        Fr8 invd;
        if (i == 0)
            invd = acc;
        else
            mul(invd, acc, pref[i - 1]);
        mul(acc, acc, diff[i]);
        alignas(64) uint64_t tmp[K][8];
        for (int lane = 0; lane < 8; lane++)
            for (int j = 0; j < K; j++)
                tmp[j][lane] = roots52m[((size_t)lane * SEG + i) * K + j];
        Fr8 rt;
        for (int j = 0; j < K; j++)
            rt.l[j] = _mm512_load_si512((const void *)tmp[j]);
        Fr8 w, term;
        mul(w, rt, invd);
        mul(term, w, poly[i]);
        add(ysum, ysum, term);
    }
    // horizontal reduction of the 8 lane sums (raw values): unpack + scalar
    uint64_t yv[8][4];
    unpack(yv, ysum);
    Fr total;
    memset(&total, 0, sizeof total);
    for (int lane = 0; lane < 8; lane++) {
        Fr t;
        memcpy(t.l, yv[lane], 32);
        fr_add(total, total, t);
    }
    // * (z^N - 1) / N with scalar Fr (Montgomery 2^256 domain)
    Fr z256, one_raw;
    memset(&one_raw, 0, sizeof one_raw);
    one_raw.l[0] = 1;
    {
        Fr zr, r2;
        memcpy(zr.l, zv4, 32);
        memcpy(r2.l, FR_R2, 32);
        fr_mul(z256, zr, r2);
    }
    Fr zp = z256, fac, invn, one = fr_one_mont();
    for (int k = 0; k < 12; k++) fr_mul(zp, zp, zp);
    fr_sub(fac, zp, one);
    memcpy(invn.l, FR_INV4096_MONT, 32);
    fr_mul(total, fac, total);   // mont * raw = raw
    fr_mul(total, invn, total);
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 8; j++)
            y_out[(3 - i) * 8 + j] = (uint8_t)(total.l[i] >> (56 - 8 * j));
    return 0;
}
#endif  // KZGN_IFMA

extern "C" long kzgn_eval_blobs_batch(const uint8_t *blobs_be, size_t n,
                                      const uint8_t *zs_be,
                                      const uint8_t *roots_mont,
                                      uint8_t *ys_out) {
    const int N = 4096;
    std::vector<Fr> roots(N);
    memcpy(roots.data(), roots_mont, 32 * (size_t)N);
#ifdef KZGN_IFMA
    {
        // raw roots for the 8-lane path (Montgomery(2^256) -> plain value)
        static thread_local std::vector<uint64_t> roots_raw_flat;
        static thread_local const void *rkey = nullptr;
        static thread_local uint64_t rkey_first[4];
        if (rkey != (const void *)roots_mont || roots_raw_flat.empty() ||
            memcmp(rkey_first, roots_mont, 32) != 0) {
            memcpy(rkey_first, roots_mont, 32);
            roots_raw_flat.assign((size_t)N * 4, 0);
            Fr one_raw;
            memset(&one_raw, 0, sizeof one_raw);
            one_raw.l[0] = 1;
            for (int i = 0; i < N; i++) {
                Fr t;
                fr_mul(t, roots[i], one_raw);
                memcpy(&roots_raw_flat[(size_t)i * 4], t.l, 32);
            }
            rkey = (const void *)roots_mont;
        }
        const uint64_t(*rraw)[4] =
            reinterpret_cast<const uint64_t(*)[4]>(roots_raw_flat.data());
        if (n == 1)
            return eval_single_ifma(blobs_be, zs_be, rraw,
                                    roots52m_cache(rraw), ys_out);
        return eval_blobs_ifma(blobs_be, n, zs_be, rraw, ys_out);
    }
#endif
    std::vector<Fr> poly((size_t)n * N), diff((size_t)n * N), pref(N);
    std::vector<Fr> zv(n);
    Fr invn, one = fr_one_mont();
    memcpy(invn.l, FR_INV4096_MONT, 32);
    for (size_t b = 0; b < n; b++)
        if (!fr_from_be(zv[b], zs_be + 32 * b)) return -(long)(b + 1);
    for (size_t b = 0; b < n; b++) {
        Fr *pb = &poly[b * N];
        const uint8_t *src = blobs_be + (size_t)b * N * 32;
        for (int i = 0; i < N; i++)
            if (!fr_raw_from_be(pb[i], src + 32 * i)) return (long)(b + 1);
    }
    // per-blob inversion chains: 4096-long prefix products + one inverse
    // each (n x 255-mul inverses amortize to ~1 mul/element-chunk); keeps
    // chains short and independent for CPU pipelining / future SIMD lanes.
    for (size_t b = 0; b < n; b++) {
        Fr *pb = &poly[b * N];
        Fr *db = &diff[b * N];
        int in_dom = -1;
        for (int i = 0; i < N; i++) {
            fr_sub(db[i], zv[b], roots[i]);
            if (fr_is_zero(db[i])) {
                in_dom = i;
                db[i] = one;
            }
        }
        if (in_dom >= 0) {
            // y = poly[in_dom]; raw IS canonical -- write big-endian directly
            for (int i = 0; i < 4; i++)
                for (int j = 0; j < 8; j++)
                    ys_out[32 * b + (3 - i) * 8 + j] =
                        (uint8_t)(pb[in_dom].l[i] >> (56 - 8 * j));
            continue;
        }
        pref[0] = db[0];
        for (int i = 1; i < N; i++) fr_mul(pref[i], pref[i - 1], db[i]);
        Fr acc;
        fr_inv(acc, pref[N - 1]);
        Fr ysum;
        memset(&ysum, 0, sizeof ysum);
        for (int i = N; i-- > 0;) {
            Fr invd;
            if (i == 0)
                invd = acc;
            else
                fr_mul(invd, acc, pref[i - 1]);
            fr_mul(acc, acc, db[i]);
            Fr w, term;
            fr_mul(w, roots[i], invd);    // Montgomery weight
            fr_mul(term, w, pb[i]);       // mont * raw = raw product
            fr_add(ysum, ysum, term);
        }
        // ysum is raw; fold in (z^n - 1)/n (both Montgomery):
        // mont*raw=raw each time
        Fr zp = zv[b];
        for (int k = 0; k < 12; k++) fr_mul(zp, zp, zp);
        Fr fac;
        fr_sub(fac, zp, one);
        fr_mul(ysum, fac, ysum);          // raw
        fr_mul(ysum, invn, ysum);         // raw
        // raw -> canonical BE: raw IS canonical; write big-endian directly
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 8; j++)
                ys_out[32 * b + (3 - i) * 8 + j] =
                    (uint8_t)(ysum.l[i] >> (56 - 8 * j));
    }
    return 0;
}

// ---------------------------------------------------------------------------
// SHA-256 (own implementation; FIPS 180-4)
// ---------------------------------------------------------------------------

static const uint32_t SHA_K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1, 0x923f82a4,
    0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3, 0x72be5d74, 0x80deb1fe,
    0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc, 0x2de92c6f,
    0x4a7484aa, 0x5cb0a9dc, 0x76f988da, 0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7,
    0xc6e00bf3, 0xd5a79147, 0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc,
    0x53380d13, 0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070, 0x19a4c116,
    0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f, 0x682e6ff3,
    0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208, 0x90befffa, 0xa4506ceb, 0xbef9a3f7,
    0xc67178f2};

static inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

static void sha256_compress(uint32_t h[8], const uint8_t block[64]) {
    uint32_t w[64];
    for (int i = 0; i < 16; i++)
        w[i] = ((uint32_t)block[4 * i] << 24) | ((uint32_t)block[4 * i + 1] << 16) |
               ((uint32_t)block[4 * i + 2] << 8) | block[4 * i + 3];
    for (int i = 16; i < 64; i++) {
        uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
        uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5], g = h[6], hh = h[7];
    for (int i = 0; i < 64; i++) {
        uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = hh + S1 + ch + SHA_K[i] + w[i];
        uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
        uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
        uint32_t t2 = S0 + maj;
        hh = g;
        g = f;
        f = e;
        e = d + t1;
        d = c;
        c = b;
        b = a;
        a = t1 + t2;
    }
    h[0] += a;
    h[1] += b;
    h[2] += c;
    h[3] += d;
    h[4] += e;
    h[5] += f;
    h[6] += g;
    h[7] += hh;
}

// ---------------------------------------------------------------------------
// Exported C ABI
// ---------------------------------------------------------------------------

extern "C" {

void kzgn_sha256(const uint8_t *data, size_t len, uint8_t out[32]) {
    uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                     0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    size_t full = len / 64;
    for (size_t i = 0; i < full; i++) sha256_compress(h, data + 64 * i);
    uint8_t block[128] = {0};
    size_t rem = len - full * 64;
    memcpy(block, data + full * 64, rem);
    block[rem] = 0x80;
    size_t nblocks = (rem + 9 <= 64) ? 1 : 2;
    uint64_t bitlen = (uint64_t)len * 8;
    for (int i = 0; i < 8; i++)
        block[nblocks * 64 - 1 - i] = (uint8_t)(bitlen >> (8 * i));
    for (size_t i = 0; i < nblocks; i++) sha256_compress(h, block + 64 * i);
    for (int i = 0; i < 8; i++) {
        out[4 * i] = (uint8_t)(h[i] >> 24);
        out[4 * i + 1] = (uint8_t)(h[i] >> 16);
        out[4 * i + 2] = (uint8_t)(h[i] >> 8);
        out[4 * i + 3] = (uint8_t)h[i];
    }
}

// Decompress n G1 points. out_xy: 96 bytes each (x||y big-endian), out_inf:
// 1 byte each. Returns 0 on success, or (index+1) of the first bad point.
long kzgn_g1_decompress_batch(const uint8_t *in, size_t n, int subgroup_check,
                              uint8_t *out_xy, uint8_t *out_inf) {
    for (size_t i = 0; i < n; i++) {
        Fp x, y;
        int rc = g1_decompress(in + 48 * i, x, y, subgroup_check != 0);
        if (rc < 0) return (long)(i + 1);
        if (rc == 1) {
            memset(out_xy + 96 * i, 0, 96);
            out_inf[i] = 1;
        } else {
            fp_to_be(out_xy + 96 * i, x);
            fp_to_be(out_xy + 96 * i + 48, y);
            out_inf[i] = 0;
        }
    }
    return 0;
}

long kzgn_g2_decompress_batch(const uint8_t *in, size_t n, int subgroup_check,
                              uint8_t *out_xy, uint8_t *out_inf) {
    for (size_t i = 0; i < n; i++) {
        Fp2 x, y;
        int rc = g2_decompress(in + 96 * i, x, y, subgroup_check != 0);
        if (rc < 0) return (long)(i + 1);
        if (rc == 1) {
            memset(out_xy + 192 * i, 0, 192);
            out_inf[i] = 1;
        } else {
            fp_to_be(out_xy + 192 * i, x.c0);
            fp_to_be(out_xy + 192 * i + 48, x.c1);
            fp_to_be(out_xy + 192 * i + 96, y.c0);
            fp_to_be(out_xy + 192 * i + 144, y.c1);
            out_inf[i] = 0;
        }
    }
    return 0;
}

// Compress n G1 affine points given as 96-byte x||y (big-endian) + inf flags.
long kzgn_g1_compress_batch(const uint8_t *xy, const uint8_t *inf, size_t n, uint8_t *out) {
    for (size_t i = 0; i < n; i++) {
        if (inf[i]) {
            g1_compress(out + 48 * i, FP_ZERO, FP_ZERO, true);
            continue;
        }
        Fp x, y;
        if (!fp_from_be(x, xy + 96 * i)) return (long)(i + 1);
        if (!fp_from_be(y, xy + 96 * i + 48)) return (long)(i + 1);
        g1_compress(out + 48 * i, x, y, false);
    }
    return 0;
}

// e(a1, a2) == e(b1, b2)?  Points as raw affine big-endian bytes + inf flags.
// Returns 1 true, 0 false, negative on malformed field elements.
int kzgn_pairings_verify(const uint8_t a1[96], int a1_inf, const uint8_t a2[192], int a2_inf,
                         const uint8_t b1[96], int b1_inf, const uint8_t b2[192], int b2_inf) {
    Fp a1x = FP_ZERO, a1y = FP_ZERO, b1x = FP_ZERO, b1y = FP_ZERO;
    Fp2 a2x = FP2_ZERO_V, a2y = FP2_ZERO_V, b2x = FP2_ZERO_V, b2y = FP2_ZERO_V;
    if (!a1_inf && (!fp_from_be(a1x, a1) || !fp_from_be(a1y, a1 + 48))) return -1;
    if (!b1_inf && (!fp_from_be(b1x, b1) || !fp_from_be(b1y, b1 + 48))) return -1;
    if (!a2_inf &&
        (!fp_from_be(a2x.c0, a2) || !fp_from_be(a2x.c1, a2 + 48) ||
         !fp_from_be(a2y.c0, a2 + 96) || !fp_from_be(a2y.c1, a2 + 144)))
        return -1;
    if (!b2_inf &&
        (!fp_from_be(b2x.c0, b2) || !fp_from_be(b2x.c1, b2 + 48) ||
         !fp_from_be(b2y.c0, b2 + 96) || !fp_from_be(b2y.c1, b2 + 144)))
        return -1;
    // e(-a1, a2) * e(b1, b2) == 1, as ONE dual Miller loop over cached
    // line tables (the G2 args are setup constants in every protocol call)
    Fp na1y;
    fp_neg(na1y, a1y);
    bool skip_a = a1_inf != 0 || a2_inf != 0;
    bool skip_b = b1_inf != 0 || b2_inf != 0;
    static thread_local PreparedG2 pa_buf, pb_buf;
    if (!skip_a) prep_fetch(a2x, a2y, pa_buf);
    if (!skip_b) prep_fetch(b2x, b2y, pb_buf);
    Fp12 f = miller_loop_dual_prepared(a1x, na1y, skip_a, skip_a ? nullptr : &pa_buf,
                                       b1x, b1y, skip_b, skip_b ? nullptr : &pb_buf);
    Fp12 e = final_exponentiation(f);
    return fp12_is_one(e) ? 1 : 0;
}

// G1 membership probe for differential testing: xy = affine BE bytes.
// fast != 0 -> endomorphism check; else the generic multiply-by-r check.
// Returns 1 in-subgroup, 0 not, -1 malformed coordinates.
int kzgn_g1_in_subgroup(const uint8_t xy[96], int fast) {
    Fp x, y;
    if (!fp_from_be(x, xy) || !fp_from_be(y, xy + 48)) return -1;
    return (fast ? in_subgroup_g1_fast(x, y) : in_subgroup<Fp>(x, y)) ? 1 : 0;
}

// Full verify_kzg_proof in one call: decompress (fast subgroup checks),
// lhs = C + [z]proof - [y]G via a Shamir double ladder, one pairing check
// e(lhs, G2gen) == e(proof, g2s). g2s = [s]_2 affine BE (x.c0|x.c1|y.c0|
// y.c1). Returns 1 ok, 0 fail, -1 malformed point, -2 non-canonical scalar.
// (parity: verify_kzg_proof_rust -> check_proof_single,
// /root/reference/kzg/src/eip_4844.rs:586-611,
// /root/reference/blst/src/types/kzg_settings.rs:178-196; rearranged so the
// variable scalar lands on the G1 side, as in kzg_tpu/eip4844.py)
// acc = [za]A + [zb]G for affine A (a_inf flags) and the generator, via a
// GLV 4-way joint ladder: each 256-bit scalar splits as k1 + k2*x^2
// (exact integer identity, both halves < 2^128), giving four affine
// addends {A, psi(A), G, psi(G)}; the 15 subset sums are batch-normalized
// to affine once so the 128-bit joint ladder uses only mixed additions.
// ~2x the plain dual Shamir ladder.
static void jac_add_affine(Jac<Fp> &r, const Jac<Fp> &p, const Fp &qx, const Fp &qy);
static void div256_128(const uint64_t k[4], unsigned __int128 d,
                       unsigned __int128 &q, unsigned __int128 &rem);

static void glv4_shamir(Jac<Fp> &acc_out, const Fp &ax, const Fp &ay, bool a_inf,
                        const uint64_t za[4], const uint64_t zb[4]) {
    const unsigned __int128 X2 =
        (unsigned __int128)BLS_X_ABS * (unsigned __int128)BLS_X_ABS;
    Fp beta;
    memcpy(beta.l, BETA_G1_MONT, sizeof beta.l);
    unsigned __int128 k[4];  // scalars for A, psiA, G, psiG
    {
        unsigned __int128 q, rem;
        div256_128(za, X2, q, rem);
        k[0] = rem;
        k[1] = q;
        div256_128(zb, X2, q, rem);
        k[2] = rem;
        k[3] = q;
    }
    Fp xs[4], ys4[4];
    bool inf4[4];
    xs[0] = ax;
    ys4[0] = ay;
    inf4[0] = a_inf;
    fp_mul(xs[1], ax, beta);
    fp_neg(ys4[1], ay);
    inf4[1] = a_inf;
    memcpy(xs[2].l, G1_GEN_X_MONT, sizeof xs[2].l);
    memcpy(ys4[2].l, G1_GEN_Y_MONT, sizeof ys4[2].l);
    inf4[2] = false;
    fp_mul(xs[3], xs[2], beta);
    fp_neg(ys4[3], ys4[2]);
    inf4[3] = false;
    // subset-sum table (Jacobian), then one batch inversion -> affine
    Jac<Fp> tab[16];
    tab[0] = jac_identity<Fp>();
    for (int b = 0; b < 4; b++)
        tab[1 << b] = inf4[b] ? jac_identity<Fp>()
                              : jac_from_affine<Fp>(xs[b], ys4[b]);
    for (int m = 3; m < 16; m++) {
        if (!(m & (m - 1))) continue;  // power of two: already set
        int lb = m & (-m);
        jac_add(tab[m], tab[lb], tab[m - lb]);
    }
    Fp tax[16], tay[16];
    bool tinf[16];
    {
        Fp pref[16], zs_[16];
        int idx[16], cnt = 0;
        for (int m = 1; m < 16; m++) {
            tinf[m] = tab[m].inf || FieldOps<Fp>::is_zero(tab[m].z);
            if (tinf[m]) continue;
            zs_[cnt] = tab[m].z;
            pref[cnt] = cnt ? Fp() : zs_[0];
            if (cnt)
                fp_mul(pref[cnt], pref[cnt - 1], zs_[cnt]);
            idx[cnt] = m;
            cnt++;
        }
        if (cnt) {
            Fp inv_all;
            fp_inv(inv_all, pref[cnt - 1]);
            for (int t = cnt - 1; t >= 0; t--) {
                Fp zinv;
                if (t == 0)
                    zinv = inv_all;
                else
                    fp_mul(zinv, inv_all, pref[t - 1]);
                fp_mul(inv_all, inv_all, zs_[t]);
                Fp zi2, zi3;
                fp_sqr(zi2, zinv);
                fp_mul(zi3, zi2, zinv);
                int m = idx[t];
                fp_mul(tax[m], tab[m].x, zi2);
                fp_mul(tay[m], tab[m].y, zi3);
            }
        }
    }
    // joint 128-bit ladder (top bit 128 possible only from lazy carries; the
    // GLV halves are < 2^128 so bit 127 is the top)
    Jac<Fp> acc = jac_identity<Fp>();
    int top = 127;
    while (top >= 0) {
        int m = 0;
        for (int b = 0; b < 4; b++) m |= (int)((k[b] >> top) & 1) << b;
        if (m) break;
        top--;
    }
    for (int i = top; i >= 0; i--) {
        jac_double(acc, acc);
        int m = 0;
        for (int b = 0; b < 4; b++) m |= (int)((k[b] >> i) & 1) << b;
        if (m && !tinf[m]) jac_add_affine(acc, acc, tax[m], tay[m]);
    }
    acc_out = acc;
}

int kzgn_verify_kzg_proof(const uint8_t commitment[48], const uint8_t z_be[32],
                          const uint8_t y_be[32], const uint8_t proof[48],
                          const uint8_t g2s[192], int g2s_inf) {
    uint64_t z[4], yv[4];
    for (int i = 0; i < 4; i++) {
        uint64_t a = 0, b = 0;
        for (int j = 0; j < 8; j++) {
            a = (a << 8) | z_be[(3 - i) * 8 + j];
            b = (b << 8) | y_be[(3 - i) * 8 + j];
        }
        z[i] = a;
        yv[i] = b;
    }
    if (geq(z, R_LIMBS, 4) || geq(yv, R_LIMBS, 4)) return -2;
    // ry = (r - y) mod r
    uint64_t ry[4] = {0, 0, 0, 0};
    bool y_zero = !(yv[0] | yv[1] | yv[2] | yv[3]);
    if (!y_zero) {
        uint64_t borrow = 0;
        for (int i = 0; i < 4; i++) {
            u128 d = (u128)R_LIMBS[i] - yv[i] - borrow;
            ry[i] = (uint64_t)d;
            borrow = (uint64_t)(d >> 64) ? 1 : 0;
        }
    }
    Fp cx, cy, px, py;
    int rc_c = g1_decompress(commitment, cx, cy, true);
    int rc_p = g1_decompress(proof, px, py, true);
    if (rc_c < 0 || rc_p < 0) return -1;
    Jac<Fp> cj = rc_c == 1 ? jac_identity<Fp>() : jac_from_affine<Fp>(cx, cy);
    Jac<Fp> pj = rc_p == 1 ? jac_identity<Fp>() : jac_from_affine<Fp>(px, py);
    // [z]proof + [r-y]G via the GLV 4-way joint ladder (half the doublings
    // of the 256-bit dual Shamir form, all-mixed additions)
    (void)pj;
    Jac<Fp> acc;
    glv4_shamir(acc, px, py, rc_p == 1, z, ry);
    jac_add(acc, acc, cj);
    Fp lx = FP_ZERO, ly = FP_ZERO;
    bool lhs_inf = !jac_to_affine(lx, ly, acc);
    Fp2 g2x, g2y, sx, sy;
    memcpy(g2x.c0.l, G2_GEN_X0_MONT, sizeof g2x.c0.l);
    memcpy(g2x.c1.l, G2_GEN_X1_MONT, sizeof g2x.c1.l);
    memcpy(g2y.c0.l, G2_GEN_Y0_MONT, sizeof g2y.c0.l);
    memcpy(g2y.c1.l, G2_GEN_Y1_MONT, sizeof g2y.c1.l);
    sx = FP2_ZERO_V;
    sy = FP2_ZERO_V;
    if (!g2s_inf &&
        (!fp_from_be(sx.c0, g2s) || !fp_from_be(sx.c1, g2s + 48) ||
         !fp_from_be(sy.c0, g2s + 96) || !fp_from_be(sy.c1, g2s + 144)))
        return -1;
    Fp nly;
    fp_neg(nly, ly);
    bool skip_l = lhs_inf;
    bool skip_p = rc_p == 1 || g2s_inf != 0;
    static thread_local PreparedG2 pl_buf, pp_buf;
    if (!skip_l) prep_fetch(g2x, g2y, pl_buf);
    if (!skip_p) prep_fetch(sx, sy, pp_buf);
    Fp12 f = miller_loop_dual_prepared(lx, nly, skip_l, skip_l ? nullptr : &pl_buf,
                                       px, py, skip_p, skip_p ? nullptr : &pp_buf);
    Fp12 e = final_exponentiation(f);
    return fp12_is_one(e) ? 1 : 0;
}

// out = scalar * P, affine bytes in/out. Returns 1 if result is infinity.
int kzgn_g1_mul(const uint8_t xy[96], int inf, const uint8_t scalar_be[32], uint8_t out_xy[96]) {
    if (inf) {
        memset(out_xy, 0, 96);
        return 1;
    }
    Fp x, y;
    if (!fp_from_be(x, xy) || !fp_from_be(y, xy + 48)) return -1;
    uint64_t e[4];
    for (int i = 0; i < 4; i++) {
        uint64_t v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | scalar_be[(3 - i) * 8 + j];
        e[i] = v;
    }
    Jac<Fp> p = jac_from_affine<Fp>(x, y), r;
    jac_mul_scalar(r, p, e, 4);
    Fp rx, ry;
    if (!jac_to_affine(rx, ry, r)) {
        memset(out_xy, 0, 96);
        return 1;
    }
    fp_to_be(out_xy, rx);
    fp_to_be(out_xy + 48, ry);
    return 0;
}

// out = P + Q, affine bytes. inf flags per point. Returns 1 if result inf.
int kzgn_g1_add(const uint8_t p_xy[96], int p_inf, const uint8_t q_xy[96], int q_inf,
                uint8_t out_xy[96]) {
    Jac<Fp> pj = jac_identity<Fp>(), qj = jac_identity<Fp>();
    Fp x, y;
    if (!p_inf) {
        if (!fp_from_be(x, p_xy) || !fp_from_be(y, p_xy + 48)) return -1;
        pj = jac_from_affine<Fp>(x, y);
    }
    if (!q_inf) {
        if (!fp_from_be(x, q_xy) || !fp_from_be(y, q_xy + 48)) return -1;
        qj = jac_from_affine<Fp>(x, y);
    }
    Jac<Fp> r;
    jac_add(r, pj, qj);
    Fp rx, ry;
    if (!jac_to_affine(rx, ry, r)) {
        memset(out_xy, 0, 96);
        return 1;
    }
    fp_to_be(out_xy, rx);
    fp_to_be(out_xy + 48, ry);
    return 0;
}

// out = scalar * P on G2, raw affine bytes (x.c0||x.c1||y.c0||y.c1).
int kzgn_g2_mul(const uint8_t xy[192], int inf, const uint8_t scalar_be[32], uint8_t out_xy[192]) {
    if (inf) {
        memset(out_xy, 0, 192);
        return 1;
    }
    Fp2 x, y;
    if (!fp_from_be(x.c0, xy) || !fp_from_be(x.c1, xy + 48) ||
        !fp_from_be(y.c0, xy + 96) || !fp_from_be(y.c1, xy + 144))
        return -1;
    uint64_t e[4];
    for (int i = 0; i < 4; i++) {
        uint64_t v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | scalar_be[(3 - i) * 8 + j];
        e[i] = v;
    }
    Jac<Fp2> p = jac_from_affine<Fp2>(x, y), r;
    jac_mul_scalar(r, p, e, 4);
    Fp2 rx, ry;
    if (!jac_to_affine(rx, ry, r)) {
        memset(out_xy, 0, 192);
        return 1;
    }
    fp_to_be(out_xy, rx.c0);
    fp_to_be(out_xy + 48, rx.c1);
    fp_to_be(out_xy + 96, ry.c0);
    fp_to_be(out_xy + 144, ry.c1);
    return 0;
}

int kzgn_g2_add(const uint8_t p_xy[192], int p_inf, const uint8_t q_xy[192], int q_inf,
                uint8_t out_xy[192]) {
    Jac<Fp2> pj = jac_identity<Fp2>(), qj = jac_identity<Fp2>();
    Fp2 x, y;
    if (!p_inf) {
        if (!fp_from_be(x.c0, p_xy) || !fp_from_be(x.c1, p_xy + 48) ||
            !fp_from_be(y.c0, p_xy + 96) || !fp_from_be(y.c1, p_xy + 144))
            return -1;
        pj = jac_from_affine<Fp2>(x, y);
    }
    if (!q_inf) {
        if (!fp_from_be(x.c0, q_xy) || !fp_from_be(x.c1, q_xy + 48) ||
            !fp_from_be(y.c0, q_xy + 96) || !fp_from_be(y.c1, q_xy + 144))
            return -1;
        qj = jac_from_affine<Fp2>(x, y);
    }
    Jac<Fp2> r;
    jac_add(r, pj, qj);
    Fp2 rx, ry;
    if (!jac_to_affine(rx, ry, r)) {
        memset(out_xy, 0, 192);
        return 1;
    }
    fp_to_be(out_xy, rx.c0);
    fp_to_be(out_xy + 48, rx.c1);
    fp_to_be(out_xy + 96, ry.c0);
    fp_to_be(out_xy + 144, ry.c1);
    return 0;
}

// Multi-scalar multiplication on G1: out = sum scalars[i] * P_i. Windowed
// Pippenger over Jacobian coordinates, for the small host-side MSMs of the
// batch-verification tails (n <= a few hundred) where a device round trip
// (~40 ms through a remote-attached chip) would dominate the arithmetic
// (role parity: the 3-MSM fold of verify_kzg_proof_batch,
// /root/reference/kzg/src/eip_4844.rs:380-435). Returns 1 if the result is
// the point at infinity, 0 otherwise, -1 on undecodable input.
// Mixed Jacobian + affine addition (madd-2007-bl, ~8M+4S vs 12M+4S for the
// full Jacobian add) -- the bucket-accumulation hot op: every MSM input is
// affine. Handles identity/doubling edges.
static void jac_add_affine(Jac<Fp> &r, const Jac<Fp> &p, const Fp &qx, const Fp &qy) {
    if (p.inf) {
        r = {qx, qy, FieldOps<Fp>::one(), false};
        return;
    }
    Fp z1z1, u2, t, s2;
    fp_sqr(z1z1, p.z);
    fp_mul(u2, qx, z1z1);
    fp_mul(t, p.z, z1z1);
    fp_mul(s2, qy, t);
    if (fp_eq(u2, p.x)) {
        if (fp_eq(s2, p.y)) {
            jac_double(r, p);
            return;
        }
        r = jac_identity<Fp>();
        return;
    }
    Fp h, hh, i, j, rr, v;
    fp_sub(h, u2, p.x);
    fp_sqr(hh, h);
    fp_add(i, hh, hh);
    fp_add(i, i, i);          // I = 4 HH
    fp_mul(j, h, i);          // J = H*I
    fp_sub(rr, s2, p.y);
    fp_add(rr, rr, rr);       // r = 2(S2 - Y1)
    fp_mul(v, p.x, i);        // V = X1*I
    Fp x3, y3, z3;
    fp_sqr(x3, rr);
    fp_sub(x3, x3, j);
    fp_sub(x3, x3, v);
    fp_sub(x3, x3, v);        // X3 = r^2 - J - 2V
    fp_sub(t, v, x3);
    fp_mul(t, rr, t);
    Fp y1j;
    fp_mul(y1j, p.y, j);
    fp_add(y1j, y1j, y1j);
    fp_sub(y3, t, y1j);       // Y3 = r(V - X3) - 2 Y1 J
    fp_add(z3, p.z, h);
    fp_sqr(z3, z3);
    fp_sub(z3, z3, z1z1);
    fp_sub(z3, z3, hh);       // Z3 = (Z1 + H)^2 - Z1Z1 - HH
    r = {x3, y3, z3, false};
}

// floor-divide a 256-bit value (4 LE u64 limbs) by a 128-bit divisor,
// binary long division. Returns quotient in q (2 limbs), remainder in rem
// (2 limbs). Preconditions (met by the GLV split below): quotient and
// remainder both fit 128 bits.
static void div256_128(const uint64_t k[4], unsigned __int128 d,
                       unsigned __int128 &q, unsigned __int128 &rem) {
    q = 0;
    unsigned __int128 r2 = 0;
    for (int i = 255; i >= 0; i--) {
        // r2 = (r2 << 1) | bit_i(k); r2 stays < 2d < 2^129 -> track overflow
        int carry = (int)(r2 >> 127);
        r2 = (r2 << 1) | ((k[i / 64] >> (i % 64)) & 1);
        if (carry || r2 >= d) {
            r2 -= d;
            if (i < 128) q |= (unsigned __int128)1 << i;
        }
    }
    rem = r2;
}

struct HostAff { Fp x, y; };

// Variable-base MSM core on the host: GLV-split Pippenger with signed
// digits and mixed-affine bucket accumulation.
//   k*P = k1*P + k2*psi(P),  psi(P) = [x^2]P = (beta * xP, -yP),
// an exact integer identity (k = k1 + k2 * x^2, k1 = k mod x^2), so both
// halves are < 2^128: half the windows of the 256-bit ladder. Buckets use
// signed digits (half the buckets) and every accumulation is a mixed add
// into affine inputs. This is the latency tail of batch verification
// (parity role: blst_p1s_mult_pippenger in
// /root/reference/blst/src/types/g1.rs:242-273; expression original).
// pts/scalars: n entries, already decompressed / canonical (inf entries
// excluded by callers).
static void msm_host(const HostAff *in_pts, const uint64_t (*in_sc)[4],
                     size_t n, Jac<Fp> &out) {
    // 2n GLV halves; window cost: ceil(129/c) * (2n + 2^(c-1) doubles-worth)
    int c = 4;
    double best = 1e30;
    for (int t = 3; t <= 12; t++) {
        double cost = (double)((129 + t - 1) / t) *
                      (2.0 * (double)n + 1.6 * (double)(1u << (t - 1)) + t);
        if (cost < best) { best = cost; c = t; }
    }
    const unsigned __int128 X2 =
        (unsigned __int128)BLS_X_ABS * (unsigned __int128)BLS_X_ABS;
    Fp beta;
    memcpy(beta.l, BETA_G1_MONT, sizeof beta.l);

    size_t cap = 2 * (n ? n : 1);
    HostAff *pts = new HostAff[cap];       // even: P (k1), odd: psi(P) (k2)
    unsigned __int128 *ks = new unsigned __int128[cap];
    size_t m = 0;
    for (size_t i = 0; i < n; i++) {
        unsigned __int128 k1, k2;
        div256_128(in_sc[i], X2, k2, k1);  // k = k1 + k2 * x^2
        if (k1) {
            pts[m] = in_pts[i];
            ks[m] = k1;
            m++;
        }
        if (k2) {
            fp_mul(pts[m].x, in_pts[i].x, beta);  // psi(P) = (beta x, -y)
            fp_neg(pts[m].y, in_pts[i].y);
            ks[m] = k2;
            m++;
        }
    }
    int windows = (129 + c - 1) / c;
    size_t nbuckets = (size_t)1 << (c - 1); // signed digits: |d| in [1, 2^(c-1)]
    uint32_t mask = (1u << c) - 1;
    // precompute signed digits: digits[i*windows + w], carry-chain once
    int16_t *digits = new int16_t[(m ? m : 1) * (size_t)windows];
    for (size_t i = 0; i < m; i++) {
        unsigned __int128 k = ks[i];
        uint32_t carry = 0;
        for (int ww = 0; ww < windows; ww++) {
            // guard: ww*c can reach 128 in the top window (shift of an
            // __int128 by >= 128 is UB; the top digit is then carry-only)
            uint32_t bits =
                ww * c < 128 ? (uint32_t)((k >> (ww * c)) & mask) : 0u;
            uint32_t d = bits + carry;
            carry = 0;
            int16_t sd = (int16_t)d;
            if (d > nbuckets) {            // d > 2^(c-1): use d - 2^c, carry 1
                sd = -(int16_t)((1u << c) - d);
                carry = 1;
            }
            digits[i * (size_t)windows + ww] = sd;
        }
    }
    Jac<Fp> *buckets = new Jac<Fp>[nbuckets];
    Jac<Fp> acc = jac_identity<Fp>();
    for (int w = windows - 1; w >= 0; w--) {
        if (!acc.inf)
            for (int d = 0; d < c; d++) jac_double(acc, acc);
        for (size_t b = 0; b < nbuckets; b++) buckets[b] = jac_identity<Fp>();
        for (size_t i = 0; i < m; i++) {
            int16_t sd = digits[i * (size_t)windows + w];
            if (!sd) continue;
            uint32_t digit = (uint32_t)(sd < 0 ? -sd : sd);
            Jac<Fp> &b = buckets[digit - 1];
            if (sd > 0) {
                jac_add_affine(b, b, pts[i].x, pts[i].y);
            } else {
                Fp ny;
                fp_neg(ny, pts[i].y);
                jac_add_affine(b, b, pts[i].x, ny);
            }
        }
        Jac<Fp> running = jac_identity<Fp>(), total = jac_identity<Fp>();
        for (size_t d = nbuckets; d-- > 0;) {
            jac_add(running, running, buckets[d]);
            jac_add(total, total, running);
        }
        jac_add(acc, acc, total);
    }
    delete[] buckets;
    delete[] digits;
    delete[] pts;
    delete[] ks;
    out = acc;
}

int kzgn_g1_msm(const uint8_t *xy, const uint8_t *inf, size_t n,
                const uint8_t *scalars_be, uint8_t *out_xy) {
    HostAff *pts = new HostAff[n ? n : 1];
    typedef uint64_t Sc4[4];
    Sc4 *sc = new Sc4[n ? n : 1];
    size_t m = 0;
    bool bad = false;
    for (size_t i = 0; i < n; i++) {
        if (inf && inf[i]) continue;
        Fp x, y;
        if (!fp_from_be(x, xy + i * 96) || !fp_from_be(y, xy + i * 96 + 48)) {
            bad = true;
            break;
        }
        for (int kk = 0; kk < 4; kk++) {
            uint64_t v = 0;
            for (int j = 0; j < 8; j++)
                v = (v << 8) | scalars_be[i * 32 + (size_t)(3 - kk) * 8 + j];
            sc[m][kk] = v;
        }
        pts[m].x = x;
        pts[m].y = y;
        m++;
    }
    if (bad) {
        delete[] pts;
        delete[] sc;
        return -1;
    }
    Jac<Fp> acc;
    msm_host(pts, sc, m, acc);
    delete[] pts;
    delete[] sc;
    Fp rx, ry;
    if (!jac_to_affine(rx, ry, acc)) {
        memset(out_xy, 0, 96);
        return 1;
    }
    fp_to_be(out_xy, rx);
    fp_to_be(out_xy + 48, ry);
    return 0;
}

// Fused EIP-7594 cell-batch verification tail, entirely on the host
// (parity: DAS::verify_cell_kzg_proof_batch, /root/reference/kzg/src/
// das.rs:294-452 and its helpers :698-906). The device kernel remains the
// multi-chip path; on a remote-attached chip this host form replaces a
// ~800 ms device round trip with ~25 ms of scalar work + 4 GLV MSMs.
//   roots_mont: 8193 x 32B little-endian Montgomery Fr (roots_of_unity of
//   the 8192-wide FFTSettings, wrap element included);
//   g1mono_xy/inf: first 64 monomial setup points, affine BE;
//   g2s64: [s^64]_2 affine BE. Returns 1/0, or negative on bad input
//   (-1 points, -2 scalars).
extern "C" int kzgn_verify_cell_batch(
    const uint8_t *u_comms_comp, size_t nu, const uint32_t *comm_idx,
    const uint32_t *cell_idx, const uint8_t *cells_be,
    const uint8_t *proofs_comp, size_t n, const uint8_t r_be[32],
    const uint8_t *roots_mont, const uint8_t *g1mono_xy,
    const uint8_t *g1mono_inf, const uint8_t g2s64[192], int g2s64_inf) {
    const int CELL = 64, K2 = 128, FE_EXT = 8192;
    if (!n) return 1;
    struct Pt { Fp x, y; bool inf; };
    std::vector<Pt> comms(nu), proofs(n);
    for (size_t i = 0; i < nu; i++) {
        int rc = g1_decompress(u_comms_comp + 48 * i, comms[i].x, comms[i].y, true);
        if (rc < 0) return -1;
        comms[i].inf = rc == 1;
    }
    for (size_t i = 0; i < n; i++) {
        int rc = g1_decompress(proofs_comp + 48 * i, proofs[i].x, proofs[i].y, true);
        if (rc < 0) return -1;
        proofs[i].inf = rc == 1;
    }
    const Fr *roots = reinterpret_cast<const Fr *>(roots_mont);
    Fr r;
    if (!fr_from_be(r, r_be)) return -2;
    std::vector<Fr> rpow(n);                     // Montgomery r^i
    rpow[0] = fr_one_mont();
    for (size_t i = 1; i < n; i++) fr_mul(rpow[i], rpow[i - 1], r);
    Fr one_raw;
    memset(&one_raw, 0, sizeof one_raw);
    one_raw.l[0] = 1;

    // rbl(cell index) for 128 cells: 7-bit reversal
    auto rbl128 = [](uint32_t v) {
        uint32_t o = 0;
        for (int b = 0; b < 7; b++) o |= ((v >> b) & 1) << (6 - b);
        return o;
    };

    struct Sc { uint64_t w[4]; };
    // (1) proof lincomb with r_powers; (4) weighted proofs with r_i * h_k^64
    std::vector<HostAff> pl_pts, wp_pts;
    std::vector<Sc> pl_sc(n), wp_sc(n);
    pl_pts.reserve(n); wp_pts.reserve(n);
    size_t npl = 0, nwp = 0;
    for (size_t i = 0; i < n; i++) {
        if (cell_idx[i] >= (uint32_t)K2) return -3;
        if (proofs[i].inf) continue;
        Fr can;
        fr_mul(can, rpow[i], one_raw);
        pl_pts.push_back({proofs[i].x, proofs[i].y});
        memcpy(pl_sc[npl].w, can.l, 32);
        npl++;
        Fr hpow = roots[(size_t)rbl128(cell_idx[i]) * CELL];
        Fr w, wc;
        fr_mul(w, rpow[i], hpow);
        fr_mul(wc, w, one_raw);
        wp_pts.push_back({proofs[i].x, proofs[i].y});
        memcpy(wp_sc[nwp].w, wc.l, 32);
        nwp++;
    }
    // (2) weighted sum of commitments
    std::vector<Fr> cw(nu);
    for (size_t c = 0; c < nu; c++) memset(&cw[c], 0, sizeof(Fr));
    for (size_t i = 0; i < n; i++) {
        if (comm_idx[i] >= nu) return -3;
        fr_add(cw[comm_idx[i]], cw[comm_idx[i]], rpow[i]);
    }
    std::vector<HostAff> wc_pts;
    std::vector<Sc> wc_sc(nu);
    size_t nwc = 0;
    for (size_t c = 0; c < nu; c++) {
        if (comms[c].inf) continue;
        Fr can;
        fr_mul(can, cw[c], one_raw);
        if (!(can.l[0] | can.l[1] | can.l[2] | can.l[3])) continue;
        wc_pts.push_back({comms[c].x, comms[c].y});
        memcpy(wc_sc[nwc].w, can.l, 32);
        nwc++;
    }
    // (3) aggregated interpolation polynomial commitment
    // cells raw-parsed; scaled = r_pow(mont) * cell(raw) = raw
    std::vector<Fr> agg((size_t)K2 * CELL);
    for (auto &f : agg) memset(&f, 0, sizeof(Fr));
    std::vector<uint8_t> used(K2, 0);
    for (size_t i = 0; i < n; i++) {
        used[cell_idx[i]] = 1;
        for (int k = 0; k < CELL; k++) {
            Fr v, sc;
            if (!fr_raw_from_be(v, cells_be + (i * CELL + k) * 32)) return -2;
            fr_mul(sc, rpow[i], v);  // raw
            Fr &slot = agg[(size_t)cell_idx[i] * CELL + k];
            fr_add(slot, slot, sc);
        }
    }
    // inverse FFT over each used column (values raw, twiddles Montgomery)
    // roots of order 64 live at stride FE_EXT/CELL in the 8192 table;
    // INVERSE roots by reflected index.
    Fr inv64;
    {
        Fr c64, r2;
        memset(&c64, 0, sizeof c64);
        c64.l[0] = 64;
        memcpy(r2.l, FR_R2, 32);
        fr_mul(c64, c64, r2);  // Montgomery(64)
        fr_inv(inv64, c64);    // Montgomery(1/64)
    }
    std::vector<Fr> poly_agg(CELL);
    for (auto &f : poly_agg) memset(&f, 0, sizeof(Fr));
    std::vector<Fr> col(CELL), tmp(CELL);
    for (int cidx = 0; cidx < K2; cidx++) {
        if (!used[cidx]) continue;
        // The reference reverse_bit_orders the column then runs its inverse
        // FFT on natural-order evaluations; an iterative DIT consumes
        // BIT-REVERSED input, so the brp-ordered cell values feed directly.
        for (int k = 0; k < CELL; k++)
            col[k] = agg[(size_t)cidx * CELL + k];
        // iterative inverse DIT FFT, w_inv = roots[FE_EXT - stride*j]
        for (int half = 1; half < CELL; half <<= 1) {
            int step = FE_EXT / (2 * half);  // root stride for this level
            for (int start = 0; start < CELL; start += 2 * half) {
                for (int j = 0; j < half; j++) {
                    // inverse twiddle: w^-j of order 2*half
                    size_t idx = (size_t)(FE_EXT - step * j);
                    const Fr &w = roots[idx == (size_t)FE_EXT ? 0 : idx];
                    Fr lo = col[start + j];
                    Fr hi;
                    fr_mul(hi, w, col[start + j + half]);  // mont*raw = raw
                    fr_add(col[start + j], lo, hi);
                    fr_sub(col[start + j + half], lo, hi);
                }
            }
        }
        for (int k = 0; k < CELL; k++) {
            Fr v;
            fr_mul(v, inv64, col[k]);
            col[k] = v;  // raw / 64
        }
        // shift by h_k^-1 powers: poly[k] *= inv_shift^k
        size_t rbli = rbl128((uint32_t)cidx);
        size_t inv_idx = (size_t)FE_EXT - rbli;
        const Fr &inv_shift = roots[inv_idx == (size_t)FE_EXT ? 0 : inv_idx];
        Fr pw = fr_one_mont();
        for (int k = 0; k < CELL; k++) {
            Fr v;
            fr_mul(v, pw, col[k]);  // mont * raw = raw
            fr_add(poly_agg[k], poly_agg[k], v);
            Fr np;
            fr_mul(np, pw, inv_shift);
            pw = np;
        }
    }
    // commit to poly_agg over the first 64 monomial points
    std::vector<HostAff> ip_pts;
    std::vector<Sc> ip_sc(CELL);
    size_t nip = 0;
    for (int k = 0; k < CELL; k++) {
        if (g1mono_inf[k]) continue;
        if (!(poly_agg[k].l[0] | poly_agg[k].l[1] | poly_agg[k].l[2] |
              poly_agg[k].l[3]))
            continue;
        Fp x, y;
        if (!fp_from_be(x, g1mono_xy + 96 * k) ||
            !fp_from_be(y, g1mono_xy + 96 * k + 48))
            return -1;
        ip_pts.push_back({x, y});
        memcpy(ip_sc[nip].w, poly_agg[k].l, 32);  // raw IS canonical
        nip++;
    }
    Jac<Fp> pl_j, wc_j, ip_j, wp_j;
    auto sc4 = [](const std::vector<Sc> &v) {
        return reinterpret_cast<const uint64_t(*)[4]>(v.data());
    };
    msm_host(pl_pts.data(), sc4(pl_sc), npl, pl_j);
    msm_host(wc_pts.data(), sc4(wc_sc), nwc, wc_j);
    msm_host(ip_pts.data(), sc4(ip_sc), nip, ip_j);
    msm_host(wp_pts.data(), sc4(wp_sc), nwp, wp_j);
    // final = wc - ip + wp
    Jac<Fp> fin;
    {
        Jac<Fp> nip_j = ip_j;
        if (!nip_j.inf) fp_neg(nip_j.y, nip_j.y);
        jac_add(fin, wc_j, nip_j);
        jac_add(fin, fin, wp_j);
    }
    // e(final, H) == e(proof_lincomb, [s^64]_2)
    Fp fx = FP_ZERO, fy = FP_ZERO, plx = FP_ZERO, ply = FP_ZERO;
    bool fin_inf = !jac_to_affine(fx, fy, fin);
    bool pl_inf = !jac_to_affine(plx, ply, pl_j);
    Fp2 hx, hy, sx = FP2_ZERO_V, sy = FP2_ZERO_V;
    memcpy(hx.c0.l, G2_GEN_X0_MONT, sizeof hx.c0.l);
    memcpy(hx.c1.l, G2_GEN_X1_MONT, sizeof hx.c1.l);
    memcpy(hy.c0.l, G2_GEN_Y0_MONT, sizeof hy.c0.l);
    memcpy(hy.c1.l, G2_GEN_Y1_MONT, sizeof hy.c1.l);
    if (!g2s64_inf &&
        (!fp_from_be(sx.c0, g2s64) || !fp_from_be(sx.c1, g2s64 + 48) ||
         !fp_from_be(sy.c0, g2s64 + 96) || !fp_from_be(sy.c1, g2s64 + 144)))
        return -1;
    Fp nfy;
    fp_neg(nfy, fy);
    bool skip_f = fin_inf;
    bool skip_p = pl_inf || g2s64_inf != 0;
    static thread_local PreparedG2 pf_buf, pp_buf;
    if (!skip_f) prep_fetch(hx, hy, pf_buf);
    if (!skip_p) prep_fetch(sx, sy, pp_buf);
    Fp12 f = miller_loop_dual_prepared(fx, nfy, skip_f, skip_f ? nullptr : &pf_buf,
                                       plx, ply, skip_p, skip_p ? nullptr : &pp_buf);
    Fp12 e = final_exponentiation(f);
    return fp12_is_one(e) ? 1 : 0;
}

// ---------------------------------------------------------------------------
// Host FK20 engine: compute_cells_and_kzg_proofs + erasure recovery
// (parity: DAS::compute_cells_and_kzg_proofs das.rs:244-292,
// compute_fk20_proofs :660-696, recover_cells :549-616 and helpers).
// On a remote-attached chip the fused device kernel costs ~900 ms; the
// host pipeline is Fr FFTs (cheap scalar loops), 128 GLV column MSMs, and
// two GLV-windowed G1 FFTs.
// ---------------------------------------------------------------------------

static const int FK_N = 4096, FK_CELL = 64, FK_K2 = 128, FK_FE = 8192;

// in-place Fr FFT, natural order in/out; values raw, twiddles Montgomery.
// roots: the 8193-entry table of FK_FE-th roots.
static void fr_fft_c(Fr *v, int n, bool inverse, const Fr *roots) {
    // bit-reverse permute
    int lg = 0;
    while ((1 << lg) < n) lg++;
    for (int i = 0; i < n; i++) {
        int j = 0;
        for (int b = 0; b < lg; b++) j |= ((i >> b) & 1) << (lg - 1 - b);
        if (j > i) {
            Fr t = v[i];
            v[i] = v[j];
            v[j] = t;
        }
    }
    for (int half = 1; half < n; half <<= 1) {
        int step = FK_FE / (2 * half);  // stride of the (2*half)-order root
        for (int start = 0; start < n; start += 2 * half) {
            for (int j = 0; j < half; j++) {
                size_t idx = inverse ? (size_t)(FK_FE - step * j) : (size_t)step * j;
                const Fr &w = roots[idx == (size_t)FK_FE ? 0 : idx];
                Fr lo = v[start + j];
                Fr hi;
                fr_mul(hi, w, v[start + j + half]);  // mont * raw = raw
                fr_add(v[start + j], lo, hi);
                fr_sub(v[start + j + half], lo, hi);
            }
        }
    }
    if (inverse) {
        // scale by 1/n (Montgomery constant computed on demand)
        Fr cn, r2, invn;
        memset(&cn, 0, sizeof cn);
        cn.l[0] = (uint64_t)n;
        memcpy(r2.l, FR_R2, 32);
        fr_mul(cn, cn, r2);
        fr_inv(invn, cn);
        for (int i = 0; i < n; i++) {
            Fr t;
            fr_mul(t, invn, v[i]);
            v[i] = t;
        }
    }
}

// reverse-bit-order permutation (extern-"C" region: no templates, so the
// element size is passed explicitly)
static void rbo_bytes_c(void *vp, int n, size_t esz) {
    uint8_t *v = (uint8_t *)vp;
    int lg = 0;
    while ((1 << lg) < n) lg++;
    uint8_t tmp[sizeof(Jac<Fp>) > 64 ? sizeof(Jac<Fp>) : 64];
    for (int i = 0; i < n; i++) {
        int j = 0;
        for (int b = 0; b < lg; b++) j |= ((i >> b) & 1) << (lg - 1 - b);
        if (j > i) {
            memcpy(tmp, v + (size_t)i * esz, esz);
            memcpy(v + (size_t)i * esz, v + (size_t)j * esz, esz);
            memcpy(v + (size_t)j * esz, tmp, esz);
        }
    }
}
#define rbo_c(ptr, n) rbo_bytes_c((void *)(ptr), (n), sizeof(*(ptr)))

// out = [k]B for a Jacobian B via the GLV 2-way joint ladder with a
// 15-entry 2x2-bit window table (i*B + j*psi(B), i,j in 0..3).
static void g1_mul_glv(Jac<Fp> &out, const Jac<Fp> &b, const uint64_t k4[4]) {
    if (b.inf) {
        out = jac_identity<Fp>();
        return;
    }
    const unsigned __int128 X2 =
        (unsigned __int128)BLS_X_ABS * (unsigned __int128)BLS_X_ABS;
    unsigned __int128 k1, k2;
    div256_128(k4, X2, k2, k1);
    Fp beta;
    memcpy(beta.l, BETA_G1_MONT, sizeof beta.l);
    Jac<Fp> psi = b;
    fp_mul(psi.x, b.x, beta);
    fp_neg(psi.y, psi.y);
    Jac<Fp> tab[16];
    tab[0] = jac_identity<Fp>();
    tab[1] = b;
    Jac<Fp> b2, p2;
    jac_double(b2, b);
    jac_double(p2, psi);
    tab[2] = b2;
    jac_add(tab[3], b2, b);
    tab[4] = psi;
    tab[8] = p2;
    jac_add(tab[12], p2, psi);
    for (int j = 1; j < 4; j++)
        for (int i = 1; i < 4; i++)
            jac_add(tab[4 * j + i], tab[4 * j], tab[i]);
    Jac<Fp> acc = jac_identity<Fp>();
    for (int pos = 63; pos >= 0; pos--) {
        if (!acc.inf) {
            jac_double(acc, acc);
            jac_double(acc, acc);
        }
        int d1 = (int)((k1 >> (2 * pos)) & 3);
        int d2 = (int)((k2 >> (2 * pos)) & 3);
        int m = d2 * 4 + d1;
        if (m) jac_add(acc, acc, tab[m]);
    }
    out = acc;
}

// in-place G1 FFT over Jacobian points (natural order in/out); twiddles
// canonical u64[4] (roots_can). Only used at n = 128.
static void g1_fft_c(Jac<Fp> *v, int n, bool inverse,
                     const uint64_t (*roots_can)[4]) {
    int lg = 0;
    while ((1 << lg) < n) lg++;
    rbo_c(v, n);
    for (int half = 1; half < n; half <<= 1) {
        int step = FK_FE / (2 * half);
        for (int start = 0; start < n; start += 2 * half) {
            for (int j = 0; j < half; j++) {
                size_t idx = inverse ? (size_t)(FK_FE - step * j) : (size_t)step * j;
                if (idx == (size_t)FK_FE) idx = 0;
                Jac<Fp> t;
                if (idx == 0) {
                    t = v[start + j + half];
                } else {
                    g1_mul_glv(t, v[start + j + half], roots_can[idx]);
                }
                Jac<Fp> lo = v[start + j];
                jac_add(v[start + j], lo, t);
                Jac<Fp> nt = t;
                if (!nt.inf) fp_neg(nt.y, nt.y);
                jac_add(v[start + j + half], lo, nt);
            }
        }
    }
    // NOTE: inverse scaling by 1/n is NOT applied here -- FK20 folds it
    // into the Fr coefficients feeding the column MSMs (see caller).
}

// process-wide FK20 context (x_ext columns + root tables), set up once
struct Fk20Ctx {
    std::vector<HostAff> xext;     // [K2][CELL] affine
    std::vector<uint8_t> xext_inf;
    std::vector<Fr> roots_mont;        // 8193 Montgomery
    std::vector<uint64_t> roots_can;   // 8193 x 4 canonical
    bool ready = false;
};
static Fk20Ctx g_fk20;

extern "C" int kzgn_fk20_init(const uint8_t *xext_xy, const uint8_t *xext_inf,
                              const uint8_t *roots_mont_bytes) {
    Fk20Ctx &c = g_fk20;
    c.xext.resize((size_t)FK_K2 * FK_CELL);
    c.xext_inf.assign(xext_inf, xext_inf + (size_t)FK_K2 * FK_CELL);
    for (size_t i = 0; i < (size_t)FK_K2 * FK_CELL; i++) {
        if (c.xext_inf[i]) continue;
        if (!fp_from_be(c.xext[i].x, xext_xy + 96 * i) ||
            !fp_from_be(c.xext[i].y, xext_xy + 96 * i + 48))
            return -1;
    }
    c.roots_mont.resize(FK_FE + 1);
    memcpy(c.roots_mont.data(), roots_mont_bytes, 32 * (size_t)(FK_FE + 1));
    c.roots_can.resize((size_t)(FK_FE + 1) * 4);
    Fr one_raw;
    memset(&one_raw, 0, sizeof one_raw);
    one_raw.l[0] = 1;
    for (size_t i = 0; i <= (size_t)FK_FE; i++) {
        Fr t;
        fr_mul(t, c.roots_mont[i], one_raw);
        memcpy(&c.roots_can[i * 4], t.l, 32);
    }
    c.ready = true;
    return 0;
}

// FK20 proofs for a monomial polynomial (first FK_N coeffs used), raw
// values. proofs_out: FK_K2 Jacobian points in brp order NOT applied
// (caller reverse_bit_orders).
static double now_ms() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec * 1e3 + ts.tv_nsec / 1e6;
}

static void fk20_proofs_c(const Fr *poly_mono, Jac<Fp> *proofs_out) {
    const Fk20Ctx &C = g_fk20;
    const bool dbg = getenv("KZGN_DEBUG_TIMING") != nullptr;
    double t0 = dbg ? now_ms() : 0;
    // toeplitz coeff FFTs: coeffs[j][i], i < CELL
    static thread_local std::vector<Fr> coeffs;  // [K2][CELL]
    coeffs.assign((size_t)FK_K2 * FK_CELL, Fr());
    Fr tc[FK_K2];
    const int r = FK_N / FK_CELL;  // 64
    for (int i = 0; i < FK_CELL; i++) {
        memset(tc, 0, sizeof tc);
        const int d = FK_N - 1;
        tc[0] = poly_mono[d - i];
        for (int j = 1; j < r - 1; j++)
            tc[2 * r - j] = poly_mono[d - i - j * FK_CELL];
        fr_fft_c(tc, FK_K2, false, C.roots_mont.data());
        for (int j = 0; j < FK_K2; j++) coeffs[(size_t)j * FK_CELL + i] = tc[j];
    }
    // fold the G1-IFFT 1/128 scale into the Fr scalars (linearity)
    Fr inv128;
    {
        Fr cn, r2;
        memset(&cn, 0, sizeof cn);
        cn.l[0] = 128;
        memcpy(r2.l, FR_R2, 32);
        fr_mul(cn, cn, r2);
        fr_inv(inv128, cn);
    }
    double t1 = dbg ? now_ms() : 0;
    // 128 column MSMs (64 points each, canonical scalars)
    struct Sc { uint64_t w[4]; };
    std::vector<HostAff> pts(FK_CELL);
    std::vector<Sc> sc(FK_CELL);
    std::vector<Jac<Fp>> h_ext(FK_K2);
    for (int j = 0; j < FK_K2; j++) {
        size_t m = 0;
        for (int i = 0; i < FK_CELL; i++) {
            if (C.xext_inf[(size_t)j * FK_CELL + i]) continue;
            Fr scaled;
            fr_mul(scaled, inv128, coeffs[(size_t)j * FK_CELL + i]);
            // scaled is raw = canonical
            if (!(scaled.l[0] | scaled.l[1] | scaled.l[2] | scaled.l[3]))
                continue;
            pts[m] = C.xext[(size_t)j * FK_CELL + i];
            memcpy(sc[m].w, scaled.l, 32);
            m++;
        }
        msm_host(pts.data(), reinterpret_cast<const uint64_t(*)[4]>(sc.data()),
                 m, h_ext[j]);
    }
    double t2 = dbg ? now_ms() : 0;
    // h = IFFT(h_ext) (scale already folded), zero top half, FFT
    g1_fft_c(h_ext.data(), FK_K2, true,
             reinterpret_cast<const uint64_t(*)[4]>(C.roots_can.data()));
    for (int j = FK_K2 / 2; j < FK_K2; j++) h_ext[j] = jac_identity<Fp>();
    g1_fft_c(h_ext.data(), FK_K2, false,
             reinterpret_cast<const uint64_t(*)[4]>(C.roots_can.data()));
    for (int j = 0; j < FK_K2; j++) proofs_out[j] = h_ext[j];
    if (dbg)
        fprintf(stderr, "[fk20] toeplitz_ffts=%.1fms column_msms=%.1fms g1_ffts=%.1fms\n",
                t1 - t0, t2 - t1, now_ms() - t2);
}

// blob (4096 canonical BE) -> cells (8192 BE, brp order) and/or proofs
// (128 compressed, brp order). with_proofs: 0 cells only, 1 both,
// 2 proofs only. Returns 0, or i+1 if blob scalar i is non-canonical.
extern "C" long kzgn_compute_cells(const uint8_t *blob_be, int with_proofs,
                                   uint8_t *cells_out, uint8_t *proofs_out) {
    if (!g_fk20.ready) return -100;
    const Fk20Ctx &C = g_fk20;
    std::vector<Fr> poly(FK_FE);
    for (int i = 0; i < FK_N; i++)
        if (!fr_raw_from_be(poly[i], blob_be + 32 * i)) return (long)(i + 1);
    for (int i = FK_N; i < FK_FE; i++) memset(&poly[i], 0, sizeof(Fr));
    // lagrange (brp evals) -> monomial: rbo + inverse FFT over 4096
    rbo_c(poly.data(), FK_N);
    fr_fft_c(poly.data(), FK_N, true, C.roots_mont.data());
    if (with_proofs != 2 && cells_out) {
        std::vector<Fr> ext(poly);
        fr_fft_c(ext.data(), FK_FE, false, C.roots_mont.data());
        rbo_c(ext.data(), FK_FE);
        for (int i = 0; i < FK_FE; i++)
            for (int w = 0; w < 4; w++)
                for (int j = 0; j < 8; j++)
                    cells_out[32 * i + (3 - w) * 8 + j] =
                        (uint8_t)(ext[i].l[w] >> (56 - 8 * j));
    }
    if (with_proofs && proofs_out) {
        std::vector<Jac<Fp>> proofs(FK_K2);
        fk20_proofs_c(poly.data(), proofs.data());
        rbo_c(proofs.data(), FK_K2);
        for (int j = 0; j < FK_K2; j++) {
            Fp x, y;
            bool inf = !jac_to_affine(x, y, proofs[j]);
            g1_compress(proofs_out + 48 * j, x, y, inf);
        }
    }
    return 0;
}

// Erasure recovery (parity: recover_cells das.rs:549-616). cell_indices
// ascending unique, n_have in [64, 128). cells_be: n_have*64 scalars.
// recovered_out: 8192 canonical BE (brp cell order); proofs_out optional
// (128 compressed). Returns 0, i+1 bad cell scalar, -1 structural.
extern "C" long kzgn_recover_cells(const uint32_t *cell_indices, size_t n_have,
                                   const uint8_t *cells_be,
                                   uint8_t *recovered_out,
                                   uint8_t *proofs_out) {
    if (!g_fk20.ready) return -100;
    const Fk20Ctx &C = g_fk20;
    std::vector<Fr> cells(FK_FE);
    std::vector<uint8_t> have(FK_K2, 0);
    for (size_t i = 0; i < n_have; i++) {
        uint32_t ci = cell_indices[i];
        if (ci >= (uint32_t)FK_K2) return -1;
        if (have[ci]) return -1;
        have[ci] = 1;
        for (int k = 0; k < FK_CELL; k++)
            if (!fr_raw_from_be(cells[(size_t)ci * FK_CELL + k],
                                cells_be + (i * FK_CELL + k) * 32))
                return (long)(i * FK_CELL + k + 1);
    }
    std::vector<Fr> out(FK_FE);
    if (n_have == (size_t)FK_K2) {
        out = cells;
    } else {
        // cells_brp = rbo(full vector); missing pattern per ELEMENT follows
        // the cell it lands in
        std::vector<Fr> cells_brp(cells);
        rbo_c(cells_brp.data(), FK_FE);
        std::vector<uint8_t> have_brp(FK_FE);
        {
            std::vector<uint8_t> he(FK_FE);
            for (int c = 0; c < FK_K2; c++)
                for (int k = 0; k < FK_CELL; k++)
                    he[(size_t)c * FK_CELL + k] = have[c];
            rbo_c(he.data(), FK_FE);
            have_brp = he;
        }
        // vanishing polynomial for missing cells
        std::vector<uint32_t> missing_rbl;
        for (uint32_t c = 0; c < (uint32_t)FK_K2; c++)
            if (!have[c]) {
                uint32_t rbl = 0;
                for (int b = 0; b < 7; b++) rbl |= ((c >> b) & 1) << (6 - b);
                missing_rbl.push_back(rbl);
            }
        if (missing_rbl.size() > (size_t)FK_K2 / 2) return -1;
        // short vanishing poly over roots h_k = roots[idx * stride],
        // stride = FE / K2 = 64
        size_t nm = missing_rbl.size();
        // product of (x - r_i) in Montgomery coefficients: monic recurrence
        // new[j] = old[j]*(-r_i) + old[j-1], walked from the top so old
        // values are read before being overwritten.
        std::vector<Fr> short_vp(nm + 1);
        for (size_t i = 0; i <= nm; i++) memset(&short_vp[i], 0, sizeof(Fr));
        short_vp[0] = fr_one_mont();
        Fr fr_zero_v;
        memset(&fr_zero_v, 0, sizeof fr_zero_v);
        size_t cur = 0;  // current degree
        for (size_t i = 0; i < nm; i++) {
            Fr nr;
            fr_sub(nr, fr_zero_v, C.roots_mont[(size_t)missing_rbl[i] * FK_CELL]);
            for (size_t j = cur + 1; j + 1 > 0; j--) {
                Fr t;
                fr_mul(t, short_vp[j], nr);          // mont * mont = mont
                if (j > 0) fr_add(t, t, short_vp[j - 1]);
                short_vp[j] = t;
                if (j == 0) break;
            }
            cur++;
        }
        // stretch: vanishing_poly[i*CELL] = short_vp[i]
        std::vector<Fr> vp(FK_FE);
        for (auto &f : vp) memset(&f, 0, sizeof(Fr));
        for (size_t i = 0; i <= nm; i++) vp[i * FK_CELL] = short_vp[i];
        // vanishing eval (forward FFT). Values are Montgomery here; the
        // FFT only multiplies by Montgomery twiddles -> stays Montgomery.
        std::vector<Fr> vp_eval(vp);
        fr_fft_c(vp_eval.data(), FK_FE, false, C.roots_mont.data());
        // (evals)*(vanishing eval): missing -> 0
        std::vector<Fr> ez(FK_FE);
        for (int i = 0; i < FK_FE; i++) {
            if (!have_brp[i]) {
                memset(&ez[i], 0, sizeof(Fr));
            } else {
                fr_mul(ez[i], vp_eval[i], cells_brp[i]);  // mont*raw = raw
            }
        }
        fr_fft_c(ez.data(), FK_FE, true, C.roots_mont.data());
        // coset (shift by 7) forward FFT of ez and vp
        Fr seven, r2;
        memset(&seven, 0, sizeof seven);
        seven.l[0] = 7;
        memcpy(r2.l, FR_R2, 32);
        fr_mul(seven, seven, r2);  // Montgomery(7)
        auto shift_poly = [&](Fr *p, const Fr &factor) {
            Fr pw = fr_one_mont();
            for (int i = 0; i < FK_FE; i++) {
                Fr t;
                fr_mul(t, pw, p[i]);
                p[i] = t;
                Fr np;
                fr_mul(np, pw, factor);
                pw = np;
            }
        };
        shift_poly(ez.data(), seven);            // raw stays raw (mont factor)
        fr_fft_c(ez.data(), FK_FE, false, C.roots_mont.data());
        std::vector<Fr> vp_coset(vp);
        shift_poly(vp_coset.data(), seven);      // mont values stay mont
        fr_fft_c(vp_coset.data(), FK_FE, false, C.roots_mont.data());
        // batch-invert vp_coset (Montgomery values, none zero on the coset)
        {
            std::vector<Fr> pref(FK_FE);
            pref[0] = vp_coset[0];
            for (int i = 1; i < FK_FE; i++)
                fr_mul(pref[i], pref[i - 1], vp_coset[i]);
            Fr acc;
            fr_inv(acc, pref[FK_FE - 1]);  // mont(1/prod)
            for (int i = FK_FE; i-- > 0;) {
                Fr invd;
                if (i == 0)
                    invd = acc;
                else
                    fr_mul(invd, acc, pref[i - 1]);
                fr_mul(acc, acc, vp_coset[i]);
                vp_coset[i] = invd;  // mont(1/v)
            }
        }
        for (int i = 0; i < FK_FE; i++) {
            Fr t;
            fr_mul(t, vp_coset[i], ez[i]);  // mont * raw = raw
            ez[i] = t;
        }
        // coset ifft: inverse fft then shift by 1/7
        fr_fft_c(ez.data(), FK_FE, true, C.roots_mont.data());
        Fr inv7;
        fr_inv(inv7, seven);
        shift_poly(ez.data(), inv7);
        // final: forward FFT -> extended evals, rbo
        fr_fft_c(ez.data(), FK_FE, false, C.roots_mont.data());
        rbo_c(ez.data(), FK_FE);
        out = ez;
        // splice the provided cells back verbatim (bit-exactness: the
        // reconstruction is exact, but copying provided data avoids any
        // doubt and matches the reference's output array semantics)
        for (int c = 0; c < FK_K2; c++)
            if (have[c])
                for (int k = 0; k < FK_CELL; k++)
                    out[(size_t)c * FK_CELL + k] = cells[(size_t)c * FK_CELL + k];
    }
    for (int i = 0; i < FK_FE; i++)
        for (int w = 0; w < 4; w++)
            for (int j = 0; j < 8; j++)
                recovered_out[32 * i + (3 - w) * 8 + j] =
                    (uint8_t)(out[i].l[w] >> (56 - 8 * j));
    if (proofs_out) {
        // monomial of the recovered extended evals, then FK20
        std::vector<Fr> poly(out);
        rbo_c(poly.data(), FK_FE);
        fr_fft_c(poly.data(), FK_FE, true, C.roots_mont.data());
        std::vector<Jac<Fp>> proofs(FK_K2);
        fk20_proofs_c(poly.data(), proofs.data());
        rbo_c(proofs.data(), FK_K2);
        for (int j = 0; j < FK_K2; j++) {
            Fp x, y;
            bool inf = !jac_to_affine(x, y, proofs[j]);
            g1_compress(proofs_out + 48 * j, x, y, inf);
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Host single-blob commit/prove (parity: blob_to_kzg_commitment_rust
// eip_4844.rs:278-295, compute_kzg_proof_rust :437-519). Single-op latency
// on a remote-attached chip is round-trip bound (~170-270 ms fenced); the
// host GLV Pippenger does the 4096-point MSM in ~85 ms. Batch paths stay
// on the device where the Pallas pipeline amortizes to ~10-15 ms/blob.
// ---------------------------------------------------------------------------

static std::vector<HostAff> g_commit_pts;   // lagrange-brp setup, affine
static std::vector<uint8_t> g_commit_inf;
static bool g_commit_ready = false;

extern "C" int kzgn_commit_init(const uint8_t *xy, const uint8_t *inf, size_t n) {
    g_commit_pts.resize(n);
    g_commit_inf.assign(inf, inf + n);
    for (size_t i = 0; i < n; i++) {
        if (g_commit_inf[i]) continue;
        if (!fp_from_be(g_commit_pts[i].x, xy + 96 * i) ||
            !fp_from_be(g_commit_pts[i].y, xy + 96 * i + 48))
            return -1;
    }
    g_commit_ready = true;
    return 0;
}

// MSM of the registered base against 4096 raw scalars; out = compressed.
static long commit_msm(const Fr *scalars, uint8_t out[48]) {
    const size_t n = g_commit_pts.size();
    struct Sc { uint64_t w[4]; };
    static thread_local std::vector<HostAff> pts;
    static thread_local std::vector<Sc> sc;
    pts.resize(n);
    sc.resize(n);
    size_t m = 0;
    for (size_t i = 0; i < n; i++) {
        if (g_commit_inf[i]) continue;
        const Fr &s = scalars[i];
        if (!(s.l[0] | s.l[1] | s.l[2] | s.l[3])) continue;
        pts[m] = g_commit_pts[i];
        memcpy(sc[m].w, s.l, 32);
        m++;
    }
    Jac<Fp> acc;
    msm_host(pts.data(), reinterpret_cast<const uint64_t(*)[4]>(sc.data()), m, acc);
    Fp x, y;
    bool is_inf = !jac_to_affine(x, y, acc);
    g1_compress(out, x, y, is_inf);
    return 0;
}

extern "C" long kzgn_blob_commit(const uint8_t *blob_be, uint8_t out[48]) {
    if (!g_commit_ready || g_commit_pts.size() != 4096) return -100;
    std::vector<Fr> p(4096);
    for (int i = 0; i < 4096; i++)
        if (!fr_raw_from_be(p[i], blob_be + 32 * i)) return (long)(i + 1);
    return commit_msm(p.data(), out);
}

// proof + y for a single blob at z. roots_mont: the 4096 brp Montgomery
// roots table. Returns 0, i+1 bad blob scalar, -1 bad z.
extern "C" long kzgn_compute_kzg_proof(const uint8_t *blob_be,
                                       const uint8_t z_be[32],
                                       const uint8_t *roots_mont,
                                       uint8_t proof_out[48],
                                       uint8_t y_out[32]) {
    if (!g_commit_ready || g_commit_pts.size() != 4096) return -100;
    const int N = 4096;
    const Fr *roots = reinterpret_cast<const Fr *>(roots_mont);
    Fr z;
    if (!fr_from_be(z, z_be)) return -1;
    std::vector<Fr> p(N), diff(N), invd(N), pref(N), q(N);
    for (int i = 0; i < N; i++)
        if (!fr_raw_from_be(p[i], blob_be + 32 * i)) return (long)(i + 1);
    Fr one = fr_one_mont();
    int dom = -1;
    for (int i = 0; i < N; i++) {
        fr_sub(diff[i], z, roots[i]);
        if (fr_is_zero(diff[i])) {
            dom = i;
            diff[i] = one;
        }
    }
    // batch inversion: invd[i] = mont(1/(z - w_i)) (or mont(1) at dom)
    pref[0] = diff[0];
    for (int i = 1; i < N; i++) fr_mul(pref[i], pref[i - 1], diff[i]);
    Fr acc;
    fr_inv(acc, pref[N - 1]);
    for (int i = N; i-- > 0;) {
        if (i == 0)
            invd[0] = acc;
        else
            fr_mul(invd[i], acc, pref[i - 1]);
        fr_mul(acc, acc, diff[i]);
    }
    // y (barycentric or in-domain)
    Fr y;
    if (dom >= 0) {
        y = p[dom];
    } else {
        Fr ysum;
        memset(&ysum, 0, sizeof ysum);
        for (int i = 0; i < N; i++) {
            Fr w, t;
            fr_mul(w, roots[i], invd[i]);   // mont
            fr_mul(t, w, p[i]);             // raw
            fr_add(ysum, ysum, t);
        }
        Fr zp = z, fac, invn;
        for (int k = 0; k < 12; k++) fr_mul(zp, zp, zp);
        fr_sub(fac, zp, one);
        memcpy(invn.l, FR_INV4096_MONT, 32);
        fr_mul(ysum, fac, ysum);
        fr_mul(y, invn, ysum);              // raw
    }
    // quotient q_i = (p_i - y)/(w_i - z) = (y - p_i) * inv(z - w_i)
    for (int i = 0; i < N; i++) {
        Fr ymp;
        fr_sub(ymp, y, p[i]);               // raw
        fr_mul(q[i], invd[i], ymp);         // mont * raw = raw
    }
    if (dom >= 0) {
        // q_dom = sum_{i != dom} (p_i - y) * w_i * inv(z*(z - w_i))
        Fr s, zinv;
        memset(&s, 0, sizeof s);
        for (int i = 0; i < N; i++) {
            if (i == dom) continue;
            Fr pmy, t, w;
            fr_sub(pmy, p[i], y);           // raw
            fr_mul(w, roots[i], invd[i]);   // mont
            fr_mul(t, w, pmy);              // raw
            fr_add(s, s, t);
        }
        fr_inv(zinv, z);                    // mont(1/z)
        fr_mul(q[dom], zinv, s);            // raw
    }
    long rc = commit_msm(q.data(), proof_out);
    if (rc) return rc;
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 8; j++)
            y_out[(3 - i) * 8 + j] = (uint8_t)(y.l[i] >> (56 - 8 * j));
    return 0;
}

// Fused batch-verification host tail: decompress commitments + proofs (fast
// subgroup checks), build the two folded linear combinations
//   lhs = sum_i r_i proof_i
//   rhs = sum_i r_i C_i + sum_i (r_i z_i) proof_i - (sum_i r_i y_i) G
// and decide e(lhs, [s]_2) == e(rhs, H) with the prepared-line dual Miller
// loop. ONE call replaces decompress + 2 MSM + pairing round trips through
// Python (parity: verify_blob_kzg_proof_batch_rust,
// /root/reference/kzg/src/eip_4844.rs:736-832, algebraically folded as in
// kzg_tpu/eip4844.py:verify_blob_kzg_proof_batch).
// r_be: the batch challenge; zs/ys: canonical 32-byte BE each.
// Returns 1 verified, 0 not, -1 bad point, -2 bad scalar,
// -100-i invalid commitment i, -200-i invalid proof i.
int kzgn_verify_blob_batch_tail(const uint8_t *commitments_comp,
                                const uint8_t *proofs_comp, size_t n,
                                const uint8_t *zs_be, const uint8_t *ys_be,
                                const uint8_t r_be[32],
                                const uint8_t g2s[192], int g2s_inf) {
    if (!n) return 1;
    struct Pt { Fp x, y; bool inf; };
    Pt *cs = new Pt[n], *ps = new Pt[n];
    long bad = 0;
    for (size_t i = 0; i < n && !bad; i++) {
        int rc = g1_decompress(commitments_comp + 48 * i, cs[i].x, cs[i].y, true);
        if (rc < 0) bad = -100 - (long)i;
        cs[i].inf = rc == 1;
    }
    for (size_t i = 0; i < n && !bad; i++) {
        int rc = g1_decompress(proofs_comp + 48 * i, ps[i].x, ps[i].y, true);
        if (rc < 0) bad = -200 - (long)i;
        ps[i].inf = rc == 1;
    }
    Fr r, rpow, ry_sum;
    if (!bad && !fr_from_be(r, r_be)) bad = -2;
    if (bad) {
        delete[] cs;
        delete[] ps;
        return (int)bad;
    }
    rpow = fr_one_mont();
    memset(&ry_sum, 0, sizeof ry_sum);
    // entries: lhs MSM over proofs with r_i; rhs MSM over [C_i | proof_i]
    // with [r_i | r_i z_i]; the -sum(r_i y_i) G term appended last.
    HostAff *lhs_pts = new HostAff[n];
    typedef uint64_t Sc4[4];
    Sc4 *lhs_sc = new Sc4[n];
    HostAff *rhs_pts = new HostAff[2 * n + 1];
    Sc4 *rhs_sc = new Sc4[2 * n + 1];
    size_t ml = 0, mr = 0;
    Fr one_raw;  // for Montgomery -> canonical reduction
    memset(&one_raw, 0, sizeof one_raw);
    one_raw.l[0] = 1;
    for (size_t i = 0; i < n; i++) {
        Fr z, y;
        if (!fr_from_be(z, zs_be + 32 * i) || !fr_from_be(y, ys_be + 32 * i)) {
            bad = -2;
            break;
        }
        Fr ri_can;
        fr_mul(ri_can, rpow, one_raw);       // canonical r_i
        Fr rz_m, rz_can;
        fr_mul(rz_m, rpow, z);               // Montgomery(r_i * z_i)
        fr_mul(rz_can, rz_m, one_raw);       // reduce to canonical
        Fr ry_m;
        fr_mul(ry_m, rpow, y);
        fr_add(ry_sum, ry_sum, ry_m);
        if (!ps[i].inf) {
            lhs_pts[ml].x = ps[i].x;
            lhs_pts[ml].y = ps[i].y;
            memcpy(lhs_sc[ml], ri_can.l, 32);
            ml++;
            rhs_pts[mr].x = ps[i].x;
            rhs_pts[mr].y = ps[i].y;
            memcpy(rhs_sc[mr], rz_can.l, 32);
            mr++;
        }
        if (!cs[i].inf) {
            rhs_pts[mr].x = cs[i].x;
            rhs_pts[mr].y = cs[i].y;
            memcpy(rhs_sc[mr], ri_can.l, 32);
            mr++;
        }
        fr_mul(rpow, rpow, r);
    }
    delete[] cs;
    delete[] ps;
    if (bad) {
        delete[] lhs_pts;
        delete[] lhs_sc;
        delete[] rhs_pts;
        delete[] rhs_sc;
        return (int)bad;
    }
    // - (sum r_i y_i) G term
    Fr ry_can;
    fr_mul(ry_can, ry_sum, one_raw);
    bool ry_zero = !(ry_can.l[0] | ry_can.l[1] | ry_can.l[2] | ry_can.l[3]);
    if (!ry_zero) {
        uint64_t neg[4];
        uint64_t borrow = 0;
        for (int i = 0; i < 4; i++) {
            unsigned __int128 d = (unsigned __int128)R_LIMBS[i] -
                                  ry_can.l[i] - borrow;
            neg[i] = (uint64_t)d;
            borrow = (d >> 64) ? 1 : 0;
        }
        memcpy(rhs_pts[mr].x.l, G1_GEN_X_MONT, sizeof rhs_pts[mr].x.l);
        memcpy(rhs_pts[mr].y.l, G1_GEN_Y_MONT, sizeof rhs_pts[mr].y.l);
        memcpy(rhs_sc[mr], neg, 32);
        mr++;
    }
    Jac<Fp> lhs_j, rhs_j;
    msm_host(lhs_pts, lhs_sc, ml, lhs_j);
    msm_host(rhs_pts, rhs_sc, mr, rhs_j);
    delete[] lhs_pts;
    delete[] lhs_sc;
    delete[] rhs_pts;
    delete[] rhs_sc;
    Fp lx = FP_ZERO, ly = FP_ZERO, rx = FP_ZERO, ryy = FP_ZERO;
    bool lhs_inf = !jac_to_affine(lx, ly, lhs_j);
    bool rhs_inf = !jac_to_affine(rx, ryy, rhs_j);
    // e(-lhs, [s]_2) * e(rhs, H) == 1
    Fp2 sx = FP2_ZERO_V, sy = FP2_ZERO_V, hx, hy;
    if (!g2s_inf &&
        (!fp_from_be(sx.c0, g2s) || !fp_from_be(sx.c1, g2s + 48) ||
         !fp_from_be(sy.c0, g2s + 96) || !fp_from_be(sy.c1, g2s + 144)))
        return -1;
    memcpy(hx.c0.l, G2_GEN_X0_MONT, sizeof hx.c0.l);
    memcpy(hx.c1.l, G2_GEN_X1_MONT, sizeof hx.c1.l);
    memcpy(hy.c0.l, G2_GEN_Y0_MONT, sizeof hy.c0.l);
    memcpy(hy.c1.l, G2_GEN_Y1_MONT, sizeof hy.c1.l);
    Fp nly;
    fp_neg(nly, ly);
    bool skip_l = lhs_inf || g2s_inf != 0;
    bool skip_r = rhs_inf;
    static thread_local PreparedG2 pl_buf, pr_buf;
    if (!skip_l) prep_fetch(sx, sy, pl_buf);
    if (!skip_r) prep_fetch(hx, hy, pr_buf);
    Fp12 f = miller_loop_dual_prepared(lx, nly, skip_l, skip_l ? nullptr : &pl_buf,
                                       rx, ryy, skip_r, skip_r ? nullptr : &pr_buf);
    Fp12 e = final_exponentiation(f);
    return fp12_is_one(e) ? 1 : 0;
}

int kzgn_version() { return 5; }

}  // extern "C"
