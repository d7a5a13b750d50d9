/* Native diagonal-voting motif inference for large motifs.
 *
 * Exact semantics of ribbit_tpu/refine.py:_most_frequent_longer_motif_scalar
 * (the validated port of the reference's mostFrequentLongerMotif,
 * parse_seed.cpp:153-256): every candidate row start walks downstream then
 * upstream in ~m jumps with ±2 jitter, greedily keeping the jitter with the
 * highest m-length match count (strict '>', x scanned -2..2, all-zero keeps
 * -2), plus a partial prefix vote when the upstream walk overshoots; first
 * row with the strictly highest total wins; all-zero votes leave the index
 * at 0.
 *
 * The scalar break conditions are monotone in the inner index, so each
 * jitter's count is an exact fixed-trip masked sum over a clamped length —
 * written branch-free so the compiler vectorizes it.
 *
 * Returns the winning row index; the caller assembles the 2-bit motif unit
 * (which may exceed 64 bits for m up to 100).  `total_len` guards reads:
 * columns/rows beyond the buffer end the inner scan (the Python spec would
 * raise there; the case is unreachable for well-formed seeds).
 */

#include <stdint.h>

#ifdef __AVX512BW__
#include <immintrin.h>
#endif

typedef int64_t i64;

static inline i64 min3(i64 a, i64 b, i64 c) {
    i64 m = a < b ? a : b;
    return m < c ? m : c;
}

/* count of i < lim with code_a[i] == code_b[i] and !nn[i] */
static inline i64 match_count(const int8_t *a, const int8_t *b,
                              const uint8_t *nn, i64 lim) {
#ifdef __AVX512BW__
    i64 dc = 0;
    i64 i = 0;
    for (; i + 64 <= lim; i += 64) {
        __mmask64 eq = _mm512_cmpeq_epi8_mask(
            _mm512_loadu_si512((const void *)(a + i)),
            _mm512_loadu_si512((const void *)(b + i)));
        __mmask64 notn = _mm512_cmpeq_epi8_mask(
            _mm512_loadu_si512((const void *)(nn + i)),
            _mm512_setzero_si512());
        dc += (i64)__builtin_popcountll(eq & notn);
    }
    if (i < lim) {
        __mmask64 tail = (~0ULL) >> (64 - (lim - i));
        __mmask64 eq = _mm512_mask_cmpeq_epi8_mask(
            tail,
            _mm512_maskz_loadu_epi8(tail, (const void *)(a + i)),
            _mm512_maskz_loadu_epi8(tail, (const void *)(b + i)));
        __mmask64 notn = _mm512_mask_cmpeq_epi8_mask(
            tail,
            _mm512_maskz_loadu_epi8(tail, (const void *)(nn + i)),
            _mm512_setzero_si512());
        dc += (i64)__builtin_popcountll(eq & notn);
    }
    return dc;
#else
    i64 dc = 0;
    for (i64 i = 0; i < lim; i++)
        dc += (i64)((!nn[i]) & (a[i] == b[i]));
    return dc;
#endif
}

/* all five jitter counts of one greedy step in a single sweep: the row
 * window loads once per block instead of five times and the call/loop
 * bookkeeping is shared.  Requires a common lim for all five bases
 * (the interior-step fast path; boundary steps fall back per-x). */
static inline void match_count5(const int8_t *a, const int8_t *b0,
                                const uint8_t *nn0, i64 lim, i64 out[5]) {
#ifdef __AVX512BW__
    i64 c0 = 0, c1 = 0, c2 = 0, c3 = 0, c4 = 0;
    i64 i = 0;
    for (; i + 64 <= lim; i += 64) {
        __m512i av = _mm512_loadu_si512((const void *)(a + i));
#define STEP5(x, acc) do { \
        __mmask64 eq = _mm512_cmpeq_epi8_mask(av, \
            _mm512_loadu_si512((const void *)(b0 + (x) - 2 + i))); \
        __mmask64 nn = _mm512_cmpeq_epi8_mask( \
            _mm512_loadu_si512((const void *)(nn0 + (x) - 2 + i)), \
            _mm512_setzero_si512()); \
        acc += (i64)__builtin_popcountll(eq & nn); } while (0)
        STEP5(0, c0); STEP5(1, c1); STEP5(2, c2); STEP5(3, c3); STEP5(4, c4);
#undef STEP5
    }
    if (i < lim) {
        __mmask64 tail = (~0ULL) >> (64 - (lim - i));
        __m512i av = _mm512_maskz_loadu_epi8(tail, (const void *)(a + i));
#define TAIL5(x, acc) do { \
        __mmask64 eq = _mm512_mask_cmpeq_epi8_mask(tail, av, \
            _mm512_maskz_loadu_epi8(tail, (const void *)(b0 + (x) - 2 + i))); \
        __mmask64 nn = _mm512_mask_cmpeq_epi8_mask(tail, \
            _mm512_maskz_loadu_epi8(tail, (const void *)(nn0 + (x) - 2 + i)), \
            _mm512_setzero_si512()); \
        acc += (i64)__builtin_popcountll(eq & nn); } while (0)
        TAIL5(0, c0); TAIL5(1, c1); TAIL5(2, c2); TAIL5(3, c3); TAIL5(4, c4);
#undef TAIL5
    }
    out[0] = c0; out[1] = c1; out[2] = c2; out[3] = c3; out[4] = c4;
#else
    for (int x = 0; x < 5; x++)
        out[x] = match_count(a, b0 + x - 2, nn0 + x - 2, lim);
#endif
}

int32_t ribbit_vote_longer(const int8_t *code, const uint8_t *n_mask,
                           int32_t total_len, int32_t seed_start,
                           int32_t seed_sequence_length, int32_t m) {
    i64 seed_end = (i64)seed_start + seed_sequence_length;
    i64 L = total_len;
    i64 M = m;
    int32_t mmotif_index = 0;
    i64 max_count = 0;

    for (i64 row = seed_start; row <= seed_end - M; row++) {
        i64 row_count = 0;
        const int8_t *restrict rowp = code + row;
        i64 row_lim = L - row;              /* rows beyond L end the scan */

        /* exact remaining-vote bound for early row abort: every greedy
         * step contributes at most min(M, row_lim) and moves the cursor
         * by at least M-2 (jitter >= -2, M >= 11 here), so once
         * row_count + bound(remaining) <= max_count this row can no
         * longer STRICTLY beat the running winner and the rest of its
         * walk is dead work.  Upstream + prefix potential is a constant
         * per row; downstream potential shrinks as the walk advances. */
        i64 step_cap = row_lim < M ? row_lim : M;
        i64 adv = M - 2 > 1 ? M - 2 : 1;    /* min cursor advance per step */
        i64 u0 = row - M;
        i64 upot = (u0 > seed_start
                        ? ((u0 - seed_start - 1) / adv + 1) : 0)
                   * step_cap + M;          /* + M covers the prefix vote */

        i64 dstream = row + M;
        /* steps-remaining UPPER bound maintained by decrement: each step
         * advances the cursor by >= adv, so true remaining <= dsteps and
         * the abort stays conservative — this replaces a per-step integer
         * division with a subtraction */
        i64 dsteps = dstream < seed_end
                         ? (seed_end - dstream + adv - 1) / adv : 0;
        while (dstream < seed_end) {
            if (max_count > row_count + upot + dsteps * step_cap) {
                row_count = -1;             /* provably can't win */
                break;
            }
            dsteps--;
            i64 max_di = -2, max_dc = 0;
            /* interior fast path: all five bases share lim */
            i64 lim_c = step_cap;
            if (seed_end - (dstream + 2) >= lim_c &&
                L - (dstream + 2) >= lim_c && lim_c > 0) {
                i64 dc5[5];
                match_count5(rowp, code + dstream, n_mask + dstream,
                             lim_c, dc5);
                for (int x = 0; x < 5; x++)
                    if (dc5[x] > max_dc) { max_dc = dc5[x]; max_di = x - 2; }
            } else {
                for (i64 x = -2; x <= 2; x++) {
                    i64 base = dstream + x;
                    i64 lim = min3(M, seed_end - base, L - base);
                    if (row_lim < lim) lim = row_lim;
                    i64 dc = lim > 0
                        ? match_count(rowp, code + base, n_mask + base, lim)
                        : 0;
                    if (dc > max_dc) { max_dc = dc; max_di = x; }
                }
            }
            row_count += max_dc;
            dstream += max_di + M;
        }
        if (row_count < 0) continue;

        i64 ustream = row - M;
        /* same decrement-maintained UB for the upstream walk (cursor moves
         * down by >= adv per step) */
        i64 usteps = ustream > seed_start
                         ? (ustream - seed_start - 1) / adv + 1 : 0;
        while (ustream > seed_start) {
            if (max_count > row_count + usteps * step_cap + M) {
                row_count = -1;
                break;
            }
            usteps--;
            i64 max_di = -2, max_dc = 0;
            i64 lim_c = step_cap;
            if (ustream - 2 >= 0 && L - (ustream + 2) >= lim_c && lim_c > 0) {
                i64 dc5[5];
                match_count5(rowp, code + ustream, n_mask + ustream,
                             lim_c, dc5);
                for (int x = 0; x < 5; x++)
                    if (dc5[x] > max_dc) { max_dc = dc5[x]; max_di = x - 2; }
            } else {
                for (i64 x = -2; x <= 2; x++) {
                    i64 base = ustream + x;
                    /* the scalar breaks at the first col < 0: i == 0 */
                    i64 lim = base < 0 ? 0 : min3(M, L - base, row_lim);
                    i64 dc = lim > 0
                        ? match_count(rowp, code + base, n_mask + base, lim)
                        : 0;
                    if (dc > max_dc) { max_dc = dc; max_di = x; }
                }
            }
            row_count += max_dc;
            ustream += max_di - M;
        }
        if (row_count < 0) continue;

        if (ustream < seed_start && seed_start - ustream < M) {
            i64 initial_lastrow = row + M - 1;
            i64 pcindex = ustream + M - 1;
            i64 prefix_rows = M + (ustream - seed_start);
            i64 max_dc = 0;
            for (i64 x = -2; x <= 2; x++) {
                i64 pc = pcindex + x;
                /* cols decrease with i: col >= seed_end or col/row >= L can
                 * only hold at i == 0; col < seed_start clamps the tail */
                i64 lim;
                if (pc >= seed_end || pc >= L || initial_lastrow >= L)
                    lim = 0;
                else {
                    lim = prefix_rows;
                    if (pc - seed_start + 1 < lim) lim = pc - seed_start + 1;
                }
                i64 dc = 0;
                for (i64 i = 0; i < lim; i++)
                    dc += (i64)((!n_mask[pc - i])
                                & (code[initial_lastrow - i] == code[pc - i]));
                if (dc > max_dc) max_dc = dc;
            }
            row_count += max_dc;
        }

        if (row_count > max_count) {
            max_count = row_count;
            mmotif_index = (int32_t)row;
        }
    }
    return mmotif_index;
}

/* Partial-prefix votes (parse_seed.cpp:205-233) for every candidate row of
 * one run, given each row's final upstream cursor — the host half of the
 * device-batched voter (ribbit_tpu/vote_device.py).  Counting is
 * order-independent, so the spec's reversed windows (row and column both
 * decreasing with i) are summed as plain forward ranges through the same
 * AVX-512 match_count used by the full voter:
 *   sum_{i<lim} eq(code[lastrow-i], code[pc-i]) & !n[pc-i]
 *     == match_count(code+lastrow-lim+1, code+pc-lim+1, n+pc-lim+1, lim).
 */
void ribbit_vote_prefix_batch(const int8_t *code, const uint8_t *n_mask,
                              int32_t total_len, int32_t seed_start,
                              int32_t ssl, int32_t m,
                              const int32_t *ustream, int32_t nrows,
                              int32_t *out) {
    i64 seed_end = (i64)seed_start + ssl;
    i64 M = m;
    for (i64 r = 0; r < nrows; r++) {
        i64 us = ustream[r];
        out[r] = 0;
        if (!(us < seed_start && seed_start - us < M))
            continue;
        i64 lastrow = seed_start + r + M - 1;
        i64 prefix_rows = M + (us - seed_start);
        i64 best = 0;
        for (i64 x = -2; x <= 2; x++) {
            i64 pc = us + M - 1 + x;
            if (pc >= seed_end || pc >= total_len || lastrow >= total_len)
                continue;
            i64 lim = prefix_rows;
            if (pc - seed_start + 1 < lim) lim = pc - seed_start + 1;
            if (lim <= 0)
                continue;
            i64 dc = match_count(code + lastrow - lim + 1,
                                 code + pc - lim + 1,
                                 n_mask + pc - lim + 1, lim);
            if (dc > best) best = dc;
        }
        out[r] = (int32_t)best;
    }
}
