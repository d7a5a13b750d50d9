/* Native alignment engine for ribbit_tpu seed refinement.
 *
 * Scalar C implementation of the exact alignment semantics specified by
 * ribbit_tpu/align.py (the validated Python port of the vendored SSW used by
 * the reference: forward/reverse local-alignment passes, banded affine-gap
 * DP with doubling band width and 3-plane direction tape, soft clips, and
 * '='/'X' mismatch splitting).  align.py is the semantics spec; this file
 * re-implements it for speed and is cross-checked against it in tests.
 *
 * Scoring: match 2, mismatch -2 (N scores -2 vs everything), gapO 3, gapE 1.
 * H is clamped at 32767 (word-mode saturation).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>

#ifdef __AVX512F__
#include <immintrin.h>
#endif

#define GAP_O 3
#define GAP_E 1
#define WORD_MAX 32767

static inline int32_t score(int8_t a, int8_t b) {
    return (a == b && a < 4) ? 2 : -2;
}

static inline int32_t max32(int32_t a, int32_t b) { return a > b ? a : b; }
static inline int64_t max64(int64_t a, int64_t b) { return a > b ? a : b; }

/* One local-alignment scan over ref columns (align.py:_forward_pass).
 * H/E are int32[R] workspaces; best_col receives the H column of the best
 * ref position.  terminate >= 0: stop after the first column whose max
 * equals terminate.  Returns best score; *end_ref gets the column index. */
#ifdef __AVX512BW__
/* 16-bit forward pass: 32 lanes on passes 1/3; the F prefix-max runs in
 * i32 over widened h0 (A = h0 + j exceeds i16).  Saturating i16 adds ARE
 * the WORD_MAX clamp (H <= 32767, |score| = 2).  Scratch reuses the
 * caller's i32 buffers reinterpreted as i16 (double the capacity);
 * best_col widens in place at the end. */
/* band >= 0 restricts column i to rows |j - i| <= band.  EXACTNESS: used
 * only on the reverse (terminate >= 0) pass with
 * band = (2*min(R,C) - terminate - GAP_O)/GAP_E.  Any cell (j, i) on a
 * terminate-achieving local alignment satisfies |j - i| <= band (reaching
 * offset d costs >= GAP_O + |d|*GAP_E and matches are <= min(R, C)), so
 * every achieving path lies fully in-band and its recurrence inputs are all
 * in-band (adjacent path cells each satisfy the bound independently).
 * Out-of-band contributions are dropped (treated as score 0), which can
 * only LOWER computed cells, so no column terminates early and no spurious
 * row reaches `terminate`; at the true terminating column the achieving
 * cells compute exactly `terminate` (sandwich: >= their in-band path
 * prefix, <= the true global max).  One subtlety: a row that leaves the
 * band stops being recomputed only at block granularity, and the row just
 * below the processed window is read once more as the j-1 diagonal — it is
 * zeroed AFTER the column that legitimately reads its fresh value, so later
 * reads see 0, never a stale (wrong-column) score. */
static int32_t forward_pass_i16(const int8_t *read, int32_t R,
                                const int8_t *ref, int32_t C,
                                int32_t terminate, int32_t band,
                                int32_t *H32, int32_t *E32,
                                int32_t *best_col32, int32_t *end_ref) {
    int16_t *H = (int16_t *)H32;
    int16_t *E = (int16_t *)E32;
    int16_t *bc = (int16_t *)best_col32;
    memset(H, 0, (size_t)R * sizeof(int16_t));
    memset(E, 0, (size_t)R * sizeof(int16_t));
    memset(bc, 0, (size_t)R * sizeof(int16_t));
    int32_t best = 0;
    *end_ref = -1;
    if (band >= 0 && (int64_t)2 * band + 1 >= R) band = -1;

    int32_t Rp = (R + 31) & ~31;             /* padded lane count */
    int16_t *h0 = (int16_t *)malloc((size_t)Rp * sizeof(int16_t));
    int16_t *F = (int16_t *)malloc((size_t)Rp * sizeof(int16_t));
    int16_t *srows = (int16_t *)malloc((size_t)R * 5 * sizeof(int16_t));
    for (int32_t c = 0; c < 5; c++) {
        int16_t *restrict sr = srows + (size_t)c * R;
        for (int32_t j = 0; j < R; j++)
            sr[j] = ((c == read[j]) & (c < 4)) ? 2 : -2;
    }

    for (int32_t i = 0; i < C; i++) {
        const int16_t *restrict srow = srows + (size_t)ref[i] * R;
        int32_t wlo = 0, whi = R - 1;        /* inclusive row window */
        if (band >= 0) {
            wlo = i - band; if (wlo < 0) wlo = 0;
            whi = i + band; if (whi > R - 1) whi = R - 1;
        }
        /* pass 1: h0 = max(sat(H[j-1] + sc), E, 0) */
        {
            if (wlo == 0) {
                int16_t d0 = srow[0];
                int16_t v0 = d0 > E[0] ? d0 : E[0];
                h0[0] = v0 > 0 ? v0 : 0;
            }
            for (int32_t j = wlo > 0 ? wlo : 1; j <= whi; j++) {
                int32_t diag = (int32_t)H[j - 1] + srow[j];
                if (diag > WORD_MAX) diag = WORD_MAX;
                int16_t v = (int16_t)diag > E[j] ? (int16_t)diag : E[j];
                h0[j] = v > 0 ? v : 0;
            }
        }
        /* pass 2: F from the i32 prefix max of A[k] = h0[k] + k*GAP_E —
         * AVX-512 blockwise prefix with widened h0 loads.  The prefix
         * starts at wlo (window-local: lower rows carry no in-band paths);
         * a scalar head runs to 16-alignment, seeding the vector carry. */
        {
            const int32_t NEGI = -(1 << 30);
            __m512i iota = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
                                             10, 11, 12, 13, 14, 15);
            __m512i zero_blk = _mm512_set1_epi32(NEGI);
            __m512i carry = _mm512_set1_epi32(NEGI);
            __m512i gapvec = _mm512_set1_epi32(GAP_O + GAP_E);
            int64_t Pmax = INT64_MIN;
            int32_t j = wlo;
            int32_t jvec = (wlo + 15) & ~15;        /* first aligned block */
            for (; j < jvec && j <= whi; j++) {     /* scalar head */
                if (j > wlo) {
                    int64_t f = Pmax - GAP_O - (int64_t)(j - 1) * GAP_E;
                    F[j] = (int16_t)(f > 0 ? f : 0);
                }
                int64_t a = (int64_t)h0[j] + (int64_t)j * GAP_E;
                if (a > Pmax) Pmax = a;
            }
            if (j == jvec && Pmax != INT64_MIN)
                carry = _mm512_set1_epi32((int32_t)Pmax);
            for (; j + 16 <= whi + 1; j += 16) {
                __m512i hw = _mm512_cvtepi16_epi32(
                    _mm256_loadu_si256((const __m256i *)(h0 + j)));
                __m512i je = _mm512_mullo_epi32(
                    _mm512_add_epi32(iota, _mm512_set1_epi32(j)),
                    _mm512_set1_epi32(GAP_E));
                __m512i a = _mm512_add_epi32(hw, je);
                __m512i p = a;
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 15));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 14));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 12));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 8));
                p = _mm512_max_epi32(p, carry);
                __m512i pshift = _mm512_alignr_epi32(p, zero_blk, 15);
                pshift = _mm512_mask_mov_epi32(pshift, 1, carry);
                __m512i f = _mm512_sub_epi32(
                    _mm512_sub_epi32(pshift, gapvec),
                    _mm512_sub_epi32(je, _mm512_set1_epi32(2 * GAP_E)));
                f = _mm512_max_epi32(f, _mm512_setzero_si512());
                /* narrow (values <= 32767) to i16 */
                _mm256_storeu_si256((__m256i *)(F + j),
                                    _mm512_cvtepi32_epi16(f));
                carry = _mm512_permutexvar_epi32(_mm512_set1_epi32(15), p);
            }
            if (j > jvec || (j == jvec && j > wlo))
                Pmax = _mm512_cvtsi512_si32(carry);
            for (; j <= whi; j++) {
                if (j > wlo) {
                    int64_t f = Pmax - GAP_O - (int64_t)(j - 1) * GAP_E;
                    F[j] = (int16_t)(f > 0 ? f : 0);
                }
                int64_t a = (int64_t)h0[j] + (int64_t)j * GAP_E;
                if (a > Pmax) Pmax = a;
            }
            F[wlo] = 0;
        }
        /* pass 3: Hn, E update, column max */
        int32_t colmax = 0;
        for (int32_t j = wlo; j <= whi; j++) {
            int16_t Hn = h0[j] > F[j] ? h0[j] : F[j];
            int16_t e1 = (int16_t)(E[j] - GAP_E);
            int16_t e2 = (int16_t)(Hn - GAP_O);
            int16_t e = e1 > e2 ? e1 : e2;
            E[j] = e > 0 ? e : 0;
            H[j] = Hn;
            if (Hn > colmax) colmax = Hn;
        }
        if (colmax > best) {
            best = colmax;
            *end_ref = i;
            if (band < 0) {
                memcpy(bc, H, (size_t)R * sizeof(int16_t));
            } else {
                /* window-only snapshot: stale rows from earlier snapshots
                 * hold values < terminate (else that column would have
                 * terminated), so the first-row-== scan stays exact */
                memcpy(bc + wlo, H + wlo,
                       (size_t)(whi - wlo + 1) * sizeof(int16_t));
            }
        }
        if (terminate >= 0 && colmax == terminate) break;
        /* retire the row that leaves the band: its fresh value was read as
         * the j-1 diagonal this column; later columns must see 0 */
        if (band >= 0 && i - band - 1 >= 0) {
            H[i - band - 1] = 0;
            E[i - band - 1] = 0;
        }
    }
    free(h0); free(F); free(srows);
    /* widen best_col in place (descending: i32 writes land above the
     * remaining i16 reads) */
    for (int32_t j = R - 1; j >= 0; j--)
        best_col32[j] = bc[j];
    return best;
}
#endif  /* __AVX512BW__ */

#ifdef __AVX512BW__
/* Fused single-sweep forward pass: one blockwise traversal per column
 * computes h0, the F prefix-max, Hn/E and the column max together in
 * 32-lane i16 vectors, instead of three separate array passes.  Valid
 * when every intermediate provably fits i16: H <= 2*min(R,C) (max local
 * score) and A = h0 + j*GAP_E <= 2*min(R,C) + R.  The saturating i16
 * add IS the WORD_MAX clamp.  Returns the best score; *end_ref / *end_read
 * get the first best column and the first row attaining it there (the
 * tie rules of align.py:_forward_pass).  H16/E16 live in the caller's
 * i32 scratch reinterpreted. */
static int32_t forward_pass_i16_fused(const int8_t *read, int32_t R,
                                      const int8_t *ref, int32_t C,
                                      int32_t terminate, int32_t band,
                                      int32_t *H32, int32_t *E32,
                                      int32_t *end_ref, int32_t *end_read) {
    int32_t Rp = (R + 31) & ~31;
    int32_t nb = Rp / 32;
    if (band >= 0 && (int64_t)2 * band + 1 >= R) band = -1;
    /* H gets a 32-lane zero guard in front so the j-1 shifted read is one
     * unaligned load (H[-1] == 0); caller buffers hold 4R bytes each and
     * R >= 64 here, so 2*(Rp+32) fits */
    int16_t *H = (int16_t *)H32 + 32;
    int16_t *E = (int16_t *)E32;
    memset((int16_t *)H32, 0, (size_t)(Rp + 32) * sizeof(int16_t));
    memset(E, 0, (size_t)Rp * sizeof(int16_t));
    /* per-column scratch: local-prefix vectors + h0 (heap, reused) */
    int16_t *pbuf = (int16_t *)malloc((size_t)Rp * sizeof(int16_t));
    int16_t *h0buf = (int16_t *)malloc((size_t)Rp * sizeof(int16_t));
    int16_t *carry = (int16_t *)malloc(((size_t)nb + 1) * sizeof(int16_t));
    int16_t *srows = (int16_t *)malloc((size_t)5 * Rp * sizeof(int16_t));
    for (int32_t c = 0; c < 5; c++) {
        int16_t *restrict sr = srows + (size_t)c * Rp;
        for (int32_t j = 0; j < R; j++)
            sr[j] = ((c == read[j]) & (c < 4)) ? 2 : -2;
        for (int32_t j = R; j < Rp; j++) sr[j] = -2;
    }
    __mmask32 lastmask = (R & 31) ? ((1u << (R & 31)) - 1) : ~0u;

    /* lane helpers */
    __m512i lane = _mm512_set_epi16(
        31, 30, 29, 28, 27, 26, 25, 24, 23, 22, 21, 20, 19, 18, 17, 16,
        15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
    __m512i sh1 = _mm512_sub_epi16(lane, _mm512_set1_epi16(1));
    __m512i sh2 = _mm512_sub_epi16(lane, _mm512_set1_epi16(2));
    __m512i sh4 = _mm512_sub_epi16(lane, _mm512_set1_epi16(4));
    __m512i sh8 = _mm512_sub_epi16(lane, _mm512_set1_epi16(8));
    __m512i sh16 = _mm512_sub_epi16(lane, _mm512_set1_epi16(16));
    /* result[0] = a[31], result[i>0] = b[i-1] */
    __m512i shiftidx = _mm512_or_si512(sh1, _mm512_set1_epi16(0x20));
    shiftidx = _mm512_mask_mov_epi16(shiftidx, 1, _mm512_set1_epi16(31));
    __m512i gapoe = _mm512_set1_epi16(GAP_O + GAP_E);
    __m512i gape = _mm512_set1_epi16(GAP_E);
    __m512i gapo = _mm512_set1_epi16(GAP_O);
    __m512i two_gape = _mm512_set1_epi16(2 * GAP_E);
    const int16_t NEGI = -20000;
    _Static_assert(GAP_E == 1, "je iota assumes unit gap extension");

    int32_t best = 0;
    *end_ref = -1;
    *end_read = -1;

    for (int32_t i = 0; i < C; i++) {
        const int16_t *restrict srow = srows + (size_t)ref[i] * Rp;
        __m512i colmax_v = _mm512_setzero_si512();
        /* block window for the band (see forward_pass_i16 for the exactness
         * argument; here the window is block-granular, sub-block rows
         * outside the band compute only-lower values) */
        int32_t blo = 0, bhi = nb - 1;
        if (band >= 0) {
            int32_t wlo = i - band; if (wlo < 0) wlo = 0;
            int32_t whi = i + band; if (whi > R - 1) whi = R - 1;
            blo = wlo >> 5; bhi = whi >> 5;
        }
        __m512i je = _mm512_add_epi16(lane,
                                      _mm512_set1_epi16((int16_t)(blo * 32)));
        /* phase A (blocks independent -> superscalar): h0 and the local
         * prefix max of A = h0 + j*GAP_E (A >= 0, so the zero-filled
         * lane slides are exact) */
        for (int32_t b = blo; b <= bhi; b++) {
            __m512i shifted = _mm512_loadu_si512((const void *)(H + b * 32 - 1));
            __m512i Ev = _mm512_loadu_si512((const void *)(E + b * 32));
            __m512i h0 = _mm512_adds_epi16(
                shifted, _mm512_loadu_si512((const void *)(srow + b * 32)));
            h0 = _mm512_max_epi16(h0, Ev);
            h0 = _mm512_max_epi16(h0, _mm512_setzero_si512());
            _mm512_storeu_si512((void *)(h0buf + b * 32), h0);
            __m512i p = _mm512_add_epi16(h0, je);
            p = _mm512_max_epi16(p, _mm512_maskz_permutexvar_epi16(
                                        0xFFFFFFFEu, sh1, p));
            p = _mm512_max_epi16(p, _mm512_maskz_permutexvar_epi16(
                                        0xFFFFFFFCu, sh2, p));
            p = _mm512_max_epi16(p, _mm512_maskz_permutexvar_epi16(
                                        0xFFFFFFF0u, sh4, p));
            p = _mm512_max_epi16(p, _mm512_maskz_permutexvar_epi16(
                                        0xFFFFFF00u, sh8, p));
            p = _mm512_max_epi16(p, _mm512_maskz_permutexvar_epi16(
                                        0xFFFF0000u, sh16, p));
            _mm512_storeu_si512((void *)(pbuf + b * 32), p);
            je = _mm512_add_epi16(je, _mm512_set1_epi16(32));
        }
        /* phase B: exclusive running max of the block maxima */
        carry[blo] = NEGI;
        for (int32_t b = blo; b <= bhi; b++) {
            int16_t bm = pbuf[b * 32 + 31];
            carry[b + 1] = carry[b] > bm ? carry[b] : bm;
        }
        /* phase C (blocks independent): F, Hn, E, column max */
        je = _mm512_add_epi16(lane, _mm512_set1_epi16((int16_t)(blo * 32)));
        for (int32_t b = blo; b <= bhi; b++) {
            __m512i cb = _mm512_set1_epi16(carry[b]);
            __m512i p = _mm512_max_epi16(
                _mm512_loadu_si512((const void *)(pbuf + b * 32)), cb);
            __m512i pshift = _mm512_permutex2var_epi16(cb, shiftidx, p);
            __m512i f = _mm512_subs_epi16(
                _mm512_subs_epi16(pshift, gapoe),
                _mm512_subs_epi16(je, two_gape));
            f = _mm512_max_epi16(f, _mm512_setzero_si512());
            __m512i h0 = _mm512_loadu_si512((const void *)(h0buf + b * 32));
            __m512i Hn = _mm512_max_epi16(h0, f);
            __m512i Ev = _mm512_loadu_si512((const void *)(E + b * 32));
            __m512i En = _mm512_max_epi16(
                _mm512_subs_epi16(Ev, gape), _mm512_subs_epi16(Hn, gapo));
            En = _mm512_max_epi16(En, _mm512_setzero_si512());
            if (b == nb - 1) {
                Hn = _mm512_maskz_mov_epi16(lastmask, Hn);
                En = _mm512_maskz_mov_epi16(lastmask, En);
            }
            _mm512_storeu_si512((void *)(H + b * 32), Hn);
            _mm512_storeu_si512((void *)(E + b * 32), En);
            colmax_v = _mm512_max_epi16(colmax_v, Hn);
            je = _mm512_add_epi16(je, _mm512_set1_epi16(32));
        }
        /* horizontal column max (values >= 0 fit i32 after widening) */
        __m512i wlo = _mm512_cvtepi16_epi32(
            _mm512_castsi512_si256(colmax_v));
        __m512i whi = _mm512_cvtepi16_epi32(
            _mm512_extracti64x4_epi64(colmax_v, 1));
        int32_t colmax = _mm512_reduce_max_epi32(_mm512_max_epi32(wlo, whi));
        if (colmax > best) {
            best = colmax;
            *end_ref = i;
            __m512i cv = _mm512_set1_epi16((int16_t)colmax);
            for (int32_t b = blo; b <= bhi; b++) {
                __mmask32 hit = _mm512_cmpeq_epi16_mask(
                    _mm512_loadu_si512((const void *)(H + b * 32)), cv);
                if (hit) {
                    *end_read = b * 32 + __builtin_ctz(hit);
                    break;
                }
            }
        }
        if (terminate >= 0 && colmax == terminate) break;
        /* retire the row leaving the band (see forward_pass_i16) */
        if (band >= 0 && i - band - 1 >= 0) {
            H[i - band - 1] = 0;
            E[i - band - 1] = 0;
        }
    }
    free(srows); free(pbuf); free(h0buf); free(carry);
    return best;
}
#endif  /* __AVX512BW__ */

static int32_t forward_pass(const int8_t *read, int32_t R,
                            const int8_t *ref, int32_t C,
                            int32_t terminate, int32_t band,
                            int32_t *H, int32_t *E, int32_t *best_col,
                            int32_t *end_ref) {
#ifdef __AVX512BW__
    return forward_pass_i16(read, R, ref, C, terminate, band, H, E, best_col,
                            end_ref);
#endif
    (void)band;  /* scalar fallback stays unbanded (exact, just slower) */
    memset(H, 0, (size_t)R * sizeof(int32_t));
    memset(E, 0, (size_t)R * sizeof(int32_t));
    memset(best_col, 0, (size_t)R * sizeof(int32_t));
    int32_t best = 0;
    *end_ref = -1;

    /* h0 workspace + previous-H shifted view; the per-column work is split
     * into vectorizable passes with only the F prefix-max scan sequential.
     * Score rows per possible ref base (the SSW query profile, ssw.c:163)
     * are precomputed once so pass 1 is pure vector arithmetic. */
    int32_t *h0 = (int32_t *)malloc((size_t)R * sizeof(int32_t));
    int32_t *F = (int32_t *)malloc((size_t)R * sizeof(int32_t));
    int32_t *srows = (int32_t *)malloc((size_t)R * 5 * sizeof(int32_t));
    for (int32_t c = 0; c < 5; c++) {
        int32_t *restrict sr = srows + (size_t)c * R;
        for (int32_t j = 0; j < R; j++)
            sr[j] = ((c == read[j]) & (c < 4)) ? 2 : -2;
    }

    for (int32_t i = 0; i < C; i++) {
        const int32_t *restrict srow = srows + (size_t)ref[i] * R;
        /* pass 1 (vector): h0[j] = max(diag, E[j], 0) with
         * diag = H_prev[j-1] + score, clamped at WORD_MAX */
        {
            int32_t *restrict h0r = h0;
            const int32_t *restrict Er = E;
            const int32_t *restrict Hr = H;
            int32_t d0 = srow[0];
            if (d0 > WORD_MAX) d0 = WORD_MAX;
            int32_t v0 = d0 > Er[0] ? d0 : Er[0];
            h0r[0] = v0 > 0 ? v0 : 0;
            for (int32_t j = 1; j < R; j++) {
                int32_t diag = Hr[j - 1] + srow[j];
                if (diag > WORD_MAX) diag = WORD_MAX;
                int32_t v = diag > Er[j] ? diag : Er[j];
                h0r[j] = v > 0 ? v : 0;
            }
        }
        /* pass 2: F from the running prefix max of A[k] = h0[k] + k*GAP_E
         * over k < j.  AVX-512 path: blockwise prefix-max (log-step lane
         * slides) with a broadcast carry; values stay well inside i32
         * (h0 <= 32767, k*GAP_E <= R). */
#ifdef __AVX512F__
        {
            const int32_t NEG = -(1 << 30);
            __m512i iota = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
                                             10, 11, 12, 13, 14, 15);
            __m512i zero_blk = _mm512_set1_epi32(NEG);
            __m512i carry = _mm512_set1_epi32(NEG);
            __m512i gapvec = _mm512_set1_epi32(GAP_O + GAP_E);
            int32_t j = 0;
            for (; j + 16 <= R; j += 16) {
                __m512i a = _mm512_add_epi32(
                    _mm512_loadu_si512(h0 + j),
                    _mm512_mullo_epi32(
                        _mm512_add_epi32(iota, _mm512_set1_epi32(j)),
                        _mm512_set1_epi32(GAP_E)));
                /* in-register prefix max */
                __m512i p = a;
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 15));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 14));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 12));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, zero_blk, 8));
                p = _mm512_max_epi32(p, carry);
                /* F[j..j+15] = max(0, P[j-1] - GAP_O - (j-1)*GAP_E); the
                 * shifted P[j-1] is p slid right one lane with the carry
                 * entering lane 0 */
                __m512i pshift = _mm512_alignr_epi32(p, zero_blk, 15);
                pshift = _mm512_mask_mov_epi32(pshift, 1, carry);
                __m512i je = _mm512_mullo_epi32(
                    _mm512_add_epi32(iota, _mm512_set1_epi32(j)),
                    _mm512_set1_epi32(GAP_E));
                /* P[j-1] - GAP_O - (j-1)*GAP_E = P[j-1] - (GAP_O+GAP_E)
                 *   - (j*GAP_E - 2*GAP_E) ... compute directly instead: */
                __m512i f = _mm512_sub_epi32(
                    _mm512_sub_epi32(pshift, gapvec),
                    _mm512_sub_epi32(je, _mm512_set1_epi32(2 * GAP_E)));
                f = _mm512_max_epi32(f, _mm512_setzero_si512());
                _mm512_storeu_si512(F + j, f);
                carry = _mm512_permutexvar_epi32(_mm512_set1_epi32(15), p);
            }
            /* scalar tail + fix F[0] */
            int64_t Pmax = _mm512_cvtsi512_si32(carry);
            if (j == 0) Pmax = INT64_MIN;
            for (; j < R; j++) {
                if (j) {
                    int64_t f = Pmax - GAP_O - (int64_t)(j - 1) * GAP_E;
                    F[j] = f > 0 ? (int32_t)f : 0;
                }
                int64_t a = (int64_t)h0[j] + (int64_t)j * GAP_E;
                if (a > Pmax) Pmax = a;
            }
            F[0] = 0;
        }
#else
        {
            int64_t Pmax = INT64_MIN;
            F[0] = 0;
            for (int32_t j = 0; j < R; j++) {
                if (j) {
                    int64_t f = Pmax - GAP_O - (int64_t)(j - 1) * GAP_E;
                    F[j] = f > 0 ? (int32_t)f : 0;
                }
                int64_t a = (int64_t)h0[j] + (int64_t)j * GAP_E;
                if (a > Pmax) Pmax = a;
            }
        }
#endif
        /* pass 3 (vector): Hn, E update, column max */
        int32_t colmax = 0;
        for (int32_t j = 0; j < R; j++) {
            int32_t Hn = h0[j] > F[j] ? h0[j] : F[j];
            int32_t e1 = E[j] - GAP_E;
            int32_t e2 = Hn - GAP_O;
            int32_t e = e1 > e2 ? e1 : e2;
            E[j] = e > 0 ? e : 0;
            H[j] = Hn;
            if (Hn > colmax) colmax = Hn;
        }
        if (colmax > best) {
            best = colmax;
            *end_ref = i;
            memcpy(best_col, H, (size_t)R * sizeof(int32_t));
        }
        if (terminate >= 0 && colmax == terminate) break;
    }
    free(h0);
    free(F);
    free(srows);
    return best;
}

/* forward pass + first-best-row location; picks the fused i16 sweep when
 * scores provably fit i16 (always for seed-refinement sizes), else the
 * legacy best-column path */
/* phase profile (fwd/rev/band cycles, band cells); enabled by
 * ribbit_refine.c when RIBBIT_CORE_PROF is set, flushed by its workers */
__thread long long ribbit_align_tprof[6];   /* fwd, rev, band, bandcells, rev-skip, naln */
int ribbit_align_prof_on = 0;
int ribbit_align_dump_on = 0;   /* reverse-geometry dump; resolved by the
                                 * refine entry before workers spawn */
#if defined(__x86_64__)
#include <x86intrin.h>
#define AP_T0(v) uint64_t v = ribbit_align_prof_on ? __rdtsc() : 0
#define AP_ADD(slot, v) do { if (ribbit_align_prof_on) \
    ribbit_align_tprof[slot] += (long long)(__rdtsc() - (v)); } while (0)
#else
#define AP_T0(v) uint64_t v = 0; (void)v
#define AP_ADD(slot, v) (void)(v)
#endif

/* band >= 0 is only legal with terminate >= 0 (the reverse pass): the
 * banded window-only best_col snapshot and the only-lower out-of-band
 * values are exact solely for locating the terminate-achieving column/row */
static int32_t forward_locate(const int8_t *read, int32_t R,
                              const int8_t *ref, int32_t C,
                              int32_t terminate, int32_t band,
                              int32_t *H, int32_t *E, int32_t *bc,
                              int32_t *end_ref, int32_t *end_read) {
    if (terminate < 0) band = -1;
#ifdef __AVX512BW__
    int64_t mn = R < C ? R : C;
    if (R >= 64 && (int64_t)R + 2 * mn + 64 <= 32000)
        return forward_pass_i16_fused(read, R, ref, C, terminate, band, H, E,
                                      end_ref, end_read);
#endif
    int32_t s = forward_pass(read, R, ref, C, terminate, band, H, E, bc,
                             end_ref);
    *end_read = -1;
    for (int32_t j = 0; j < R; j++)
        if (bc[j] == s) { *end_read = j; break; }
    return s;
}

/* Banded traceback over a plane-major direction tape:
 * dirs[plane * readLen * width_d + i * width_d + dcol]
 * (align.py:273-320). Returns op count, or -1 on traceback error. */
static int32_t band_traceback(const int8_t *dirs, int32_t readLen,
                              int32_t refLen, int32_t w,
                              int32_t *ops_len, char *ops_ch,
                              int32_t ops_cap) {
    int32_t width_d = w * 2 + 1;
    size_t plane_sz = (size_t)readLen * width_d;
    int32_t i = readLen - 1, j = refLen - 1;
    int32_t e = 0, nops = 0;
    char op = 'M', prev_op = 'M';
    int32_t plane = 2;
    int32_t err = 0;
    while (i >= 0 && j > 0) {
        int32_t off = i - w > 0 ? i - w : 0;
        int32_t dcol = j - off;
        int8_t d = dirs[(size_t)plane * plane_sz + (size_t)i * width_d + dcol];
        switch (d) {
            case 1: i--; j--; plane = 2; op = 'M'; break;
            case 2: i--; plane = 0; op = 'I'; break;
            case 3: i--; plane = 2; op = 'I'; break;
            case 4: j--; plane = 1; op = 'D'; break;
            case 5: j--; plane = 2; op = 'D'; break;
            default: err = 1; break;
        }
        if (err) break;
        if (op == prev_op) e++;
        else {
            if (nops < ops_cap) { ops_len[nops] = e; ops_ch[nops] = prev_op; nops++; }
            prev_op = op;
            e = 1;
        }
    }
    if (err) return -1;
    if (op == 'M') {
        if (nops < ops_cap) { ops_len[nops] = e + 1; ops_ch[nops] = op; nops++; }
    } else {
        if (nops < ops_cap) { ops_len[nops] = e; ops_ch[nops] = op; nops++; }
        if (nops < ops_cap) { ops_len[nops] = 1; ops_ch[nops] = 'M'; nops++; }
    }
    /* reverse */
    for (int32_t a = 0, b = nops - 1; a < b; a++, b--) {
        int32_t tl = ops_len[a]; ops_len[a] = ops_len[b]; ops_len[b] = tl;
        char tc = ops_ch[a]; ops_ch[a] = ops_ch[b]; ops_ch[b] = tc;
    }
    return nops;
}

/* Banded affine-gap DP with doubling band width (align.py:banded_sw).
 * Emits run-length ops into (ops_len, ops_ch); returns op count, or -1 on
 * traceback error (caller emits an empty cigar, matching the spec). */
static int32_t banded_sw_scalar(const int8_t *ref, int32_t refLen,
                                const int8_t *read, int32_t readLen,
                                int32_t target_score, int32_t band_width,
                                int32_t *ops_len, char *ops_ch,
                                int32_t ops_cap) {
    int32_t length = refLen > readLen ? refLen : readLen;
    int64_t best = 0;           /* accumulates across band iterations */
    int8_t *dirs = NULL;
    int64_t *h_b = NULL, *e_b = NULL, *h_c = NULL;
    int32_t w = band_width;

    for (;;) {
        w = band_width;
        int32_t width = w * 2 + 3;
        int32_t width_d = w * 2 + 1;
        size_t plane_sz = (size_t)readLen * width_d;

        dirs = (int8_t *)realloc(dirs, plane_sz * 3);
        memset(dirs, 0, plane_sz * 3);
        h_b = (int64_t *)realloc(h_b, (size_t)width * sizeof(int64_t));
        e_b = (int64_t *)realloc(e_b, (size_t)width * sizeof(int64_t));
        h_c = (int64_t *)realloc(h_c, (size_t)width * sizeof(int64_t));
        memset(h_b, 0, (size_t)width * sizeof(int64_t));
        memset(e_b, 0, (size_t)width * sizeof(int64_t));
        memset(h_c, 0, (size_t)width * sizeof(int64_t));

        for (int32_t i = 0; i < readLen; i++) {
            int32_t beg = i - w > 0 ? i - w : 0;
            int32_t end = i + w < refLen - 1 ? i + w : refLen - 1;
            int32_t edge = end + 1 < width - 1 ? end + 1 : width - 1;
            h_b[0] = e_b[0] = 0;
            h_b[edge] = e_b[edge] = 0;
            int32_t off_i = i - w > 0 ? i - w : 0;
            int32_t off_im1 = i - 1 - w > 0 ? i - 1 - w : 0;

            int64_t fp = 0, hcp = 0;   /* f[j-1], h_c[j-1]; 0 at row start */
            int8_t *d0 = dirs + (size_t)i * width_d;
            int8_t *d1 = d0 + plane_sz;
            int8_t *d2 = d1 + plane_sz;
            for (int32_t j = beg; j <= end; j++) {
                int32_t u = j - off_i + 1;
                int32_t ec = j - off_im1 + 1;
                int32_t dc = j - 1 - off_im1 + 1;

                int64_t t1, t2;
                if (i == 0) { t1 = -GAP_O; t2 = -GAP_E; }
                else { t1 = h_b[ec] - GAP_O; t2 = e_b[ec] - GAP_E; }
                int64_t e_new = max64(t1, t2);
                int8_t de = t1 > t2 ? 3 : 2;

                int64_t diag = h_b[dc] + score(ref[j], read[i]);
                int64_t e1 = max64(e_new, 0);

                int64_t f = max64(fp - GAP_E, hcp - GAP_O);
                int8_t df = (hcp - GAP_O > fp - GAP_E) ? 5 : 4;
                int64_t f1 = max64(f, 0);
                int64_t tmp1 = max64(e1, f1);
                int64_t hc = max64(tmp1, diag);
                if (hc > best) best = hc;

                int8_t dh = (tmp1 <= diag) ? 1 : (e1 > f1 ? de : df);
                int32_t dcol = j - off_i;
                d0[dcol] = de;
                d1[dcol] = df;
                d2[dcol] = dh;

                /* carry previous-column values; write back band cells.
                 * e_b[u]/h_... writes land after this column's reads of the
                 * (i-1)-row cells because u < ec for all rows (u == ec - 1
                 * when offsets differ, u == ec when equal but the read
                 * happened above). h_b writeback is deferred via h_c. */
                e_b[u] = e_new;
                h_c[u] = hc;
                fp = f;
                hcp = hc;
            }
            /* copy the row's band slice into h_b (align.py writes h_b[u]) */
            for (int32_t j = beg; j <= end; j++) {
                int32_t u = j - off_i + 1;
                h_b[u] = h_c[u];
            }
        }
        band_width *= 2;
        if (!(best < target_score && band_width <= length)) {
            band_width /= 2;
            break;
        }
    }

    int32_t nops = band_traceback(dirs, readLen, refLen, band_width,
                                  ops_len, ops_ch, ops_cap);
    free(dirs); free(h_b); free(e_b); free(h_c);
    return nops;
}

#if defined(__AVX512BW__) && defined(__AVX512VL__)
/* Vectorized banded rows.  The only loop-carried term in a band row is
 *   f[j] = max(f[j-1] - GAP_E, hc[j-1] - GAP_O)
 * and since hc[j] = max(g[j], f[j]) with g[j] = max(e1[j], diag[j]) >= 0
 * and GAP_E < GAP_O, it collapses to f[j] = max(f[j-1]-E, g[j-1]-O) with
 * f[beg] = -GAP_E, whose closed form is a prefix max (GAP_E == 1):
 *   f[j] = max( beg-1-j,  max_{k<j}(g[k] + k) - GAP_O - (j-1) )
 * — the same blockwise prefix-max scan as the forward pass.  Every cell
 * value and direction bit is arithmetically identical to the scalar row,
 * so the tape and the traceback (and the CIGAR bytes) are unchanged. */
static int32_t banded_sw_avx(const int8_t *ref, int32_t refLen,
                             const int8_t *read, int32_t readLen,
                             int32_t target_score, int32_t band_width,
                             int32_t *ops_len, char *ops_ch,
                             int32_t ops_cap) {
    _Static_assert(GAP_E == 1, "f closed form assumes unit gap extension");
    int32_t length = refLen > readLen ? refLen : readLen;
    int64_t best = 0;           /* accumulates across band iterations */
    int8_t *dirs = NULL;
    int32_t *h_b = NULL, *e_b = NULL, *h_c = NULL;
    int32_t w = band_width;
    const int32_t NEG = -(1 << 30);
    const __m512i iota = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
                                           10, 11, 12, 13, 14, 15);
    const __m512i neg_blk = _mm512_set1_epi32(NEG);
    const __m512i vO = _mm512_set1_epi32(GAP_O);
    const __m512i vE = _mm512_set1_epi32(GAP_E);
    const __m512i v2 = _mm512_set1_epi32(2);
    const __m512i vm2 = _mm512_set1_epi32(-2);
    const __m512i zero = _mm512_setzero_si512();

    for (;;) {
        w = band_width;
        int32_t width = w * 2 + 3;
        int32_t width_d = w * 2 + 1;
        size_t plane_sz = (size_t)readLen * width_d;

        dirs = (int8_t *)realloc(dirs, plane_sz * 3);
        memset(dirs, 0, plane_sz * 3);
        /* +16 lanes of slack: full-width unaligned loads past `edge` feed
         * masked-off lanes only */
        size_t wb = ((size_t)width + 16) * sizeof(int32_t);
        h_b = (int32_t *)realloc(h_b, wb);
        e_b = (int32_t *)realloc(e_b, wb);
        h_c = (int32_t *)realloc(h_c, wb);
        memset(h_b, 0, wb);
        memset(e_b, 0, wb);
        memset(h_c, 0, wb);

        for (int32_t i = 0; i < readLen; i++) {
            int32_t beg = i - w > 0 ? i - w : 0;
            int32_t end = i + w < refLen - 1 ? i + w : refLen - 1;
            int32_t edge = end + 1 < width - 1 ? end + 1 : width - 1;
            h_b[0] = e_b[0] = 0;
            h_b[edge] = e_b[edge] = 0;
            int32_t off_i = i - w > 0 ? i - w : 0;
            int32_t off_im1 = i - 1 - w > 0 ? i - 1 - w : 0;

            int8_t *d0 = dirs + (size_t)i * width_d - off_i;
            int8_t *d1 = d0 + plane_sz;
            int8_t *d2 = d1 + plane_sz;
            const __m512i readv = _mm512_set1_epi32(read[i]);
            /* carries: P prefix (empty -> NEG), hc[j-1]/f[j-1] (0 at start
             * matches the scalar's fp = hcp = 0) */
            int32_t carryP = NEG, carry_hc = 0, carry_f = 0;
            __m512i bestv = zero;
            for (int32_t j0 = beg; j0 <= end; j0 += 16) {
                int32_t rem = end - j0 + 1;
                __mmask16 mk = rem >= 16 ? (__mmask16)0xFFFF
                                         : (__mmask16)((1u << rem) - 1);
                /* previous-row reads (h_b only rewritten after the row;
                 * e_b stores of this block land at u <= ec so later blocks
                 * never read them — same aliasing argument as the scalar) */
                __m512i hprev = _mm512_loadu_si512(
                    (const void *)(h_b + j0 - off_im1 + 1));
                __m512i eprev = _mm512_loadu_si512(
                    (const void *)(e_b + j0 - off_im1 + 1));
                __m512i hdiag = _mm512_loadu_si512(
                    (const void *)(h_b + j0 - off_im1));
                __m512i t1 = _mm512_sub_epi32(hprev, vO);
                __m512i t2 = _mm512_sub_epi32(eprev, vE);
                __m512i e_new = _mm512_max_epi32(t1, t2);
                __mmask16 de_m = _mm512_cmpgt_epi32_mask(t1, t2);
                /* score(ref[j], read[i]): 2 iff equal and < 4, else -2;
                 * masked ref load (ref may end exactly at the band edge) */
                __m512i refw = _mm512_cvtepi8_epi32(
                    _mm_maskz_loadu_epi8(mk, (const void *)(ref + j0)));
                __mmask16 eq = _mm512_mask_cmpeq_epi32_mask(
                    _mm512_cmplt_epi32_mask(refw, _mm512_set1_epi32(4)),
                    refw, readv);
                __m512i sc = _mm512_mask_mov_epi32(vm2, eq, v2);
                __m512i diag = _mm512_add_epi32(hdiag, sc);
                __m512i e1 = _mm512_max_epi32(e_new, zero);
                __m512i g = _mm512_max_epi32(e1, diag);
                /* A = g + j on live lanes, NEG elsewhere; blockwise
                 * inclusive prefix max with running carry */
                __m512i jv = _mm512_add_epi32(iota, _mm512_set1_epi32(j0));
                __m512i A = _mm512_mask_add_epi32(neg_blk, mk, g, jv);
                __m512i p = A;
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, neg_blk, 15));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, neg_blk, 14));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, neg_blk, 12));
                p = _mm512_max_epi32(p, _mm512_alignr_epi32(p, neg_blk, 8));
                p = _mm512_max_epi32(p, _mm512_set1_epi32(carryP));
                __m512i pshift = _mm512_alignr_epi32(p, neg_blk, 15);
                pshift = _mm512_mask_mov_epi32(pshift, 1,
                                               _mm512_set1_epi32(carryP));
                carryP = _mm512_cvtsi512_si32(
                    _mm512_permutexvar_epi32(_mm512_set1_epi32(15), p));
                /* f = max(beg-1-j, P[j-1] - GAP_O - (j-1)) */
                __m512i fA = _mm512_sub_epi32(
                    _mm512_sub_epi32(pshift, vO),
                    _mm512_sub_epi32(jv, _mm512_set1_epi32(1)));
                __m512i fB = _mm512_sub_epi32(_mm512_set1_epi32(beg - 1), jv);
                __m512i f = _mm512_max_epi32(fA, fB);
                __m512i f1 = _mm512_max_epi32(f, zero);
                __m512i tmp1 = _mm512_max_epi32(e1, f1);
                __m512i hc = _mm512_max_epi32(tmp1, diag);
                /* df compares hc[j-1]-O vs f[j-1]-E (slide-1 with carries) */
                __m512i hcsh = _mm512_alignr_epi32(hc, neg_blk, 15);
                hcsh = _mm512_mask_mov_epi32(hcsh, 1,
                                             _mm512_set1_epi32(carry_hc));
                __m512i fsh = _mm512_alignr_epi32(f, neg_blk, 15);
                fsh = _mm512_mask_mov_epi32(fsh, 1,
                                            _mm512_set1_epi32(carry_f));
                __mmask16 df_m = _mm512_cmpgt_epi32_mask(
                    _mm512_sub_epi32(hcsh, vO), _mm512_sub_epi32(fsh, vE));
                carry_hc = _mm512_cvtsi512_si32(
                    _mm512_permutexvar_epi32(_mm512_set1_epi32(15), hc));
                carry_f = _mm512_cvtsi512_si32(
                    _mm512_permutexvar_epi32(_mm512_set1_epi32(15), f));
                /* dh = (tmp1 <= diag) ? 1 : (e1 > f1 ? de : df) */
                __mmask16 m1 = _mm512_cmple_epi32_mask(tmp1, diag);
                __mmask16 me = _mm512_cmpgt_epi32_mask(e1, f1);
                __m512i de_v = _mm512_mask_mov_epi32(
                    v2, de_m, _mm512_set1_epi32(3));
                __m512i df_v = _mm512_mask_mov_epi32(
                    _mm512_set1_epi32(4), df_m, _mm512_set1_epi32(5));
                __m512i dh_v = _mm512_mask_mov_epi32(
                    _mm512_mask_mov_epi32(df_v, me, de_v), m1,
                    _mm512_set1_epi32(1));
                /* stores */
                int32_t u0 = j0 - off_i + 1;
                _mm512_mask_storeu_epi32((void *)(e_b + u0), mk, e_new);
                _mm512_mask_storeu_epi32((void *)(h_c + u0), mk, hc);
                _mm_mask_storeu_epi8((void *)(d0 + j0), mk,
                                     _mm512_cvtepi32_epi8(de_v));
                _mm_mask_storeu_epi8((void *)(d1 + j0), mk,
                                     _mm512_cvtepi32_epi8(df_v));
                _mm_mask_storeu_epi8((void *)(d2 + j0), mk,
                                     _mm512_cvtepi32_epi8(dh_v));
                bestv = _mm512_max_epi32(bestv,
                                         _mm512_maskz_mov_epi32(mk, hc));
            }
            int32_t row_best = _mm512_reduce_max_epi32(bestv);
            if (row_best > best) best = row_best;
            memcpy(h_b + (beg - off_i + 1), h_c + (beg - off_i + 1),
                   (size_t)(end - beg + 1) * sizeof(int32_t));
        }
        band_width *= 2;
        if (!(best < target_score && band_width <= length)) {
            band_width /= 2;
            break;
        }
    }

    int32_t nops = band_traceback(dirs, readLen, refLen, band_width,
                                  ops_len, ops_ch, ops_cap);
    free(dirs); free(h_b); free(e_b); free(h_c);
    return nops;
}
#endif  /* __AVX512BW__ && __AVX512VL__ */

static int32_t banded_sw(const int8_t *ref, int32_t refLen,
                         const int8_t *read, int32_t readLen,
                         int32_t target_score, int32_t band_width,
                         int32_t *ops_len, char *ops_ch, int32_t ops_cap) {
#if defined(__AVX512BW__) && defined(__AVX512VL__)
    /* i32 headroom: cells <= 2*min(R,C), A adds an index < refLen */
    if ((int64_t)refLen + readLen < ((int64_t)1 << 29))
        return banded_sw_avx(ref, refLen, read, readLen, target_score,
                             band_width, ops_len, ops_ch, ops_cap);
#endif
    return banded_sw_scalar(ref, refLen, read, readLen, target_score,
                            band_width, ops_len, ops_ch, ops_cap);
}

/* First exact occurrence of read in ref under the scoring alphabet
 * (bases >= 4 never score a match, ribbit_align.c:score, so they never
 * "occur"), -1 when absent.  Plain KMP, O(R + C).
 *
 * Used as a forward-pass shortcut: a local alignment scores 2R only by
 * matching ALL R read bases contiguously with zero penalties (matches are
 * +2 each and at most R of them exist; any gap/mismatch subtracts), i.e.
 * exactly when read occurs in ref.  The forward pass picks the FIRST
 * column reaching the global max and the first row there
 * (align.py:_forward_pass tie rules), and 2R is the global max whenever it
 * is achievable (score <= 2*min(R, C)), so an occurrence at minimal d
 * forces score1 = 2R, end_ref = d + R - 1 (an earlier column scoring 2R
 * would itself be a full-match diagonal, i.e. an earlier occurrence) and
 * end_read = R - 1 (row j is bounded by 2(j+1) < 2R for j < R-1).  Seeds
 * are aligned against a pseudo-perfect tiling of their own inferred motif
 * (parse_seed.cpp:381,401-404), so pure repeats — a large share of calls —
 * take this O(R + C) path instead of the O(R*C) DP. */
static int32_t kmp_first_occurrence(const int8_t *read, int32_t R,
                                    const int8_t *ref, int32_t C) {
    if (R <= 0 || R > C) return -1;
    for (int32_t i = 0; i < R; i++)
        if (read[i] >= 4) return -1;
    int32_t *fail = (int32_t *)malloc((size_t)R * sizeof(int32_t));
    if (!fail) return -1;
    fail[0] = 0;
    for (int32_t i = 1, k = 0; i < R; i++) {
        while (k && read[i] != read[k]) k = fail[k - 1];
        if (read[i] == read[k]) k++;
        fail[i] = k;
    }
    int32_t found = -1;
    for (int32_t j = 0, k = 0; j < C; j++) {
        int8_t c = ref[j];
        if (c >= 4) { k = 0; continue; }
        while (k && c != read[k]) k = fail[k - 1];
        if (c == read[k]) k++;
        if (k == R) { found = j - R + 1; break; }
    }
    free(fail);
    return found;
}

static int32_t emit_num(char *buf, int32_t pos, int32_t cap, int32_t v, char op) {
    char tmp[16];
    int n = snprintf(tmp, sizeof tmp, "%d%c", v, op);
    if (pos + n >= cap) return -1;
    memcpy(buf + pos, tmp, (size_t)n);
    return pos + n;
}

/* Full Align(): returns 0 ok, 1 no-positive-cell (empty cigar), -1 error.
 * out[0..5] = sw_score, ref_begin, ref_end, query_begin, query_end,
 * mismatches.  cigar_buf gets the NUL-terminated cigar string. */
int ribbit_align(const int8_t *read, int32_t R,
                 const int8_t *ref, int32_t C,
                 int32_t *out, char *cigar_buf, int32_t cigar_cap) {
    cigar_buf[0] = 0;
    memset(out, 0, 6 * sizeof(int32_t));
    if (R == 0 || C == 0) return -1;

    int32_t *H = (int32_t *)malloc((size_t)R * sizeof(int32_t));
    int32_t *E = (int32_t *)malloc((size_t)R * sizeof(int32_t));
    int32_t *bc = (int32_t *)malloc((size_t)R * sizeof(int32_t));

    int32_t end_ref, end_read, score1;
    /* O(R + C) occurrence precheck replaces the O(R*C) forward pass for
     * pure repeats (exactness argument at kmp_first_occurrence).  Gated on
     * 2R < WORD_MAX so the clamp semantics of large seeds are untouched. */
    int32_t pre_d = (2LL * R < WORD_MAX)
                        ? kmp_first_occurrence(read, R, ref, C) : -1;
    if (pre_d >= 0) {
        score1 = 2 * R;
        end_ref = pre_d + R - 1;
        end_read = R - 1;
    } else {
        AP_T0(tf0);
        score1 = forward_locate(read, R, ref, C, -1, -1, H, E, bc,
                                &end_ref, &end_read);
        AP_ADD(0, tf0);
    }
    if (end_ref < 0) {
        out[0] = 0; out[2] = -1; out[4] = R - 1;
        free(H); free(E); free(bc);
        return 1;
    }

    out[0] = score1;
    out[2] = end_ref;
    out[4] = end_read;

    /* Perfect-diagonal shortcut: when score1 == 2K and the K-cell diagonal
     * ending at (end_read, end_ref) is all matches, the reverse pass must
     * terminate at reversed column K-1 (a local score within c columns is
     * at most 2c, so no earlier column reaches 2K) and its first best row
     * there is K-1 (rows j < K-1 are bounded by 2(j+1) < 2K).  So
     * (end_ref_rev, rev_read_idx) = (K-1, K-1) exactly, and the O(R*C)
     * reverse DP is skipped. */
    int32_t ref_begin, query_begin;
    int32_t K = score1 >> 1;
    int perfect = (score1 & 1) == 0 && K >= 1 && K <= end_read + 1 &&
                  K <= end_ref + 1 && score1 < WORD_MAX;
    if (perfect) {
        for (int32_t t = 0; t < K; t++) {
            int8_t a = read[end_read - t], b = ref[end_ref - t];
            if (a != b || a >= 4) { perfect = 0; break; }
        }
    }
    if (ribbit_align_prof_on) ribbit_align_tprof[5]++;
    if (perfect) {
        if (ribbit_align_prof_on) ribbit_align_tprof[4]++;
        ref_begin = end_ref - (K - 1);
        query_begin = end_read - (K - 1);
    } else {
        /* reverse pass on reversed prefixes, early-terminating at score1 */
        int32_t Rr = end_read + 1, Cr = end_ref + 1;
        int8_t *read_rev = (int8_t *)malloc((size_t)Rr);
        int8_t *ref_rev = (int8_t *)malloc((size_t)Cr);
        for (int32_t j = 0; j < Rr; j++) read_rev[j] = read[end_read - j];
        for (int32_t j = 0; j < Cr; j++) ref_rev[j] = ref[end_ref - j];
        /* Off-diagonal band for the reverse pass.  Every score1-achieving
         * alignment inside the reversed prefix rectangle ends at reverse
         * cell (0,0): forward end_ref is the FIRST column reaching the
         * global max and end_read the FIRST row there, so an achieving
         * alignment ending at an earlier column/row would have moved them.
         * Anchored at the origin, a path cell at diagonal offset d needs a
         * gap run (DP cost GAP_O for the first gap cell, GAP_E for each
         * extension) totalling >= GAP_O + (|d|-1)*GAP_E, while matches are
         * <= min(Rr, Cr).  Out-of-band paths only lower computed scores,
         * so the first terminating column and first achieving row are
         * exact (full argument at forward_pass_i16). */
        int64_t mn_rc = Rr < Cr ? Rr : Cr;
        int64_t slack = 2 * mn_rc - score1;
        int64_t D64 = slack < GAP_O ? 0 : (slack - GAP_O) / GAP_E + 1;
        int32_t band = D64 >= Rr ? -1 : (int32_t)D64;
        int32_t end_ref_rev, rev_read_idx;
        AP_T0(tr0);
        int32_t rbest = forward_locate(read_rev, Rr, ref_rev, Cr, score1,
                                       band, H, E, bc,
                                       &end_ref_rev, &rev_read_idx);
        if (band >= 0 && rbest != score1)
            /* belt-and-braces: the band bound guarantees this never fires;
             * if it ever did, fall back to the exact full-width pass
             * rather than emit a wrong begin */
            forward_locate(read_rev, Rr, ref_rev, Cr, score1, -1, H, E, bc,
                           &end_ref_rev, &rev_read_idx);
        AP_ADD(1, tr0);
        ref_begin = end_ref - end_ref_rev;
        query_begin = end_read - rev_read_idx;
        free(read_rev); free(ref_rev);
        if (ribbit_align_dump_on)   /* reverse-pass geometry dump */
            fprintf(stderr, "[ADUMP] R=%d C=%d s1=%d er=%d eq=%d irev=%d jrev=%d\n",
                    R, C, score1, end_ref, end_read, end_ref_rev,
                    rev_read_idx);
    }
    out[1] = ref_begin;
    out[3] = query_begin;

    /* banded traceback on the located subsequences */
    int32_t sub_ref_len = end_ref - ref_begin + 1;
    int32_t sub_read_len = end_read - query_begin + 1;
    int32_t bw = sub_ref_len - sub_read_len;
    if (bw < 0) bw = -bw;
    bw += 1;
    int32_t ops_cap = 2 * (sub_ref_len + sub_read_len) + 8;
    int32_t *ops_len = (int32_t *)malloc((size_t)ops_cap * sizeof(int32_t));
    char *ops_ch = (char *)malloc((size_t)ops_cap);
    AP_T0(tb0);
    int32_t nops = banded_sw(ref + ref_begin, sub_ref_len,
                             read + query_begin, sub_read_len,
                             score1, bw, ops_len, ops_ch, ops_cap);
    AP_ADD(2, tb0);
    if (ribbit_align_prof_on)
        ribbit_align_tprof[3] += (long long)sub_read_len * (2 * bw + 1);
    free(H); free(E); free(bc);
    if (nops < 0) { free(ops_len); free(ops_ch); return 0; /* empty cigar */ }

    /* mark mismatches + soft clips (align.py:_mark_mismatch) */
    int32_t pos = 0, mism = 0;
    if (query_begin > 0) {
        pos = emit_num(cigar_buf, pos, cigar_cap, query_begin, 'S');
        if (pos < 0) goto overflow;
    }
    {
        int32_t rp = ref_begin, qp = query_begin;
        int32_t run_len = 0; char run_op = 0;
        for (int32_t k = 0; k < nops; k++) {
            int32_t ln = ops_len[k];
            char opk = ops_ch[k];
            if (opk == 'M') {
                for (int32_t t = 0; t < ln; t++) {
                    /* spec compares raw translated codes (align.py
                     * _mark_mismatch): N(4)==N(4) counts as '=' even though
                     * the score matrix penalizes it */
                    char ch = (ref[rp] == read[qp]) ? '=' : 'X';
                    if (ch == 'X') mism++;
                    if (run_op == ch) run_len++;
                    else {
                        if (run_len) {
                            pos = emit_num(cigar_buf, pos, cigar_cap, run_len, run_op);
                            if (pos < 0) goto overflow;
                        }
                        run_op = ch; run_len = 1;
                    }
                    rp++; qp++;
                }
            } else if (opk == 'I') {
                if (run_len) {
                    pos = emit_num(cigar_buf, pos, cigar_cap, run_len, run_op);
                    if (pos < 0) goto overflow;
                    run_len = 0; run_op = 0;
                }
                pos = emit_num(cigar_buf, pos, cigar_cap, ln, 'I');
                if (pos < 0) goto overflow;
                qp += ln; mism += ln;
            } else { /* 'D' */
                if (run_len) {
                    pos = emit_num(cigar_buf, pos, cigar_cap, run_len, run_op);
                    if (pos < 0) goto overflow;
                    run_len = 0; run_op = 0;
                }
                pos = emit_num(cigar_buf, pos, cigar_cap, ln, 'D');
                if (pos < 0) goto overflow;
                rp += ln; mism += ln;
            }
        }
        if (run_len) {
            pos = emit_num(cigar_buf, pos, cigar_cap, run_len, run_op);
            if (pos < 0) goto overflow;
        }
    }
    {
        int32_t endclip = R - end_read - 1;
        if (endclip > 0) {
            pos = emit_num(cigar_buf, pos, cigar_cap, endclip, 'S');
            if (pos < 0) goto overflow;
        }
    }
    cigar_buf[pos] = 0;
    out[5] = mism;
    free(ops_len); free(ops_ch);
    return 0;

overflow:
    cigar_buf[0] = 0;
    free(ops_len); free(ops_ch);
    return -1;
}
