/* Bitmap-word decoder: device-produced packed qualified bitmaps -> exact
 * event streams for the native core replay (ribbit_core_set_events
 * contract).
 *
 * The TPU event-extraction kernel (ribbit_tpu/scan_events_pallas.py)
 * emits ONE int32 word per sequence position carrying NROWS = 8 shift
 * rows with a uniform field stride:
 *
 *   bits  0- 7  q6 qualified bitmap, rows 0-7   (threshold-6 overlay
 *         8-15  q7 qualified bitmap, rows 0-7    windows / threshold-7
 *        16-23  perfect-match bitmap, rows 0-7   raw windows / eq & ~N)
 *
 * Run starts/ends are TRANSITIONS between consecutive words: bit on at p
 * and off at p-1 -> run start p; off at p and on at p-1 -> exclusive run
 * end p (one implicit zero word closes open runs at p = L).  Any word
 * equal to its predecessor carries no event, so the scan fast-forwards
 * through both all-zero regions and the interiors of long qualified runs
 * (two words at a time against the repeated previous word).
 *
 * Perfect runs are emitted only when their exact length >= cutoffs[row]
 * (the generation cutoff 12-m for m<=6 else m,
 * parse_perfect_shiftxor.cpp:146-226) -- applied here instead of in the
 * kernel, which no longer pays saturating run-length chains.
 *
 * Single pass: (start, end) pairs land in per-channel bucket regions of
 * the caller's i32 buffers (row r's region is [r*cap, r*cap + count_r)),
 * channel-major with no counting pre-pass and no sort.  On overflow the
 * scan keeps counting without writing and returns the needed capacity
 * (caller retries); 0 on success.  counts[3*NROWS]: per-row event
 * counts, layout [stream*NROWS + r], streams 0=q6, 1=q7, 2=perfect.
 */

#include <stdint.h>
#include <string.h>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

typedef int32_t i32;
typedef int64_t i64;
typedef uint32_t u32;
typedef uint64_t u64;

#define NROWS 8

i64 ribbit_decode_bitmaps(const i32 *w, i64 L,
                          i64 row_lo, i64 row_hi, const i64 *cutoffs,
                          i64 cap,
                          i32 *q6_s, i32 *q6_e, i32 *q7_s, i32 *q7_e,
                          i32 *p_s, i32 *p_e, i64 *counts)
{
    u32 rows = 0;
    for (i64 r = row_lo; r < row_hi; r++) rows |= 1u << r;
    const u32 q6m = rows;
    const u32 q7m = rows << NROWS;
    const u32 pmm = rows << (2 * NROWS);
    const u32 amask = q6m | q7m | pmm;

    i64 cs6[NROWS], ce6[NROWS], cs7[NROWS], ce7[NROWS], cp[NROWS];
    i64 open_p[NROWS];
    for (int r = 0; r < NROWS; r++) {
        cs6[r] = ce6[r] = cs7[r] = ce7[r] = cp[r] = (i64)r * cap;
        open_p[r] = -1;
    }
    i64 over = 0;                            /* max overflow seen */

#define EMIT(buf, cur, r, val) do {                                       \
        i64 _k = (cur)[r]++;                                              \
        if (_k < ((i64)(r) + 1) * cap) (buf)[_k] = (i32)(val);            \
        else { i64 _need = (cur)[r] - (i64)(r) * cap;                     \
               if (_need > over) over = _need; }                          \
    } while (0)

    u32 prev = 0;          /* masked previous word */
    i64 p = 0;

/* transition body for one word (position P, masked value CUR); skipped
 * entirely when the masked value is unchanged */
#define PROCESS(CUR, P) do {                                              \
        u32 _cur = (CUR);                                                 \
        u32 diff = _cur ^ prev;                                           \
        if (diff) {                                                       \
            u32 on = _cur & diff, off = prev & diff;                      \
            u32 t = on & q6m;                                             \
            while (t) { int b = __builtin_ctz(t); t &= t - 1;             \
                        EMIT(q6_s, cs6, b, (P)); }                        \
            t = off & q6m;                                                \
            while (t) { int b = __builtin_ctz(t); t &= t - 1;             \
                        EMIT(q6_e, ce6, b, (P)); }                        \
            t = (on & q7m) >> NROWS;                                      \
            while (t) { int b = __builtin_ctz(t); t &= t - 1;             \
                        EMIT(q7_s, cs7, b, (P)); }                        \
            t = (off & q7m) >> NROWS;                                     \
            while (t) { int b = __builtin_ctz(t); t &= t - 1;             \
                        EMIT(q7_e, ce7, b, (P)); }                        \
            t = (on & pmm) >> (2 * NROWS);                                \
            while (t) { int b = __builtin_ctz(t); t &= t - 1;             \
                        open_p[b] = (P); }                                \
            t = (off & pmm) >> (2 * NROWS);                               \
            while (t) { int b = __builtin_ctz(t); t &= t - 1;             \
                        i64 s = open_p[b];                                \
                        if (s >= 0 && (P) - s >= cutoffs[b]) {            \
                            EMIT(p_s, cp, b, s);                          \
                            /* p_e shares cp: pairs emitted together */   \
                            i64 _k = cp[b] - 1;                           \
                            if (_k < ((i64)b + 1) * cap)                  \
                                p_e[_k] = (i32)(P);                       \
                        }                                                 \
                        open_p[b] = -1; }                                 \
            prev = _cur;                                                  \
        }                                                                 \
    } while (0)

    /* Transition DETECTION is vectorized: compare 16 words per AVX-512
     * iteration against their shifted-by-one predecessors; every flagged
     * word of the block is processed from the one compare mask (no
     * rescan), so dense runs AND zero regions both stream at
     * ~detection speed, and transition-heavy blocks pay once. */
#if defined(__AVX512F__)
    {
        u32 raw_prev = 0;
        while (p + 16 <= L) {
            __m512i v = _mm512_loadu_si512((const void *)(w + p));
            __m512i bp = _mm512_set1_epi32((i32)raw_prev);
            __m512i vp = _mm512_alignr_epi32(v, bp, 15);
            u32 m = (u32)_mm512_cmpneq_epi32_mask(v, vp);
            while (m) {
                int o = __builtin_ctz(m);
                m &= m - 1;
                PROCESS((u32)w[p + o] & amask, p + o);
            }
            raw_prev = (u32)w[p + 15];
            p += 16;
        }
    }
#else
    {
        u32 raw_prev = 0;
        while (p + 2 <= L) {
            u64 two, rep = ((u64)raw_prev << 32) | raw_prev;
            memcpy(&two, w + p, 8);
            if (two == rep) { p += 2; continue; }
            PROCESS((u32)w[p] & amask, p);
            raw_prev = (u32)w[p];
            p++;
        }
    }
#endif
    for (; p < L; p++)                       /* scalar tail */
        PROCESS((u32)w[p] & amask, p);
    PROCESS(0, L);      /* implicit closing word ends open runs at L */
#undef PROCESS
#undef EMIT

    if (over) return over;
    for (int r = 0; r < NROWS; r++) {
        if (cs6[r] != ce6[r] || cs7[r] != ce7[r])
            return -1;
        counts[0 * NROWS + r] = cs6[r] - (i64)r * cap;
        counts[1 * NROWS + r] = cs7[r] - (i64)r * cap;
        counts[2 * NROWS + r] = cp[r] - (i64)r * cap;
    }
    return 0;
}
