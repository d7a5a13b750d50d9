/* Flagword decoder: device-produced packed event flags -> exact event
 * streams for the native core replay (ribbit_core_set_events contract).
 *
 * The TPU event-extraction kernel (ribbit_tpu/scan_events_pallas.py) emits,
 * per 4-shift-row group, ONE int32 word per sequence position:
 *
 *   bits  0- 3  q6 run-start flags   (threshold-6 overlay windows,
 *         4- 7  q6 run-end flags      parse_anchored_shiftxor.cpp path)
 *         8-11  q7 run-start flags   (threshold-7 raw windows,
 *        12-15  q7 run-end flags      parse_substitute_shiftxor.cpp path)
 *        16-19  perfect run-start    (eq & ~N runs >= generation cutoff,
 *        20-23  perfect run-end       parse_perfect_shiftxor.cpp:146-226)
 *
 * bit b of a field = the group's shift row b.  Flags are ~2% dense, so the
 * scan skips zero words (64-bit double-word test); set flags decode via
 * ctz loops.  Single pass: (start, end) pairs land in per-channel bucket
 * regions of the caller's i32 buffers (channel b's region is
 * [b*cap, b*cap + count_b)), giving channel-major output with no counting
 * pre-pass and no sort.  Start/end flags of one run pair positionally per
 * channel (equal counts by construction; run-end value is exclusive:
 * flag position + 1).  On overflow the scan keeps counting without
 * writing and returns the needed capacity (caller retries); returns -1 on
 * start/end pairing mismatch (malformed input); 0 on success.
 * counts[12]: per-channel event counts, layout [stream*4 + b] with
 * streams 0=q6, 1=q7, 2=perfect.
 */

#include <stdint.h>
#include <string.h>

typedef int32_t i32;
typedef int64_t i64;
typedef uint32_t u32;
typedef uint64_t u64;

i64 ribbit_decode_flagwords(const i32 *w, i64 L,
                            i64 bit_lo, i64 bit_hi, i64 cap,
                            i32 *q6_s, i32 *q6_e, i32 *q7_s, i32 *q7_e,
                            i32 *p_s, i32 *p_e, i64 *counts)
{
    u32 vmask = 0;
    for (i64 b = bit_lo; b < bit_hi; b++) vmask |= 1u << b;
    const u32 amask = vmask * 0x111111u;    /* all six fields */

    /* per-channel cursors within the bucket regions */
    i64 cs6[4], ce6[4], cs7[4], ce7[4], csp[4], cep[4];
    for (int b = 0; b < 4; b++) {
        cs6[b] = ce6[b] = cs7[b] = ce7[b] = csp[b] = cep[b] = (i64)b * cap;
    }
    i64 over = 0;                            /* max overflow seen */

#define EMIT(buf, cur, b, val) do {                                       \
        i64 _k = (cur)[b]++;                                              \
        if (_k < ((i64)(b) + 1) * cap) (buf)[_k] = (i32)(val);            \
        else { i64 _need = (cur)[b] - (i64)(b) * cap;                     \
               if (_need > over) over = _need; }                          \
    } while (0)

    i64 p = 0;
    while (p < L) {
        /* skip runs of zero words two at a time */
        while (p + 2 <= L) {
            u64 two;
            memcpy(&two, w + p, 8);
            if (two & ((u64)amask | ((u64)amask << 32))) break;
            p += 2;
        }
        if (p >= L) break;
        u32 a = (u32)w[p] & amask;
        if (a) {
            u32 t = a & vmask;
            while (t) { int b = __builtin_ctz(t); t &= t - 1;
                        EMIT(q6_s, cs6, b, p); }
            t = (a >> 4) & vmask;
            while (t) { int b = __builtin_ctz(t); t &= t - 1;
                        EMIT(q6_e, ce6, b, p + 1); }
            t = (a >> 8) & vmask;
            while (t) { int b = __builtin_ctz(t); t &= t - 1;
                        EMIT(q7_s, cs7, b, p); }
            t = (a >> 12) & vmask;
            while (t) { int b = __builtin_ctz(t); t &= t - 1;
                        EMIT(q7_e, ce7, b, p + 1); }
            t = (a >> 16) & vmask;
            while (t) { int b = __builtin_ctz(t); t &= t - 1;
                        EMIT(p_s, csp, b, p); }
            t = (a >> 20) & vmask;
            while (t) { int b = __builtin_ctz(t); t &= t - 1;
                        EMIT(p_e, cep, b, p + 1); }
        }
        p++;
    }
#undef EMIT

    if (over) return over;
    for (int b = 0; b < 4; b++) {
        if (cs6[b] != ce6[b] || cs7[b] != ce7[b] || csp[b] != cep[b])
            return -1;
        counts[0 * 4 + b] = cs6[b] - (i64)b * cap;
        counts[1 * 4 + b] = cs7[b] - (i64)b * cap;
        counts[2 * 4 + b] = csp[b] - (i64)b * cap;
    }
    return 0;
}
