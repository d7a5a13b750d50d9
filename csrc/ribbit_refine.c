/* ribbit_refine: native seed refinement (motif inference, alignment vs a
 * pseudo-perfect repeat, CIGAR processing, emission, flank recursion).
 *
 * Exact-semantics C port of the oracle-validated Python modules
 * ribbit_tpu/refine.py + cigarproc.py + bitutils.py + umap_order.py, which
 * are themselves rule-for-rule ports of the reference:
 *   processSeed                  parse_seed.cpp:318-464
 *   processSeedMotifWise         parse_smallmotif_seed.cpp:190-288
 *   possibleMotifs               parse_smallmotif_seed.cpp:76-188
 *   calculateMotifUnits          parse_smallmotif_seed.cpp:26-72
 *   mostFrequentMotif            parse_seed.cpp:259-315
 *   calculateRepeatClass         bitseq_utils.cpp:185-221
 *   calculateAtomicity(+Long)    bitseq_utils.cpp:42-183
 *   processCIGARWithPruning      process_cigar.cpp:126-251
 *   processCIGARMotifWise        process_cigar.cpp:254-336
 *   libstdc++ unordered_map iteration order (emission-order dependence of
 *   parse_smallmotif_seed.cpp:177-187)
 *
 * All purity arithmetic is C `float` to match the reference's float and the
 * %.6g stream formatting.  Motifs longer than 32 bases are handled as base
 * arrays (the Python spec uses bignums; equality on base arrays is the same
 * relation).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>
#include <math.h>
#include <malloc.h>
#include <pthread.h>

typedef int64_t i64;
typedef int32_t i32;

#define PURITY_THRESHOLD 0.85f
#define CONTINUOUS_ONES_THRESHOLD 3

/* from ribbit_align.c */
int ribbit_align(const int8_t *read, i32 R, const int8_t *ref, i32 C,
                 i32 *out, char *cigar_buf, i32 cigar_cap);
/* from ribbit_vote.c */
i32 ribbit_vote_longer(const int8_t *code, const uint8_t *n_mask,
                       i32 total_len, i32 seed_start,
                       i32 seed_sequence_length, i32 m);
/* from ribbit_core.c */
typedef struct RibbitCore RibbitCore;
i64 ribbit_core_overlay_longest_run(RibbitCore *c, i32 midx, i64 a, i64 b);
int32_t ribbit_core_overlay_run3(RibbitCore *c, i32 midx, i64 a, i64 b);
i64 ribbit_core_scan_stream(RibbitCore *c,
                            void (*cb)(void *arg, const i64 *seeds4, i64 n),
                            void *arg);
void ribbit_core_get_seeds(RibbitCore *c, i64 *out);
void ribbit_core_drop_overlay(RibbitCore *c);

/* ------------------------------------------------------------------ */
/* output buffer                                                      */
/* ------------------------------------------------------------------ */

typedef struct { char *d; i64 n, cap; } StrBuf;

/* allocation failure here has no recovery path that preserves the output
 * contract; fail loudly instead of dereferencing NULL */
static void *xmalloc(size_t sz) {
    void *p = malloc(sz ? sz : 1);
    if (!p) { fprintf(stderr, "ribbit_refine: out of memory\n"); abort(); }
    return p;
}
static void *xcalloc(size_t n, size_t sz) {
    void *p = calloc(n ? n : 1, sz ? sz : 1);
    if (!p) { fprintf(stderr, "ribbit_refine: out of memory\n"); abort(); }
    return p;
}
static void *xrealloc(void *p, size_t sz) {
    void *q = realloc(p, sz ? sz : 1);
    if (!q) { fprintf(stderr, "ribbit_refine: out of memory\n"); abort(); }
    return q;
}

static void sb_reserve(StrBuf *b, i64 extra) {
    if (b->n + extra + 1 > b->cap) {
        b->cap = b->cap ? b->cap * 2 : 4096;
        while (b->n + extra + 1 > b->cap) b->cap *= 2;
        b->d = (char *)xrealloc(b->d, (size_t)b->cap);
    }
}

static void sb_append(StrBuf *b, const char *s, i64 len) {
    sb_reserve(b, len);
    memcpy(b->d + b->n, s, (size_t)len);
    b->n += len;
    b->d[b->n] = 0;
}

/* ------------------------------------------------------------------ */
/* bit utilities (bitutils.py)                                        */
/* ------------------------------------------------------------------ */

/* canonical repeat class: lexicographically smallest 2-bit cyclic rotation
 * (m <= 16 so u64 is enough) */
static uint64_t repeat_class_compute(uint64_t motif, i32 m) {
    uint64_t mask = (m >= 32) ? ~0ULL : ((1ULL << (2 * m)) - 1);
    uint64_t best = motif, cycle;
    for (i32 i = 0; i < m - 1; i++) {
        cycle = ((motif >> (2 * (m - (i + 1)))) | (motif << (2 * (i + 1)))) & mask;
        if (cycle < best) best = cycle;
    }
    return best;
}

/* memoized for the small-motif hot path (m <= 10), like the reference's
 * REPEAT_CLASSES tables (ribbit.cpp:248-267) but built lazily: ~5.6 MB
 * total, thread-safe one-time init */
#include <pthread.h>
static uint32_t *rc_tables[11];
static pthread_once_t rc_once = PTHREAD_ONCE_INIT;

static void rc_build_tables(void) {
    for (i32 m = 2; m <= 10; m++) {
        uint64_t n = 1ULL << (2 * m);
        uint32_t *t = (uint32_t *)malloc((size_t)n * sizeof(uint32_t));
        for (uint64_t w = 0; w < n; w++)
            t[w] = (uint32_t)repeat_class_compute(w, m);
        rc_tables[m] = t;
    }
}

static inline uint64_t repeat_class(uint64_t motif, i32 m) {
    if (m >= 2 && m <= 10 && rc_tables[m])
        return rc_tables[m][motif];
    return repeat_class_compute(motif, m);
}

/* atomicity on an integer motif (m <= 16): smallest f dividing m with
 * motif f-periodic */
static i32 atomicity_int(uint64_t motif, i32 m) {
    for (i32 f = 1; f <= m / 2; f++) {
        if (m % f != 0) continue;
        uint64_t mask = (1ULL << (2 * (m - f))) - 1;
        if ((motif >> (2 * f)) == (motif & mask)) return f;
    }
    return m;
}

/* atomicity on a base array: bases f-periodic (bases[i]==bases[i+f]) */
static i32 atomicity_bases(const int8_t *bases, i32 m, i32 require_divisor) {
    i32 limit = require_divisor ? m / 2 : m - m / 3 - 1;
    for (i32 f = 1; f <= limit; f++) {
        if (require_divisor && m % f != 0) continue;
        int ok = 1;
        for (i32 i = 0; i + f < m; i++)
            if (bases[i] != bases[i + f]) { ok = 0; break; }
        if (ok) return f;
    }
    return m;
}

static void motif_int_to_bases(uint64_t motif, i32 m, int8_t *out) {
    for (i32 i = 0; i < m; i++)
        out[i] = (int8_t)((motif >> (2 * (m - 1 - i))) & 3);
}

static const char BASE_CHARS[4] = {'A', 'C', 'G', 'T'};

/* ------------------------------------------------------------------ */
/* libstdc++ unordered_map iteration order (umap_order.py)            */
/* ------------------------------------------------------------------ */

static const i64 UMAP_PRIMES[] = {
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
    71, 73, 79, 83, 89, 97, 103, 109, 113, 127, 137, 139, 149, 157, 167, 179,
    193, 199, 211, 227, 241, 257, 277, 293, 313, 337, 359, 383, 409, 439,
    467, 503, 541, 577, 619, 661, 709, 761, 823, 887, 953, 1031, 1109, 1193,
    1289, 1381, 1493, 1613, 1741, 1879, 2029, 2179, 2357, 2549, 2753, 2971,
    3209, 3469, 3739, 4027, 4349, 4703, 5087, 5503, 5953, 6427, 6949, 7517,
    8123, 8783, 9497, 10273, 11113, 12011, 12983, 14033, 15173, 16411, 17749,
    19183, 20753, 22447, 24281, 26267, 28411, 30727, 33223, 35933, 38873,
    42043, 45481, 49201, 53201, 57557, 62233, 67307, 72817, 78779, 85229,
    92203, 99733, 107897, 116731, 126271, 136607, 147793, 159871, 172933,
    187091, 202409, 218971, 236897, 256279, 277261, 299951, 324503, 351061,
    379787, 410857, 444487, 480881, 520241, 562841, 608903, 658753, 712697,
    771049, 834181, 902483, 976369};
#define N_UMAP_PRIMES ((i64)(sizeof(UMAP_PRIMES) / sizeof(UMAP_PRIMES[0])))

static i64 next_table_prime(i64 n) {
    i64 lo = 0, hi = N_UMAP_PRIMES;
    while (lo < hi) {
        i64 mid = (lo + hi) >> 1;
        if (UMAP_PRIMES[mid] < n) lo = mid + 1; else hi = mid;
    }
    if (lo < N_UMAP_PRIMES) return UMAP_PRIMES[lo];
    i64 x = (n % 2) ? n : n + 1;
    for (;;) {
        int prime = 1;
        for (i64 d = 3; d * d <= x; d += 2)
            if (x % d == 0) { prime = 0; break; }
        if (prime) return x;
        x += 2;
    }
}

/* simple open-addressing map bucket -> node index (buckets are sparse) */
typedef struct { i64 *keys, *vals; i64 cap, n; } BktMap;

static void bm_init(BktMap *m, i64 cap_hint) {
    i64 cap = 16;
    while (cap < cap_hint * 2) cap *= 2;
    m->cap = cap;
    m->n = 0;
    m->keys = (i64 *)malloc((size_t)cap * sizeof(i64));
    m->vals = (i64 *)malloc((size_t)cap * sizeof(i64));
    for (i64 i = 0; i < cap; i++) m->keys[i] = -1;
}
static void bm_clear(BktMap *m) {
    for (i64 i = 0; i < m->cap; i++) m->keys[i] = -1;
    m->n = 0;
}
static void bm_free(BktMap *m) { free(m->keys); free(m->vals); }
static i64 *bm_slot(BktMap *m, i64 key) {     /* returns &val or NULL */
    i64 h = (i64)(((uint64_t)key * 0x9E3779B97F4A7C15ULL) >> 1) % m->cap;
    for (;;) {
        if (m->keys[h] == -1) return NULL;
        if (m->keys[h] == key) return &m->vals[h];
        h = (h + 1) & (m->cap - 1);
    }
}
static void bm_put(BktMap *m, i64 key, i64 val) {
    i64 h = (i64)(((uint64_t)key * 0x9E3779B97F4A7C15ULL) >> 1) % m->cap;
    for (;;) {
        if (m->keys[h] == -1 || m->keys[h] == key) {
            if (m->keys[h] == -1) { m->keys[h] = key; m->n++; }
            m->vals[h] = val;
            return;
        }
        h = (h + 1) & (m->cap - 1);
    }
}

/* iteration order of libstdc++ unordered_map<uint,V> after inserting
 * distinct keys in order (identity hash, max_load_factor 1.0) */
static void libstdcxx_order(const i64 *keys, i64 nkeys, i64 *out) {
    if (nkeys == 0) return;
    /* nodes: key + next-index; sentinel = index -1 via head */
    i64 *node_key = (i64 *)malloc((size_t)nkeys * sizeof(i64));
    i64 *node_nxt = (i64 *)malloc((size_t)nkeys * sizeof(i64));
    i64 head = -1;              /* sentinel.nxt */
    BktMap buckets;             /* bucket -> node index BEFORE bucket's first;
                                   -2 encodes the sentinel */
    bm_init(&buckets, nkeys + 8);
    i64 nbkt = 1, next_resize = 0, size = 0;

    for (i64 ki = 0; ki < nkeys; ki++) {
        i64 key = keys[ki];
        if (size + 1 > next_resize) {
            i64 min_bkts = size + 1;
            if (next_resize == 0 && min_bkts < 11) min_bkts = 11;
            if (min_bkts >= nbkt) {
                i64 want = min_bkts + 1 > nbkt * 2 ? min_bkts + 1 : nbkt * 2;
                i64 new_nbkt = next_table_prime(want);
                /* rehash: walk list in iteration order re-inserting */
                nbkt = new_nbkt;
                bm_clear(&buckets);
                i64 p = head;
                head = -1;
                i64 bbegin_bkt = -1;
                while (p != -1) {
                    i64 nxt = node_nxt[p];
                    i64 b = node_key[p] % nbkt;
                    i64 *before = bm_slot(&buckets, b);
                    if (before == NULL) {
                        node_nxt[p] = head;
                        head = p;
                        bm_put(&buckets, b, -2);
                        if (node_nxt[p] != -1)
                            bm_put(&buckets, bbegin_bkt, p);
                        bbegin_bkt = b;
                    } else {
                        i64 bef = *before;
                        if (bef == -2) {
                            node_nxt[p] = head;
                            head = p;
                        } else {
                            node_nxt[p] = node_nxt[bef];
                            node_nxt[bef] = p;
                        }
                    }
                    p = nxt;
                }
                next_resize = nbkt;
            } else {
                next_resize = nbkt;
            }
        }

        i64 b = key % nbkt;
        i64 node = size;        /* node index == insertion order */
        node_key[node] = key;
        i64 *before = bm_slot(&buckets, b);
        if (before != NULL) {
            i64 bef = *before;
            if (bef == -2) {
                node_nxt[node] = head;
                head = node;
            } else {
                node_nxt[node] = node_nxt[bef];
                node_nxt[bef] = node;
            }
        } else {
            i64 front_bkt = head != -1 ? node_key[head] % nbkt : -1;
            node_nxt[node] = head;
            head = node;
            if (node_nxt[node] != -1)
                bm_put(&buckets, front_bkt, node);
            bm_put(&buckets, b, -2);
        }
        size++;
    }

    i64 p = head, k = 0;
    while (p != -1) {
        out[k++] = node_key[p];
        p = node_nxt[p];
    }
    bm_free(&buckets);
    free(node_key);
    free(node_nxt);
}

/* ------------------------------------------------------------------ */
/* CIGAR processing (cigarproc.py / process_cigar.cpp)                */
/* ------------------------------------------------------------------ */

typedef struct {
    i64 repeat_start, repeat_end, alignment_length, match_units;
    float purity;
    char *cigar;        /* malloc'd */
} CigarResult;

typedef struct { i64 len; char op; } COp;

static i64 cigar_split(const char *cigar, COp **out) {
    i64 n = 0, cap = 16;
    COp *ops = (COp *)malloc((size_t)cap * sizeof(COp));
    i64 num = 0;
    int have = 0;
    for (const char *p = cigar; *p; p++) {
        if (*p >= '0' && *p <= '9') {
            num = num * 10 + (*p - '0');
            have = 1;
        } else {
            if (n == cap) { cap *= 2; ops = (COp *)realloc(ops, (size_t)cap * sizeof(COp)); }
            ops[n].len = have ? num : 0;
            ops[n].op = *p;
            n++;
            num = 0;
            have = 0;
        }
    }
    *out = ops;
    return n;
}

/* env-gated (RIBBIT_CORE_PROF) refinement section profile: thread-local
 * rdtsc accumulators flushed atomically per worker */
#include <stdatomic.h>
static _Atomic long long g_rprof[14];
static __thread long long t_rprof[14];
#define RP_SMALL 0
#define RP_LARGE 1
#define RP_GATE 2
#define RP_PM 3
#define RP_VOTE 4
#define RP_ALIGN 5
#define RP_CIGAR 6
#define RP_NALIGN 7
#define RP_CELLS 8
#define RP_GPASS 9
#define RP_MHIT 10
#define RP_MCELLS 11
#define RP_NVOTE 12
#define RP_VHIT 13
static int g_rprof_on = -1;
static inline int rprof_on(void) {
    if (g_rprof_on < 0) g_rprof_on = getenv("RIBBIT_CORE_PROF") != NULL;
    return g_rprof_on;
}
#if defined(__x86_64__)
#include <x86intrin.h>
#define RPROF_T0(v) uint64_t v = rprof_on() ? __rdtsc() : 0
#define RPROF_ADD(slot, v) do { if (rprof_on())     t_rprof[slot] += (long long)(__rdtsc() - (v)); } while (0)
#else
#define RPROF_T0(v) uint64_t v = 0; (void)v
#define RPROF_ADD(slot, v) (void)(v)
#endif
#define RPROF_N(slot, k) do { if (rprof_on()) t_rprof[slot] += (k); } while (0)
extern __thread long long ribbit_align_tprof[6];
extern int ribbit_align_prof_on;
extern int ribbit_align_dump_on;
static _Atomic long long g_aprof[6];

static void rprof_flush(void) {
    if (!rprof_on()) return;
    for (int i = 0; i < 14; i++) {
        atomic_fetch_add(&g_rprof[i], t_rprof[i]);
        t_rprof[i] = 0;
    }
    for (int i = 0; i < 6; i++) {
        atomic_fetch_add(&g_aprof[i], ribbit_align_tprof[i]);
        ribbit_align_tprof[i] = 0;
    }
}

/* calculateTrimEdges (process_cigar.cpp:34-86) */
static void calculate_trim_edges(float *purity, const i64 *ccigar_lengths,
                                 i64 ncc, i64 *alignment_length,
                                 i64 motif_length, const i64 *minimum_length,
                                 i64 min_len_size, i64 *trim_l, i64 *trim_r) {
    i64 trim_length = 0;
    *trim_l = 0;
    *trim_r = 0;
    i64 min_len = (motif_length >= 0 && motif_length < min_len_size)
                  ? minimum_length[motif_length] : 0;

    while (*purity < PURITY_THRESHOLD) {
        trim_length += 1;
        float max_purity = 0.0f;
        i64 max_alength = 0;

        for (i64 i = 0; i <= trim_length; i++) {
            i64 pair_match = 0, pair_alignment = 0;
            for (i64 j = 2 * i; j <= (ncc - 1) - 2 * (trim_length - i); j++) {
                if (j % 2 == 0) pair_match += ccigar_lengths[j];
                pair_alignment += ccigar_lengths[j];
            }
            float pair_purity = pair_alignment
                ? (float)pair_match / (float)pair_alignment
                : nanf("");
            if (pair_purity >= PURITY_THRESHOLD) {
                if (max_alength < pair_alignment) {
                    max_purity = pair_purity;
                    max_alength = pair_alignment;
                    *trim_l = i;
                    *trim_r = trim_length - i;
                }
            }
        }
        if (max_purity > *purity) {
            *purity = max_purity;
            *alignment_length = max_alength;
        }
        if (*alignment_length < min_len) break;
    }
}

/* processCIGARWithPruning (process_cigar.cpp:126-251); motif_length is the
 * atomicity at the call sites */
static CigarResult process_cigar_with_pruning(i64 seed_start,
                                              i64 seed_sequence_length,
                                              const char *cigar,
                                              i64 motif_length,
                                              const i64 *minimum_length,
                                              i64 min_len_size) {
    COp *ops;
    i64 nops = cigar_split(cigar, &ops);

    CigarResult r;
    r.repeat_start = seed_start;
    r.repeat_end = seed_start + seed_sequence_length;
    r.alignment_length = 0;
    r.match_units = 0;
    i64 matches = 0;

    i64 *ccigar_lengths = (i64 *)malloc((size_t)(nops + 1) * sizeof(i64));
    i64 *ccigar_indices = (i64 *)malloc((size_t)(nops + 1) * sizeof(i64));
    i64 ncc = 0, nci = 0;
    int mismatch_continue = 0;
    i64 start_soft_clip = 0;

    StrBuf nc = {NULL, 0, 0};
    char tmp[32];

    for (i64 cidx = 0; cidx < nops; cidx++) {
        i64 clength = ops[cidx].len;
        char ctype = ops[cidx].op;
        if (ctype == 'S') {
            if (cidx == 0) {
                r.repeat_start += clength;
                start_soft_clip = clength;
            } else {
                r.repeat_end -= clength;
            }
        } else if (ctype == 'X' || ctype == 'I' || ctype == 'D') {
            r.alignment_length += clength;
            if (mismatch_continue) ccigar_lengths[ncc - 1] += clength;
            else ccigar_lengths[ncc++] = clength;
            ccigar_indices[nci++] = ncc - 1;
            mismatch_continue = 1;
            sb_append(&nc, tmp, snprintf(tmp, sizeof tmp, "%lld%c",
                                         (long long)clength, ctype));
        } else if (ctype == '=' || ctype == 'M') {
            r.alignment_length += clength;
            matches += clength;
            r.match_units += clength / motif_length;
            ccigar_lengths[ncc++] = clength;
            ccigar_indices[nci++] = ncc - 1;
            mismatch_continue = 0;
            sb_append(&nc, tmp, snprintf(tmp, sizeof tmp, "%lld%c",
                                         (long long)clength, ctype));
        }
    }

    r.purity = r.alignment_length
        ? (float)matches / (float)r.alignment_length : nanf("");

    if (r.purity < PURITY_THRESHOLD) {
        i64 trim_l, trim_r;
        calculate_trim_edges(&r.purity, ccigar_lengths, ncc,
                             &r.alignment_length, motif_length,
                             minimum_length, min_len_size, &trim_l, &trim_r);
        free(nc.d);
        nc.d = NULL; nc.n = 0; nc.cap = 0;
        matches = 0;
        r.match_units = 0;

        for (i64 i = 0; i < nci; i++) {
            i64 ccidx = ccigar_indices[i];
            i64 clength;
            char ctype;
            if (start_soft_clip) {
                clength = ops[i + 1].len;
                ctype = ops[i + 1].op;
            } else {
                clength = ops[i].len;
                ctype = ops[i].op;
            }
            if (ccidx < 2 * trim_l) {
                if (ctype != 'D') r.repeat_start += clength;
            } else if (ccidx <= ncc - 1 - 2 * trim_r) {
                sb_append(&nc, tmp, snprintf(tmp, sizeof tmp, "%lld%c",
                                             (long long)clength, ctype));
                if (ctype == 'M' || ctype == '=') {
                    matches += clength;
                    r.match_units += clength / motif_length;
                }
            } else {
                if (ctype != 'D') r.repeat_end -= clength;
            }
        }
    }
    r.cigar = nc.d ? nc.d : (char *)calloc(1, 1);
    free(ops);
    free(ccigar_lengths);
    free(ccigar_indices);
    return r;
}

/* processCIGARMotifWise (process_cigar.cpp:254-336): purity only, no trim */
static CigarResult process_cigar_motifwise(i64 seed_start,
                                           i64 seed_sequence_length,
                                           const char *cigar,
                                           i64 motif_length) {
    COp *ops;
    i64 nops = cigar_split(cigar, &ops);
    CigarResult r;
    r.repeat_start = seed_start;
    r.repeat_end = seed_start + seed_sequence_length;
    r.alignment_length = 0;
    r.match_units = 0;
    i64 matches = 0;
    StrBuf nc = {NULL, 0, 0};
    char tmp[32];

    for (i64 cidx = 0; cidx < nops; cidx++) {
        i64 clength = ops[cidx].len;
        char ctype = ops[cidx].op;
        if (ctype == 'S') {
            if (cidx == 0) r.repeat_start += clength;
            else r.repeat_end -= clength;
        } else if (ctype == 'X' || ctype == 'I' || ctype == 'D') {
            r.alignment_length += clength;
            sb_append(&nc, tmp, snprintf(tmp, sizeof tmp, "%lld%c",
                                         (long long)clength, ctype));
        } else if (ctype == '=' || ctype == 'M') {
            r.alignment_length += clength;
            matches += clength;
            r.match_units += clength / motif_length;
            sb_append(&nc, tmp, snprintf(tmp, sizeof tmp, "%lld%c",
                                         (long long)clength, ctype));
        }
    }
    r.purity = r.alignment_length
        ? (float)matches / (float)r.alignment_length : nanf("");
    r.cigar = nc.d ? nc.d : (char *)calloc(1, 1);
    free(ops);
    return r;
}

/* ------------------------------------------------------------------ */
/* refinement context                                                 */
/* ------------------------------------------------------------------ */

typedef struct {
    RibbitCore *core;               /* overlay longest-run queries */
    const int8_t *code;             /* 2-bit codes, N -> 0 */
    const uint8_t *nmask;
    const int8_t *translated;       /* SSW translation of raw chars (N -> 4) */
    i64 L;
    i32 min_motif, max_motif, min_shift;
    const i64 *minimum_length;      /* [max_motif+1], 0 default */
    const i64 *perfect_units;       /* [max_motif+1], 0 default */
    i64 tbl_size;
    const char *seq_id;
    i64 seq_id_len;
    StrBuf *out;
} RefineCtx;

/* Content-addressed vote memo.  The diagonal vote
 * (parse_seed.cpp:153-256, ribbit_vote.c) reads code/nmask only in
 * [seed_start-1, seed_start+ssl): rows start at row >= seed_start and scan
 * < M bases with row + M <= seed_end; columns are clamped below seed_end
 * downstream, and upstream bases sit at >= ustream-2 > seed_start-2 with
 * the prefix vote clamped at col >= seed_start.  Every clamp involving the
 * contig length L is slack once seed_end + m + 2 <= L, so for interior
 * seeds the winning row is a pure function of the content window plus
 * (ssl, m), offset by seed_start.  Repetitive genomes re-pose the same
 * question at many addresses (the align memo measures 85% content-duplicate
 * alignments on the chromosome fixture), so a per-thread direct-mapped
 * cache keyed on (window bytes, ssl, m) — hash + full memcmp verify, same
 * exactness contract as the align memo — short-circuits the O(ssl*m) vote
 * and stores the relative index.  Boundary seeds always run the kernel. */
#define VCMEMO_BITS 13
#define VCMEMO_N ((i64)1 << VCMEMO_BITS)
#define VCMEMO_MAX_BYTES ((i64)1 << 18)
/* total owned window bytes per thread; stop caching past this (the hit
 * value concentrates in small windows, so a budget beats larger entries) */
#define VCMEMO_BUDGET ((i64)64 << 20)
/* rel sentinel for the kernel's default return (mmotif_index == 0, no row
 * strictly won): that outcome is ABSOLUTE, not seed-relative, and is a pure
 * function of the content window + (ssl, m), so replay it as absolute 0 */
#define VCMEMO_REL_ZERO INT32_MIN
typedef struct {
    uint64_t hash;
    i32 ssl, m, rel;
    int8_t *win;                    /* owned copy: code span then nmask span */
} VCMemoEnt;
static __thread VCMemoEnt *t_vcmemo;
static __thread i64 t_vcmemo_bytes;

static void vcmemo_free(void) {
    if (!t_vcmemo) return;
    for (i64 i = 0; i < VCMEMO_N; i++) free(t_vcmemo[i].win);
    free(t_vcmemo);
    t_vcmemo = NULL;
    t_vcmemo_bytes = 0;
}

static inline uint64_t vc_mix64(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 29;
    return x;
}

static inline uint64_t vc_hash(const uint8_t *p, i64 n, uint64_t h) {
    i64 i = 0;
    for (; i + 8 <= n; i += 8) {
        uint64_t w;
        memcpy(&w, p + i, 8);
        h = vc_mix64(h ^ w);
    }
    uint64_t t = 0;
    for (; i < n; i++) t = (t << 8) | p[i];
    return vc_mix64(h ^ t ^ ((uint64_t)n << 56));
}

static int g_vcmemo_on = -1;

/* env-gated (RIBBIT_VOTE_DUMP=path) per-kernel-run dump for offline cost
 * analysis: "seed_start ssl m cycles" per actual (non-memoized) vote run */
static FILE *g_vdump;

static i32 vote_kernel_run(const RefineCtx *x, i64 seed_start, i64 ssl,
                           i64 m) {
    if (!g_vdump)
        return ribbit_vote_longer(x->code, x->nmask, (i32)x->L,
                                  (i32)seed_start, (i32)ssl, (i32)m);
#if defined(__x86_64__)
    uint64_t t0 = __rdtsc();
#endif
    i32 r = ribbit_vote_longer(x->code, x->nmask, (i32)x->L,
                               (i32)seed_start, (i32)ssl, (i32)m);
#if defined(__x86_64__)
    unsigned long long dt = (unsigned long long)(__rdtsc() - t0);
#else
    unsigned long long dt = 0;
#endif
    flockfile(g_vdump);
    fprintf(g_vdump, "%lld %lld %lld %llu\n", (long long)seed_start,
            (long long)ssl, (long long)m, dt);
    funlockfile(g_vdump);
    return r;
}

/* resolve the env gate on the main thread (ribbit_refine_run) before any
 * worker reads it — pthread_create gives the happens-before edge */
static void vcmemo_resolve(void) {
    if (g_vcmemo_on < 0) {
        const char *e = getenv("RIBBIT_VOTE_MEMO");
        g_vcmemo_on = !(e && e[0] == '0');
    }
}

static i32 vote_longer_memo(const RefineCtx *x, i64 seed_start, i64 ssl,
                            i64 m) {
    RPROF_N(RP_NVOTE, 1);
    i64 lo = seed_start - 1, span = ssl + 1;   /* window [lo, seed_end) */
    if (!g_vcmemo_on || seed_start < 1 || seed_start + ssl + m + 2 > x->L ||
        span > VCMEMO_MAX_BYTES)
        return vote_kernel_run(x, seed_start, ssl, m);
    if (!t_vcmemo) {
        t_vcmemo = (VCMemoEnt *)calloc((size_t)VCMEMO_N, sizeof(VCMemoEnt));
        if (!t_vcmemo)
            return vote_kernel_run(x, seed_start, ssl, m);
    }
    uint64_t h = vc_hash((const uint8_t *)(x->code + lo), span,
                         0x9E3779B97F4A7C15ULL ^ (uint64_t)ssl);
    h = vc_hash(x->nmask + lo, span, h ^ (uint64_t)m);
    VCMemoEnt *e = &t_vcmemo[h & (VCMEMO_N - 1)];
    if (e->win && e->hash == h && e->ssl == (i32)ssl && e->m == (i32)m &&
        memcmp(e->win, x->code + lo, (size_t)span) == 0 &&
        memcmp(e->win + span, x->nmask + lo, (size_t)span) == 0) {
        RPROF_N(RP_VHIT, 1);
        return e->rel == VCMEMO_REL_ZERO ? 0 : (i32)seed_start + e->rel;
    }
    i32 r = vote_kernel_run(x, seed_start, ssl, m);
    i64 net = 2 * span - (e->win ? 2 * (i64)(e->ssl + 1) : 0);
    if (t_vcmemo_bytes + net > VCMEMO_BUDGET)
        return r;                   /* per-thread residency cap */
    int8_t *copy = (int8_t *)malloc((size_t)(2 * span));
    if (copy) {
        memcpy(copy, x->code + lo, (size_t)span);
        memcpy(copy + span, x->nmask + lo, (size_t)span);
        if (e->win)
            t_vcmemo_bytes -= 2 * (i64)(e->ssl + 1);
        t_vcmemo_bytes += 2 * span;
        free(e->win);
        e->hash = h;
        e->ssl = (i32)ssl;
        e->m = (i32)m;
        /* real winners satisfy r >= seed_start >= 1; r < seed_start is the
         * kernel's absolute default 0 (e.g. ssl <= m after N-trimming) */
        e->rel = r < (i32)seed_start ? VCMEMO_REL_ZERO : r - (i32)seed_start;
        e->win = copy;
    }
    return r;
}

static i64 min_length_of(const RefineCtx *x, i64 m) {
    return (m >= 0 && m < x->tbl_size) ? x->minimum_length[m] : 0;
}
static i64 perfect_units_of(const RefineCtx *x, i64 m) {
    return (m >= 0 && m < x->tbl_size) ? x->perfect_units[m] : 0;
}

/* emit one BED line (parse_seed.cpp:434-437 column contract) */
static void emit_line(RefineCtx *x, i64 start, i64 end, const char *motif,
                      i64 atomicity, i64 motif_length, i64 length, i64 units,
                      float purity, i64 seed_type, const char *cigar) {
    /* the motif string scales with -M, so the head buffer must too */
    char stack_head[256];
    i64 cap = (i64)strlen(motif) + 200;
    char *head = cap <= (i64)sizeof stack_head
                     ? stack_head : (char *)xmalloc((size_t)cap);
    int n = snprintf(head, (size_t)cap,
                     "%lld\t%lld\t%s\t%lld | %lld\t%lld\t%lld\t%.6g\t+\tSEED-%lld\t",
                     (long long)start, (long long)end, motif,
                     (long long)atomicity, (long long)motif_length,
                     (long long)length, (long long)units, (double)purity,
                     (long long)seed_type);
    if (n >= cap) n = (int)(cap - 1);
    sb_append(x->out, x->seq_id, x->seq_id_len);
    sb_append(x->out, "\t", 1);
    sb_append(x->out, head, n);
    if (head != stack_head) free(head);
    sb_append(x->out, cigar, (i64)strlen(cigar));
    sb_append(x->out, "\n", 1);
}

/* _n_trimmed_length (refine.py / parse_seed.cpp:349-354) */
static i64 n_trimmed_length(const RefineCtx *x, i64 seed_start, i64 seed_end,
                            i64 motif_length) {
    i64 ssl = seed_end - seed_start + motif_length;
    i64 lim = seed_end + motif_length;
    if (lim > x->L) lim = x->L;
    for (i64 p = seed_start; p < lim; p++)
        if (x->nmask[p]) return p - seed_start;
    return ssl;
}

/* int ppr = ssl + m + ((1-PURITY_THRESHOLD)*ssl), C++ float arithmetic
 * (parse_seed.cpp:381) */
static i64 ppr_length_of(i64 ssl, i64 m) {
    float f = (1.0f - PURITY_THRESHOLD) * (float)ssl;
    return (i64)((float)(ssl + m) + f);
}

/* build pseudo-perfect repeat codes by tiling motif chars then translating;
 * motif chars are ACGT so translation is the 0..3 code directly */
static int8_t *build_ppr(const int8_t *motif_bases, i64 motif_len, i64 ppr_len) {
    int8_t *ppr = (int8_t *)malloc((size_t)(ppr_len > 0 ? ppr_len : 1));
    for (i64 i = 0; i < ppr_len; i++) ppr[i] = motif_bases[i % motif_len];
    return ppr;
}

/* run the SSW alignment; returns malloc'd cigar (NULL = "alignment is None"
 * i.e. a hard error, empty string = no cigar) plus the out ints */
static char *run_align_raw(const int8_t *read, i64 read_len, const int8_t *ref,
                           i64 ref_len, i32 *out6) {
    i64 cap = 4 * (read_len + ref_len) + 64;
    char *buf = (char *)malloc((size_t)cap);
    int rc = ribbit_align(read, (i32)read_len, ref, (i32)ref_len, out6,
                          buf, (i32)cap);
    if (rc < 0) { free(buf); return NULL; }
    return buf;
}

/* Content-addressed alignment memo.  Tandem-repeat refinement aligns the
 * same (genome slice, pseudo-perfect repeat) pair repeatedly: overlapping
 * seeds from different shift channels resolve to the same candidate
 * (start, len, motif), and repetitive genomes contain byte-identical
 * slices at many positions.  Alignment is a pure function of the two byte
 * strings, so a per-thread direct-mapped cache keyed on content (hash +
 * full memcmp verify, so parity is untouchable) short-circuits the O(R*C)
 * DP.  Exactness: on hash-slot match the stored read/ref bytes are
 * compared in full before reuse; any mismatch falls through to the real
 * kernel. */
#define AMEMO_BITS 13
#define AMEMO_N ((i64)1 << AMEMO_BITS)
#define AMEMO_MAX_BYTES ((i64)1 << 20) /* don't cache pathological pairs */
typedef struct {
    uint64_t hash;
    i32 R, C;
    i32 rc;                     /* <0: alignment returned NULL */
    int8_t *read, *ref;         /* owned copies; read!=NULL marks occupancy */
    i32 out6[6];
    char *cigar;                /* owned copy, valid when rc >= 0 */
} AMemoEnt;
static __thread AMemoEnt *t_amemo;

static void amemo_free(void) {
    if (!t_amemo) return;
    for (i64 i = 0; i < AMEMO_N; i++) {
        free(t_amemo[i].read);
        free(t_amemo[i].ref);
        free(t_amemo[i].cigar);
    }
    free(t_amemo);
    t_amemo = NULL;
}

static inline uint64_t amemo_hash(const int8_t *read, i64 R,
                                  const int8_t *ref, i64 C) {
    uint64_t h = 1469598103934665603ULL;
    for (i64 i = 0; i < R; i++) h = (h ^ (uint8_t)read[i]) * 1099511628211ULL;
    for (i64 i = 0; i < C; i++) h = (h ^ (uint8_t)ref[i]) * 1099511628211ULL;
    h = (h ^ (uint64_t)R) * 1099511628211ULL;
    h = (h ^ (uint64_t)C) * 1099511628211ULL;
    return h;
}

static int g_amemo_on = -1;

static void amemo_resolve(void) {
    if (g_amemo_on < 0) {
        const char *e = getenv("RIBBIT_ALIGN_MEMO");
        g_amemo_on = !(e && e[0] == '0');
    }
}

static char *run_align(const int8_t *read, i64 read_len, const int8_t *ref,
                       i64 ref_len, i32 *out6) {
    if (!g_amemo_on || read_len + ref_len > AMEMO_MAX_BYTES)
        return run_align_raw(read, read_len, ref, ref_len, out6);
    if (!t_amemo) {
        t_amemo = (AMemoEnt *)calloc((size_t)AMEMO_N, sizeof(AMemoEnt));
        if (!t_amemo) return run_align_raw(read, read_len, ref, ref_len, out6);
    }
    uint64_t h = amemo_hash(read, read_len, ref, ref_len);
    AMemoEnt *e = &t_amemo[h & (AMEMO_N - 1)];
    if (e->read && e->hash == h && e->R == (i32)read_len &&
        e->C == (i32)ref_len &&
        memcmp(e->read, read, (size_t)read_len) == 0 &&
        memcmp(e->ref, ref, (size_t)ref_len) == 0) {
        RPROF_N(RP_MHIT, 1);
        RPROF_N(RP_MCELLS, read_len * ref_len);
        memcpy(out6, e->out6, sizeof(e->out6));
        if (e->rc < 0) return NULL;
        char *buf = (char *)malloc(strlen(e->cigar) + 1);
        if (!buf) return run_align_raw(read, read_len, ref, ref_len, out6);
        strcpy(buf, e->cigar);
        return buf;
    }
    char *buf = run_align_raw(read, read_len, ref, ref_len, out6);
    /* replace the slot with the fresh result */
    int8_t *rcopy = (int8_t *)malloc((size_t)(read_len > 0 ? read_len : 1));
    int8_t *ccopy = (int8_t *)malloc((size_t)(ref_len > 0 ? ref_len : 1));
    char *gcopy = buf ? (char *)malloc(strlen(buf) + 1) : NULL;
    if (!rcopy || !ccopy || (buf && !gcopy)) {
        free(rcopy); free(ccopy); free(gcopy);
        return buf;
    }
    memcpy(rcopy, read, (size_t)read_len);
    memcpy(ccopy, ref, (size_t)ref_len);
    if (buf) strcpy(gcopy, buf);
    free(e->read); free(e->ref); free(e->cigar);
    e->hash = h;
    e->R = (i32)read_len;
    e->C = (i32)ref_len;
    e->rc = buf ? 0 : -1;
    e->read = rcopy;
    e->ref = ccopy;
    e->cigar = gcopy;
    memcpy(e->out6, out6, sizeof(e->out6));
    return buf;
}

/* ------------------------------------------------------------------ */
/* mostFrequentMotif (parse_seed.cpp:259-315): m <= 10 window hashing */
/* ------------------------------------------------------------------ */

static uint64_t most_frequent_motif(const RefineCtx *x, i64 seed_start,
                                    i64 ssl, i64 m) {
    uint64_t mask = (1ULL << (2 * m)) - 1;
    i64 seed_end = seed_start + ssl;
    if (seed_end > x->L - 1) seed_end = x->L - 1;
    uint64_t window = 0;
    i64 max_freq = 0;
    uint64_t maxfreq_motif = 0;
    double guard = 0.9 * (double)m - 1;
    BktMap counts;
    bm_init(&counts, 64);
    for (i64 j = seed_start; j < seed_end; j++) {
        window = ((window << 2) | (uint64_t)x->code[j]) & mask;
        if ((double)(j - seed_start) >= guard) {
            i64 *slot = bm_slot(&counts, (i64)window);
            i64 cnt = slot ? *slot + 1 : 1;
            if (counts.n * 2 + 2 >= counts.cap) {
                /* grow: rebuild */
                BktMap nm2;
                bm_init(&nm2, counts.cap);
                for (i64 t = 0; t < counts.cap; t++)
                    if (counts.keys[t] != -1)
                        bm_put(&nm2, counts.keys[t], counts.vals[t]);
                bm_free(&counts);
                counts = nm2;
            }
            bm_put(&counts, (i64)window, cnt);
            if (cnt > max_freq) {
                max_freq = cnt;
                maxfreq_motif = window;
            }
        }
    }
    bm_free(&counts);
    return maxfreq_motif;
}

/* ------------------------------------------------------------------ */
/* possibleMotifs (parse_smallmotif_seed.cpp:76-188)                  */
/* ------------------------------------------------------------------ */

typedef struct {
    i64 *motifs, *starts, *ends;
    i64 n, cap;
} MotifCands;

static void mc_push(MotifCands *mc, i64 motif, i64 s, i64 e) {
    if (mc->n == mc->cap) {
        mc->cap = mc->cap ? mc->cap * 2 : 16;
        mc->motifs = (i64 *)realloc(mc->motifs, (size_t)mc->cap * sizeof(i64));
        mc->starts = (i64 *)realloc(mc->starts, (size_t)mc->cap * sizeof(i64));
        mc->ends = (i64 *)realloc(mc->ends, (size_t)mc->cap * sizeof(i64));
    }
    mc->motifs[mc->n] = motif;
    mc->starts[mc->n] = s;
    mc->ends[mc->n] = e;
    mc->n++;
}

typedef struct {
    i64 new_motif_start, m_start, m_end, m_units, m_gaps, m_gapsize;
    uint64_t m_next;
    i64 key;
} ClassState;

static MotifCands possible_motifs(const RefineCtx *x, i64 seed_start,
                                  i64 ssl, i64 m) {
    uint64_t mask = (1ULL << (2 * m)) - 1;
    i64 seed_end = seed_start + ssl;
    if (seed_end > x->L - 1) seed_end = x->L - 1;

    MotifCands mc = {NULL, NULL, NULL, 0, 0};
    i64 min_len = min_length_of(x, m);
    i64 perf_units = perfect_units_of(x, m);
    double guard = 0.9 * (double)m - 1;
    uint64_t window = 0;

    /* class -> slot in states[]; slots appended in first-seen order */
    BktMap slots;
    bm_init(&slots, 256);
    ClassState *states = NULL;
    i64 nstates = 0, cap_states = 0;

    for (i64 j = seed_start; j < seed_end; j++) {
        window = ((window << 2) | (uint64_t)x->code[j]) & mask;
        i64 motif = (i64)repeat_class(window, (i32)m);
        i64 wstart = j - (m - 1);
        i64 wend = j + 1;

        if ((double)(j - seed_start) >= guard) {
            uint64_t rotated = ((window << 2) | (window >> ((m - 1) * 2))) & mask;
            i64 *slot = bm_slot(&slots, motif);
            if (slot == NULL) {
                if (nstates == cap_states) {
                    cap_states = cap_states ? cap_states * 2 : 64;
                    states = (ClassState *)realloc(
                        states, (size_t)cap_states * sizeof(ClassState));
                }
                ClassState *st = &states[nstates];
                st->key = motif;
                st->new_motif_start = wstart;
                st->m_start = wstart;
                st->m_end = wend;
                st->m_units = 1;
                st->m_gaps = 0;
                st->m_gapsize = 0;
                st->m_next = rotated;
                if (slots.n * 2 + 2 >= slots.cap) {
                    BktMap nm2;
                    bm_init(&nm2, slots.cap);
                    for (i64 t = 0; t < slots.cap; t++)
                        if (slots.keys[t] != -1)
                            bm_put(&nm2, slots.keys[t], slots.vals[t]);
                    bm_free(&slots);
                    slots = nm2;
                }
                bm_put(&slots, motif, nstates);
                nstates++;
            } else {
                ClassState *st = &states[*slot];
                if (wstart - st->m_end > 3 * m) {
                    if (st->m_end - st->m_start >= min_len &&
                        st->m_units >= perf_units)
                        mc_push(&mc, motif, st->m_start, st->m_end);
                    st->m_start = wstart;
                    st->m_end = wend;
                    st->m_units = 1;
                    st->m_gaps = 0;
                    st->m_gapsize = 0;
                    st->m_next = rotated;
                    st->new_motif_start = wstart;
                } else {
                    if (st->m_end < j) {
                        i64 gap = j - st->m_end;
                        if (gap < m) {
                            st->m_gaps += 1;
                            st->m_gapsize += 1;
                        } else if (gap % m > 0) {
                            st->m_gaps += gap / m + 1;
                            st->m_gapsize += gap + 1;
                        } else {
                            st->m_gaps += gap / m;
                            st->m_gapsize += gap;
                        }
                    } else if (st->m_end == j && st->m_next != window) {
                        st->m_gaps += 1;
                        st->m_gapsize += 1;
                    }
                    if (wstart - st->new_motif_start >= m) {
                        st->new_motif_start = wstart;
                        st->m_units += 1;
                    }
                    st->m_end = wend;
                    st->m_next = rotated;
                }
            }
        }
    }

    /* leftovers in libstdc++ unordered_map iteration order
     * (parse_smallmotif_seed.cpp:177-187) */
    if (nstates > 0) {
        i64 *keys = (i64 *)malloc((size_t)nstates * sizeof(i64));
        i64 *order = (i64 *)malloc((size_t)nstates * sizeof(i64));
        for (i64 t = 0; t < nstates; t++) keys[t] = states[t].key;
        libstdcxx_order(keys, nstates, order);
        for (i64 t = 0; t < nstates; t++) {
            i64 *slot = bm_slot(&slots, order[t]);
            ClassState *st = &states[*slot];
            if (st->m_end - st->m_start >= min_len && st->m_units >= perf_units)
                mc_push(&mc, st->key, st->m_start, st->m_end);
        }
        free(keys);
        free(order);
    }
    bm_free(&slots);
    free(states);
    return mc;
}

/* calculateMotifUnits (parse_smallmotif_seed.cpp:26-72) */
static i64 calculate_motif_units(const RefineCtx *x, i64 start, i64 length,
                                 i64 m, uint64_t motif_unit) {
    uint64_t mask = (1ULL << (2 * m)) - 1;
    i64 seed_end = start + length;
    if (seed_end > x->L - 1) seed_end = x->L - 1;
    uint64_t window = 0;
    double guard = 0.9 * (double)m - 1;

    BktMap pos_map, units_map;
    bm_init(&pos_map, 64);
    bm_init(&units_map, 64);
    for (i64 j = start; j < seed_end; j++) {
        window = ((window << 2) | (uint64_t)x->code[j]) & mask;
        if ((double)(j - start) >= guard) {
            i64 motif = (i64)repeat_class(window, (i32)m);
            i64 *p = bm_slot(&pos_map, motif);
            if (p == NULL) {
                if (pos_map.n * 2 + 2 >= pos_map.cap) {
                    BktMap nm2;
                    bm_init(&nm2, pos_map.cap);
                    for (i64 t = 0; t < pos_map.cap; t++)
                        if (pos_map.keys[t] != -1)
                            bm_put(&nm2, pos_map.keys[t], pos_map.vals[t]);
                    bm_free(&pos_map);
                    pos_map = nm2;
                }
                if (units_map.n * 2 + 2 >= units_map.cap) {
                    BktMap nm2;
                    bm_init(&nm2, units_map.cap);
                    for (i64 t = 0; t < units_map.cap; t++)
                        if (units_map.keys[t] != -1)
                            bm_put(&nm2, units_map.keys[t], units_map.vals[t]);
                    bm_free(&units_map);
                    units_map = nm2;
                }
                bm_put(&pos_map, motif, j - (m - 1));
                bm_put(&units_map, motif, 1);
            } else {
                if ((j - (m - 1)) - *p >= m) {
                    *p = j - (m - 1);
                    i64 *u = bm_slot(&units_map, motif);
                    *u += 1;
                }
            }
        }
    }
    i64 *u = bm_slot(&units_map, (i64)motif_unit);
    i64 result = u ? *u : 0;
    bm_free(&pos_map);
    bm_free(&units_map);
    return result;
}

/* ------------------------------------------------------------------ */
/* processSeed (parse_seed.cpp:318-464)                               */
/* ------------------------------------------------------------------ */

static void process_seed(RefineCtx *x, i64 seed_start, i64 seed_end,
                         i64 motif_length, i64 seed_type, i32 midx) {
    i64 ssl = n_trimmed_length(x, seed_start, seed_end, motif_length);

    if ((double)(seed_end - seed_start) < 0.9 * (double)motif_length) return;
    RPROF_T0(tg0);
    int gate = ribbit_core_overlay_run3(x->core, midx, seed_start, seed_end);
    RPROF_ADD(RP_GATE, tg0);
    if (!gate) return;
    RPROF_N(RP_GPASS, 1);
    RPROF_N(RP_LARGE, 1);

    i64 ppr_len = ppr_length_of(ssl, motif_length);
    /* motif_length is bounded only by the user's -M flag (the reference
     * accepts any value, ribbit.cpp:86), so the motif buffers are sized
     * from it rather than fixed on the stack */
    int8_t *motif_bases = (int8_t *)xmalloc((size_t)(2 * (motif_length + 1)));
    char *motif_str = (char *)(motif_bases + motif_length + 1);
    i64 atomicity;
    if (motif_length <= 10) {
        uint64_t unit = most_frequent_motif(x, seed_start, ssl, motif_length);
        atomicity = atomicity_int(unit, (i32)motif_length);
        motif_int_to_bases(unit, (i32)motif_length, motif_bases);
    } else {
        RPROF_T0(tv0);
        i32 mm = vote_longer_memo(x, seed_start, ssl, motif_length);
        RPROF_ADD(RP_VOTE, tv0);
        for (i64 i = 0; i < motif_length; i++) {
            i64 p = mm + i;
            motif_bases[i] = (p < x->L) ? x->code[p] : 0;
        }
        /* QUIRK: the reference packs the motif into a uint256_t
         * (parse_seed.cpp:246-253); for m > 128 the leading m-128 bases
         * overflow out and read back as 'A' (zero).  With the leading
         * bases zeroed, plain base-array periodicity is arithmetically
         * identical to calculateAtomicityLongMotif on the truncated
         * value (both the f <= m-128 all-ones-mask case and f > m-128). */
        for (i64 i = 0; i < motif_length - 128; i++) motif_bases[i] = 0;
        atomicity = atomicity_bases(motif_bases, (i32)motif_length, 0);
    }

    if (motif_length % atomicity != 0) { free(motif_bases); return; }

    for (i64 i = 0; i < atomicity; i++)
        motif_str[i] = BASE_CHARS[motif_bases[i]];
    motif_str[atomicity] = 0;

    /* align seed sequence (clipped at L, python slicing) vs pseudo-perfect */
    i64 read_len = ssl;
    if (seed_start + read_len > x->L) read_len = x->L - seed_start;
    int8_t *ppr = build_ppr(motif_bases, atomicity, ppr_len);
    i32 out6[6];
    RPROF_T0(ta0);
    char *cigar = run_align(x->translated + seed_start, read_len, ppr,
                            ppr_len, out6);
    RPROF_ADD(RP_ALIGN, ta0);
    RPROF_N(RP_NALIGN, 1);
    RPROF_N(RP_CELLS, read_len * ppr_len);
    free(ppr);
    if (cigar == NULL) { free(motif_bases); return; }
    if (cigar[0] == 0) { free(cigar); free(motif_bases); return; }

    RPROF_T0(tcg0);
    CigarResult cr = process_cigar_with_pruning(
        seed_start, ssl, cigar, atomicity, x->minimum_length, x->tbl_size);
    RPROF_ADD(RP_CIGAR, tcg0);
    free(cigar);

    i64 repeat_start = cr.repeat_start, repeat_end = cr.repeat_end;
    i64 loci_first = repeat_start, loci_second = repeat_end - atomicity;

    if (cr.alignment_length >= min_length_of(x, atomicity)) {
        i64 repeat_length = repeat_end - repeat_start;
        if (repeat_length >= min_length_of(x, motif_length)) {
            emit_line(x, repeat_start, repeat_end, motif_str, atomicity,
                      motif_length, repeat_length, repeat_length / atomicity,
                      cr.purity, seed_type, cr.cigar);
        }
    }
    free(cr.cigar);
    free(motif_bases);

    /* recursion into uncovered flanks (parse_seed.cpp:444-463) */
    i64 flank_start = seed_start;
    {
        i64 first = loci_first, second = loci_second;
        if (flank_start >= first) {
            flank_start = second;
        } else {
            if (first - flank_start >= min_length_of(x, motif_length)) {
                if (flank_start < seed_start) flank_start = seed_start;
                if (first > seed_end) first = seed_end;
                if (!(flank_start == seed_start && first == seed_end))
                    process_seed(x, flank_start, first, motif_length,
                                 seed_type, midx);
            }
            flank_start = second;
        }
    }
    if (seed_end - flank_start >= min_length_of(x, motif_length)) {
        if (flank_start < seed_start) flank_start = seed_start;
        if (flank_start != seed_start)
            process_seed(x, flank_start, seed_end, motif_length, seed_type,
                         midx);
    }
}

/* ------------------------------------------------------------------ */
/* processSeedMotifWise (parse_smallmotif_seed.cpp:190-288)           */
/* ------------------------------------------------------------------ */

static void process_seed_motifwise(RefineCtx *x, i64 seed_start, i64 seed_end,
                                   i64 motif_length, i64 seed_type, i32 midx) {
    i64 ssl = n_trimmed_length(x, seed_start, seed_end, motif_length);
    RPROF_T0(tg0);
    int gate = ribbit_core_overlay_run3(x->core, midx, seed_start, seed_end);
    RPROF_ADD(RP_GATE, tg0);
    if (!gate) return;
    RPROF_N(RP_GPASS, 1);
    RPROF_N(RP_SMALL, 1);

    RPROF_T0(tp0);
    MotifCands mc = possible_motifs(x, seed_start, ssl, motif_length);
    RPROF_ADD(RP_PM, tp0);
    if (mc.n == 0) {
        free(mc.motifs); free(mc.starts); free(mc.ends);
        return;
    }

    for (i64 idx = 0; idx < mc.n; idx++) {
        uint64_t motif_unit = (uint64_t)mc.motifs[idx];
        i64 atomicity = atomicity_int(motif_unit, (i32)motif_length);
        int8_t motif_bases[64];
        motif_int_to_bases(motif_unit, (i32)motif_length, motif_bases);
        char motif_str[64];
        for (i64 i = 0; i < atomicity; i++)
            motif_str[i] = BASE_CHARS[motif_bases[i]];
        motif_str[atomicity] = 0;
        motif_unit >>= 2 * (motif_length - atomicity);

        i64 ms = mc.starts[idx], me = mc.ends[idx];
        i64 msl = me - ms;
        i64 read_len = msl;
        if (ms + read_len > x->L) read_len = x->L - ms;

        i64 ppr_len = ppr_length_of(msl, motif_length);
        int8_t *ppr = build_ppr(motif_bases, atomicity, ppr_len);
        i32 out6[6];
        RPROF_T0(ta0);
        char *cigar = run_align(x->translated + ms, read_len, ppr, ppr_len,
                                out6);
        RPROF_ADD(RP_ALIGN, ta0);
        RPROF_N(RP_NALIGN, 1);
        RPROF_N(RP_CELLS, read_len * ppr_len);
        free(ppr);
        if (cigar == NULL) continue;
        if (cigar[0] == 0) { free(cigar); continue; }

        RPROF_T0(tcg0);
        CigarResult cr = process_cigar_motifwise(ms, msl, cigar, atomicity);
        RPROF_ADD(RP_CIGAR, tcg0);
        free(cigar);
        i64 repeat_length = cr.repeat_end - cr.repeat_start;
        i64 match_units = calculate_motif_units(x, cr.repeat_start,
                                                repeat_length, atomicity,
                                                motif_unit);
        if (match_units >= perfect_units_of(x, atomicity) &&
            repeat_length >= min_length_of(x, atomicity)) {
            emit_line(x, cr.repeat_start, cr.repeat_end, motif_str, atomicity,
                      motif_length, repeat_length, repeat_length / atomicity,
                      cr.purity, seed_type, cr.cigar);
        }
        free(cr.cigar);
    }
    free(mc.motifs); free(mc.starts); free(mc.ends);
}

/* ------------------------------------------------------------------ */
/* public API                                                         */
/* ------------------------------------------------------------------ */

/* Refine a merged seed stream into BED text.  seeds: int64[nseeds*4]
 * (start, end, mlen, rank).  translated: SSW base translation of the raw
 * sequence chars (A/C/G/T/U -> 0..3, everything else 4).  Returns a
 * malloc'd buffer (caller frees with ribbit_buffer_free); *out_len gets its
 * length. */
static void refine_one(RefineCtx *x, const i64 *seed, i32 min_shift) {
    i64 s = seed[0], e = seed[1], mlen = seed[2], rank = seed[3];
    if (rank == -1) return;
    if ((double)(e - s) >= 0.9 * (double)mlen) {
        i32 midx = (i32)(mlen - min_shift);
        if (mlen <= 10)
            process_seed_motifwise(x, s, e, mlen, rank, midx);
        else
            process_seed(x, s, e, mlen, rank, midx);
    }
}

#include <pthread.h>
#include <unistd.h>

/* Seeds are refined in blocks: workers fill one StrBuf per seed of the
 * current block, the block is concatenated in seed order and its buffers
 * freed before the next block starts.  Peak extra memory is one block of
 * buffers (vs one StrBuf per seed for the whole genome: ~390 MB of array
 * alone at 16M seeds), output stays byte-identical to the sequential
 * order. */
#define REFINE_BLOCK ((i64)1 << 16)

typedef struct {
    RefineCtx proto;            /* shared read-only fields */
    const i64 *seeds;
    i64 blk_lo, blk_hi;         /* current block [lo, hi) */
    StrBuf *bufs;               /* REFINE_BLOCK entries, reused per block */
    i64 next;                   /* atomic work cursor within the block */
} RefinePool;

static void *refine_worker(void *arg) {
    RefinePool *p = (RefinePool *)arg;
    for (;;) {
        i64 k = __atomic_fetch_add(&p->next, 1, __ATOMIC_RELAXED);
        if (k >= p->blk_hi) break;
        RefineCtx x = p->proto;       /* per-task ctx; out -> seed's buffer */
        x.out = &p->bufs[k - p->blk_lo];
        refine_one(&x, p->seeds + 4 * k, x.min_shift);
    }
    amemo_free();
    vcmemo_free();
    rprof_flush();
    return NULL;
}

static void rprof_report(void) {
    if (!rprof_on()) return;
    fprintf(stderr, "[refine] prof small=%lld large=%lld gpass=%lld "
            "naln=%lld cells=%.2fG gate=%.2fGc pm=%.2fGc vote=%.2fGc "
            "align=%.2fGc cigar=%.2fGc\n",
            (long long)g_rprof[RP_SMALL], (long long)g_rprof[RP_LARGE],
            (long long)g_rprof[RP_GPASS], (long long)g_rprof[RP_NALIGN],
            g_rprof[RP_CELLS] / 1e9, g_rprof[RP_GATE] / 1e9,
            g_rprof[RP_PM] / 1e9, g_rprof[RP_VOTE] / 1e9,
            g_rprof[RP_ALIGN] / 1e9, g_rprof[RP_CIGAR] / 1e9);
    fprintf(stderr, "[refine] prof align: fwd=%.2fGc rev=%.2fGc "
            "band=%.2fGc bandcells=%.2fG memo_hit=%lld memo_cells=%.2fG "
            "revskip=%lld/%lld vote_hit=%lld/%lld\n",
            g_aprof[0] / 1e9, g_aprof[1] / 1e9, g_aprof[2] / 1e9,
            g_aprof[3] / 1e9, (long long)g_rprof[RP_MHIT],
            g_rprof[RP_MCELLS] / 1e9,
            (long long)g_aprof[4], (long long)g_aprof[5],
            (long long)g_rprof[RP_VHIT], (long long)g_rprof[RP_NVOTE]);
}

/* Refine a merged seed stream into BED text.  seeds: int64[nseeds*4]
 * (start, end, mlen, rank).  translated: SSW base translation of the raw
 * sequence chars (A/C/G/T/U -> 0..3, everything else 4).  Per-seed
 * refinement is independent (read-only shared state), so seeds fan out over
 * a thread pool; per-seed output buffers are concatenated in seed order so
 * the BED text is byte-identical to the sequential run.  Returns a malloc'd
 * buffer (caller frees with ribbit_buffer_free); *out_len gets its length. */
/* shared entry preamble for both refinement entry points: malloc tuning
 * (per-seed workspaces frequently exceed glibc's default 128 KB mmap
 * threshold; with a thread pool that means an mmap/munmap pair + TLB
 * shootdown per seed), canonicalizer tables, and the env gates resolved on
 * the calling thread before workers exist (TSan-clean: pthread_create
 * orders these writes before any worker read). */
static void refine_entry_init(void) {
    static int malloc_tuned = 0;
    if (!malloc_tuned) {
        mallopt(M_MMAP_THRESHOLD, 64 << 20);
        mallopt(M_TRIM_THRESHOLD, 64 << 20);
        malloc_tuned = 1;
    }
    pthread_once(&rc_once, rc_build_tables);
    ribbit_align_prof_on = rprof_on();
    ribbit_align_dump_on = getenv("RIBBIT_ALIGN_DUMP") != NULL;
    amemo_resolve();
    vcmemo_resolve();
    if (!g_vdump) {
        const char *vd = getenv("RIBBIT_VOTE_DUMP");
        if (vd) g_vdump = fopen(vd, "a");
        /* line-buffered so an abnormal exit loses at most one record;
         * single-process usage assumed (concurrent appenders could still
         * interleave lines, but each line flushes whole) */
        if (g_vdump) setvbuf(g_vdump, NULL, _IOLBF, 0);
    }
}

static i64 resolve_nthreads(i32 req_threads) {
    i64 nthreads = req_threads;
    if (nthreads <= 0) {
        const char *env = getenv("RIBBIT_THREADS");
        if (env) nthreads = atoll(env);
        else nthreads = (i64)sysconf(_SC_NPROCESSORS_ONLN);
    }
    return nthreads < 1 ? 1 : nthreads;
}

char *ribbit_refine_run(RibbitCore *core, const int8_t *code,
                        const uint8_t *nmask, const int8_t *translated,
                        i64 L, i32 min_motif, i32 max_motif, i32 min_shift,
                        const i64 *min_length_tbl, const i64 *perfect_units_tbl,
                        i64 tbl_size, const char *seq_id,
                        const i64 *seeds, i64 nseeds, i32 req_threads,
                        i64 *out_len) {
    refine_entry_init();

    RefinePool pool;
    pool.proto.core = core;
    pool.proto.code = code;
    pool.proto.nmask = nmask;
    pool.proto.translated = translated;
    pool.proto.L = L;
    pool.proto.min_motif = min_motif;
    pool.proto.max_motif = max_motif;
    pool.proto.min_shift = min_shift;
    pool.proto.minimum_length = min_length_tbl;
    pool.proto.perfect_units = perfect_units_tbl;
    pool.proto.tbl_size = tbl_size;
    pool.proto.seq_id = seq_id;
    pool.proto.seq_id_len = (i64)strlen(seq_id);
    pool.proto.out = NULL;
    pool.seeds = seeds;

    i64 nthreads = resolve_nthreads(req_threads);
    if (nthreads > nseeds) nthreads = nseeds > 0 ? nseeds : 1;

    if (nthreads == 1) {
        RefineCtx x = pool.proto;
        StrBuf out = {NULL, 0, 0};
        x.out = &out;
        for (i64 k = 0; k < nseeds; k++)
            refine_one(&x, seeds + 4 * k, min_shift);
        amemo_free();
        vcmemo_free();
        rprof_flush();
        rprof_report();
        if (out.d == NULL) { out.d = (char *)calloc(1, 1); out.n = 0; }
        *out_len = out.n;
        return out.d;
    }

    pool.bufs = (StrBuf *)calloc((size_t)REFINE_BLOCK, sizeof(StrBuf));
    pthread_t *tids = (pthread_t *)malloc((size_t)nthreads * sizeof(pthread_t));
    StrBuf out = {NULL, 0, 0};
    for (i64 lo = 0; lo < nseeds; lo += REFINE_BLOCK) {
        i64 hi = lo + REFINE_BLOCK < nseeds ? lo + REFINE_BLOCK : nseeds;
        pool.blk_lo = lo;
        pool.blk_hi = hi;
        pool.next = lo;
        i64 nt = nthreads;
        if (nt > hi - lo) nt = hi - lo;
        for (i64 t = 0; t < nt; t++)
            pthread_create(&tids[t], NULL, refine_worker, &pool);
        for (i64 t = 0; t < nt; t++)
            pthread_join(tids[t], NULL);
        for (i64 k = 0; k < hi - lo; k++) {
            if (pool.bufs[k].n)
                sb_append(&out, pool.bufs[k].d, pool.bufs[k].n);
            free(pool.bufs[k].d);
            pool.bufs[k] = (StrBuf){NULL, 0, 0};
        }
    }
    free(tids);
    free(pool.bufs);
    rprof_report();
    if (out.d == NULL) { out.d = (char *)calloc(1, 1); out.n = 0; }
    *out_len = out.n;
    return out.d;
}

/* ------------------------------------------------------------------ */
/* streaming scan+refine: overlap the serial anchored consume with the */
/* refinement pool (seeds arrive via ribbit_core_scan_stream)          */
/* ------------------------------------------------------------------ */

/* seeds live in fixed-size blocks behind a never-reallocated pointer
 * table (contigs are < 2^31 bp, so < 2^31 seeds: 32768 blocks suffice),
 * so workers can read published seeds without locking */
#define SS_BLK_LOG 16
#define SS_BLK ((i64)1 << SS_BLK_LOG)
#define SS_MAXBLK 32768
#define SS_CHUNK 512                    /* seeds per output chunk */

typedef struct {
    RefineCtx proto;
    i64 **blocks;                       /* SS_MAXBLK pointers */
    i64 appended;                       /* producer-private append count */
    StrBuf **chunk_out;                 /* one StrBuf per claimed chunk */
    i64 chunk_cap;
    pthread_mutex_t mu;
    pthread_cond_t cv;
    i64 published;                      /* seeds visible to workers */
    i64 next_claim;                     /* next chunk index */
    i64 inflight;                       /* chunks being refined right now */
    int eof, abandon, paused;
} SStream;

static inline const i64 *ss_seed(const SStream *ss, i64 k) {
    return ss->blocks[k >> SS_BLK_LOG] + 4 * (k & (SS_BLK - 1));
}

/* producer side: copy the batch in (appends beyond `published` are
 * producer-private), then publish under the lock */
static void ss_push(void *arg, const i64 *seeds4, i64 n) {
    SStream *ss = (SStream *)arg;
    i64 k = ss->appended;
    for (i64 i = 0; i < n; i++, k++) {
        i64 b = k >> SS_BLK_LOG;
        if (!ss->blocks[b])
            ss->blocks[b] = (i64 *)xmalloc((size_t)SS_BLK * 4 * sizeof(i64));
        memcpy(ss->blocks[b] + 4 * (k & (SS_BLK - 1)), seeds4 + 4 * i,
               4 * sizeof(i64));
    }
    ss->appended = k;
    pthread_mutex_lock(&ss->mu);
    ss->published = k;
    pthread_cond_broadcast(&ss->cv);
    pthread_mutex_unlock(&ss->mu);
}

static void *ss_worker(void *arg) {
    SStream *ss = (SStream *)arg;
    for (;;) {
        i64 ci, lo, hi;
        pthread_mutex_lock(&ss->mu);
        for (;;) {
            if (ss->abandon) { pthread_mutex_unlock(&ss->mu); goto out; }
            i64 avail = ss->eof
                ? (ss->published + SS_CHUNK - 1) / SS_CHUNK
                : ss->published / SS_CHUNK;
            if (!ss->paused && ss->next_claim < avail) {
                ci = ss->next_claim++;
                lo = ci * SS_CHUNK;
                hi = lo + SS_CHUNK;
                if (ss->eof && hi > ss->published) hi = ss->published;
                ss->inflight++;
                break;
            }
            if (!ss->paused && ss->eof) {
                pthread_mutex_unlock(&ss->mu);
                goto out;
            }
            pthread_cond_wait(&ss->cv, &ss->mu);
        }
        pthread_mutex_unlock(&ss->mu);

        StrBuf *out = (StrBuf *)xcalloc(1, sizeof(StrBuf));
        RefineCtx x = ss->proto;
        x.out = out;
        for (i64 k = lo; k < hi; k++)
            refine_one(&x, ss_seed(ss, k), x.min_shift);
        pthread_mutex_lock(&ss->mu);
        ss->chunk_out[ci] = out;
        if (--ss->inflight == 0)
            pthread_cond_broadcast(&ss->cv);
        pthread_mutex_unlock(&ss->mu);
    }
out:
    amemo_free();
    vcmemo_free();
    rprof_flush();
    return NULL;
}

/* Run the full scan AND refinement with the anchored consume overlapped by
 * the refinement pool.  Output is byte-identical to
 * ribbit_core_scan + ribbit_refine_run: seeds stream in final-merge order,
 * chunks concatenate in order, and the rare poisoned stream (positional
 * retag quirk crossing the merge cursor) falls back to a from-scratch
 * batch refinement over the authoritative seed list.  *out_nseeds gets the
 * seed count. */
char *ribbit_scan_refine(RibbitCore *core, const int8_t *code,
                         const uint8_t *nmask, const int8_t *translated,
                         i64 L, i32 min_motif, i32 max_motif, i32 min_shift,
                         const i64 *min_length_tbl,
                         const i64 *perfect_units_tbl,
                         i64 tbl_size, const char *seq_id, i32 req_threads,
                         i32 drop_overlay, i64 *out_len, i64 *out_nseeds) {
    refine_entry_init();
    i64 nthreads = resolve_nthreads(req_threads);

    SStream ss;
    memset(&ss, 0, sizeof ss);
    ss.proto.core = core;
    ss.proto.code = code;
    ss.proto.nmask = nmask;
    ss.proto.translated = translated;
    ss.proto.L = L;
    ss.proto.min_motif = min_motif;
    ss.proto.max_motif = max_motif;
    ss.proto.min_shift = min_shift;
    ss.proto.minimum_length = min_length_tbl;
    ss.proto.perfect_units = perfect_units_tbl;
    ss.proto.tbl_size = tbl_size;
    ss.proto.seq_id = seq_id;
    ss.proto.seq_id_len = (i64)strlen(seq_id);
    ss.blocks = (i64 **)xcalloc(SS_MAXBLK, sizeof(i64 *));
    /* full-range chunk table (lazy zero pages; workers store into it while
     * the stream is still growing, so it can never be reallocated) */
    ss.chunk_cap = SS_MAXBLK * (SS_BLK / SS_CHUNK);
    ss.chunk_out = (StrBuf **)xcalloc((size_t)ss.chunk_cap, sizeof(StrBuf *));
    pthread_mutex_init(&ss.mu, NULL);
    pthread_cond_init(&ss.cv, NULL);

    i64 nworkers = nthreads - 1;
    pthread_t *tids = NULL;
    if (nworkers > 0) {
        tids = (pthread_t *)xmalloc((size_t)nworkers * sizeof(pthread_t));
        for (i64 t = 0; t < nworkers; t++)
            pthread_create(&tids[t], NULL, ss_worker, &ss);
    }

    i64 n = ribbit_core_scan_stream(core, ss_push, &ss);
    if (drop_overlay) {
        /* release the ~12.4 B/bp packed overlay before the refine tail
         * (large contigs; same point the two-phase path drops it).  The
         * refine gate falls back to chunked recompute.  Workers may be
         * mid-query, so quiesce first: pause claiming, wait until no
         * chunk is in flight, then free. */
        pthread_mutex_lock(&ss.mu);
        ss.paused = 1;
        while (ss.inflight > 0)
            pthread_cond_wait(&ss.cv, &ss.mu);
        ribbit_core_drop_overlay(core);
        ss.paused = 0;
        pthread_cond_broadcast(&ss.cv);
        pthread_mutex_unlock(&ss.mu);
    }
    int poisoned = n < 0;
    if (poisoned) n = -n - 1;
    if (getenv("RIBBIT_STREAM_DEBUG"))
        fprintf(stderr, "[stream] published=%lld claimed=%lld poisoned=%d\n",
                (long long)ss.published, (long long)ss.next_claim * SS_CHUNK,
                poisoned);
    *out_nseeds = n;

    i64 nchunks = (ss.published + SS_CHUNK - 1) / SS_CHUNK;
    pthread_mutex_lock(&ss.mu);
    ss.eof = 1;
    if (poisoned) ss.abandon = 1;
    pthread_cond_broadcast(&ss.cv);
    pthread_mutex_unlock(&ss.mu);

    if (!poisoned)
        ss_worker(&ss);             /* main thread joins the pool */
    for (i64 t = 0; t < nworkers; t++)
        pthread_join(tids[t], NULL);
    free(tids);

    char *result;
    if (!poisoned) {
        StrBuf out = {NULL, 0, 0};
        for (i64 ci = 0; ci < nchunks; ci++) {
            StrBuf *b = ss.chunk_out[ci];
            if (b) {
                if (b->n) sb_append(&out, b->d, b->n);
                free(b->d);
                free(b);
            }
        }
        rprof_report();
        if (out.d == NULL) { out.d = (char *)calloc(1, 1); out.n = 0; }
        *out_len = out.n;
        result = out.d;
    } else {
        /* discard streamed work; refine the authoritative list */
        for (i64 ci = 0; ci < nchunks; ci++) {
            StrBuf *b = ss.chunk_out[ci];
            if (b) { free(b->d); free(b); }
        }
        i64 *seeds = (i64 *)xmalloc((size_t)(n > 0 ? n : 1) * 4
                                    * sizeof(i64));
        ribbit_core_get_seeds(core, seeds);
        result = ribbit_refine_run(core, code, nmask, translated, L,
                                   min_motif, max_motif, min_shift,
                                   min_length_tbl, perfect_units_tbl,
                                   tbl_size, seq_id, seeds, n, req_threads,
                                   out_len);
        free(seeds);
    }
    for (i64 b = 0; b < SS_MAXBLK; b++) free(ss.blocks[b]);
    free(ss.blocks);
    free(ss.chunk_out);
    pthread_mutex_destroy(&ss.mu);
    pthread_cond_destroy(&ss.cv);
    return result;
}

void ribbit_buffer_free(char *p) { free(p); }

/* test hook: expose the libstdc++ iteration-order simulation */
void ribbit_umap_order(const i64 *keys, i64 n, i64 *out) {
    libstdcxx_order(keys, n, out);
}

/* test hook: drive vote_longer_memo directly so the memo's replay
 * semantics (relative winners, absolute default-0 sentinel) can be
 * regression-tested without needing a pipeline-reachable trigger.
 * Shares this thread's memo across calls, exactly like refinement. */
i32 ribbit_vote_memo_probe(const int8_t *code, const uint8_t *nmask, i64 L,
                           i64 seed_start, i64 ssl, i64 m) {
    vcmemo_resolve();
    RefineCtx x;
    memset(&x, 0, sizeof x);
    x.code = code;
    x.nmask = nmask;
    x.L = L;
    return vote_longer_memo(&x, seed_start, ssl, m);
}
