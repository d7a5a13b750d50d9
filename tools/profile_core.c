/* Standalone driver for profiling the scan core (gprof/perf friendly —
 * the production .so is dlopen'd via ctypes, which gprof cannot see).
 *
 *   cc -O2 -pg -pthread tools/profile_core.c csrc/ribbit_core.c -o /tmp/profcore -lm
 *   /tmp/profcore /tmp/parity/big20.code /tmp/parity/big20.nmask
 *   gprof /tmp/profcore gmon.out | head -40
 *
 * Inputs are the raw int8 code / uint8 nmask dumps written by
 * tools/evaluate.py (same byte layout as ribbit_tpu.encode.encode).
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

typedef struct RibbitCore RibbitCore;
RibbitCore *ribbit_core_create(const int8_t *code, const uint8_t *nmask,
                               int64_t L, int32_t min_motif, int32_t max_motif);
void ribbit_core_set_threads(RibbitCore *c, int32_t n);
int64_t ribbit_core_scan(RibbitCore *c);
void ribbit_core_get_seeds(RibbitCore *c, int64_t *out);
void ribbit_core_destroy(RibbitCore *c);
char *ribbit_refine_run(RibbitCore *core, const int8_t *code,
                        const uint8_t *nmask, const int8_t *translated,
                        int64_t L, int32_t min_motif, int32_t max_motif,
                        int32_t min_shift, const int64_t *min_length_tbl,
                        const int64_t *perfect_units_tbl, int64_t tbl_size,
                        const char *seq_id, const int64_t *seeds,
                        int64_t nseeds, int32_t req_threads, int64_t *out_len);
void ribbit_buffer_free(char *p);

static void *slurp(const char *path, long *len) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(1); }
    fseek(f, 0, SEEK_END);
    *len = ftell(f);
    fseek(f, 0, SEEK_SET);
    void *buf = malloc((size_t)*len);
    if (fread(buf, 1, (size_t)*len, f) != (size_t)*len) { perror("read"); exit(1); }
    fclose(f);
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s code.bin nmask.bin [threads]\n", argv[0]);
        return 2;
    }
    long L, L2;
    int8_t *code = (int8_t *)slurp(argv[1], &L);
    uint8_t *nmask = (uint8_t *)slurp(argv[2], &L2);
    if (L != L2) { fprintf(stderr, "length mismatch\n"); return 2; }
    RibbitCore *c = ribbit_core_create(code, nmask, L, 2, 100);
    int threads = argc > 3 ? atoi(argv[3]) : 0;
    if (threads) ribbit_core_set_threads(c, threads);
    int64_t n = ribbit_core_scan(c);
    fprintf(stderr, "final seeds: %lld (L=%ld)\n", (long long)n, L);

    /* optional: refinement too (args: trans.bin minlen.bin punits.bin) */
    if (argc > 6) {
        long LT, T1, T2;
        int8_t *trans = (int8_t *)slurp(argv[4], &LT);
        int64_t *minlen = (int64_t *)slurp(argv[5], &T1);
        int64_t *punits = (int64_t *)slurp(argv[6], &T2);
        int64_t *seeds = malloc((size_t)n * 4 * sizeof(int64_t));
        ribbit_core_get_seeds(c, seeds);
        int64_t out_len = 0;
        char *buf = ribbit_refine_run(c, code, nmask, trans, L, 2, 100, 1,
                                      minlen, punits, T1 / 8, "chr",
                                      seeds, n, threads, &out_len);
        fprintf(stderr, "refine out bytes: %lld\n", (long long)out_len);
        ribbit_buffer_free(buf);
        free(seeds); free(trans); free(minlen); free(punits);
    }
    ribbit_core_destroy(c);
    free(code);
    free(nmask);
    return 0;
}
