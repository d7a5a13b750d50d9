/* Native diagonal-voting motif inference for large motifs.
 *
 * Scalar implementation of the exact semantics in
 * ribbit_tpu/refine.py:_most_frequent_longer_motif_scalar (the validated
 * port of the reference's mostFrequentLongerMotif, parse_seed.cpp:153-256):
 * every candidate row start walks downstream then upstream in ~m jumps with
 * ±2 jitter, greedily keeping the jitter with the highest m-length match
 * count (strict '>', x scanned -2..2, all-zero keeps -2), plus a partial
 * prefix vote when the upstream walk overshoots; first row with the strictly
 * highest total wins; all-zero votes leave the index at 0.
 *
 * Returns the winning row index; the caller assembles the 2-bit motif unit
 * (which may exceed 64 bits for m up to 100).  `total_len` guards reads:
 * columns/rows beyond the buffer end the inner scan (the Python spec would
 * raise there; the case is unreachable for well-formed seeds).
 */

#include <stdint.h>

int32_t ribbit_vote_longer(const int8_t *code, const uint8_t *n_mask,
                           int32_t total_len, int32_t seed_start,
                           int32_t seed_sequence_length, int32_t m) {
    int32_t seed_end = seed_start + seed_sequence_length;
    int32_t mmotif_index = 0;
    int64_t max_count = 0;

    for (int32_t row = seed_start; row <= seed_end - m; row++) {
        int64_t row_count = 0;

        int32_t dstream = row + m;
        while (dstream < seed_end) {
            int32_t max_di = -2;
            int64_t max_dc = 0;
            for (int32_t x = -2; x <= 2; x++) {
                int64_t dc = 0;
                for (int32_t i = 0; i < m; i++) {
                    int32_t col = dstream + x + i;
                    if (col >= seed_end || col >= total_len
                        || row + i >= total_len) break;
                    if (!n_mask[col] && code[row + i] == code[col]) dc++;
                }
                if (dc > max_dc) { max_dc = dc; max_di = x; }
            }
            row_count += max_dc;
            dstream += max_di + m;
        }

        int32_t ustream = row - m;
        while (ustream > seed_start) {
            int32_t max_di = -2;
            int64_t max_dc = 0;
            for (int32_t x = -2; x <= 2; x++) {
                int64_t dc = 0;
                for (int32_t i = 0; i < m; i++) {
                    int32_t col = ustream + x + i;
                    if (col < 0) break;
                    if (col >= total_len || row + i >= total_len) break;
                    if (!n_mask[col] && code[row + i] == code[col]) dc++;
                }
                if (dc > max_dc) { max_dc = dc; max_di = x; }
            }
            row_count += max_dc;
            ustream += max_di - m;
        }

        if (ustream < seed_start && seed_start - ustream < m) {
            int32_t initial_lastrow = row + m - 1;
            int32_t pcindex = seed_start + (m + (ustream - seed_start)) - 1;
            int32_t prefix_rows = m + (ustream - seed_start);
            int64_t max_dc = 0;
            for (int32_t x = -2; x <= 2; x++) {
                int64_t dc = 0;
                for (int32_t i = 0; i < prefix_rows; i++) {
                    int32_t col = pcindex + x - i;
                    if (col >= seed_end || col < seed_start) break;
                    int32_t rw = initial_lastrow - i;
                    if (col >= total_len || rw >= total_len) break;
                    if (!n_mask[col] && code[rw] == code[col]) dc++;
                }
                if (dc > max_dc) max_dc = dc;
            }
            row_count += max_dc;
        }

        if (row_count > max_count) {
            max_count = row_count;
            mmotif_index = row;
        }
    }
    return mmotif_index;
}
