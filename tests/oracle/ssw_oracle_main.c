/* Test-only oracle harness: links against the *reference* ssw.c
 * (read directly from /root/reference at build time, never copied into this
 * repo) to provide ground truth for differential tests of the golden
 * Smith-Waterman model and the TPU kernels.
 *
 * Protocol: one alignment per stdin line:
 *   match mismatch gap_open gap_extend report_cigar score_filter QUERY REF
 * Output line:
 *   score ref_begin ref_end read_begin read_end CIGAR|-
 *
 * The parameter plumbing mirrors how the pipeline invokes the kernel
 * (ssw_cpp.cpp:234-283 / SmithWaterman.h:191-211): 5x5 matrix with zero N
 * row/column, score_size=2 (byte then word), flag = 0x08 (begin) or 0x0f
 * (cigar), distance_filter 32767, maskLen = query length.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include "ssw.h"

static int8_t translate(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    case 'U': case 'u': return 0;
    default: return 4;
  }
}

int main(void) {
  char query[4096], ref[4096];
  int match, mismatch, gapo, gape, want_cigar, score_filter;
  while (scanf("%d %d %d %d %d %d %4095s %4095s", &match, &mismatch, &gapo,
               &gape, &want_cigar, &score_filter, query, ref) == 8) {
    int qlen = (int)strlen(query);
    int rlen = (int)strlen(ref);
    if (strcmp(ref, "-") == 0) rlen = 0;
    int8_t mat[25];
    int id = 0;
    for (int i = 0; i < 4; ++i) {
      for (int j = 0; j < 4; ++j) mat[id++] = (i == j) ? match : -mismatch;
      mat[id++] = 0;
    }
    for (int i = 0; i < 5; ++i) mat[id++] = 0;
    int8_t *q = malloc(qlen), *r = malloc(rlen ? rlen : 1);
    for (int i = 0; i < qlen; ++i) q[i] = translate(query[i]);
    for (int i = 0; i < rlen; ++i) r[i] = translate(ref[i]);
    s_profile *prof = ssw_init(q, qlen, mat, 5, 2);
    uint8_t flag = 0x08;
    if (want_cigar) flag |= 0x0f;
    s_align *al = ssw_align(prof, r, rlen, gapo, gape, flag,
                            (uint16_t)score_filter, 32767, qlen);
    printf("%d %d %d %d %d ", al->score1, al->ref_begin1, al->ref_end1,
           al->read_begin1, al->read_end1);
    if (al->cigarLen > 0) {
      for (int i = 0; i < al->cigarLen; ++i) {
        uint32_t el = al->cigar[i];
        printf("%u%c", el >> 4, "MID"[el & 0xf]);
      }
    } else {
      printf("-");
    }
    printf("\n");
    align_destroy(al);
    init_destroy(prof);
    free(q);
    free(r);
  }
  return 0;
}
