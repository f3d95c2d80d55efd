/* faidx for the reference harness build (see shim_kstring.c header note).
 * Plain (uncompressed) FASTA + .fai only — all harness inputs are
 * shim-generated plain FASTA.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/faidx.h"

typedef struct {
    char *name;
    int64_t len, offset;
    int line_blen, line_len;
} shim_fai_entry;

struct faidx_t {
    FILE *f;
    int n;
    shim_fai_entry *entries;
};

static shim_fai_entry *shim_fai_find(const faidx_t *fai, const char *name)
{
    for (int i = 0; i < fai->n; ++i)
        if (strcmp(fai->entries[i].name, name) == 0) return &fai->entries[i];
    return NULL;
}

faidx_t *fai_load(const char *fn)
{
    char path[4096];
    snprintf(path, sizeof path, "%s.fai", fn);
    FILE *idx = fopen(path, "r");
    if (!idx) return NULL;
    FILE *f = fopen(fn, "rb");
    if (!f) {
        fclose(idx);
        return NULL;
    }
    faidx_t *fai = (faidx_t *)calloc(1, sizeof(faidx_t));
    fai->f = f;
    char line[4096];
    int cap = 0;
    while (fgets(line, sizeof line, idx)) {
        char name[2048];
        long long len, offset;
        int blen, llen;
        if (sscanf(line, "%2047s %lld %lld %d %d", name, &len, &offset, &blen,
                   &llen) != 5)
            continue;
        if (fai->n == cap) {
            cap = cap ? cap * 2 : 8;
            fai->entries = (shim_fai_entry *)realloc(
                fai->entries, cap * sizeof(shim_fai_entry));
        }
        shim_fai_entry *e = &fai->entries[fai->n++];
        e->name = strdup(name);
        e->len = len;
        e->offset = offset;
        e->line_blen = blen;
        e->line_len = llen;
    }
    fclose(idx);
    return fai;
}

void fai_destroy(faidx_t *fai)
{
    if (!fai) return;
    for (int i = 0; i < fai->n; ++i) free(fai->entries[i].name);
    free(fai->entries);
    fclose(fai->f);
    free(fai);
}

int faidx_nseq(const faidx_t *fai) { return fai->n; }

const char *faidx_iseq(const faidx_t *fai, int i)
{
    return (i >= 0 && i < fai->n) ? fai->entries[i].name : NULL;
}

hts_pos_t faidx_seq_len64(const faidx_t *fai, const char *seq)
{
    shim_fai_entry *e = shim_fai_find(fai, seq);
    return e ? e->len : -1;
}

int faidx_seq_len(const faidx_t *fai, const char *seq)
{
    hts_pos_t l = faidx_seq_len64(fai, seq);
    return l > INT32_MAX ? -1 : (int)l;
}

int faidx_has_seq(const faidx_t *fai, const char *seq)
{
    return shim_fai_find(fai, seq) != NULL;
}

/* fetch [p_beg_i, p_end_i] (0-based inclusive), clamped to the sequence */
char *faidx_fetch_seq64(const faidx_t *fai, const char *c_name,
                        hts_pos_t p_beg_i, hts_pos_t p_end_i, hts_pos_t *len)
{
    shim_fai_entry *e = shim_fai_find(fai, c_name);
    if (!e) {
        *len = -2;
        return NULL;
    }
    if (p_beg_i < 0) p_beg_i = 0;
    if (p_end_i >= e->len) p_end_i = e->len - 1;
    if (p_beg_i > p_end_i) {
        *len = 0;
        char *empty = (char *)malloc(1);
        empty[0] = 0;
        return empty;
    }
    hts_pos_t want = p_end_i - p_beg_i + 1;
    char *out = (char *)malloc(want + 1);
    hts_pos_t got = 0;
    hts_pos_t pos = p_beg_i;
    while (got < want) {
        int64_t line_i = pos / e->line_blen;
        int64_t in_line = pos % e->line_blen;
        int64_t file_off = e->offset + line_i * e->line_len + in_line;
        int64_t chunk = e->line_blen - in_line;
        if (chunk > want - got) chunk = want - got;
        if (fseeko(fai->f, file_off, SEEK_SET) != 0) break;
        size_t r = fread(out + got, 1, (size_t)chunk, fai->f);
        if (r != (size_t)chunk) break;
        got += chunk;
        pos += chunk;
    }
    out[got] = 0;
    *len = got;
    return out;
}

char *faidx_fetch_seq(const faidx_t *fai, const char *c_name, int p_beg_i,
                      int p_end_i, int *len)
{
    hts_pos_t len64 = 0;
    char *out = faidx_fetch_seq64(fai, c_name, p_beg_i, p_end_i, &len64);
    *len = (int)len64;
    return out;
}
