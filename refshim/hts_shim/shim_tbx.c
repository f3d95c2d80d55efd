/* Tabix read path for the reference harness build (see shim_kstring.c
 * header note) — used only for dbSNP VCF queries
 * (reference: src/IOStream/vcf_loader.cpp:82-148).
 *
 * The .tbi file is parsed for its contig-name table only; iteration is a
 * forward linear scan over the (sorted) VCF with one-record pushback so
 * consecutive per-chromosome queries do not lose the record that
 * terminated the previous scan.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/bgzf.h"
#include "htslib/hts.h"
#include "htslib/kstring.h"
#include "htslib/tbx.h"

typedef struct {
    int n_names;
    char **names;
    /* one-record pushback */
    int has_pending;
    kstring_t pending;
    int pending_tid;
    hts_pos_t pending_beg, pending_end;
} shim_tbx_priv;

BGZF *hts_get_bgzfp(htsFile *fp) { return fp->fp.bgzf; }

const tbx_conf_t tbx_conf_gff = {0, 1, 4, 5, '#', 0};
const tbx_conf_t tbx_conf_bed = {TBX_UCSC, 1, 2, 3, '#', 0};
const tbx_conf_t tbx_conf_psltbl = {TBX_UCSC, 15, 17, 18, '#', 0};
const tbx_conf_t tbx_conf_sam = {TBX_SAM, 3, 4, 0, '@', 0};
const tbx_conf_t tbx_conf_vcf = {TBX_VCF, 1, 2, 0, '#', 0};

static uint32_t rd32(const uint8_t *p)
{
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}

tbx_t *tbx_index_load(const char *fn)
{
    BGZF *bg = bgzf_open(fn, "r");
    if (!bg) return NULL;
    uint8_t head[36];
    if (bgzf_read(bg, head, 36) != 36 || memcmp(head, "TBI\1", 4) != 0) {
        bgzf_close(bg);
        return NULL;
    }
    tbx_t *tbx = (tbx_t *)calloc(1, sizeof(tbx_t));
    int32_t n_ref = (int32_t)rd32(head + 4);
    tbx->conf.preset = (int32_t)rd32(head + 8);
    tbx->conf.sc = (int32_t)rd32(head + 12);
    tbx->conf.bc = (int32_t)rd32(head + 16);
    tbx->conf.ec = (int32_t)rd32(head + 20);
    tbx->conf.meta_char = (int32_t)rd32(head + 24);
    tbx->conf.line_skip = (int32_t)rd32(head + 28);
    uint32_t l_nm = rd32(head + 32);
    char *nm = (char *)malloc(l_nm);
    if (bgzf_read(bg, nm, l_nm) != (ssize_t)l_nm) {
        free(nm);
        free(tbx);
        bgzf_close(bg);
        return NULL;
    }
    bgzf_close(bg); /* bins/intervals unused: linear scan */

    shim_tbx_priv *priv = (shim_tbx_priv *)calloc(1, sizeof(shim_tbx_priv));
    priv->n_names = n_ref;
    priv->names = (char **)calloc(n_ref, sizeof(char *));
    const char *p = nm;
    for (int i = 0; i < n_ref; ++i) {
        priv->names[i] = strdup(p);
        p += strlen(p) + 1;
    }
    free(nm);
    tbx->dict = priv;
    tbx->idx = (hts_idx_t *)calloc(1, 8);
    return tbx;
}

void tbx_destroy(tbx_t *tbx)
{
    if (!tbx) return;
    shim_tbx_priv *priv = (shim_tbx_priv *)tbx->dict;
    if (priv) {
        for (int i = 0; i < priv->n_names; ++i) free(priv->names[i]);
        free(priv->names);
        free(priv->pending.s);
        free(priv);
    }
    free(tbx->idx);
    free(tbx);
}

int tbx_name2id(tbx_t *tbx, const char *ss)
{
    shim_tbx_priv *priv = (shim_tbx_priv *)tbx->dict;
    for (int i = 0; i < priv->n_names; ++i)
        if (strcmp(priv->names[i], ss) == 0) return i;
    return -1;
}

const char **tbx_seqnames(tbx_t *tbx, int *n)
{
    shim_tbx_priv *priv = (shim_tbx_priv *)tbx->dict;
    *n = priv->n_names;
    const char **out =
        (const char **)malloc((priv->n_names ? priv->n_names : 1) *
                              sizeof(char *));
    for (int i = 0; i < priv->n_names; ++i) out[i] = priv->names[i];
    return out;
}

/* parse one data line's (tid, beg, end) using the tabix VCF convention */
static int shim_tbx_parse(tbx_t *tbx, kstring_t *line, int *tid,
                          hts_pos_t *beg, hts_pos_t *end)
{
    /* columns are 1-based in conf */
    int want_seq = tbx->conf.sc ? tbx->conf.sc : 1;
    int want_beg = tbx->conf.bc ? tbx->conf.bc : 2;
    char seq[1024] = "";
    hts_pos_t pos = 0;
    size_t reflen = 1;
    int col = 1;
    const char *p = line->s;
    while (*p) {
        const char *tab = strchr(p, '\t');
        size_t l = tab ? (size_t)(tab - p) : strlen(p);
        if (col == want_seq) {
            size_t c = l < sizeof seq - 1 ? l : sizeof seq - 1;
            memcpy(seq, p, c);
            seq[c] = 0;
        } else if (col == want_beg) {
            pos = (hts_pos_t)atoll(p);
        } else if (col == 4 && (tbx->conf.preset & 0xffff) == TBX_VCF) {
            reflen = l; /* REF column sets the span */
        }
        if (!tab) break;
        p = tab + 1;
        ++col;
        if (col > 4) break;
    }
    *tid = tbx_name2id(tbx, seq);
    *beg = pos - 1;
    *end = pos - 1 + (hts_pos_t)reflen;
    return 0;
}

int tbx_readrec(BGZF *fp, void *tbxv, void *sv, int *tid, hts_pos_t *beg,
                hts_pos_t *end)
{
    tbx_t *tbx = (tbx_t *)tbxv;
    shim_tbx_priv *priv = (shim_tbx_priv *)tbx->dict;
    kstring_t *s = (kstring_t *)sv;
    if (priv->has_pending) {
        s->l = 0;
        kputsn(priv->pending.s, priv->pending.l, s);
        if (ks_resize(s, s->l + 1) == 0) s->s[s->l] = 0;
        *tid = priv->pending_tid;
        *beg = priv->pending_beg;
        *end = priv->pending_end;
        priv->has_pending = 0;
        return (int)s->l;
    }
    for (;;) {
        int ret = bgzf_getline(fp, '\n', s);
        if (ret < 0) return ret;
        if (s->l == 0) continue;
        if (tbx->conf.meta_char && s->s[0] == (char)tbx->conf.meta_char)
            continue;
        shim_tbx_parse(tbx, s, tid, beg, end);
        return (int)s->l;
    }
}

/* stash the record that ran past the current query region */
void shim_tbx_pushback(void *tbxv, kstring_t *s, int tid, hts_pos_t beg,
                       hts_pos_t end)
{
    tbx_t *tbx = (tbx_t *)tbxv;
    shim_tbx_priv *priv = (shim_tbx_priv *)tbx->dict;
    priv->pending.l = 0;
    kputsn(s->s, s->l, &priv->pending);
    if (ks_resize(&priv->pending, priv->pending.l + 1) == 0)
        priv->pending.s[priv->pending.l] = 0;
    priv->pending_tid = tid;
    priv->pending_beg = beg;
    priv->pending_end = end;
    priv->has_pending = 1;
}

/* ---- generic iterator creation used by the tbx macros ---- */

hts_itr_t *hts_itr_query(const hts_idx_t *idx, int tid, hts_pos_t beg,
                         hts_pos_t end, hts_readrec_func *readrec)
{
    (void)idx;
    hts_itr_t *it = (hts_itr_t *)calloc(1, sizeof(hts_itr_t));
    it->tid = tid;
    it->beg = beg;
    it->end = end;
    it->readrec = readrec;
    if (tid < 0) it->finished = 1;
    return it;
}

char *shim_parse_region(const char *reg, hts_pos_t *beg, hts_pos_t *end);

hts_itr_t *hts_itr_querys(const hts_idx_t *idx, const char *reg,
                          hts_name2id_f getid, void *hdr,
                          hts_itr_query_func *itr_query,
                          hts_readrec_func *readrec)
{
    hts_pos_t beg, end;
    char *name = shim_parse_region(reg, &beg, &end);
    int tid = getid(hdr, name);
    free(name);
    return itr_query(idx, tid, beg, end, readrec);
}
