/* VCF header/record model for the reference harness build (see
 * shim_kstring.c header note).
 *
 * Design: reference code builds records exclusively through the bcf_update_*
 * API and renders them with vcf_format (reference:
 * src/haplotypecaller/genotype/utils/adapter_utils.cpp:253-312,
 * genotype.cpp:98-161, block_combiner.cpp:55), so the bcf1_t::d fields are
 * kept canonical here: updates write straight into d.info / d.fmt /
 * d.allele with plainly-typed payloads, and vcf_format renders from d.*.
 * The BCF2 binary wire encoding is never produced (records are never
 * written as binary BCF by the reference).
 */
#include <inttypes.h>
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/bgzf.h"
#include "htslib/hts.h"
#include "htslib/kstring.h"
#include "htslib/vcf.h"

uint32_t bcf_float_missing = 0x7F800001;
uint32_t bcf_float_vector_end = 0x7F800002;

/* ------------------------------------------------------------------ */
/* header                                                              */
/* ------------------------------------------------------------------ */

typedef struct {
    bcf_idpair_t *pairs; /* points into hdr->id[type] */
} shim_dict;

static int shim_dict_find(const bcf_hdr_t *h, int type, const char *key)
{
    for (int i = 0; i < h->n[type]; ++i) {
        if (h->id[type][i].key && strcmp(h->id[type][i].key, key) == 0)
            return i;
    }
    return -1;
}

static int shim_dict_add(bcf_hdr_t *h, int type, const char *key)
{
    int id = shim_dict_find(h, type, key);
    if (id >= 0) return id;
    if (h->n[type] == h->m[type]) {
        h->m[type] = h->m[type] ? h->m[type] * 2 : 16;
        h->id[type] = (bcf_idpair_t *)realloc(
            h->id[type], h->m[type] * sizeof(bcf_idpair_t));
    }
    id = h->n[type]++;
    bcf_idinfo_t *info = (bcf_idinfo_t *)calloc(1, sizeof(bcf_idinfo_t));
    info->id = id;
    info->info[0] = info->info[1] = info->info[2] = 15; /* unset */
    h->id[type][id].key = strdup(key);
    h->id[type][id].val = info;
    return id;
}

bcf_hdr_t *bcf_hdr_init(const char *mode)
{
    bcf_hdr_t *h = (bcf_hdr_t *)calloc(1, sizeof(bcf_hdr_t));
    if (mode && strchr(mode, 'w')) {
        bcf_hdr_append(h, "##fileformat=VCFv4.2");
        bcf_hdr_append(h, "##FILTER=<ID=PASS,Description=\"All filters passed\">");
    }
    return h;
}

void bcf_hdr_destroy(bcf_hdr_t *h)
{
    if (!h) return;
    for (int t = 0; t < 3; ++t) {
        if (!h->id[t]) continue; /* samples live in h->samples only */
        for (int i = 0; i < h->n[t]; ++i) {
            free((void *)h->id[t][i].key);
            free((void *)h->id[t][i].val);
        }
        free(h->id[t]);
    }
    for (int i = 0; i < h->nhrec; ++i) {
        bcf_hrec_t *r = h->hrec[i];
        free(r->key);
        free(r->value);
        for (int k = 0; k < r->nkeys; ++k) {
            free(r->keys[k]);
            free(r->vals[k]);
        }
        free(r->keys);
        free(r->vals);
        free(r);
    }
    free(h->hrec);
    if (h->samples) {
        for (int i = 0; i < h->n[BCF_DT_SAMPLE]; ++i) free(h->samples[i]);
        free(h->samples);
    }
    free(h->mem.s);
    free(h);
}

/* parse '<ID=..,Number=..,Type=..,Description="..">' key/vals */
static bcf_hrec_t *shim_parse_structured(const char *key, const char *body)
{
    bcf_hrec_t *r = (bcf_hrec_t *)calloc(1, sizeof(bcf_hrec_t));
    r->key = strdup(key);
    const char *p = body; /* points after '<' */
    while (*p && *p != '>') {
        const char *eq = strchr(p, '=');
        if (!eq) break;
        size_t klen = (size_t)(eq - p);
        char *k = (char *)malloc(klen + 1);
        memcpy(k, p, klen);
        k[klen] = 0;
        p = eq + 1;
        char *v;
        if (*p == '"') {
            ++p;
            const char *q = p;
            while (*q && *q != '"') {
                if (*q == '\\' && q[1]) ++q;
                ++q;
            }
            v = (char *)malloc((size_t)(q - p) + 1);
            memcpy(v, p, (size_t)(q - p));
            v[q - p] = 0;
            p = *q ? q + 1 : q;
        } else {
            const char *q = p;
            while (*q && *q != ',' && *q != '>') ++q;
            v = (char *)malloc((size_t)(q - p) + 1);
            memcpy(v, p, (size_t)(q - p));
            v[q - p] = 0;
            p = q;
        }
        if (*p == ',') ++p;
        r->nkeys++;
        r->keys = (char **)realloc(r->keys, r->nkeys * sizeof(char *));
        r->vals = (char **)realloc(r->vals, r->nkeys * sizeof(char *));
        r->keys[r->nkeys - 1] = k;
        r->vals[r->nkeys - 1] = v;
    }
    return r;
}

static const char *shim_hrec_get(const bcf_hrec_t *r, const char *key)
{
    for (int i = 0; i < r->nkeys; ++i)
        if (strcmp(r->keys[i], key) == 0) return r->vals[i];
    return NULL;
}

static void shim_append_hrec(bcf_hdr_t *h, bcf_hrec_t *r)
{
    h->nhrec++;
    h->hrec = (bcf_hrec_t **)realloc(h->hrec,
                                     h->nhrec * sizeof(bcf_hrec_t *));
    h->hrec[h->nhrec - 1] = r;
}

static uint64_t shim_pack_typeinfo(const bcf_hrec_t *r, int col_type)
{
    const char *num = shim_hrec_get(r, "Number");
    const char *typ = shim_hrec_get(r, "Type");
    uint32_t number = 0, var = BCF_VL_FIXED, type = BCF_HT_STR & 0xf;
    if (num) {
        if (strcmp(num, "A") == 0) var = BCF_VL_A;
        else if (strcmp(num, "G") == 0) var = BCF_VL_G;
        else if (strcmp(num, "R") == 0) var = BCF_VL_R;
        else if (strcmp(num, ".") == 0) var = BCF_VL_VAR;
        else number = (uint32_t)atoi(num);
    }
    if (typ) {
        if (strcmp(typ, "Integer") == 0) type = BCF_HT_INT;
        else if (strcmp(typ, "Float") == 0) type = BCF_HT_REAL;
        else if (strcmp(typ, "String") == 0) type = BCF_HT_STR;
        else if (strcmp(typ, "Flag") == 0) type = BCF_HT_FLAG;
        else if (strcmp(typ, "Character") == 0) type = BCF_HT_STR;
    }
    return ((uint64_t)number << 12) | ((uint64_t)var << 8) |
           ((uint64_t)type << 4) | (uint64_t)col_type;
}

int bcf_hdr_append(bcf_hdr_t *h, const char *line)
{
    const char *p = line;
    while (*p == '#') ++p;
    const char *eq = strchr(p, '=');
    if (!eq) return -1;
    size_t klen = (size_t)(eq - p);
    char key[64];
    if (klen >= sizeof key) klen = sizeof key - 1;
    memcpy(key, p, klen);
    key[klen] = 0;

    bcf_hrec_t *r;
    if (eq[1] == '<') {
        r = shim_parse_structured(key, eq + 2);
    } else {
        r = (bcf_hrec_t *)calloc(1, sizeof(bcf_hrec_t));
        r->key = strdup(key);
        const char *v = eq + 1;
        size_t vl = strlen(v);
        while (vl && (v[vl - 1] == '\n' || v[vl - 1] == '\r')) --vl;
        r->value = (char *)malloc(vl + 1);
        memcpy(r->value, v, vl);
        r->value[vl] = 0;
    }

    if (strcmp(key, "INFO") == 0) r->type = BCF_HL_INFO;
    else if (strcmp(key, "FORMAT") == 0) r->type = BCF_HL_FMT;
    else if (strcmp(key, "FILTER") == 0) r->type = BCF_HL_FLT;
    else if (strcmp(key, "contig") == 0) r->type = BCF_HL_CTG;
    else if (r->value) r->type = BCF_HL_GEN;
    else r->type = BCF_HL_STR;

    const char *id = r->nkeys ? shim_hrec_get(r, "ID") : NULL;
    if (r->type == BCF_HL_CTG && id) {
        int cid = shim_dict_add(h, BCF_DT_CTG, id);
        bcf_idinfo_t *info = (bcf_idinfo_t *)h->id[BCF_DT_CTG][cid].val;
        const char *len = shim_hrec_get(r, "length");
        info->info[0] = len ? (uint64_t)atoll(len) : 0;
        info->hrec[0] = r;
    } else if ((r->type == BCF_HL_INFO || r->type == BCF_HL_FMT ||
                r->type == BCF_HL_FLT) && id) {
        int did = shim_dict_add(h, BCF_DT_ID, id);
        bcf_idinfo_t *info = (bcf_idinfo_t *)h->id[BCF_DT_ID][did].val;
        int col = r->type == BCF_HL_INFO ? BCF_HL_INFO
                  : r->type == BCF_HL_FMT ? BCF_HL_FMT : BCF_HL_FLT;
        info->info[col] = shim_pack_typeinfo(r, col);
        info->hrec[col] = r;
    }
    shim_append_hrec(h, r);
    h->dirty = 1;
    return 0;
}

void bcf_hdr_remove(bcf_hdr_t *h, int type, const char *key)
{
    for (int i = 0; i < h->nhrec; ++i) {
        bcf_hrec_t *r = h->hrec[i];
        if (r->type != type) continue;
        const char *id = r->nkeys ? shim_hrec_get(r, "ID") : NULL;
        if ((key && id && strcmp(id, key) == 0) ||
            (key && !id && strcmp(r->key, key) == 0) || !key) {
            /* drop the hrec (dict entry stays: ids remain stable) */
            free(r->key);
            free(r->value);
            for (int k = 0; k < r->nkeys; ++k) {
                free(r->keys[k]);
                free(r->vals[k]);
            }
            free(r->keys);
            free(r->vals);
            free(r);
            memmove(&h->hrec[i], &h->hrec[i + 1],
                    (h->nhrec - i - 1) * sizeof(bcf_hrec_t *));
            h->nhrec--;
            if (key) return;
            --i;
        }
    }
}

int bcf_hdr_add_sample(bcf_hdr_t *h, const char *sample)
{
    if (!sample) return 0; /* htslib: NULL finalises sample list */
    int n = h->n[BCF_DT_SAMPLE];
    h->samples = (char **)realloc(h->samples, (n + 1) * sizeof(char *));
    h->samples[n] = strdup(sample);
    h->n[BCF_DT_SAMPLE] = n + 1;
    return 0;
}

int bcf_hdr_sync(bcf_hdr_t *h)
{
    h->dirty = 0;
    return 0;
}

int bcf_hdr_id2int(const bcf_hdr_t *h, int type, const char *id)
{
    return shim_dict_find(h, type, id);
}

const char **bcf_hdr_seqnames(const bcf_hdr_t *h, int *nseqs)
{
    int n = h->n[BCF_DT_CTG];
    const char **names = (const char **)malloc((n ? n : 1) * sizeof(char *));
    for (int i = 0; i < n; ++i) names[i] = h->id[BCF_DT_CTG][i].key;
    *nseqs = n;
    return names;
}

static void shim_render_hrec(const bcf_hrec_t *r, kstring_t *s)
{
    kputs("##", s);
    kputs(r->key, s);
    kputc('=', s);
    if (r->value) {
        kputs(r->value, s);
    } else {
        kputc('<', s);
        for (int i = 0; i < r->nkeys; ++i) {
            if (i) kputc(',', s);
            kputs(r->keys[i], s);
            kputc('=', s);
            /* quote Description/Source/Version like htslib does */
            if (strcmp(r->keys[i], "Description") == 0 ||
                strcmp(r->keys[i], "Source") == 0 ||
                strcmp(r->keys[i], "Version") == 0) {
                kputc('"', s);
                kputs(r->vals[i], s);
                kputc('"', s);
            } else {
                kputs(r->vals[i], s);
            }
        }
        kputc('>', s);
    }
    kputc('\n', s);
}

int bcf_hdr_format(const bcf_hdr_t *h, int is_bcf, kstring_t *str)
{
    (void)is_bcf;
    for (int i = 0; i < h->nhrec; ++i) shim_render_hrec(h->hrec[i], str);
    kputs("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO", str);
    if (h->n[BCF_DT_SAMPLE] > 0) {
        kputs("\tFORMAT", str);
        for (int i = 0; i < h->n[BCF_DT_SAMPLE]; ++i) {
            kputc('\t', str);
            kputs(h->samples[i], str);
        }
    }
    kputc('\n', str);
    return 0;
}

int bcf_hdr_write(htsFile *fp, bcf_hdr_t *h)
{
    kstring_t str = {0, 0, NULL};
    bcf_hdr_format(h, 0, &str);
    ssize_t n = bgzf_write(fp->fp.bgzf, str.s, str.l);
    int ret = (n == (ssize_t)str.l) ? 0 : -1;
    free(str.s);
    h->dirty = 0;
    return ret;
}

/* read a text VCF header (for dbSNP inputs) */
bcf_hdr_t *bcf_hdr_read(htsFile *fp)
{
    bcf_hdr_t *h = bcf_hdr_init("r");
    kstring_t line = {0, 0, NULL};
    for (;;) {
        if (bgzf_getline(fp->fp.bgzf, '\n', &line) < 0) break;
        if (line.l >= 2 && line.s[0] == '#' && line.s[1] == '#') {
            bcf_hdr_append(h, line.s);
        } else if (line.l >= 1 && line.s[0] == '#') {
            /* #CHROM line: collect samples after the 9 fixed columns */
            int col = 0;
            char *save = NULL;
            for (char *tok = strtok_r(line.s, "\t", &save); tok;
                 tok = strtok_r(NULL, "\t", &save)) {
                if (col++ >= 9) bcf_hdr_add_sample(h, tok);
            }
            break;
        } else {
            break; /* malformed: data before #CHROM */
        }
    }
    free(line.s);
    return h;
}

/* ------------------------------------------------------------------ */
/* records                                                             */
/* ------------------------------------------------------------------ */

bcf1_t *bcf_init(void)
{
    bcf1_t *v = (bcf1_t *)calloc(1, sizeof(bcf1_t));
    v->rid = -1;
    v->pos = -1;
    bcf_float_set_missing(v->qual);
    return v;
}

static void shim_clear_payload(bcf1_t *v)
{
    for (int i = 0; i < (int)v->n_info; ++i) {
        if (v->d.info[i].vptr_free) free(v->d.info[i].vptr);
        v->d.info[i].vptr = NULL;
    }
    for (int i = 0; i < (int)v->n_fmt; ++i) {
        if (v->d.fmt[i].p_free) free(v->d.fmt[i].p);
        v->d.fmt[i].p = NULL;
    }
    v->n_info = 0;
    v->n_fmt = 0;
    v->n_allele = 0;
    v->n_sample = 0;
    v->d.n_flt = 0;
    if (v->d.id) v->d.id[0] = 0;
    if (v->d.als) v->d.als[0] = 0;
}

void bcf_clear(bcf1_t *v)
{
    shim_clear_payload(v);
    v->rid = -1;
    v->pos = -1;
    v->rlen = 0;
    bcf_float_set_missing(v->qual);
    v->shared.l = 0;
    v->indiv.l = 0;
    v->unpacked = BCF_UN_ALL; /* d.* is always canonical in the shim */
    v->errcode = 0;
}

void bcf_empty(bcf1_t *v)
{
    shim_clear_payload(v);
    free(v->d.id);
    free(v->d.als);
    free(v->d.allele);
    free(v->d.info);
    free(v->d.fmt);
    free(v->d.flt);
    free(v->shared.s);
    free(v->indiv.s);
    memset(&v->d, 0, sizeof v->d);
}

void bcf_destroy(bcf1_t *v)
{
    if (!v) return;
    bcf_empty(v);
    free(v);
}

int bcf_unpack(bcf1_t *b, int which)
{
    (void)which;
    b->unpacked = BCF_UN_ALL;
    return 0; /* d.* is canonical already */
}

bcf1_t *bcf_dup(bcf1_t *src)
{
    bcf1_t *dst = bcf_init();
    dst->rid = src->rid;
    dst->pos = src->pos;
    dst->rlen = src->rlen;
    dst->qual = src->qual;
    /* duplicate d.* payloads */
    if (src->d.id) bcf_update_id(NULL, dst, src->d.id);
    if (src->n_allele) {
        dst->n_allele = src->n_allele;
        size_t blk = 0;
        for (int i = 0; i < (int)src->n_allele; ++i)
            blk += strlen(src->d.allele[i]) + 1;
        dst->d.als = (char *)malloc(blk);
        dst->d.m_als = (int)blk;
        dst->d.allele = (char **)malloc(src->n_allele * sizeof(char *));
        dst->d.m_allele = src->n_allele;
        char *p = dst->d.als;
        for (int i = 0; i < (int)src->n_allele; ++i) {
            size_t l = strlen(src->d.allele[i]) + 1;
            memcpy(p, src->d.allele[i], l);
            dst->d.allele[i] = p;
            p += l;
        }
    }
    return dst;
}

int bcf_update_id(const bcf_hdr_t *hdr, bcf1_t *line, const char *id)
{
    (void)hdr;
    if (!id) id = ".";
    size_t l = strlen(id);
    if ((int)l + 1 > line->d.m_id) {
        line->d.id = (char *)realloc(line->d.id, l + 1);
        line->d.m_id = (int)(l + 1);
    }
    memcpy(line->d.id, id, l + 1);
    return 0;
}

int bcf_update_alleles(const bcf_hdr_t *hdr, bcf1_t *line,
                       const char **alleles, int nals)
{
    (void)hdr;
    size_t blk = 0;
    for (int i = 0; i < nals; ++i) blk += strlen(alleles[i]) + 1;
    if ((int)blk > line->d.m_als) {
        line->d.als = (char *)realloc(line->d.als, blk);
        line->d.m_als = (int)blk;
    }
    if (nals > line->d.m_allele) {
        line->d.allele =
            (char **)realloc(line->d.allele, nals * sizeof(char *));
        line->d.m_allele = nals;
    }
    char *p = line->d.als;
    for (int i = 0; i < nals; ++i) {
        size_t l = strlen(alleles[i]) + 1;
        memcpy(p, alleles[i], l);
        line->d.allele[i] = p;
        p += l;
    }
    line->n_allele = (uint32_t)nals;
    line->rlen = nals ? (hts_pos_t)strlen(line->d.allele[0]) : 0;
    return 0;
}

int bcf_update_alleles_str(const bcf_hdr_t *hdr, bcf1_t *line,
                           const char *alleles_string)
{
    /* comma-separated */
    char *tmp = strdup(alleles_string);
    const char *als[64];
    int n = 0;
    char *save = NULL;
    for (char *tok = strtok_r(tmp, ",", &save); tok && n < 64;
         tok = strtok_r(NULL, ",", &save))
        als[n++] = tok;
    int ret = bcf_update_alleles(hdr, line, als, n);
    free(tmp);
    return ret;
}

int bcf_update_filter(const bcf_hdr_t *hdr, bcf1_t *line, int *flt_ids, int n)
{
    (void)hdr;
    if (n > line->d.m_flt) {
        line->d.flt = (int *)realloc(line->d.flt, n * sizeof(int));
        line->d.m_flt = n;
    }
    for (int i = 0; i < n; ++i) line->d.flt[i] = flt_ids[i];
    line->d.n_flt = n;
    return 0;
}

static size_t shim_ht_size(int type)
{
    switch (type) {
    case BCF_HT_INT: return sizeof(int32_t);
    case BCF_HT_REAL: return sizeof(float);
    case BCF_HT_STR: return 1;
    default: return 0;
    }
}

static int shim_ht2bt(int type)
{
    switch (type) {
    case BCF_HT_INT: return BCF_BT_INT32;
    case BCF_HT_REAL: return BCF_BT_FLOAT;
    case BCF_HT_STR: return BCF_BT_CHAR;
    default: return BCF_BT_NULL;
    }
}

int bcf_update_info(const bcf_hdr_t *hdr, bcf1_t *line, const char *key,
                    const void *values, int n, int type)
{
    int kid = bcf_hdr_id2int(hdr, BCF_DT_ID, key);
    if (kid < 0) return -1;

    /* find existing entry */
    int idx = -1;
    for (int i = 0; i < (int)line->n_info; ++i) {
        if (line->d.info[i].key == kid) {
            idx = i;
            break;
        }
    }
    if (n == 0 || values == NULL) { /* remove */
        if (idx >= 0) {
            if (line->d.info[idx].vptr_free) free(line->d.info[idx].vptr);
            memmove(&line->d.info[idx], &line->d.info[idx + 1],
                    ((int)line->n_info - idx - 1) * sizeof(bcf_info_t));
            line->n_info--;
        }
        return 0;
    }
    if (idx < 0) {
        if ((int)line->n_info == line->d.m_info) {
            line->d.m_info = line->d.m_info ? line->d.m_info * 2 : 8;
            line->d.info = (bcf_info_t *)realloc(
                line->d.info, line->d.m_info * sizeof(bcf_info_t));
        }
        idx = (int)line->n_info++;
        memset(&line->d.info[idx], 0, sizeof(bcf_info_t));
    } else if (line->d.info[idx].vptr_free) {
        free(line->d.info[idx].vptr);
    }
    bcf_info_t *inf = &line->d.info[idx];
    inf->key = kid;
    inf->type = shim_ht2bt(type);
    inf->len = type == BCF_HT_FLAG ? 1
               : type == BCF_HT_STR ? (int)strlen((const char *)values)
                                    : n;
    size_t bytes = type == BCF_HT_FLAG
                       ? 0
                       : shim_ht_size(type) *
                             (type == BCF_HT_STR ? (size_t)inf->len + 1
                                                 : (size_t)n);
    if (bytes) {
        inf->vptr = (uint8_t *)malloc(bytes);
        memcpy(inf->vptr, values, bytes);
        inf->vptr_free = 1;
    } else {
        inf->vptr = NULL;
        inf->vptr_free = 0;
    }
    inf->vptr_len = (uint32_t)bytes;
    if (inf->len == 1) {
        if (type == BCF_HT_INT) inf->v1.i = *(const int32_t *)values;
        else if (type == BCF_HT_REAL) inf->v1.f = *(const float *)values;
    }
    return 0;
}

static bcf_fmt_t *shim_get_fmt_slot(const bcf_hdr_t *hdr, bcf1_t *line,
                                    const char *key)
{
    int kid = bcf_hdr_id2int(hdr, BCF_DT_ID, key);
    if (kid < 0) return NULL;
    for (int i = 0; i < (int)line->n_fmt; ++i) {
        if (line->d.fmt[i].id == kid) {
            if (line->d.fmt[i].p_free) free(line->d.fmt[i].p);
            line->d.fmt[i].p = NULL;
            return &line->d.fmt[i];
        }
    }
    if ((int)line->n_fmt == line->d.m_fmt) {
        line->d.m_fmt = line->d.m_fmt ? line->d.m_fmt * 2 : 8;
        line->d.fmt = (bcf_fmt_t *)realloc(line->d.fmt,
                                           line->d.m_fmt * sizeof(bcf_fmt_t));
    }
    bcf_fmt_t *f = &line->d.fmt[line->n_fmt++];
    memset(f, 0, sizeof *f);
    f->id = kid;
    return f;
}

int bcf_update_format(const bcf_hdr_t *hdr, bcf1_t *line, const char *key,
                      const void *values, int n, int type)
{
    int nsmpl = bcf_hdr_nsamples(hdr);
    if (nsmpl <= 0) return -1;
    bcf_fmt_t *f = shim_get_fmt_slot(hdr, line, key);
    if (!f) return -1;
    f->n = n / nsmpl;
    f->type = shim_ht2bt(type);
    f->size = (int)(shim_ht_size(type) * (size_t)f->n);
    size_t bytes = shim_ht_size(type) * (size_t)n;
    f->p = (uint8_t *)malloc(bytes ? bytes : 1);
    memcpy(f->p, values, bytes);
    f->p_len = (uint32_t)bytes;
    f->p_free = 1;
    line->n_sample = (uint32_t)nsmpl;
    return 0;
}

int bcf_update_format_string(const bcf_hdr_t *hdr, bcf1_t *line,
                             const char *key, const char **values, int n)
{
    int nsmpl = bcf_hdr_nsamples(hdr);
    if (nsmpl <= 0 || n != nsmpl) return -1;
    size_t width = 0;
    for (int i = 0; i < n; ++i) {
        size_t l = values[i] ? strlen(values[i]) : 1;
        if (l > width) width = l;
    }
    bcf_fmt_t *f = shim_get_fmt_slot(hdr, line, key);
    if (!f) return -1;
    f->n = (int)width;
    f->type = BCF_BT_CHAR;
    f->size = (int)width;
    f->p = (uint8_t *)malloc(width * (size_t)n);
    for (int i = 0; i < n; ++i) {
        const char *v = values[i] ? values[i] : ".";
        size_t l = strlen(v);
        memcpy(f->p + (size_t)i * width, v, l);
        /* pad with vector-end NULs rendered as nothing */
        memset(f->p + (size_t)i * width + l, 0, width - l);
    }
    f->p_len = (uint32_t)(width * (size_t)n);
    f->p_free = 1;
    line->n_sample = (uint32_t)nsmpl;
    return 0;
}

/* ------------------------------------------------------------------ */
/* rendering                                                           */
/* ------------------------------------------------------------------ */

static void shim_render_typed(kstring_t *s, int bt, const uint8_t *p, int len)
{
    if (bt == BCF_BT_CHAR) {
        kputsn((const char *)p, (size_t)len, s);
        return;
    }
    for (int i = 0; i < len; ++i) {
        if (bt == BCF_BT_INT32) {
            int32_t v;
            memcpy(&v, p + 4 * (size_t)i, 4);
            if (v == bcf_int32_vector_end) break;
            if (i) kputc(',', s);
            if (v == bcf_int32_missing) kputc('.', s);
            else kputw(v, s);
        } else { /* float */
            float v;
            memcpy(&v, p + 4 * (size_t)i, 4);
            uint32_t u;
            memcpy(&u, &v, 4);
            if (u == bcf_float_vector_end) break;
            if (i) kputc(',', s);
            if (u == bcf_float_missing) kputc('.', s);
            else kputd(v, s);
        }
    }
}

int vcf_format(const bcf_hdr_t *h, const bcf1_t *v, kstring_t *s)
{
    /* CHROM POS ID REF ALT */
    const char *chrom = (v->rid >= 0 && v->rid < h->n[BCF_DT_CTG])
                            ? h->id[BCF_DT_CTG][v->rid].key
                            : ".";
    kputs(chrom, s);
    kputc('\t', s);
    kputll(v->pos + 1, s);
    kputc('\t', s);
    kputs(v->d.id && v->d.id[0] ? v->d.id : ".", s);
    kputc('\t', s);
    if (v->n_allele == 0) {
        kputs(".\t.", s);
    } else {
        kputs(v->d.allele[0], s);
        kputc('\t', s);
        if (v->n_allele == 1) {
            kputc('.', s);
        } else {
            for (int i = 1; i < (int)v->n_allele; ++i) {
                if (i > 1) kputc(',', s);
                kputs(v->d.allele[i], s);
            }
        }
    }
    /* QUAL */
    kputc('\t', s);
    uint32_t qbits;
    memcpy(&qbits, &v->qual, 4);
    if (qbits == bcf_float_missing || isnan(v->qual)) kputc('.', s);
    else kputd(v->qual, s);
    /* FILTER */
    kputc('\t', s);
    if (v->d.n_flt == 0) {
        kputc('.', s);
    } else {
        for (int i = 0; i < v->d.n_flt; ++i) {
            if (i) kputc(';', s);
            kputs(h->id[BCF_DT_ID][v->d.flt[i]].key, s);
        }
    }
    /* INFO */
    kputc('\t', s);
    if (v->n_info == 0) {
        kputc('.', s);
    } else {
        for (int i = 0; i < (int)v->n_info; ++i) {
            const bcf_info_t *inf = &v->d.info[i];
            if (i) kputc(';', s);
            kputs(h->id[BCF_DT_ID][inf->key].key, s);
            if (inf->type == BCF_BT_NULL) continue; /* FLAG */
            kputc('=', s);
            int render_len = inf->type == BCF_BT_CHAR ? inf->len : inf->len;
            shim_render_typed(s, inf->type, inf->vptr, render_len);
        }
    }
    /* FORMAT + samples */
    if (v->n_fmt > 0 && h->n[BCF_DT_SAMPLE] > 0) {
        kputc('\t', s);
        for (int i = 0; i < (int)v->n_fmt; ++i) {
            if (i) kputc(':', s);
            kputs(h->id[BCF_DT_ID][v->d.fmt[i].id].key, s);
        }
        int gt_id = bcf_hdr_id2int(h, BCF_DT_ID, "GT");
        for (int sm = 0; sm < h->n[BCF_DT_SAMPLE]; ++sm) {
            kputc('\t', s);
            for (int i = 0; i < (int)v->n_fmt; ++i) {
                const bcf_fmt_t *f = &v->d.fmt[i];
                if (i) kputc(':', s);
                const uint8_t *p = f->p + (size_t)sm * (size_t)f->size;
                if (f->id == gt_id && f->type == BCF_BT_INT32) {
                    for (int a = 0; a < f->n; ++a) {
                        int32_t g;
                        memcpy(&g, p + 4 * (size_t)a, 4);
                        if (g == bcf_int32_vector_end) break;
                        if (a) kputc(bcf_gt_is_phased(g) ? '|' : '/', s);
                        if (bcf_gt_is_missing(g)) kputc('.', s);
                        else kputw(bcf_gt_allele(g), s);
                    }
                } else if (f->type == BCF_BT_CHAR) {
                    int len = f->n;
                    while (len > 0 && p[len - 1] == 0) --len;
                    if (len == 0) kputc('.', s);
                    else kputsn((const char *)p, (size_t)len, s);
                } else {
                    shim_render_typed(s, f->type, p, f->n);
                }
            }
        }
    }
    kputc('\n', s);
    return 0;
}

/* ------------------------------------------------------------------ */
/* parsing (dbSNP read path)                                           */
/* ------------------------------------------------------------------ */

int vcf_parse(kstring_t *s, const bcf_hdr_t *h, bcf1_t *v)
{
    bcf_clear(v);
    char *save = NULL;
    char *buf = strdup(s->s);
    int col = 0, ret = 0;
    hts_pos_t pos = 0;
    for (char *tok = strtok_r(buf, "\t", &save); tok && col < 8;
         tok = strtok_r(NULL, "\t", &save), ++col) {
        switch (col) {
        case 0: {
            int rid = bcf_hdr_id2int(h, BCF_DT_CTG, tok);
            if (rid < 0) /* auto-register unseen contig, like htslib */
                rid = shim_dict_add((bcf_hdr_t *)h, BCF_DT_CTG, tok);
            v->rid = rid;
            break;
        }
        case 1:
            pos = (hts_pos_t)atoll(tok);
            v->pos = pos - 1;
            break;
        case 2:
            bcf_update_id(h, v, strcmp(tok, ".") == 0 ? NULL : tok);
            break;
        case 3: { /* REF; ALT arrives next iteration */
            char *alt = strtok_r(NULL, "\t", &save);
            ++col;
            kstring_t als = {0, 0, NULL};
            kputs(tok, &als);
            if (alt && strcmp(alt, ".") != 0) {
                kputc(',', &als);
                kputs(alt, &als);
            }
            bcf_update_alleles_str(h, v, als.s);
            free(als.s);
            break;
        }
        case 5:
            if (strcmp(tok, ".") == 0) bcf_float_set_missing(v->qual);
            else v->qual = (float)atof(tok);
            break;
        default:
            break; /* FILTER/INFO/FORMAT: not needed for dbSNP ID-fill */
        }
    }
    free(buf);
    v->unpacked = BCF_UN_ALL;
    return ret;
}

int bcf_read(htsFile *fp, const bcf_hdr_t *h, bcf1_t *v)
{
    kstring_t *line = &fp->line;
    int ret = bgzf_getline(fp->fp.bgzf, '\n', line);
    if (ret < 0) return ret;
    if (line->l && line->s[0] == '#') return bcf_read(fp, h, v);
    return vcf_parse(line, h, v);
}

/* ------------------------------------------------------------------ */
/* index hooks (output indexing disabled in harness runs)              */
/* ------------------------------------------------------------------ */

int bcf_idx_init(htsFile *fp, bcf_hdr_t *h, int min_shift, const char *fnidx)
{
    (void)fp; (void)h; (void)min_shift; (void)fnidx;
    return 0;
}

int bcf_idx_save(htsFile *fp)
{
    (void)fp;
    return 0;
}
