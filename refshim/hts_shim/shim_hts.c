/* hts_* core for the reference harness build (see shim_kstring.c header
 * note): file open/close with format sniffing, thread-pool stubs (the shim
 * does codec work inline), index/iterator plumbing.
 *
 * Iterators are implemented WITHOUT a real index: the BAM inputs are
 * coordinate-sorted, so region queries are linear scans that skip records
 * before the region and finish past it — semantically identical to htslib's
 * indexed iteration for this workload (reference consumes iterators only in
 * src/IOStream/bam_loader.cpp:118-142).
 */
#include <ctype.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/bgzf.h"
#include "htslib/hts.h"
#include "htslib/thread_pool.h"

BGZF *bgzf_open(const char *path, const char *mode); /* shim_bgzf.c */

static int shim_ends_with(const char *s, const char *suffix)
{
    size_t ls = strlen(s), lx = strlen(suffix);
    return ls >= lx && strcmp(s + ls - lx, suffix) == 0;
}

htsFile *hts_open(const char *fn, const char *mode)
{
    htsFile *fp = (htsFile *)calloc(1, sizeof(htsFile));
    fp->fn = strdup(fn);
    fp->is_bgzf = 1;
    if (strchr(mode, 'r')) {
        fp->fp.bgzf = bgzf_open(fn, "r");
        if (!fp->fp.bgzf) goto fail;
        /* sniff: BGZF payload starting with "BAM\1" => BAM, else text VCF */
        uint8_t magic[4] = {0, 0, 0, 0};
        FILE *probe = fopen(fn, "rb");
        int is_gz = 0;
        if (probe) {
            uint8_t g[2];
            if (fread(g, 1, 2, probe) == 2 && g[0] == 0x1f && g[1] == 0x8b)
                is_gz = 1;
            fclose(probe);
        }
        if (!is_gz) {
            /* plain text input (e.g. uncompressed VCF): reopen passthrough */
            bgzf_close(fp->fp.bgzf);
            fp->fp.bgzf = bgzf_open(fn, "rT");
            fp->fp.bgzf->is_write = 0;
            /* passthrough read: represent as is_compressed=0; bgzf_read in
             * passthrough mode reads the raw file through the block buffer */
            fp->format.format = vcf;
            fp->format.compression = no_compression;
        } else {
            ssize_t n = bgzf_read(fp->fp.bgzf, magic, 4);
            /* rewind by reopening (cheap; open happens once per file) */
            bgzf_close(fp->fp.bgzf);
            fp->fp.bgzf = bgzf_open(fn, "r");
            if (n == 4 && memcmp(magic, "BAM\1", 4) == 0) {
                fp->format.format = bam;
                fp->is_bin = 1;
            } else {
                fp->format.format = vcf;
            }
            fp->format.compression = bgzf;
        }
    } else if (strchr(mode, 'w')) {
        fp->is_write = 1;
        int compressed = strchr(mode, 'z') != NULL;
        if (!compressed && shim_ends_with(fn, ".gz")) compressed = 1;
        if (compressed) {
            char bmode[8] = "w";
            const char *digit = mode;
            while (*digit && (*digit < '0' || *digit > '9')) ++digit;
            if (*digit) {
                bmode[1] = *digit;
                bmode[2] = 0;
            }
            fp->fp.bgzf = bgzf_open(fn, bmode);
        } else {
            fp->fp.bgzf = bgzf_open(fn, "wT"); /* raw text passthrough */
        }
        /* always report bgzf so callers write through bgzf_write (the
         * shim handle does passthrough text when uncompressed); the
         * inline hfile.h hwrite path would poke hFILE fields that the
         * shim's union slot does not hold (reference writer.cpp:427) */
        fp->format.compression = bgzf;
        if (!fp->fp.bgzf) goto fail;
        fp->format.format = shim_ends_with(fn, ".bam") ? bam : vcf;
        if (fp->format.format == bam) fp->is_bin = 1;
    } else {
        goto fail;
    }
    return fp;
fail:
    free(fp->fn);
    free(fp);
    return NULL;
}

int hts_close(htsFile *fp)
{
    if (!fp) return -1;
    int ret = 0;
    if (fp->fp.bgzf) ret = bgzf_close(fp->fp.bgzf);
    free(fp->fn);
    free((void *)fp->fnidx);
    free(fp->line.s);
    free(fp);
    return ret;
}

int hts_set_opt(htsFile *fp, enum hts_fmt_option opt, ...)
{
    (void)fp; (void)opt;
    return 0; /* cache sizing / thread pools: inline codec, nothing to set */
}

int hts_set_thread_pool(htsFile *fp, htsThreadPool *p)
{
    (void)fp; (void)p;
    return 0;
}

int hts_set_threads(htsFile *fp, int n)
{
    (void)fp; (void)n;
    return 0;
}

/* ---- thread pool (opaque struct; codec work is done inline) ---- */

struct hts_tpool {
    int nthreads;
};

hts_tpool *hts_tpool_init(int n)
{
    hts_tpool *p = (hts_tpool *)calloc(1, sizeof(hts_tpool));
    p->nthreads = n;
    return p;
}

void hts_tpool_destroy(hts_tpool *p) { free(p); }

int hts_tpool_size(hts_tpool *p) { return p ? p->nthreads : 0; }

/* ---- index stubs ---- */

struct hts_idx_t {
    int fmt;
};

void hts_idx_destroy(hts_idx_t *idx) { free(idx); }

/* name registration for on-the-fly tbi building; indexing is disabled in
 * harness runs, so just return the tid */
int hts_idx_tbi_name(hts_idx_t *idx, int tid, const char *name)
{
    (void)idx; (void)name;
    return tid;
}

/* ---- iterators (linear-scan based) ---- */

void hts_itr_destroy(hts_itr_t *iter)
{
    if (!iter) return;
    if (iter->reg_list) {
        for (int i = 0; i < iter->n_reg; ++i) {
            free((void *)iter->reg_list[i].reg);
            free(iter->reg_list[i].intervals);
        }
        free(iter->reg_list);
    }
    free(iter->off);
    free(iter->bins.a);
    free(iter);
}

/* Parse "chr:beg-end" | "chr:pos" | "chr". Returns malloc'd contig name. */
char *shim_parse_region(const char *reg, hts_pos_t *beg, hts_pos_t *end)
{
    const char *colon = strrchr(reg, ':');
    *beg = 0;
    *end = HTS_POS_MAX;
    if (!colon || !isdigit((unsigned char)colon[1])) {
        return strdup(reg);
    }
    size_t namelen = (size_t)(colon - reg);
    char *name = (char *)malloc(namelen + 1);
    memcpy(name, reg, namelen);
    name[namelen] = 0;
    long long b = 0, e = -1;
    const char *p = colon + 1;
    while (isdigit((unsigned char)*p) || *p == ',') {
        if (*p != ',') b = b * 10 + (*p - '0');
        ++p;
    }
    if (*p == '-') {
        ++p;
        e = 0;
        while (isdigit((unsigned char)*p) || *p == ',') {
            if (*p != ',') e = e * 10 + (*p - '0');
            ++p;
        }
    }
    *beg = b > 0 ? b - 1 : 0; /* 1-based inclusive -> 0-based half-open */
    *end = e >= 0 ? e : (b > 0 ? b : HTS_POS_MAX);
    return name;
}

/* ---- logging + hFILE inline-support symbols ---- */

#include <stdarg.h>

int hts_verbose = HTS_LOG_WARNING;

void hts_log(enum htsLogLevel severity, const char *context,
             const char *format, ...)
{
    if ((int)severity > hts_verbose) return;
    va_list ap;
    va_start(ap, format);
    fprintf(stderr, "[hts-shim:%s] ", context ? context : "?");
    vfprintf(stderr, format, ap);
    fputc('\n', stderr);
    va_end(ap);
}

/* hFILE is never used by the shim (all IO goes through BGZF-over-stdio);
 * these exist only to satisfy inline hfile.h helpers that are referenced
 * but unreachable at runtime. */
struct hFILE;
ssize_t hwrite2(struct hFILE *fp, const void *buffer, size_t nbytes,
                size_t n)
{
    (void)fp; (void)buffer; (void)nbytes; (void)n;
    fprintf(stderr, "hts-shim: hwrite2 reached (unsupported path)\n");
    abort();
}

int hfile_set_blksize(struct hFILE *fp, size_t bufsiz)
{
    (void)fp; (void)bufsiz;
    return 0;
}
