/* kstring exported functions for the reference harness build.
 *
 * The harness build (refshim/) links the reference's genuine calling code
 * against this from-scratch implementation of the htslib API subset it
 * uses, because no libhts binary or source exists in this environment.
 * Declarations come from the reference's bundled htslib 1.18 headers
 * (third_lib/htslib/include); all function bodies here are original.
 */
#define _GNU_SOURCE
#include <errno.h>
#include <math.h>
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/kstring.h"

int kvsprintf(kstring_t *s, const char *fmt, va_list ap)
{
    va_list args;
    va_copy(args, ap);
    int need = vsnprintf(NULL, 0, fmt, args);
    va_end(args);
    if (need < 0) return -1;
    if (ks_resize(s, s->l + need + 1) < 0) return -1;
    va_copy(args, ap);
    vsnprintf(s->s + s->l, need + 1, fmt, args);
    va_end(args);
    s->l += need;
    return need;
}

int ksprintf(kstring_t *s, const char *fmt, ...)
{
    va_list ap;
    va_start(ap, fmt);
    int ret = kvsprintf(s, fmt, ap);
    va_end(ap);
    return ret;
}

/* %g-style double formatter (htslib renders VCF floats through this). */
int kputd(double d, kstring_t *s)
{
    size_t before = s->l;
    if (d == 0) {
        if (signbit(d)) return kputs("-0", s) < 0 ? EOF : 2;
        return kputc('0', s) < 0 ? EOF : 1;
    }
    char buf[48];
    int n = snprintf(buf, sizeof buf, "%g", d);
    if (n < 0 || kputsn(buf, (size_t)n, s) < 0) return EOF;
    return (int)(s->l - before);
}

int ksplit_core(char *s, int delimiter, int *_max, int **_offsets)
{
    int n = 0, max = *_max;
    int *offsets = *_offsets;
    size_t i, len = strlen(s);
    int in_field = 0;
    for (i = 0; i <= len; ++i) {
        int is_delim = (i == len) ||
                       (delimiter ? s[i] == delimiter
                                  : (s[i] == ' ' || s[i] == '\t' ||
                                     s[i] == '\n'));
        if (is_delim) {
            if (i < len) s[i] = 0;
            in_field = 0;
        } else if (!in_field) {
            if (n == max) {
                max = max ? max << 1 : 2;
                offsets = realloc(offsets, max * sizeof(int));
            }
            offsets[n++] = (int)i;
            in_field = 1;
        }
    }
    *_max = max;
    *_offsets = offsets;
    return n;
}

char *kstrstr(const char *str, const char *pat, int **_prep)
{
    (void)_prep;
    return strstr((char *)str, pat);
}

char *kstrnstr(const char *str, const char *pat, int n, int **_prep)
{
    (void)_prep;
    size_t plen = strlen(pat);
    if (plen == 0) return (char *)str;
    for (int i = 0; i + (int)plen <= n; ++i) {
        if (memcmp(str + i, pat, plen) == 0) return (char *)(str + i);
    }
    return NULL;
}

void *kmemmem(const void *_str, int n, const void *_pat, int m, int **_prep)
{
    (void)_prep;
    return memmem(_str, (size_t)n, _pat, (size_t)m);
}

char *kstrtok(const char *str, const char *sep_in, ks_tokaux_t *aux)
{
    const char *p, *start;
    const char *sep = sep_in;
    if (sep) {
        aux->finished = 0;
        if (sep[0] && sep[1] == 0) {
            aux->sep = sep[0];
        } else {
            aux->sep = -1;
            aux->tab[0] = aux->tab[1] = aux->tab[2] = aux->tab[3] = 0;
            for (p = sep; *p; ++p)
                aux->tab[(unsigned char)*p >> 6] |=
                    1ull << ((unsigned char)*p & 0x3f);
        }
        start = str;
    } else {
        if (aux->finished) return NULL;
        start = aux->p + 1;
    }
    if (aux->sep < 0) {
        for (p = start; *p; ++p)
            if (aux->tab[(unsigned char)*p >> 6] >>
                    ((unsigned char)*p & 0x3f) & 1)
                break;
    } else {
        for (p = start; *p; ++p)
            if (*p == aux->sep) break;
    }
    aux->p = p;
    if (*p == 0) aux->finished = 1;
    return (char *)start;
}

int kgetline(kstring_t *s, kgets_func *fgets_fn, void *fp)
{
    size_t l0 = s->l;
    char buf[4096];
    while (s->l == l0 || s->s[s->l - 1] != '\n') {
        if (s->m - s->l < 2) {
            if (ks_resize(s, s->m ? s->m << 1 : 4096) < 0) return EOF;
        }
        if (fgets_fn(buf, sizeof buf, fp) == NULL) break;
        kputs(buf, s);
    }
    if (s->l == l0) return EOF;
    if (s->l > l0 && s->s[s->l - 1] == '\n') {
        --s->l;
        s->s[s->l] = 0;
    }
    return 0;
}

int kgetline2(kstring_t *s, kgets_func2 *fgets_fn, void *fp)
{
    size_t l0 = s->l;
    while (s->l == l0 || s->s[s->l - 1] != '\n') {
        if (s->m - s->l < 200) {
            if (ks_resize(s, s->m ? s->m << 1 : 4096) < 0) return EOF;
        }
        ssize_t len = fgets_fn(s->s + s->l, (size_t)(s->m - s->l), fp);
        if (len <= 0) break;
        s->l += (size_t)len;
    }
    if (s->l == l0) return EOF;
    if (s->l > l0 && s->s[s->l - 1] == '\n') {
        --s->l;
        s->s[s->l] = 0;
    }
    return 0;
}
