/* BAM reading + bam1_t utilities for the reference harness build (see
 * shim_kstring.c header note). Implements the BAM wire format from the SAM
 * spec §4; struct layouts come from the bundled htslib/sam.h.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/bgzf.h"
#include "htslib/hts.h"
#include "htslib/sam.h"

char *shim_parse_region(const char *reg, hts_pos_t *beg, hts_pos_t *end);

/* nucleotide -> 4-bit code (=ACMGRSVTWYHKDBN) */
const int8_t bam_cigar_table[256] = {
    /* only used via sam_parse_cigar; filled lazily there */
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,  9,
    -1, -1,  8, -1,  2, -1, -1, -1,  5,  1, -1, -1, -1,  0,  3, -1,
     6, -1, -1,  4, -1, -1, -1, -1,  7, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1};

const unsigned char seq_nt16_table[256] = {
    ['='] = 0,  ['A'] = 1,  ['a'] = 1,  ['C'] = 2,  ['c'] = 2,
    ['M'] = 3,  ['m'] = 3,  ['G'] = 4,  ['g'] = 4,  ['R'] = 5,
    ['r'] = 5,  ['S'] = 6,  ['s'] = 6,  ['V'] = 7,  ['v'] = 7,
    ['T'] = 8,  ['t'] = 8,  ['W'] = 9,  ['w'] = 9,  ['Y'] = 10,
    ['y'] = 10, ['H'] = 11, ['h'] = 11, ['K'] = 12, ['k'] = 12,
    ['D'] = 13, ['d'] = 13, ['B'] = 14, ['b'] = 14, ['N'] = 15,
    ['n'] = 15};

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

static uint32_t le32(const uint8_t *p)
{
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
static uint16_t le16(const uint8_t *p)
{
    return (uint16_t)(p[0] | (p[1] << 8));
}

/* ---------------- header ---------------- */

sam_hdr_t *sam_hdr_init(void) { return (sam_hdr_t *)calloc(1, sizeof(sam_hdr_t)); }

sam_hdr_t *sam_hdr_read(samFile *fp)
{
    BGZF *bg = fp->fp.bgzf;
    uint8_t magic[4];
    if (bgzf_read(bg, magic, 4) != 4 || memcmp(magic, "BAM\1", 4) != 0)
        return NULL;
    uint8_t b4[4];
    if (bgzf_read(bg, b4, 4) != 4) return NULL;
    uint32_t l_text = le32(b4);
    sam_hdr_t *h = sam_hdr_init();
    h->l_text = l_text;
    h->text = (char *)malloc(l_text + 1);
    if (bgzf_read(bg, h->text, l_text) != (ssize_t)l_text) return NULL;
    h->text[l_text] = 0;
    if (bgzf_read(bg, b4, 4) != 4) return NULL;
    h->n_targets = (int32_t)le32(b4);
    h->target_name = (char **)calloc(h->n_targets, sizeof(char *));
    h->target_len = (uint32_t *)calloc(h->n_targets, sizeof(uint32_t));
    for (int i = 0; i < h->n_targets; ++i) {
        if (bgzf_read(bg, b4, 4) != 4) return NULL;
        uint32_t l_name = le32(b4);
        h->target_name[i] = (char *)malloc(l_name);
        if (bgzf_read(bg, h->target_name[i], l_name) != (ssize_t)l_name)
            return NULL;
        if (bgzf_read(bg, b4, 4) != 4) return NULL;
        h->target_len[i] = le32(b4);
    }
    return h;
}

void sam_hdr_destroy(sam_hdr_t *h)
{
    if (!h) return;
    for (int i = 0; i < h->n_targets; ++i) free(h->target_name[i]);
    free(h->target_name);
    free(h->target_len);
    free(h->text);
    free(h);
}

int sam_hdr_name2tid(sam_hdr_t *h, const char *ref)
{
    for (int i = 0; i < h->n_targets; ++i)
        if (strcmp(h->target_name[i], ref) == 0) return i;
    return -1;
}

const char *sam_hdr_tid2name(const sam_hdr_t *h, int tid)
{
    return (tid >= 0 && tid < h->n_targets) ? h->target_name[tid] : NULL;
}

hts_pos_t sam_hdr_tid2len(const sam_hdr_t *h, int tid)
{
    return (tid >= 0 && tid < h->n_targets) ? h->target_len[tid] : 0;
}

int sam_hdr_nref(const sam_hdr_t *h) { return h->n_targets; }

sam_hdr_t *sam_hdr_dup(const sam_hdr_t *h0)
{
    sam_hdr_t *h = sam_hdr_init();
    h->n_targets = h0->n_targets;
    h->l_text = h0->l_text;
    h->text = (char *)malloc(h0->l_text + 1);
    memcpy(h->text, h0->text, h0->l_text + 1);
    h->target_name = (char **)calloc(h->n_targets, sizeof(char *));
    h->target_len = (uint32_t *)calloc(h->n_targets, sizeof(uint32_t));
    for (int i = 0; i < h->n_targets; ++i) {
        h->target_name[i] = strdup(h0->target_name[i]);
        h->target_len[i] = h0->target_len[i];
    }
    return h;
}

/* ---------------- records ---------------- */

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t *b)
{
    if (!b) return;
    /* htslib mempolicy semantics: each of data/struct is freed only when
     * the user does NOT own it (pool-allocated reads set both bits and
     * expect destroy to be a no-op) */
    if ((bam_get_mempolicy(b) & BAM_USER_OWNS_DATA) == 0)
        free(b->data);
    else
        b->l_data = 0;
    if ((bam_get_mempolicy(b) & BAM_USER_OWNS_STRUCT) == 0)
        free(b);
}

static int shim_bam_grow(bam1_t *b, size_t need)
{
    if (b->m_data >= need) return 0;
    size_t m = (need + 39) & ~((size_t)7);
    uint8_t *nd;
    uint32_t policy = bam_get_mempolicy(b);
    if (policy & BAM_USER_OWNS_DATA) {
        /* htslib: never realloc a user-owned buffer — switch to an owned
         * one and clear the flag */
        nd = (uint8_t *)malloc(m);
        if (!nd) return -1;
        if (b->data && b->l_data > 0) memcpy(nd, b->data, (size_t)b->l_data);
        bam_set_mempolicy(b, policy & ~(uint32_t)BAM_USER_OWNS_DATA);
    } else {
        nd = (uint8_t *)realloc(b->data, m);
        if (!nd) return -1;
    }
    b->data = nd;
    b->m_data = (uint32_t)m;
    return 0;
}

/* read one alignment record; returns >=0 ok, -1 EOF, <-1 error */
int sam_read1(samFile *fp, sam_hdr_t *h, bam1_t *b)
{
    (void)h;
    BGZF *bg = fp->fp.bgzf;
    uint8_t b4[4];
    ssize_t n = bgzf_read(bg, b4, 4);
    if (n == 0) return -1;
    if (n != 4) return -2;
    uint32_t block_size = le32(b4);
    if (block_size < 32) return -2;
    uint8_t fixed[32];
    if (bgzf_read(bg, fixed, 32) != 32) return -2;

    b->core.tid = (int32_t)le32(fixed);
    b->core.pos = (int32_t)le32(fixed + 4);
    uint32_t l_read_name = fixed[8];
    b->core.qual = fixed[9];
    b->core.bin = le16(fixed + 10);
    b->core.n_cigar = le16(fixed + 12);
    b->core.flag = le16(fixed + 14);
    b->core.l_qseq = (int32_t)le32(fixed + 16);
    b->core.mtid = (int32_t)le32(fixed + 20);
    b->core.mpos = (int32_t)le32(fixed + 24);
    b->core.isize = (int32_t)le32(fixed + 28);

    uint32_t rest = block_size - 32;
    uint32_t extranul = (4 - (l_read_name % 4)) % 4;
    b->core.l_extranul = (uint8_t)extranul;
    b->core.l_qname = (uint16_t)(l_read_name + extranul);

    size_t data_len = rest + extranul;
    if (shim_bam_grow(b, data_len) < 0) return -2;
    /* qname */
    if (bgzf_read(bg, b->data, l_read_name) != (ssize_t)l_read_name)
        return -2;
    for (uint32_t i = 0; i < extranul; ++i) b->data[l_read_name + i] = 0;
    /* cigar + seq + qual + aux */
    uint32_t tail = rest - l_read_name;
    if (bgzf_read(bg, b->data + b->core.l_qname, tail) != (ssize_t)tail)
        return -2;
    b->l_data = (int)data_len;
    return (int)block_size;
}

bam1_t *bam_copy1(bam1_t *bdst, const bam1_t *bsrc)
{
    if (shim_bam_grow(bdst, (size_t)bsrc->l_data) < 0) return NULL;
    uint8_t *data = bdst->data;
    uint32_t m_data = bdst->m_data;
    uint32_t policy = bam_get_mempolicy(bdst);
    memcpy(data, bsrc->data, bsrc->l_data);
    *bdst = *bsrc;
    bdst->data = data;
    bdst->m_data = m_data;
    bam_set_mempolicy(bdst, policy);
    return bdst;
}

bam1_t *bam_dup1(const bam1_t *bsrc)
{
    bam1_t *b = bam_init1();
    if (!bam_copy1(b, bsrc)) {
        bam_destroy1(b);
        return NULL;
    }
    return b;
}

int bam_set1(bam1_t *bam, size_t l_qname, const char *qname, uint16_t flag,
             int32_t tid, hts_pos_t pos, uint8_t mapq, size_t n_cigar,
             const uint32_t *cigar, int32_t mtid, hts_pos_t mpos,
             hts_pos_t isize, size_t l_seq, const char *seq,
             const char *qual, size_t l_aux)
{
    if (l_qname == 0) {
        qname = "*";
        l_qname = 1;
    }
    size_t extranul = (4 - ((l_qname + 1) % 4)) % 4;
    size_t qname_block = l_qname + 1 + extranul;
    size_t data_len = qname_block + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
    if (shim_bam_grow(bam, data_len + l_aux) < 0) return -1;

    bam->core.pos = pos;
    bam->core.tid = tid;
    bam->core.bin = 0;
    bam->core.qual = mapq;
    bam->core.l_extranul = (uint8_t)extranul;
    bam->core.flag = flag;
    bam->core.l_qname = (uint16_t)qname_block;
    bam->core.n_cigar = (uint32_t)n_cigar;
    bam->core.l_qseq = (int32_t)l_seq;
    bam->core.mtid = mtid;
    bam->core.mpos = mpos;
    bam->core.isize = isize;

    uint8_t *p = bam->data;
    memcpy(p, qname, l_qname);
    for (size_t i = 0; i <= extranul; ++i) p[l_qname + i] = 0;
    p += qname_block;
    if (n_cigar) memcpy(p, cigar, 4 * n_cigar);
    p += 4 * n_cigar;
    for (size_t i = 0; i + 1 < l_seq; i += 2) {
        *p++ = (uint8_t)((seq_nt16_table[(unsigned char)seq[i]] << 4) |
                         seq_nt16_table[(unsigned char)seq[i + 1]]);
    }
    if (l_seq & 1) *p++ = (uint8_t)(seq_nt16_table[(unsigned char)seq[l_seq - 1]] << 4);
    if (qual) {
        memcpy(p, qual, l_seq);
    } else {
        memset(p, 0xff, l_seq);
    }
    p += l_seq;
    bam->l_data = (int)(p - bam->data);
    return (int)data_len;
}

hts_pos_t bam_cigar2rlen(int n_cigar, const uint32_t *cigar)
{
    hts_pos_t l = 0;
    for (int i = 0; i < n_cigar; ++i) {
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 2)
            l += bam_cigar_oplen(cigar[i]);
    }
    return l;
}

hts_pos_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar)
{
    hts_pos_t l = 0;
    for (int i = 0; i < n_cigar; ++i) {
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 1)
            l += bam_cigar_oplen(cigar[i]);
    }
    return l;
}

hts_pos_t bam_endpos(const bam1_t *b)
{
    hts_pos_t rlen =
        (b->core.flag & BAM_FUNMAP)
            ? 0
            : bam_cigar2rlen((int)b->core.n_cigar, bam_get_cigar(b));
    if (rlen == 0) rlen = 1;
    return b->core.pos + rlen;
}

ssize_t sam_parse_cigar(const char *in, char **end, uint32_t **a_cigar,
                        size_t *a_mem)
{
    size_t n = 0;
    const char *p = in;
    if (*p == '*') {
        ++p;
    } else {
        while (*p) {
            char *num_end;
            long len = strtol(p, &num_end, 10);
            if (num_end == p || len < 0) break;
            const char *ops = BAM_CIGAR_STR;
            const char *hit = strchr(ops, *num_end);
            if (!hit || *num_end == 0) break;
            if (n + 1 > *a_mem) {
                size_t m = *a_mem ? *a_mem * 2 : 8;
                uint32_t *na = (uint32_t *)realloc(*a_cigar, m * 4);
                if (!na) return -1;
                *a_cigar = na;
                *a_mem = m;
            }
            (*a_cigar)[n++] = bam_cigar_gen((uint32_t)len,
                                            (uint32_t)(hit - ops));
            p = num_end + 1;
        }
    }
    if (end) *end = (char *)p;
    return (ssize_t)n;
}

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2])
{
    uint8_t *s = bam_get_aux(b);
    uint8_t *end = b->data + b->l_data;
    while (s + 3 < end) {
        if (s[0] == (uint8_t)tag[0] && s[1] == (uint8_t)tag[1]) return s + 2;
        uint8_t type = s[2];
        s += 3;
        switch (type) {
        case 'A': case 'c': case 'C': s += 1; break;
        case 's': case 'S': s += 2; break;
        case 'i': case 'I': case 'f': s += 4; break;
        case 'd': s += 8; break;
        case 'Z': case 'H':
            while (s < end && *s) ++s;
            ++s;
            break;
        case 'B': {
            if (s + 5 > end) return NULL;
            uint8_t sub = s[0];
            uint32_t count = le32(s + 1);
            int esize = (sub == 'c' || sub == 'C') ? 1
                        : (sub == 's' || sub == 'S') ? 2
                        : (sub == 'i' || sub == 'I' || sub == 'f') ? 4 : 0;
            if (!esize) return NULL;
            s += 5 + (size_t)esize * count;
            break;
        }
        default:
            return NULL;
        }
    }
    return NULL;
}

char *bam_aux2Z(const uint8_t *s)
{
    return (*s == 'Z' || *s == 'H') ? (char *)(s + 1) : NULL;
}

/* ---------------- index / iterators ---------------- */

hts_idx_t *sam_index_load(samFile *fp, const char *fn)
{
    (void)fp;
    /* verify the sidecar index exists (mirrors htslib's contract that the
     * loader fails without one); iteration itself is linear-scan */
    char buf[4096];
    snprintf(buf, sizeof buf, "%s.bai", fn);
    FILE *f = fopen(buf, "rb");
    if (!f) {
        size_t l = strlen(fn);
        if (l > 4) {
            snprintf(buf, sizeof buf, "%.*s.bai", (int)(l - 4), fn);
            f = fopen(buf, "rb");
        }
    }
    if (!f) return NULL;
    fclose(f);
    return (hts_idx_t *)calloc(1, 8);
}

hts_itr_t *sam_itr_querys(const hts_idx_t *idx, sam_hdr_t *hdr,
                          const char *region)
{
    (void)idx;
    hts_itr_t *it = (hts_itr_t *)calloc(1, sizeof(hts_itr_t));
    hts_pos_t beg, end;
    char *name = shim_parse_region(region, &beg, &end);
    it->tid = sam_hdr_name2tid(hdr, name);
    free(name);
    it->beg = beg;
    it->end = end;
    if (it->tid < 0) {
        free(it);
        return NULL;
    }
    return it;
}

hts_itr_t *sam_itr_regarray(const hts_idx_t *idx, sam_hdr_t *hdr,
                            char **regarray, unsigned int count)
{
    (void)idx;
    hts_itr_t *it = (hts_itr_t *)calloc(1, sizeof(hts_itr_t));
    it->multi = 1;
    it->n_reg = (int)count;
    it->reg_list =
        (hts_reglist_t *)calloc(count ? count : 1, sizeof(hts_reglist_t));
    for (unsigned int i = 0; i < count; ++i) {
        hts_pos_t beg, end;
        char *name = shim_parse_region(regarray[i], &beg, &end);
        it->reg_list[i].reg = name;
        it->reg_list[i].tid = sam_hdr_name2tid(hdr, name);
        it->reg_list[i].intervals =
            (hts_pair_pos_t *)calloc(1, sizeof(hts_pair_pos_t));
        it->reg_list[i].count = 1;
        it->reg_list[i].intervals[0].beg = beg;
        it->reg_list[i].intervals[0].end = end;
        it->reg_list[i].min_beg = beg;
        it->reg_list[i].max_end = end;
    }
    it->curr_reg = 0;
    return it;
}

void shim_tbx_pushback(void *tbx, kstring_t *s, int tid, hts_pos_t beg,
                       hts_pos_t end);

/* linear scan: read records until one overlaps [beg, end) of tid.
 * Two flavours share this entry point: BAM iterators (readrec == NULL,
 * data == htsFile*) and tabix iterators (readrec == tbx_readrec,
 * data == tbx_t*, r == kstring_t*). A tabix record that lands past the
 * query region is pushed back so the next per-chromosome query sees it. */
int hts_itr_next(BGZF *bgfp, hts_itr_t *iter, void *r, void *data)
{
    if (iter->readrec) { /* generic (tabix) path */
        kstring_t *s = (kstring_t *)r;
        for (;;) {
            if (iter->finished) return -1;
            int tid;
            hts_pos_t beg, end;
            int ret = iter->readrec(bgfp, data, r, &tid, &beg, &end);
            if (ret < 0) {
                iter->finished = 1;
                return ret;
            }
            if (tid < iter->tid ||
                (tid == iter->tid && end <= iter->beg))
                continue;
            if (tid > iter->tid || beg >= iter->end) {
                shim_tbx_pushback(data, s, tid, beg, end);
                iter->finished = 1;
                return -1;
            }
            return ret;
        }
    }
    samFile *fp = (samFile *)data;
    bam1_t *b = (bam1_t *)r;
    for (;;) {
        if (iter->finished) return -1;
        int ret = sam_read1(fp, NULL, b);
        if (ret < 0) {
            iter->finished = 1;
            return ret;
        }
        if (b->core.tid < iter->tid) continue;
        if (b->core.tid > iter->tid || b->core.pos >= iter->end) {
            iter->finished = 1;
            return -1;
        }
        if (bam_endpos(b) > iter->beg) return ret;
    }
}

/* multi-region linear scan over a sorted region list */
int hts_itr_multi_next(htsFile *fd, hts_itr_t *iter, void *r)
{
    bam1_t *b = (bam1_t *)r;
    for (;;) {
        if (iter->finished) return -1;
        int ret = sam_read1(fd, NULL, b);
        if (ret < 0) {
            iter->finished = 1;
            return ret;
        }
        hts_pos_t endp = bam_endpos(b);
        /* check every region (lists are small in harness runs); a record
         * matches if it overlaps any region */
        int past_all = 1;
        for (int i = 0; i < iter->n_reg; ++i) {
            hts_reglist_t *rl = &iter->reg_list[i];
            if (rl->tid != b->core.tid) {
                if (rl->tid > b->core.tid) past_all = 0;
                continue;
            }
            for (uint32_t j = 0; j < rl->count; ++j) {
                if (b->core.pos < rl->intervals[j].end) past_all = 0;
                if (b->core.pos < rl->intervals[j].end &&
                    endp > rl->intervals[j].beg)
                    return ret;
            }
        }
        if (past_all) {
            iter->finished = 1;
            return -1;
        }
    }
}
