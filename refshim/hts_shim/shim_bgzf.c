/* BGZF implementation for the reference harness build (see shim_kstring.c
 * header note). Backed by stdio + zlib. Original implementation of the
 * public BGZF spec (SAM spec §4.1); struct layout comes from the bundled
 * htslib/bgzf.h so the bgzf_tell macro and external field reads stay valid.
 *
 * Modes: "r" read (real BGZF blocks); "w"+level write BGZF; passthrough
 * text mode is marked by compress_level == -2 (used by the shim's hts_open
 * for plain VCF output — the reference writer always writes through
 * fp.bgzf regardless of compression, reference:
 * src/haplotypecaller/writer/writer.cpp:298,373).
 */
#include <errno.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#include "htslib/bgzf.h"
#include "htslib/kstring.h"

#define SHIM_BGZF_BLOCK_SIZE 0xff00u
#define SHIM_BGZF_MAX_BLOCK 0x10000u

/* fp is declared as struct hFILE*; the shim stores a FILE* there (all
 * functions touching it live in this shim). */
#define SHIM_FILE(fp) ((FILE *)(fp)->fp)

static const uint8_t shim_bgzf_eof[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00, 0x42, 0x43,
    0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00};

BGZF *bgzf_open(const char *path, const char *mode)
{
    int is_write = (strchr(mode, 'w') != NULL) || (strchr(mode, 'a') != NULL);
    FILE *f = fopen(path, is_write ? "wb" : "rb");
    if (!f) return NULL;

    BGZF *fp = (BGZF *)calloc(1, sizeof(BGZF));
    fp->fp = (struct hFILE *)f;
    fp->is_write = is_write;
    fp->is_compressed = 1;
    fp->compress_level = -1; /* default (zlib level 6) */
    for (const char *m = mode; *m; ++m) {
        if (*m >= '0' && *m <= '9') fp->compress_level = *m - '0';
        if (*m == 'u') fp->compress_level = 0;
        if (*m == 'T') { /* shim extension: raw text passthrough */
            fp->is_compressed = 0;
            fp->compress_level = -2;
        }
    }
    fp->uncompressed_block = malloc(SHIM_BGZF_MAX_BLOCK);
    fp->compressed_block = malloc(SHIM_BGZF_MAX_BLOCK);
    fp->block_address = 0;
    fp->block_offset = 0;
    fp->block_length = 0;
    return fp;
}

/* ---------------- write side ---------------- */

static int shim_deflate_block(BGZF *fp)
{
    if (fp->block_offset == 0) return 0;
    uint8_t *out = (uint8_t *)fp->compressed_block;
    /* 18-byte BGZF header; BSIZE patched after deflate */
    static const uint8_t hdr[18] = {0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0,
                                    0,    0xff, 0x06, 0,    0x42, 0x43,
                                    0x02, 0,    0,    0};
    memcpy(out, hdr, 18);

    z_stream zs;
    memset(&zs, 0, sizeof zs);
    int level = fp->compress_level < 0 ? Z_DEFAULT_COMPRESSION
                                       : fp->compress_level;
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return -1;
    zs.next_in = (Bytef *)fp->uncompressed_block;
    zs.avail_in = (uInt)fp->block_offset;
    zs.next_out = out + 18;
    zs.avail_out = SHIM_BGZF_MAX_BLOCK - 18 - 8;
    int ret = deflate(&zs, Z_FINISH);
    uint32_t clen = (uint32_t)zs.total_out;
    deflateEnd(&zs);
    if (ret != Z_STREAM_END) return -1;

    uint32_t bsize = clen + 18 + 8; /* total block size */
    out[16] = (uint8_t)((bsize - 1) & 0xff);
    out[17] = (uint8_t)(((bsize - 1) >> 8) & 0xff);
    uint32_t crc = crc32(0, (Bytef *)fp->uncompressed_block,
                         (uInt)fp->block_offset);
    uint8_t *tail = out + 18 + clen;
    tail[0] = crc & 0xff;
    tail[1] = (crc >> 8) & 0xff;
    tail[2] = (crc >> 16) & 0xff;
    tail[3] = (crc >> 24) & 0xff;
    uint32_t isize = (uint32_t)fp->block_offset;
    tail[4] = isize & 0xff;
    tail[5] = (isize >> 8) & 0xff;
    tail[6] = (isize >> 16) & 0xff;
    tail[7] = (isize >> 24) & 0xff;

    if (fwrite(out, 1, bsize, SHIM_FILE(fp)) != bsize) return -1;
    fp->block_address += bsize;
    fp->block_offset = 0;
    return 0;
}

int bgzf_flush(BGZF *fp)
{
    if (!fp->is_write) return 0;
    if (!fp->is_compressed) {
        fflush(SHIM_FILE(fp));
        return 0;
    }
    return shim_deflate_block(fp);
}

ssize_t bgzf_write(BGZF *fp, const void *data, size_t length)
{
    if (!fp->is_compressed) { /* passthrough text mode */
        size_t n = fwrite(data, 1, length, SHIM_FILE(fp));
        fp->block_address += (int64_t)n;
        return n == length ? (ssize_t)length : -1;
    }
    const uint8_t *p = (const uint8_t *)data;
    size_t remaining = length;
    while (remaining > 0) {
        size_t space = SHIM_BGZF_BLOCK_SIZE - (size_t)fp->block_offset;
        size_t take = remaining < space ? remaining : space;
        memcpy((uint8_t *)fp->uncompressed_block + fp->block_offset, p, take);
        fp->block_offset += (int)take;
        p += take;
        remaining -= take;
        if ((size_t)fp->block_offset >= SHIM_BGZF_BLOCK_SIZE) {
            if (shim_deflate_block(fp) < 0) return -1;
        }
    }
    return (ssize_t)length;
}

int bgzf_raw_write_shim_unused(void) { return 0; }

/* ---------------- read side ---------------- */

static int shim_read_block(BGZF *fp)
{
    FILE *f = SHIM_FILE(fp);
    int64_t addr = ftello(f);
    uint8_t hdr[12]; /* fixed gzip member header; extra field follows */
    size_t got = fread(hdr, 1, 12, f);
    if (got == 0) return -1; /* clean EOF */
    if (got != 12 || hdr[0] != 0x1f || hdr[1] != 0x8b) {
        fp->errcode |= BGZF_ERR_HEADER;
        return -2;
    }
    /* find BSIZE in the extra field */
    uint16_t xlen = (uint16_t)(hdr[10] | (hdr[11] << 8));
    uint8_t extra[256];
    if (xlen > sizeof extra || fread(extra, 1, xlen, f) != xlen) {
        fp->errcode |= BGZF_ERR_HEADER;
        return -2;
    }
    uint32_t bsize = 0;
    for (uint16_t off = 0; off + 4 <= xlen;) {
        uint8_t si1 = extra[off], si2 = extra[off + 1];
        uint16_t slen = (uint16_t)(extra[off + 2] | (extra[off + 3] << 8));
        if (si1 == 'B' && si2 == 'C' && slen == 2) {
            bsize = (uint32_t)(extra[off + 4] | (extra[off + 5] << 8)) + 1;
            break;
        }
        off += 4 + slen;
    }
    if (bsize < 12u + xlen + 8u) {
        fp->errcode |= BGZF_ERR_HEADER;
        return -2;
    }
    uint32_t clen = bsize - (12 + xlen) - 8; /* deflate payload */
    if (fread(fp->compressed_block, 1, clen, f) != clen) {
        fp->errcode |= BGZF_ERR_IO;
        return -2;
    }
    uint8_t tail[8];
    if (fread(tail, 1, 8, f) != 8) {
        fp->errcode |= BGZF_ERR_IO;
        return -2;
    }
    uint32_t isize = (uint32_t)(tail[4] | (tail[5] << 8) | (tail[6] << 16) |
                                ((uint32_t)tail[7] << 24));

    z_stream zs;
    memset(&zs, 0, sizeof zs);
    if (inflateInit2(&zs, -15) != Z_OK) return -2;
    zs.next_in = (Bytef *)fp->compressed_block;
    zs.avail_in = clen;
    zs.next_out = (Bytef *)fp->uncompressed_block;
    zs.avail_out = SHIM_BGZF_MAX_BLOCK;
    int ret = inflate(&zs, Z_FINISH);
    uint32_t ilen = (uint32_t)zs.total_out;
    inflateEnd(&zs);
    if (ret != Z_STREAM_END || ilen != isize) {
        fp->errcode |= BGZF_ERR_ZLIB;
        return -2;
    }
    uint32_t crc = crc32(0, (Bytef *)fp->uncompressed_block, ilen);
    uint32_t want = (uint32_t)(tail[0] | (tail[1] << 8) | (tail[2] << 16) |
                               ((uint32_t)tail[3] << 24));
    if (crc != want) {
        fp->errcode |= BGZF_ERR_CRC;
        return -2;
    }
    fp->block_address = addr;
    fp->block_length = (int)ilen;
    fp->block_offset = 0;
    return 0;
}

ssize_t bgzf_read(BGZF *fp, void *data, size_t length)
{
    if (!fp->is_compressed) { /* passthrough text mode */
        size_t n = fread(data, 1, length, SHIM_FILE(fp));
        fp->block_address += (int64_t)n;
        return (ssize_t)n;
    }
    uint8_t *out = (uint8_t *)data;
    size_t done = 0;
    while (done < length) {
        if (fp->block_offset >= fp->block_length) {
            int r = shim_read_block(fp);
            if (r == -1) break; /* EOF */
            if (r < -1) return -1;
            if (fp->block_length == 0) continue; /* empty (EOF) block */
        }
        size_t avail = (size_t)(fp->block_length - fp->block_offset);
        size_t take = (length - done) < avail ? (length - done) : avail;
        memcpy(out + done,
               (uint8_t *)fp->uncompressed_block + fp->block_offset, take);
        fp->block_offset += (int)take;
        done += take;
    }
    return (ssize_t)done;
}

int64_t bgzf_seek(BGZF *fp, int64_t pos, int whence)
{
    if (fp->is_write || whence != SEEK_SET) return -1;
    int64_t block_addr = pos >> 16;
    int offset = (int)(pos & 0xffff);
    if (fseeko(SHIM_FILE(fp), block_addr, SEEK_SET) != 0) return -1;
    fp->block_length = 0; /* force re-read */
    fp->block_offset = 0;
    fp->block_address = block_addr;
    if (offset > 0) {
        if (shim_read_block(fp) != 0) return -1;
        if (offset > fp->block_length) return -1;
        fp->block_offset = offset;
    }
    return 0;
}

int bgzf_getc(BGZF *fp)
{
    uint8_t c;
    ssize_t n = bgzf_read(fp, &c, 1);
    return n == 1 ? c : (n == 0 ? -1 : -2);
}

int bgzf_getline(BGZF *fp, int delim, kstring_t *str)
{
    str->l = 0;
    int c;
    while ((c = bgzf_getc(fp)) >= 0 && c != delim) kputc(c, str);
    if (c < -1) return -2;
    if (c == -1 && str->l == 0) return -1;
    if (str->l > 0 && delim == '\n' && str->s[str->l - 1] == '\r') --str->l;
    if (ks_resize(str, str->l + 1) < 0) return -2;
    str->s[str->l] = 0;
    return (int)str->l;
}

int bgzf_close(BGZF *fp)
{
    if (!fp) return -1;
    if (fp->is_write) {
        (void)bgzf_flush(fp);
        if (fp->is_compressed) {
            fwrite(shim_bgzf_eof, 1, sizeof shim_bgzf_eof, SHIM_FILE(fp));
        }
    }
    int ret = fclose(SHIM_FILE(fp));
    free(fp->uncompressed_block);
    free(fp->compressed_block);
    free(fp);
    return ret;
}

/* On-the-fly index hooks: the harness runs with output indexing disabled
 * (--index flips create_output_index_ to false), so these only need to be
 * link-complete no-ops that report success. */
int bgzf_idx_push(BGZF *fp, hts_idx_t *hidx, int tid, hts_pos_t beg,
                  hts_pos_t end, uint64_t offset, int is_mapped)
{
    (void)fp; (void)hidx; (void)tid; (void)beg; (void)end; (void)offset;
    (void)is_mapped;
    return 0;
}

int bgzf_mt(BGZF *fp, int n_threads, int n_sub_blks)
{
    (void)fp; (void)n_threads; (void)n_sub_blks;
    return 0;
}

int bgzf_thread_pool(BGZF *fp, struct hts_tpool *pool, int qsize)
{
    (void)fp; (void)pool; (void)qsize;
    return 0;
}
