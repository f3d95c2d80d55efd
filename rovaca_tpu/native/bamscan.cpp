// BAM record scanner — native fast path for the BAM reader.
//
// Takes a buffer of decompressed BAM alignment records and extracts the
// fixed-size fields of every complete record in one pass, so Python only
// slices payloads (name/cigar/seq/qual/tags) lazily per record.
// (Counterpart of the hot part of the reference's htslib-backed BamLoader,
// reference: src/IOStream/bam_loader.cpp:118-142.)

#include <cstdint>
#include <cstring>

namespace {
inline int32_t rd_i32(const uint8_t* p) {
    int32_t v;
    std::memcpy(&v, p, 4);
    return v;
}
inline uint16_t rd_u16(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}
}  // namespace

// Scans complete records in buf[0..len). Returns the number of records
// written (<= cap) and sets *consumed to the byte count of fully-scanned
// records (callers keep the tail for the next chunk).
extern "C" int64_t rovaca_bam_scan(
    const uint8_t* buf, int64_t len, int64_t cap, int64_t* rec_off,
    int32_t* rec_len, int32_t* tid, int32_t* pos, int32_t* mapq,
    int32_t* flag, int32_t* n_cigar, int32_t* l_seq, int32_t* l_read_name,
    int32_t* next_tid, int32_t* next_pos, int32_t* tlen, int64_t* consumed) {
    int64_t off = 0;
    int64_t n = 0;
    while (n < cap && off + 4 <= len) {
        const int32_t block_size = rd_i32(buf + off);
        if (block_size < 32 || off + 4 + block_size > len) break;
        const uint8_t* r = buf + off + 4;
        rec_off[n] = off + 4;
        rec_len[n] = block_size;
        tid[n] = rd_i32(r + 0);
        pos[n] = rd_i32(r + 4);
        l_read_name[n] = r[8];
        mapq[n] = r[9];
        n_cigar[n] = rd_u16(r + 12);
        flag[n] = rd_u16(r + 14);
        l_seq[n] = rd_i32(r + 16);
        next_tid[n] = rd_i32(r + 20);
        next_pos[n] = rd_i32(r + 24);
        tlen[n] = rd_i32(r + 28);
        off += 4 + block_size;
        n++;
    }
    *consumed = off;
    return n;
}
