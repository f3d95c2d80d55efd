// Drives the reference's GENUINE local assembler (AssembleEngine::
// local_assemble -> hc_apply_main) over serialized region cases, like the
// reference's own FakeAssembler test driver (reference:
// src/haplotypecaller/apply/test/fake_assembler.cpp:45-93), but dumping the
// FINALIZED reads in full (qname, 0-based start, cigar, seq, quals) in
// addition to the sorted haplotype strings — so the whole
// finalize/overlap-qual/assembly stage can be diffed read-by-read against
// rovaca_tpu.
//
// Case file (scripts/golden_assembly.py format):
//   "contig\tbeg\tend\tn" line, n SAM read lines, one blank line, per case.
// Ref file: single line, the chr1 reference string (0-based coordinates).
// Output per case:
//   chr1:beg-end\treads: N
//   N lines: qname\tstart0\tcigar\tseq\tqual+33
//   haplotypes: K
//   K sorted haplotype lines
//   blank line
//
// Built by refshim/build_harness.sh into .refbuild/bin/assemble_harness.

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <memory_resource>
#include <sstream>
#include <string>
#include <vector>

#include "htslib/sam.h"

#include "assemble_argument.h"
#include "assemble_engine.h"
#include "assemble_result.h"
#include "haplotype.h"
#include "hc_assemble_main.h"
#include "read_record.h"

using namespace rovaca;

static constexpr size_t s_buffer_size = 1024u * 1024u * 64u;
static constexpr size_t k_reads_mem_capacity = 1024u * 1024u * 64u;
static constexpr uint32_t k_default_region_padding = 100;

static bam1_t *parse_sam(const char *line)
{
    std::vector<std::string> col;
    const char *p = line;
    while (*p && *p != '\n') {
        const char *q = p;
        while (*q && *q != '\t' && *q != '\n') q++;
        col.emplace_back(p, q - p);
        p = (*q == '\t') ? q + 1 : q;
    }
    if (col.size() < 11) {
        fprintf(stderr, "bad SAM line: %s\n", line);
        exit(2);
    }
    uint32_t *cig = nullptr;
    size_t cig_mem = 0;
    char *end = nullptr;
    ssize_t ncig = sam_parse_cigar(col[5].c_str(), &end, &cig, &cig_mem);
    if (ncig < 0) {
        fprintf(stderr, "bad cigar: %s\n", col[5].c_str());
        exit(2);
    }
    size_t lseq = col[9].size();
    bam1_t *b = bam_init1();
    int flag = atoi(col[1].c_str());
    hts_pos_t pos = atoll(col[3].c_str()) - 1;
    hts_pos_t mpos = col[7] == "0" ? -1 : atoll(col[7].c_str()) - 1;
    int mtid = col[6] == "*" ? -1 : 0;
    std::vector<char> quals(lseq);
    for (size_t i = 0; i < lseq; ++i) quals[i] = char(col[10][i] - 33);
    bam_set1(b, col[0].size(), col[0].c_str(), uint16_t(flag), 0, pos,
             uint8_t(atoi(col[4].c_str())), size_t(ncig), cig, mtid, mpos,
             atoll(col[8].c_str()), lseq, col[9].c_str(), quals.data(), 64);
    free(cig);
    return b;
}

int main(int argc, char *argv[])
{
    if (argc < 4) {
        fprintf(stderr, "usage: assemble_harness cases.txt ref.txt out.txt\n");
        return 1;
    }
    std::ifstream cases(argv[1]);
    std::ifstream refs(argv[2]);
    std::ofstream out(argv[3]);
    std::string chr_ref;
    std::getline(refs, chr_ref);

    AssembleArgument argument = ASSEMBLE_DEFAULT_ARGUMENTS;
    argument.read_threading_argument.kmer = {10, 25};
    argument.debugAssembly = true;
    AssembleEngine::init_assemble_argument(&argument);

    std::string line;
    while (std::getline(cases, line)) {
        if (line.empty()) continue;
        std::istringstream head(line);
        std::string contig;
        int64_t beg, end_;
        size_t n;
        head >> contig >> beg >> end_ >> n;
        std::vector<bam1_t *> region_reads;
        region_reads.reserve(n);
        for (size_t i = 0; i < n; ++i) {
            std::getline(cases, line);
            region_reads.push_back(parse_sam(line.c_str()));
        }
        std::getline(cases, line);  // per-case padded ref-window line

        auto *buffer = new uint8_t[s_buffer_size]{};
        auto *target_mem = new std::pmr::monotonic_buffer_resource(
            buffer, s_buffer_size, std::pmr::null_memory_resource());
        hc_region_active_storage region{
            tid : 0,
            active : 1,
            start_index : beg,
            end_index : end_,
            activeSpan : {beg, end_},
            paddedSpan : {beg - k_default_region_padding,
                          end_ + k_default_region_padding}
        };
        p_hc_apply assembler = hc_apply_init();
        AssembleReadsBuffer reads_mem{
            buffer_ : new uint8_t[k_reads_mem_capacity]{},
            used_ : 0,
            capacity_ : k_reads_mem_capacity};
        AssembleResult *res = AssembleEngine::local_assemble(
            assembler, &region, (const uint8_t *)chr_ref.data(),
            chr_ref.size(), region_reads, target_mem, &reads_mem);

        auto reads = res->get_reads();
        auto haplotypes = res->get_haplotypes();
        std::sort(haplotypes.begin(), haplotypes.end(),
                  [](pHaplotype a, pHaplotype b) {
                      return strcmp((const char *)a->get_display_string()->data,
                                    (const char *)b->get_display_string()->data)
                             < 0;
                  });
        std::sort(reads.begin(), reads.end(),
                  [](pReadRecord a, pReadRecord b) {
                      if (a->get_start() != b->get_start())
                          return a->get_start() < b->get_start();
                      return strcmp(a->qname(), b->qname()) < 0;
                  });
        out << "chr1:" << beg << "-" << end_ << "\treads: " << reads.size()
            << "\n";
        for (pReadRecord r : reads) {
            out << r->qname() << "\t" << r->get_start() << "\t";
            uint32_t *cig = r->cigar();
            for (uint32_t i = 0; i < r->cigar_length(); ++i)
                out << bam_cigar_oplen(cig[i])
                    << BAM_CIGAR_STR[bam_cigar_op(cig[i])];
            out << "\t";
            for (int64_t i = 0; i < (int64_t)r->seq_length(); ++i)
                out << (char)r->seq_i(i);
            out << "\t";
            for (int64_t i = 0; i < (int64_t)r->seq_length(); ++i)
                out << (char)(r->qual_i(i) + 33);
            out << "\n";
        }
        out << "haplotypes: " << haplotypes.size() << "\n";
        for (pHaplotype h : haplotypes)
            out << h->get_display_string()->data << "\n";
        out << "\n";
        out.flush();

        res->~AssembleResult();
        hc_apply_reset(assembler);
        hc_apply_finit(assembler);
        for (bam1_t *b : region_reads) bam_destroy1(b);
        delete[] reads_mem.buffer_;
        delete target_mem;
        delete[] buffer;
    }
    AssembleEngine::finit_assemble_argument();
    return 0;
}
