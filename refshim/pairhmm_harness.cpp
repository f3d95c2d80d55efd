// Drives the reference's GENUINE PairHMM dispatcher (rovaca::call_pairhmm)
// over serialized (haplotypes, reads) cases, mirroring the engine call site
// exactly (reference: src/haplotypecaller/haplotypecaller_engine.cpp:238-250:
// sort reads by length when AVX512, base-quality threshold 18, PCR model
// CONSERVATIVE by default).
//
// Case format (scripts/golden_pairhmm.py):
//   "H R" header line, H haplotype lines (first = ref), R SAM lines.
// Result format, per case:
//   surviving read names (tab-joined) after filter_poorly_modelled_evidence
//   H rows: per-read post-normalization log10 likelihoods, "%.12e" tabbed
//   blank line
//
// Built by refshim/build_harness.sh into .refbuild/bin/pairhmm_harness,
// linked against the reference's own shared libraries.

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "htslib/sam.h"

#include "forward.h"
#include "haplotype.h"
#include "read_record.h"
#include "rovaca_memory_pool.h"
#include "../common/enum.h"
#include "pairhmm_engine.h"

using namespace rovaca;

static const size_t POOL_BYTES = size_t(1) << 30;  // 1 GiB scratch

static bam1_t *parse_sam(const char *line, std::vector<bam1_t *> &owned)
{
    // columns: qname flag rname pos mapq cigar rnext pnext tlen seq qual
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
    std::vector<char> qual(lseq);
    for (size_t i = 0; i < lseq; ++i) qual[i] = (char)(col[10][i] - 33);
    bam1_t *b = bam_init1();
    int32_t mtid = (col[6] == "*") ? -1 : 0;
    hts_pos_t mpos = (col[6] == "*") ? -1 : atoll(col[7].c_str()) - 1;
    int r = bam_set1(b, col[0].size(), col[0].c_str(),
                     (uint16_t)atoi(col[1].c_str()), 0,
                     atoll(col[3].c_str()) - 1,
                     (uint8_t)atoi(col[4].c_str()), (size_t)ncig, cig, mtid,
                     mpos, atoll(col[8].c_str()), lseq, col[9].c_str(),
                     qual.data(), 0);
    free(cig);
    if (r < 0) {
        fprintf(stderr, "bam_set1 failed\n");
        exit(2);
    }
    owned.push_back(b);
    return b;
}

int main(int argc, char **argv)
{
    if (argc < 3) {
        fprintf(stderr, "usage: %s cases.txt result.txt [iters]\n", argv[0]);
        return 1;
    }
    int iters = argc > 3 ? atoi(argv[3]) : 1;
    FILE *in = fopen(argv[1], "r");
    FILE *out = fopen(argv[2], "w");
    if (!in || !out) {
        perror("open");
        return 1;
    }

    init_pairhmm_ptr(false);  // CPUID dispatch (pairhmm_engine.cpp:22-53)
    bool sort_by_len = avx512_supported();

    uint8_t *buf = (uint8_t *)malloc(POOL_BYTES);
    RovacaMemoryPool pool(buf, POOL_BYTES);
    sam_hdr_t *hdr = sam_hdr_init();

    char *line = nullptr;
    size_t cap = 0;

    while (getline(&line, &cap, in) > 0) {
        int nh = 0, nr = 0;
        if (sscanf(line, "%d %d", &nh, &nr) != 2 || nh <= 0) continue;

        std::vector<std::string> hap_strs(nh);
        for (int i = 0; i < nh; ++i) {
            if (getline(&line, &cap, in) <= 0) return 2;
            hap_strs[i].assign(line, strcspn(line, "\n"));
        }
        std::vector<bam1_t *> owned;
        std::vector<std::string> sam_lines(nr);
        for (int i = 0; i < nr; ++i) {
            if (getline(&line, &cap, in) <= 0) return 2;
            sam_lines[i].assign(line, strcspn(line, "\n"));
        }

        for (int it = 0; it < iters; ++it) {
            MemoryPoolGuard guard(&pool);

            HaplotypeVector haps{&pool};
            for (int i = 0; i < nh; ++i) {
                pHaplotype h = Haplotype::create(&pool);
                // the (str, num, is_ref) overload with the exact length —
                // the 3-arg overload stores strlen+1 (haplotype.cpp:12-18),
                // inflating length() and skewing init_d = IC/hap_len
                h->init_haplotype(hap_strs[i].c_str(),
                                  (uint32_t)hap_strs[i].size(),
                                  i == 0 ? 1 : 0, &pool);
                haps.push_back(h);
            }
            ReadVector reads{&pool};
            for (int i = 0; i < nr; ++i)
                reads.push_back(ReadRecord::create(
                    &pool, hdr, parse_sam(sam_lines[i].c_str(), owned)));

            if (sort_by_len)
                std::sort(reads.begin(), reads.end(),
                          [](pReadRecord l, pReadRecord r) {
                              return l->seq_length() < r->seq_length();
                          });

            DoubleVector2D lik = call_pairhmm(
                haps, reads, 18, PcrIndelModel::CONSERVATIVE, &pool);

            if (it == iters - 1) {
                for (size_t i = 0; i < reads.size(); ++i)
                    fprintf(out, "%s%s", i ? "\t" : "", reads[i]->qname());
                fprintf(out, "\n");
                for (int h = 0; h < nh; ++h) {
                    for (size_t i = 0; i < reads.size(); ++i)
                        fprintf(out, "%s%.12e", i ? "\t" : "", lik[h][i]);
                    fprintf(out, "\n");
                }
                fprintf(out, "\n");
            }
            for (bam1_t *b : owned) bam_destroy1(b);
            owned.clear();
        }
    }
    free(line);
    fclose(in);
    fclose(out);
    return 0;
}
