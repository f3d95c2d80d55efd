// Drives the reference's GENUINE per-region calling chain end-to-end —
// local assembly, region trimming, read trimming/filters, PairHMM,
// realignment, genotyping + annotation — exactly as
// HaplotypeCallerEngine::call_region wires it (reference:
// src/haplotypecaller/haplotypecaller_engine.cpp:145-285), and prints the
// resulting variants with their FORMAT fields plus diagnostic read lists.
// VCF mode only (reference confidence NONE).
//
// Case file (scripts/golden_assembly.py format, 1-BASED region coords):
//   "contig\tbeg1\tend1\tn" line, n SAM read lines, blank line, per case.
// Ref file: single line, the full chromosome string.
// Output per case:
//   region: beg1-end1
//   trimmed: varbeg1-varend1 padded: pbeg1-pend1   (or "trimmed: none")
//   pairhmm_reads: N\tname1,name2,...   (post trim+filters, pre-sort)
//   variant: pos1 REF ALT,... QUAL GT AD DP GQ PL
//   blank line
//
// Built by refshim/build_harness.sh into .refbuild/bin/region_harness.

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <list>
#include <memory_resource>
#include <sstream>
#include <string>
#include <vector>

#include "htslib/sam.h"
#include "htslib/vcf.h"

#include "assemble_argument.h"
#include "assemble_engine.h"
#include "assemble_result.h"
#include "genotype_argument.h"
#include "germline_genotying_engine.h"
#include "genotype_likelihoods.h"
#include "haplotype.h"
#include "hc_assemble_main.h"
#include "indexed_sample_list.hpp"
#include "homogeneous_ploidy_model.hpp"
#include "read_record.h"
#include "simple_interval.h"
#include "utils/adapter_utils.h"
#include "utils/assembly_based_caller_utils.h"
// test-harness access to private annotation fields (InfoData has only
// setters; we need to read them back for golden diffs)
#define private public
#include "info_data.hpp"
#include "variant.h"
#undef private
#include "allele.h"
#include "genotype.h"
#include "genotypes_context.hpp"
#include "allele_likelihoods.hpp"
#include "indexed_allele_list.hpp"
#include "bam_data_pool.hpp"
#include "../common/enum.h"
#include "pairhmm_engine.h"

using namespace rovaca;

static constexpr size_t s_buffer_size = 1024u * 1024u * 256u;
static constexpr size_t k_reads_mem_capacity = 1024u * 1024u * 64u;
static constexpr int64_t k_region_padding = 100;
static constexpr int64_t k_reference_padding = 500;
static constexpr int32_t k_read_length_filter_threshold = 10;

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
    if (ncig < 0) exit(2);
    size_t lseq = col[9].size();
    bam1_t *b = bam_init1();
    std::vector<char> quals(lseq);
    for (size_t i = 0; i < lseq; ++i) quals[i] = char(col[10][i] - 33);
    bam_set1(b, col[0].size(), col[0].c_str(), uint16_t(atoi(col[1].c_str())),
             0, atoll(col[3].c_str()) - 1, uint8_t(atoi(col[4].c_str())),
             size_t(ncig), cig, col[6] == "*" ? -1 : 0,
             col[7] == "0" ? -1 : atoll(col[7].c_str()) - 1,
             atoll(col[8].c_str()), lseq, col[9].c_str(), quals.data(), 64);
    free(cig);
    return b;
}

static bool mate_ok(pReadRecord read)
{
    return !read->is_paired() || read->mate_is_unmapped() ||
           (!read->is_unmapped() && read->get_tid() == read->mate_tid());
}

int main(int argc, char *argv[])
{
    if (argc < 4) {
        fprintf(stderr, "usage: region_harness cases.txt ref.txt out.txt\n");
        return 1;
    }
    std::ifstream cases(argv[1]);
    std::ifstream refs(argv[2]);
    std::ofstream out(argv[3]);
    std::string chr_ref;
    std::getline(refs, chr_ref);

    rovaca::init_pairhmm_ptr(false);

    AssembleArgument argument = ASSEMBLE_DEFAULT_ARGUMENTS;
    argument.read_threading_argument.kmer = {10, 25};
    AssembleEngine::init_assemble_argument(&argument);

    // minimal one-contig BAM header (chr1 = the provided ref string),
    // built field-by-field (the shim libhts has no sam_hdr_add_lines)
    bam_hdr_t *hdr = sam_hdr_init();
    hdr->n_targets = 1;
    hdr->target_name = (char **)calloc(1, sizeof(char *));
    hdr->target_name[0] = strdup("chr1");
    hdr->target_len = (uint32_t *)calloc(1, sizeof(uint32_t));
    hdr->target_len[0] = uint32_t(chr_ref.size());
    bcf_hdr_t *vcf_hdr = bcf_hdr_init("w");

    GenotypeArgument gargs{};
    gargs.output = "region_harness";
    gargs.tool_name = "HaplotypeCaller";
    gargs.init_reference_confidence_mode(ReferenceConfidenceMode::NONE);

    std::vector<std::string> samples{"SAMPLE"};
    pInterfaceSampleList sample_list = IndexedSampleList::create(samples);
    pInterfacePloidyModel ploidy_model =
        HomogeneousPloidyModel::create(gargs.sample_ploidy, sample_list);

    auto *genotype_engine = new GermlineGenotyingEngine{};
    bool is_avx512 = true;

    std::string line;
    while (std::getline(cases, line)) {
        if (line.empty()) continue;
        std::istringstream head(line);
        std::string contig;
        int64_t beg1, end1;
        size_t n;
        head >> contig >> beg1 >> end1 >> n;
        std::vector<bam1_t *> region_reads;
        for (size_t i = 0; i < n; ++i) {
            std::getline(cases, line);
            region_reads.push_back(parse_sam(line.c_str()));
        }
        out << "region: " << beg1 << "-" << end1 << "\n";

        auto *buffer = new uint8_t[s_buffer_size]{};
        auto *target_mem = new std::pmr::monotonic_buffer_resource(
            buffer, s_buffer_size, std::pmr::null_memory_resource());
        auto *bam_pool = new BamDataPool(uint32_t(32 * 1024 * 1024));
        std::pmr::list<bam1_t *> extra_memory_reads{target_mem};

        genotype_engine->clear_upstream_deletions_loc();
        genotype_engine->set_dbsnp(0, nullptr);
        genotype_engine->init_engine_per_loop(&gargs, target_mem, bam_pool,
                                              hdr, vcf_hdr, sample_list,
                                              ploidy_model);
        p_lib_sw_avx sw = genotype_engine->sw();

        // engine region intervals (1-based)
        pSimpleInterval original =
            SimpleInterval::create(0, beg1, end1, target_mem);
        pSimpleInterval original_padded = SimpleInterval::create(
            0, std::max(beg1 - k_region_padding, int64_t(1)),
            std::min(end1 + k_region_padding, int64_t(chr_ref.size())),
            target_mem);
        pSimpleInterval ref_loc = SimpleInterval::create(
            0, std::max(original_padded->get_start() - k_reference_padding,
                        int64_t(1)),
            std::min(original_padded->get_stop() + k_reference_padding,
                     int64_t(chr_ref.size())),
            target_mem);
        RefFragment ref_bases;
        ref_bases.data = (uint8_t *)chr_ref.data() + ref_loc->get_start() - 1;
        ref_bases.len = uint32_t(ref_loc->get_length());

        hc_region_active_storage region{
            tid : 0,
            active : 1,
            start_index : beg1,
            end_index : end1,
            activeSpan : {beg1, end1},
            paddedSpan : {original_padded->get_start(),
                          original_padded->get_stop()}
        };
        p_hc_apply assembler = hc_apply_init();
        AssembleReadsBuffer reads_mem{
            buffer_ : new uint8_t[k_reads_mem_capacity]{},
            used_ : 0,
            capacity_ : k_reads_mem_capacity};
        AssembleResult *untrimed_result = AssembleEngine::local_assemble(
            assembler, &region, (const uint8_t *)chr_ref.data(),
            chr_ref.size(), region_reads, target_mem, &reads_mem);

        ReadHashSet original_reads{{untrimed_result->get_reads().begin(),
                                    untrimed_result->get_reads().end()},
                                   target_mem};
        if (untrimed_result->get_reads().empty() ||
            untrimed_result->get_haplotypes().size() <= 1) {
            out << "trimmed: none (assembly)\n\n";
            goto cleanup;
        }
        {
            HaplotypeVector &untrim_h = const_cast<HaplotypeVector &>(
                untrimed_result->get_haplotypes());
            auto trim_result = AdapterUtils::trim_region(
                untrim_h, &ref_bases, ref_loc, original, original_padded,
                &gargs, target_mem);
            if (trim_result.first == nullptr) {
                out << "trimmed: none\n\n";
                goto cleanup;
            }
            pSimpleInterval variant = trim_result.first;
            pSimpleInterval variant_padded = trim_result.second;
            out << "trimmed: " << variant->get_start() << "-"
                << variant->get_stop() << " padded: "
                << variant_padded->get_start() << "-"
                << variant_padded->get_stop() << "\n";

            ReadHashSet trimed_reads = AdapterUtils::trim_reads_by_region(
                original_reads, variant_padded, target_mem, bam_pool,
                extra_memory_reads);
            HaplotypeVector trimed_haps = AdapterUtils::trim_haplotype_by_region(
                untrim_h, variant_padded, target_mem);
            if (trimed_haps.size() <= 1) {
                out << "trimmed: none (haps)\n\n";
                goto cleanup;
            }
            ReadHashSet passing_reads{target_mem};
            for (pReadRecord r : trimed_reads)
                if (r->unclipped_read_length() >= k_read_length_filter_threshold)
                    passing_reads.insert(r);
            Int32ToReadVectorMap per_sample_passing_read_list{target_mem};
            {
                ReadVector filtered{target_mem};
                for (auto it = passing_reads.begin();
                     it != passing_reads.end();) {
                    pReadRecord r = *it;
                    if (r->unclipped_read_length() <
                            k_read_length_filter_threshold ||
                        r->mapping_quality() < gargs.mapping_quality_threshold ||
                        !mate_ok(r)) {
                        filtered.push_back(r);
                        it = passing_reads.erase(it);
                    }
                    else {
                        ++it;
                    }
                }
                per_sample_passing_read_list.insert({0, std::move(filtered)});
            }
            Int32ToReadVectorMap per_sample_filtered_read_list{
                {{0, {passing_reads.begin(), passing_reads.end()}}},
                target_mem};
            if (per_sample_filtered_read_list.at(0).empty()) {
                out << "no pairhmm reads\n\n";
                goto cleanup;
            }
            pHaplotype ref_haplotype = trimed_haps.front();
            ReadVector &trimed_reads2 = per_sample_filtered_read_list.at(0);
            out << "pairhmm_reads: " << trimed_reads2.size() << "\n";
            {
                ReadVector sorted_names{trimed_reads2, target_mem};
                std::sort(sorted_names.begin(), sorted_names.end(),
                          [](pReadRecord a, pReadRecord b) {
                              int c = strcmp(a->qname(), b->qname());
                              if (c) return c < 0;
                              return a->get_start() < b->get_start();
                          });
                for (pReadRecord r : sorted_names) {
                    out << "  " << r->qname() << "\t" << r->get_start()
                        << "\t";
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
            }
            if (is_avx512)
                std::sort(trimed_reads2.begin(), trimed_reads2.end(),
                          [](pReadRecord l, pReadRecord r) {
                              return l->seq_length() < r->seq_length();
                          });
            DoubleVector2D likelihoods = rovaca::call_pairhmm(
                trimed_haps, trimed_reads2, 18, PcrIndelModel::CONSERVATIVE, target_mem);

            // full-precision (hap x read) matrix for cross-impl diffing
            out << "likelihoods: " << trimed_haps.size() << " x "
                << trimed_reads2.size() << "\n";
            {
                char buf[64];
                for (size_t hi = 0; hi < likelihoods.size(); ++hi) {
                    for (size_t ri = 0; ri < likelihoods[hi].size(); ++ri) {
                        snprintf(buf, sizeof buf, "%.17g", likelihoods[hi][ri]);
                        out << "  L\t" << hi << "\t"
                            << trimed_reads2[ri]->qname() << "\t"
                            << trimed_reads2[ri]->get_start() << "\t" << buf
                            << "\n";
                    }
                }
                for (size_t hi = 0; hi < trimed_haps.size(); ++hi) {
                    out << "  H\t" << hi << "\t";
                    pHaplotype h = trimed_haps[hi];
                    const uint8_t *hb = h->get_bases()->data;
                    for (int64_t bi = 0; bi < (int64_t)h->length(); ++bi)
                        out << (char)hb[bi];
                    out << "\n";
                }
            }

            auto *alleles =
                IndexedAlleleList<pHaplotype>::create(trimed_haps, target_mem);
            ReadVector2D evidence_by_sample{{trimed_reads2}, target_mem};
            ReadVector2D filtered_evidence_by_sample{target_mem};
            for (auto &itr : per_sample_passing_read_list)
                filtered_evidence_by_sample.push_back(itr.second);
            DoubleVector3D likelihoods_by_sample{{likelihoods}, target_mem};
            auto *rh_likelihoods =
                RHLikelihoods::create<pReadRecord, pHaplotype>(
                    target_mem, sample_list, alleles,
                    std::move(evidence_by_sample),
                    std::move(filtered_evidence_by_sample),
                    std::move(likelihoods_by_sample));
            AssemblyBasedCallerUtils::realign_reads_to_their_best_haplotype(
                rh_likelihoods, ref_haplotype, ref_loc->get_start(), sw,
                target_mem, bam_pool);
            {
                const ReadVector &rr = rh_likelihoods->sample_evidence(0);
                ReadVector sorted_rr{rr, target_mem};
                std::sort(sorted_rr.begin(), sorted_rr.end(),
                          [](pReadRecord a, pReadRecord b) {
                              int c = strcmp(a->qname(), b->qname());
                              if (c) return c < 0;
                              return a->get_start() < b->get_start();
                          });
                out << "realigned: " << sorted_rr.size() << "\n";
                for (pReadRecord r : sorted_rr) {
                    out << "  " << r->qname() << "\t" << r->get_start()
                        << "-" << r->get_stop() << "\t";
                    uint32_t *cig = r->cigar();
                    for (uint32_t i = 0; i < r->cigar_length(); ++i)
                        out << bam_cigar_oplen(cig[i])
                            << BAM_CIGAR_STR[bam_cigar_op(cig[i])];
                    out << "\n";
                }
            }
            auto variants = genotype_engine->assign_genotype_likelihoods(
                rh_likelihoods, &ref_bases, ref_loc, variant,
                per_sample_passing_read_list);
            for (pVariant vc : variants.first) {
                out << "variant: " << vc->get_start() << " ";
                const AlleleVector &als = vc->alleles();
                for (size_t i = 0; i < als.size(); ++i)
                    out << (i ? "," : "") << als[i]->get_display_string()->data;
                char qbuf[32];
                snprintf(qbuf, sizeof qbuf, "%.2f", vc->get_phred_scaled_qual());
                out << " QUAL=" << qbuf;
                if (vc->info()) {
                    char sbuf[64];
                    snprintf(sbuf, sizeof sbuf, " SOR=%.5f FS=%.3f MQ=%.2f",
                             vc->info()->_sor, vc->info()->_fs,
                             vc->info()->_mq);
                    out << sbuf;
                }
                pGenotypesContext gc = vc->genotype();
                if (gc && gc->size() > 0) {
                    pGenotype g = gc->at(0);
                    out << " AD=";
                    const Int32Vector &ad = g->ad();
                    for (size_t i = 0; i < ad.size(); ++i)
                        out << (i ? "," : "") << ad[i];
                    out << " DP=" << g->get_dp() << " GQ=" << g->get_gq()
                        << " PL=";
                    const Int32Vector &pl = g->pl();
                    for (size_t i = 0; i < pl.size(); ++i)
                        out << (i ? "," : "") << pl[i];
                    out << " GL=";
                    char glbuf[64];
                    const DoubleVector &gl =
                        g->get_likelihoods()->_log10likelihoods;
                    for (size_t i = 0; i < gl.size(); ++i) {
                        snprintf(glbuf, sizeof glbuf, "%.17g", gl[i]);
                        out << (i ? "," : "") << glbuf;
                    }
                    snprintf(glbuf, sizeof glbuf, " LOG10ERR=%.17g",
                             vc->log10_error());
                    out << glbuf;
                }
                out << "\n";
            }
        }
    cleanup:
        out << "\n";
        out.flush();
        untrimed_result->~AssembleResult();
        hc_apply_reset(assembler);
        hc_apply_finit(assembler);
        for (bam1_t *b : region_reads) bam_destroy1(b);
        delete[] reads_mem.buffer_;
        delete bam_pool;
        delete target_mem;
        delete[] buffer;
    }
    AssembleEngine::finit_assemble_argument();
    return 0;
}
